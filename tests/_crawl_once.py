"""Helper: run one small crawl at a given master, dump fetch_log + seen
to CSV. Used by test_parallelism to prove ordering is identical at
different parallelism levels (the sandbox stand-in for N vs 4N executors).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd  # noqa: E402

from crawlspark.engine import CrawlEngine  # noqa: E402
from crawlspark.session import get_spark  # noqa: E402
from crawlspark.synth import SynthConfig, gen_seeds, host_name  # noqa: E402


def main(master: str, workdir: str, out_csv: str, mode: str = "plain") -> None:
    cfg = SynthConfig(n_seeds=60, n_hosts=5, max_depth=1)
    seeds = gen_seeds(cfg)
    pol = pd.DataFrame(
        {
            "host": [host_name(i) for i in range(1, 6)],
            "budget": [60 if i <= 2 else 40 for i in range(1, 6)],
        }
    )
    spark = get_spark(
        master,
        shuffle_partitions=7,
        app_name="par-test",
        extra_conf={"spark.sql.adaptive.enabled": "false"},
    )
    eng = CrawlEngine(spark, workdir, cfg, politeness_pdf=pol, cuckoo_pg=4)
    eng.add_seeds(spark.createDataFrame(seeds))
    if mode == "reprioritize":
        # two rounds on hash priority, then PageRank over the crawled
        # link graph rewrites pending priorities — the rest of the
        # crawl follows link structure. Must stay bit-identical across
        # parallelism levels like the plain path.
        eng.run(max_rounds=2)
        eng.reprioritize(eng.link_ranks())
    eng.run(max_rounds=25)
    log = (
        eng.fetch_log.read(spark)
        .toPandas()
        .sort_values(["round_id", "host", "rank"])
        .reset_index(drop=True)
    )
    seen = eng.seen.read(spark).toPandas().sort_values("url").reset_index(drop=True)
    log.to_csv(out_csv + ".log.csv", index=False)
    seen.to_csv(out_csv + ".seen.csv", index=False)
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3], *sys.argv[4:5])
