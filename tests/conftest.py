import os
import shutil
import sys

import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from crawlspark.session import get_spark

    # AQE off: at test scale its per-stage materialization adds ~10s per
    # crawl round; the engine's plans are already partition-bounded.
    # (Bench/production keep AQE on for skew-join handling at scale.)
    s = get_spark(
        "local[4]",
        shuffle_partitions=4,
        app_name="crawlspark-tests",
        extra_conf={
            "spark.sql.adaptive.enabled": "false",
            "spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version": "2",
        },
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def crawl(spark, tmp_path_factory):
    """One shared small crawl: engine run + golden simulation.

    Config exercises robots denial, 504 retries, permanent failure,
    budget binding and outlink expansion in ~11 rounds.
    """
    from crawlspark.engine import CrawlEngine
    from crawlspark.golden import simulate
    from crawlspark.synth import SynthConfig, gen_seeds, host_name

    cfg = SynthConfig(n_seeds=400, n_hosts=20, max_depth=1)
    seeds = gen_seeds(cfg)

    def bf(i):
        return 50 if i <= 2 else 20

    golden = simulate(list(seeds["url"]), cfg, budget_fn=bf)
    pol = pd.DataFrame(
        {
            "host": [host_name(i) for i in range(1, cfg.n_hosts + 1)],
            "budget": [bf(i) for i in range(1, cfg.n_hosts + 1)],
        }
    )
    workdir = str(tmp_path_factory.mktemp("crawl"))
    # use_cuckoo=False: the cuckoo pre-filter provably cannot change
    # results (no false negatives; maybe-set exact-checked); its
    # engine integration is asserted by test_cuckoo_equivalence.
    eng = CrawlEngine(spark, workdir, cfg, politeness_pdf=pol, use_cuckoo=False)
    eng.add_seeds(spark.createDataFrame(seeds))
    eng.run(max_rounds=40)
    return {"engine": eng, "golden": golden, "cfg": cfg, "pol": pol, "seeds": seeds}
