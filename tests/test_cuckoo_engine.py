"""Engine rounds with the cuckoo pre-filter enabled must produce exactly
the same fetch_log/seen as rounds with only the exact anti-join."""

import pandas as pd

from crawlspark.engine import CrawlEngine
from crawlspark.synth import SynthConfig, gen_seeds, host_name


def test_cuckoo_equivalence(spark, tmp_path):
    cfg = SynthConfig(n_seeds=60, n_hosts=4, max_depth=1)
    seeds = gen_seeds(cfg)
    pol = pd.DataFrame(
        {
            "host": [host_name(i) for i in range(1, 5)],
            "budget": [30] * 4,
        }
    )
    outs = {}
    for tag, use in (("exact", False), ("cuckoo", True)):
        eng = CrawlEngine(
            spark,
            str(tmp_path / tag),
            cfg,
            politeness_pdf=pol,
            use_cuckoo=use,
            cuckoo_pg=4,
        )
        eng.add_seeds(spark.createDataFrame(seeds))
        eng.run(max_rounds=25, stop_after=4)
        outs[tag] = (
            eng.fetch_log.read(spark)
            .toPandas()
            .sort_values(["round_id", "host", "rank"])
            .reset_index(drop=True)
        )
    assert len(outs["exact"]) > 0
    pd.testing.assert_frame_equal(outs["exact"], outs["cuckoo"])


def test_cuckoo_auto_flip(spark, tmp_path):
    """use_cuckoo='auto' engages the filter mid-crawl (once the seen
    table crosses cuckoo_auto_min) without changing any output: the
    filter invariant holds for an arbitrary flip point."""
    cfg = SynthConfig(n_seeds=60, n_hosts=4, max_depth=1)
    seeds = gen_seeds(cfg)
    pol = pd.DataFrame(
        {
            "host": [host_name(i) for i in range(1, 5)],
            "budget": [30] * 4,
        }
    )
    outs = {}
    flipper = None
    for tag, use, amin in (("exact", False, None), ("auto", "auto", 40)):
        eng = CrawlEngine(
            spark,
            str(tmp_path / tag),
            cfg,
            politeness_pdf=pol,
            use_cuckoo=use,
            cuckoo_pg=4,
            cuckoo_auto_min=amin,
        )
        assert eng.cuckoo_on is (False if use == "auto" else use)
        eng.add_seeds(spark.createDataFrame(seeds))
        eng.run(max_rounds=25, stop_after=4)
        if tag == "auto":
            flipper = eng
        outs[tag] = (
            eng.fetch_log.read(spark)
            .toPandas()
            .sort_values(["round_id", "host", "rank"])
            .reset_index(drop=True)
        )
    # the threshold (40) is below the final seen size, so the filter
    # really did engage partway through — and outputs still match
    assert flipper.cuckoo_on and flipper._seen_rows >= 40
    assert len(outs["exact"]) > 0
    pd.testing.assert_frame_equal(outs["exact"], outs["auto"])
