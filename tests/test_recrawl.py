"""Recrawl-after-TTL: URLs seen with status 200 re-enter the frontier
after ``recrawl_after`` rounds and are fetched again; the seen table is
maintained with MERGE (upsert-by-url, last write wins) so re-crawled
URLs update their row instead of duplicating it — the reference's
upsert-by-_id semantics (ElasticSearchIndexHandler.java:213-217).
"""

import pandas as pd

from crawlspark.engine import CrawlEngine
from crawlspark.synth import SynthConfig, gen_seeds, host_name


def test_recrawl_ttl(spark, tmp_path):
    cfg = SynthConfig(n_seeds=40, n_hosts=4, max_depth=0)
    seeds = gen_seeds(cfg)
    pol = pd.DataFrame(
        {"host": [host_name(i) for i in range(1, 5)], "budget": [100] * 4}
    )
    eng = CrawlEngine(
        spark,
        str(tmp_path / "rc"),
        cfg,
        politeness_pdf=pol,
        use_cuckoo=False,
        recrawl_after=3,
    )
    eng.add_seeds(spark.createDataFrame(seeds))
    eng.run(max_rounds=9)

    seen = eng.seen.read(spark).toPandas()
    img = eng.images.read(spark).select("url", "round_id", "phash").toPandas()

    # MERGE keeps exactly one seen row per URL (no duplicates)
    assert seen.url.nunique() == len(seen)
    # every 200-URL was re-fetched at least once within 9 rounds
    ok_urls = set(seen[seen.status == 200].url)
    per = img.groupby("url").size()
    assert ok_urls <= set(per.index)
    assert (per.loc[sorted(ok_urls)] >= 2).all(), "some 200-URL never recrawled"
    # fetch cadence: first fetch round 0 (or after retries), refetch
    # ~TTL+1 rounds later — at least two distinct round_ids per URL
    rounds_per_url = img.groupby("url").round_id.nunique()
    assert (rounds_per_url.loc[sorted(ok_urls)] >= 2).all()
    # deterministic codec: re-fetch produces identical content
    assert img.groupby("url").phash.nunique().max() == 1
    # seen row reflects the LATEST fetch round
    latest_img = img.groupby("url").round_id.max()
    seen_200 = seen[seen.status == 200].set_index("url").round_id
    pd.testing.assert_series_equal(
        seen_200.sort_index(),
        latest_img.loc[sorted(ok_urls)].sort_index(),
        check_names=False,
        check_dtype=False,
    )


def test_recrawl_auto_cuckoo_equivalence(spark, tmp_path):
    """Recrawl-MERGE mode with use_cuckoo='auto' (tiny threshold → the
    filter engages mid-crawl while MERGE keeps inflating the seen-row
    upper bound) produces exactly the exact-join crawl: the counter
    being approximate under MERGE affects only WHEN the filter engages,
    never what any round computes."""
    cfg = SynthConfig(n_seeds=40, n_hosts=4, max_depth=1)
    seeds = gen_seeds(cfg)
    pol = pd.DataFrame(
        {"host": [host_name(i) for i in range(1, 5)], "budget": [100] * 4}
    )
    outs = {}
    for tag, use, amin in (("exact", False, None), ("auto", "auto", 30)):
        eng = CrawlEngine(
            spark,
            str(tmp_path / f"rcc-{tag}"),
            cfg,
            politeness_pdf=pol,
            use_cuckoo=use,
            cuckoo_pg=4,
            cuckoo_auto_min=amin,
            recrawl_after=3,
        )
        eng.add_seeds(spark.createDataFrame(seeds))
        eng.run(max_rounds=8)
        if tag == "auto":
            assert eng.cuckoo_on, "threshold 30 should have engaged the filter"
        outs[tag] = {
            "log": eng.fetch_log.read(spark)
            .toPandas()
            .sort_values(["round_id", "host", "rank"])
            .reset_index(drop=True),
            "seen": eng.seen.read(spark)
            .toPandas()
            .sort_values("url")
            .reset_index(drop=True),
        }
    assert len(outs["exact"]["log"]) > 0
    pd.testing.assert_frame_equal(outs["exact"]["log"], outs["auto"]["log"])
    pd.testing.assert_frame_equal(outs["exact"]["seen"], outs["auto"]["seen"])


def test_snaptable_merge(spark, tmp_path):
    from crawlspark.snaptable import SnapTable

    t = SnapTable(str(tmp_path / "m"))
    df1 = spark.createDataFrame(
        [("a", 1), ("b", 1), ("c", 1)], "k string, v int"
    )
    t.overwrite(df1)
    t.merge(spark.createDataFrame([("b", 2), ("d", 2)], "k string, v int"), ["k"])
    got = {(r.k, r.v) for r in t.read(spark).collect()}
    assert got == {("a", 1), ("b", 2), ("c", 1), ("d", 2)}
    # idempotent: merging the same rows changes nothing
    t.merge(spark.createDataFrame([("b", 2), ("d", 2)], "k string, v int"), ["k"])
    got2 = {(r.k, r.v) for r in t.read(spark).collect()}
    assert got2 == got


def test_registry_sink_idempotent(spark, tmp_path):
    """K6 applied: the registry update set merges idempotently —
    re-applying the same updates changes nothing (the reference's
    skip-if-already-cleared REST loop, as one keyed MERGE)."""
    from crawlspark.ops.enrich import registry_erase_clear
    from crawlspark.snaptable import SnapTable
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    reg = SnapTable(str(tmp_path / "registry"))
    base = spark.createDataFrame(
        [("10.15468/dl.aaaaaa", "2030-01-01"), ("10.15468/dl.bbbbbb", None)],
        "doi string, erase_after string",
    )
    updates = registry_erase_clear(spark, sf)
    reg.overwrite(base.unionByName(updates.select("doi", F.lit("2030-01-01").alias("erase_after"))))
    before = reg.read(spark).count()

    reg.merge(updates, ["doi"])
    after1 = reg.read(spark).toPandas().sort_values("doi").reset_index(drop=True)
    assert after1.doi.nunique() == before  # no duplicates, keys preserved
    cleared = after1[after1.doi.isin(updates.toPandas().doi)]
    assert cleared.erase_after.isna().all()  # all cited downloads cleared

    reg.merge(updates, ["doi"])  # idempotent re-apply
    after2 = reg.read(spark).toPandas().sort_values("doi").reset_index(drop=True)
    import pandas as pd

    pd.testing.assert_frame_equal(after1, after2)
