"""Dirty-bucket partial overwrites: BucketedTable semantics + the
engine's per-round frontier/seen write volume tracking the round delta
(r2 VERDICT "Next round" #4/#5)."""

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from crawlspark.engine import CrawlEngine
from crawlspark.snaptable import BucketedTable
from crawlspark.synth import SynthConfig, gen_seeds, host_name

SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType(), False),
        T.StructField("v", T.StringType(), False),
    ]
)


def _bexpr(n):
    return F.pmod(F.col("k"), F.lit(n)).cast("int")


def _df(spark, lo, hi, tag):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), F.concat(F.lit(tag), F.col("id")).alias("v")
    )


def test_replace_buckets_partial(spark, tmp_path):
    t = BucketedTable(str(tmp_path / "b"), n_buckets=8)
    t.commit_empty(SCHEMA)
    t.replace_buckets(_df(spark, 0, 80, "a"), list(range(8)), _bexpr(8))
    before = t.bucket_dirs()
    assert set(before) == {str(i) for i in range(8)}
    # rewrite only buckets 0 and 1 with new content for them
    newc = _df(spark, 0, 80, "z").filter(F.pmod("k", F.lit(8)) <= 1)
    t.replace_buckets(newc, [0, 1], _bexpr(8))
    after = t.bucket_dirs()
    # untouched buckets carry the SAME leaf dirs (no rewrite)
    for b in range(2, 8):
        assert after[str(b)] == before[str(b)]
    assert after["0"] != before["0"] and after["1"] != before["1"]
    got = t.read(spark).toPandas()
    assert len(got) == 80
    assert (got[got.k % 8 <= 1].v.str.startswith("z")).all()
    assert (got[got.k % 8 > 1].v.str.startswith("a")).all()
    # a dirty bucket emptied of rows is dropped from the table
    t.replace_buckets(_df(spark, 0, 0, "x"), [0], _bexpr(8))
    assert "0" not in t.bucket_dirs()
    assert t.read(spark).filter(F.pmod("k", F.lit(8)) == 0).count() == 0


def test_bucketed_merge_touches_only_key_buckets(spark, tmp_path):
    t = BucketedTable(str(tmp_path / "m"), n_buckets=8)
    t.commit_empty(SCHEMA)
    t.replace_buckets(_df(spark, 0, 80, "a"), list(range(8)), _bexpr(8))
    before = t.bucket_dirs()
    # upsert keys 0 (exists, bucket 0) and 96 (new, bucket 0) and 17 (bucket 1)
    up = spark.createDataFrame(
        pd.DataFrame({"k": [0, 96, 17], "v": ["u0", "u96", "u17"]}), SCHEMA
    )
    t.merge(up, ["k"], _bexpr(8))
    after = t.bucket_dirs()
    for b in range(2, 8):
        assert after[str(b)] == before[str(b)], "non-key bucket was rewritten"
    got = t.read(spark).toPandas().set_index("k").v
    assert got.loc[0] == "u0" and got.loc[96] == "u96" and got.loc[17] == "u17"
    assert len(got) == 81 and got.loc[2] == "a2"


def test_partial_replace_refuses_untracked_dirs(spark, tmp_path):
    import pytest

    t = BucketedTable(str(tmp_path / "u"), n_buckets=4)
    t.commit_empty(SCHEMA)
    t.overwrite(_df(spark, 0, 10, "a"))  # untracked (non-bucketed) commit
    with pytest.raises(ValueError, match="untracked"):
        t.replace_buckets(_df(spark, 0, 2, "z"), [0], _bexpr(4))
    # all-buckets replace migrates
    t.replace_buckets(_df(spark, 0, 10, "z"), list(range(4)), _bexpr(4))
    assert t.read(spark).count() == 10


def test_engine_frontier_write_volume_tracks_delta(spark, tmp_path):
    """With no outlink expansion (max_depth=0) a round touches only the
    budgeted URLs, so the frontier rewrite must hit a strict subset of
    buckets and write far fewer rows than the pending table holds."""
    cfg = SynthConfig(n_seeds=300, n_hosts=3, max_depth=0)
    seeds = gen_seeds(cfg)
    pol = pd.DataFrame(
        {"host": [host_name(i) for i in range(1, 4)], "budget": [4, 4, 4]}
    )
    eng = CrawlEngine(
        spark,
        str(tmp_path / "wd"),
        cfg,
        politeness_pdf=pol,
        use_cuckoo=False,
        frontier_buckets=64,
    )
    eng.add_seeds(spark.createDataFrame(seeds))
    results = eng.run(max_rounds=4)
    assert len(results) >= 2
    for c in results:
        # <= 12 urls touched + <= a few retries: far fewer than 64 buckets
        assert 0 < c["frontier_dirty_buckets"] <= 24
        assert c["frontier_rows_written"] < c["pending"]
        # rows written stay in the dirty buckets' share of the table,
        # not the full pending size (64 buckets, <=24 dirty)
        assert c["frontier_rows_written"] <= c["pending"] * 24 / 64 + 32
