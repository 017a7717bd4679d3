"""Partitioned cuckoo URL-seen filter: no false negatives, low FP rate,
state independent of input partitioning."""

import pandas as pd

from crawlspark.urlseen import CuckooSeen


def _urls(spark, lo, hi):
    return spark.range(lo, hi).selectExpr(
        "concat('https://h', cast(id % 50 as string), '.example.com/img/', cast(id as string)) as url"
    )


def test_no_false_negatives_and_fp_rate(spark, tmp_path):
    ck = CuckooSeen(str(tmp_path / "ck"), n_pg=8, buckets_per_pg=512)
    ck.insert(_urls(spark, 0, 3000))
    new, maybe = ck.split_candidates(_urls(spark, 0, 3000))
    assert new.count() == 0  # inserted URLs can never be "definitely new"
    assert maybe.count() == 3000
    n2, m2 = ck.split_candidates(_urls(spark, 3000, 6000))
    fp = m2.count()
    assert n2.count() + fp == 3000
    assert fp < 30  # 16-bit fingerprints → FP ~0.01%


def test_state_deterministic_under_partitioning(spark, tmp_path):
    a = CuckooSeen(str(tmp_path / "a"), n_pg=8, buckets_per_pg=512)
    b = CuckooSeen(str(tmp_path / "b"), n_pg=8, buckets_per_pg=512)
    a.insert(_urls(spark, 0, 2000))
    b.insert(_urls(spark, 0, 2000).repartition(13))
    pa = a.table.read(spark).orderBy("pg", "bucket", "fp").toPandas()
    pb = b.table.read(spark).orderBy("pg", "bucket", "fp").toPandas()
    pd.testing.assert_frame_equal(pa, pb)


def test_incremental_insert_keeps_membership(spark, tmp_path):
    ck = CuckooSeen(str(tmp_path / "i"), n_pg=4, buckets_per_pg=256)
    ck.insert(_urls(spark, 0, 500))
    ck.insert(_urls(spark, 500, 1000))
    new, maybe = ck.split_candidates(_urls(spark, 0, 1000))
    assert new.count() == 0
