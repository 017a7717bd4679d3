"""Oracle parity for gates RETIRED from the driver registry in round 4.

The driver's correctness gate records exactly 50 rows; round 4 arranges
the registry so those 50 are exactly the oracle-backed gates, which
meant retiring three provably-subsumed oracle gates
(anti_join_customers, phash_hamming_topk, embedding_lsh_buckets) to
make room for geo_bbox_filter. Retirement must not mean losing their
external verification — this test runs each retired gate against the
SAME DuckDB oracle the driver used, with the driver's own
normalization (sorted columns, 6-decimal float canon, order-insensitive
row compare).
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if s.dtype.kind == "f":
            df[c] = s.round(6)
        elif s.dtype.kind in "iu":
            df[c] = s.astype("int64")
    df = df.astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _check(spark, duck, fn, sql):
    mine = _norm(fn(spark, SF_DIR).toPandas())
    ref = _norm(duck.execute(sql).df())
    assert len(mine) > 0, "retired gate returned no rows"
    pd.testing.assert_frame_equal(mine, ref)


def test_anti_join_customers(spark, duck):
    from crawlspark.ops.relational import ANTI_SQL, anti_join_customers

    _check(spark, duck, anti_join_customers, ANTI_SQL)


def test_phash_hamming_topk(spark, duck):
    from crawlspark.ops.similarity import RETIRED_ORACLES, phash_hamming_topk

    _check(spark, duck, phash_hamming_topk, RETIRED_ORACLES["phash_hamming_topk"])


def test_embedding_lsh_buckets(spark, duck):
    from crawlspark.ops.similarity import RETIRED_ORACLES, embedding_lsh_buckets

    _check(spark, duck, embedding_lsh_buckets, RETIRED_ORACLES["embedding_lsh_buckets"])
