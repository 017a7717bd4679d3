"""Sequence packing: DuckDB oracle parity plus the stream invariants
(contiguous tiling, in-budget offsets, boundary flags)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype.kind in "iu":
            df[c] = df[c].astype("int64")
    df = df.astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    return con


def test_oracle_parity(spark, duck):
    from crawlspark.ops.packing import PACK_SQL, pack_training_sequences

    mine = _norm(pack_training_sequences(spark, SF_DIR).toPandas())
    ref = _norm(duck.execute(PACK_SQL).df())
    assert len(mine) > 0
    pd.testing.assert_frame_equal(mine, ref)


def test_stream_invariants(spark):
    from crawlspark.ops.packing import _BUDGET, pack_training_sequences

    pdf = pack_training_sequences(spark, SF_DIR).toPandas()
    assert (pdf.offset >= 0).all() and (pdf.offset < _BUDGET).all()
    assert ((pdf.start % _BUDGET == pdf.offset)).all()
    for _, g in pdf.groupby("shard"):
        g = g.sort_values("start")
        # contiguous tiling: each doc starts where the previous ended
        assert (
            g.start.iloc[1:].to_numpy()
            == (g.start + g.tokens).iloc[:-1].to_numpy()
        ).all()
        # spans flag is exactly "end crosses a budget boundary"
        want = ((g.start + g.tokens - 1) // _BUDGET) > (g.start // _BUDGET)
        assert (g.spans == want).all()
    # every doc appears exactly once
    assert pdf.doc_id.is_unique


def test_parallelism_invariance(spark):
    """The packing is identical at different shuffle widths (the
    training stream must not depend on the cluster size)."""
    from crawlspark.ops.packing import pack_sequences

    docs = spark.range(0, 333).selectExpr(
        "id AS doc_id", "(id % 17 + 1) AS tokens"
    )
    a = pack_sequences(docs, budget=32, shards=4).toPandas()
    b = pack_sequences(docs.repartition(13), budget=32, shards=4).toPandas()
    key = ["doc_id"]
    pd.testing.assert_frame_equal(
        a.sort_values(key).reset_index(drop=True),
        b.sort_values(key).reset_index(drop=True),
    )


def test_rejects_degenerate_parameters(spark):
    from crawlspark.ops.packing import pack_sequences

    docs = spark.range(3).selectExpr("id AS doc_id", "1 AS tokens")
    with pytest.raises(ValueError):
        pack_sequences(docs, budget=0)
    with pytest.raises(ValueError):
        pack_sequences(docs, shards=0)
