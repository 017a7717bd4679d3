"""Int8 embedding quantization: DuckDB parity of the codes, round-trip
error bound, and ANN recall preservation."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{SF_DIR}/embeddings.parquet'"
    )
    return con


def test_codes_oracle_parity(spark, duck):
    from crawlspark.ops.quantize import QUANTIZE_SQL, quantized_codes

    mine = (
        quantized_codes(spark, SF_DIR)
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    ref = duck.execute(QUANTIZE_SQL).df().sort_values("vec_id").reset_index(drop=True)
    assert len(mine) > 0
    mine["scale"] = mine["scale"].round(9)
    ref["scale"] = ref["scale"].round(9)
    pd.testing.assert_frame_equal(mine, ref, check_dtype=False)


def test_roundtrip_error_bound(spark):
    from crawlspark.ops.quantize import dequantize, quantize_embeddings

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    rt = dequantize(
        quantize_embeddings(emb).drop("embedding"), out="deq"
    ).join(emb, "vec_id")
    pdf = rt.select("vec_id", "scale", "embedding", "deq").toPandas()
    for _, r in pdf.iterrows():
        err = np.abs(np.array(r.embedding) - np.array(r.deq))
        # symmetric rounding: per-component error <= scale/2 (+ float eps)
        assert (err <= r.scale / 2 + 1e-6).all()


def test_ann_recall_preserved(spark):
    """Brute-force cosine top-10 neighbours computed on dequantized
    int8 vectors must agree with fp32 at recall@10 >= 0.95 (mean)."""
    from crawlspark.ops.quantize import dequantize, quantize_embeddings

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    pdf = (
        dequantize(quantize_embeddings(emb).drop("embedding"), out="deq")
        .join(emb, "vec_id")
        .select("vec_id", "embedding", "deq")
        .toPandas()
        .sort_values("vec_id")
    )
    X = np.array(pdf.embedding.tolist(), dtype=np.float64)
    Q = np.array(pdf.deq.tolist(), dtype=np.float64)

    def topk(M, k=10):
        n = M / np.linalg.norm(M, axis=1, keepdims=True)
        S = n @ n.T
        np.fill_diagonal(S, -np.inf)
        return np.argsort(-S, axis=1)[:, :k]

    t_f, t_q = topk(X), topk(Q)
    recall = np.mean(
        [len(set(a) & set(b)) / len(a) for a, b in zip(t_f, t_q)]
    )
    assert recall >= 0.95, f"recall@10 dropped to {recall:.3f}"
