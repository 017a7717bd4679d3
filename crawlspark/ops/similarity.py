"""Similarity search over the ``embeddings`` table (array<float>, dim 64):
brute-force cosine top-k (baseline) and an LSH-bucketed variant (the
scale path — at 10^9 vectors only within-bucket pairs are scored).

Dot products run as built-in higher-order functions (zip_with +
aggregate) on doubles — no Python in the plan. Values rounded to 4 dp
so Spark/DuckDB float summation order cannot flip the comparison.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from . import load

_N_QUERIES = 5
_TOP_K = 3

# portable pseudo-random hyperplanes: component (p, d) from an md5 digit
_PLANES = 4


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def cosine_topk(spark, sf):
    emb = load(spark, sf, "embeddings")
    q = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    cand = emb.select(F.col("vec_id").alias("nid"), F.col("embedding").alias("nv"))
    pairs = F.broadcast(q).crossJoin(cand).filter(F.col("qid") != F.col("nid"))
    cos = _dot(F.col("qv"), F.col("nv")) / (_norm(F.col("qv")) * _norm(F.col("nv")))
    scored = pairs.select("qid", "nid", F.round(cos, 4).alias("cosine"))
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("nid").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _TOP_K)
        .select("qid", "rank", "nid", "cosine")
    )


COSINE_SQL = f"""
WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < {_N_QUERIES}),
c AS (SELECT vec_id AS nid, embedding AS nv FROM embeddings),
scored AS (
  SELECT qid, nid,
         round(
           list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i]::DOUBLE * nv[i]::DOUBLE))
           / (sqrt(list_sum(list_transform(qv, x -> x::DOUBLE * x::DOUBLE)))
              * sqrt(list_sum(list_transform(nv, x -> x::DOUBLE * x::DOUBLE)))), 4) AS cosine
  FROM q, c WHERE qid <> nid
)
SELECT qid, rank, nid, cosine FROM (
  SELECT qid, nid, cosine,
         row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, nid ASC) AS rank
  FROM scored
) WHERE rank <= {_TOP_K}
"""


# --- LSH bucketing by hyperplane sign bits (ANN scale path).
# Hyperplane components derive from md5 digits → identical in both
# engines without shipping a weights table.
def _plane_weight_spark(p: int) -> str:
    # weight for plane p at dimension i (1-based): md5 digit - 7.5
    return (
        f"instr('0123456789abcdef', substring(md5(concat('{p}_', cast(i as string))), 1, 1)) - 8.5"
    )


def embedding_lsh_buckets(spark, sf):
    emb = load(spark, sf, "embeddings")
    bits = []
    for p in range(_PLANES):
        dot = (
            f"aggregate(zip_with(embedding, transform(sequence(1, size(embedding)), "
            f"i -> {_plane_weight_spark(p)}), (x, w) -> cast(x as double) * w), "
            f"cast(0.0 as double), (acc, v) -> acc + v)"
        )
        bits.append(f"(CASE WHEN {dot} > 0 THEN {1 << p} ELSE 0 END)")
    return emb.select(
        "vec_id",
        F.expr(f"cast({' + '.join(bits)} as int)").alias("bucket"),
    )


def _lsh_duck() -> str:
    bits = []
    for p in range(_PLANES):
        dot = (
            f"list_sum(list_transform(generate_series(1, len(embedding)), "
            f"i -> embedding[i]::DOUBLE * (strpos('0123456789abcdef', substring(md5(concat('{p}_', i::VARCHAR)), 1, 1)) - 8.5)))"
        )
        bits.append(f"(CASE WHEN {dot} > 0 THEN {1 << p} ELSE 0 END)")
    return f"SELECT vec_id, ({' + '.join(bits)})::INT AS bucket FROM embeddings"


LSH_SQL = _lsh_duck()


# --- within-bucket ANN: buckets bound candidate pairs (join key =
# bucket), demonstrating the shuffle-bounded plan shape used at scale
def lsh_ann_topk(spark, sf):
    emb = load(spark, sf, "embeddings")
    b = embedding_lsh_buckets(spark, sf)
    ev = emb.join(b, "vec_id")
    a = ev.select(
        F.col("bucket"), F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    ).filter(F.col("qid") < _N_QUERIES * 10)
    c = ev.select(
        F.col("bucket").alias("bucket2"),
        F.col("vec_id").alias("nid"),
        F.col("embedding").alias("nv"),
    )
    pairs = a.join(c, (a.bucket == c.bucket2) & (F.col("qid") != F.col("nid")))
    cos = _dot(F.col("qv"), F.col("nv")) / (_norm(F.col("qv")) * _norm(F.col("nv")))
    scored = pairs.select("qid", "nid", F.round(cos, 4).alias("cosine"))
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("nid").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _TOP_K)
        .select("qid", "rank", "nid", "cosine")
    )


LSH_ANN_SQL = f"""
WITH b AS ({_lsh_duck()}),
ev AS (SELECT e.vec_id, e.embedding, b.bucket FROM embeddings e JOIN b ON e.vec_id = b.vec_id),
pairs AS (
  SELECT a.vec_id AS qid, c.vec_id AS nid,
         round(
           list_sum(list_transform(generate_series(1, len(a.embedding)), i -> a.embedding[i]::DOUBLE * c.embedding[i]::DOUBLE))
           / (sqrt(list_sum(list_transform(a.embedding, x -> x::DOUBLE * x::DOUBLE)))
              * sqrt(list_sum(list_transform(c.embedding, x -> x::DOUBLE * x::DOUBLE)))), 4) AS cosine
  FROM ev a JOIN ev c ON a.bucket = c.bucket AND a.vec_id <> c.vec_id
  WHERE a.vec_id < {_N_QUERIES * 10}
)
SELECT qid, rank, nid, cosine FROM (
  SELECT qid, nid, cosine,
         row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, nid ASC) AS rank
  FROM pairs
) WHERE rank <= {_TOP_K}
"""


QUERIES = {
    "cosine_topk": cosine_topk,
    "embedding_lsh_buckets": embedding_lsh_buckets,
    "lsh_ann_topk": lsh_ann_topk,
}

ORACLES = {
    "cosine_topk": COSINE_SQL,
    "embedding_lsh_buckets": LSH_SQL,
    "lsh_ann_topk": LSH_ANN_SQL,
}
