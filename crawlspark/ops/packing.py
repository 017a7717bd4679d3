"""Sequence packing for pretraining batches (concat-and-chunk).

LLM pretraining consumes fixed-length token sequences; corpora are
variable-length documents. The standard preparation concatenates
documents in a deterministic mixing order and chunks the stream every
``budget`` tokens, so each training sequence is fully packed and a
document may span a chunk boundary. The reference has no analogue (its
batches are transport batches, ElasticSearchIndexHandler.java:191-201);
this is a training-data op the new engine adds, like sampling.py.

Determinism/portability: documents are sharded by ``id % shards`` and
ordered within a shard by (md5-prefix(id+salt), id) — the same
hash-mixing convention as sampling.py, so Spark, DuckDB and plain
Python produce the identical packing, and reruns at any parallelism
level produce the identical training stream.

Scale notes (10^10 docs): the only shuffle is the window's hash
partition by shard; with shards sized to the cluster (e.g. 4096) each
window partition holds corpus/shards rows, there is no global sort and
no driver state. The cumulative sum is a single running-window pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import load
from .sampling import _hkey


def pack_sequences(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    token_col: str = "tokens",
    budget: int = 2048,
    shards: int = 1024,
    salt: str = "",
) -> DataFrame:
    """Assign each document a (shard, pack, offset) in the chunked
    token stream. Returns the input's id/token columns plus:

    - ``shard``  — id % shards (the parallel packing unit)
    - ``start``  — token offset of the doc in its shard's stream
    - ``pack``   — floor(start / budget): the training-sequence index
    - ``offset`` — start - pack*budget: position inside the sequence
    - ``spans``  — true when the doc crosses a sequence boundary

    Docs with zero/negative tokens are dropped (they occupy no stream
    positions and would alias the next doc's offset).
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive: {budget}")
    if shards <= 0:
        raise ValueError(f"shards must be positive: {shards}")
    w = Window.partitionBy("shard").orderBy("_mix", id_col)
    return (
        df.select(
            F.col(id_col),
            F.col(token_col).cast("long").alias(token_col),
            F.pmod(F.col(id_col), F.lit(shards)).cast("int").alias("shard"),
            _hkey(id_col, salt).alias("_mix"),
        )
        .filter(F.col(token_col) > 0)
        .withColumn("start", F.sum(token_col).over(w) - F.col(token_col))
        .withColumn("pack", F.floor(F.col("start") / budget).cast("long"))
        .withColumn("offset", (F.col("start") - F.col("pack") * budget).cast("long"))
        .withColumn(
            "spans",
            F.floor((F.col("start") + F.col(token_col) - 1) / budget)
            > F.col("pack"),
        )
        .drop("_mix")
    )


# ---------------------------------------------------------------- gate
_BUDGET = 64
_SHARDS = 8


def pack_training_sequences(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents").select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("tokens")
    )
    return pack_sequences(
        docs, budget=_BUDGET, shards=_SHARDS, salt="|pack"
    ).select("doc_id", "tokens", "shard", "start", "pack", "offset", "spans")


PACK_SQL = f"""
WITH toks AS (
  SELECT doc_id,
         len(str_split(text, ' '))::BIGINT AS tokens,
         (doc_id % {_SHARDS})::INT AS shard,
         substring(md5(doc_id::VARCHAR || '|pack'), 1, 15) AS mix
  FROM documents
  WHERE len(str_split(text, ' ')) > 0
),
cum AS (
  SELECT doc_id, tokens, shard,
         (sum(tokens) OVER (PARTITION BY shard ORDER BY mix, doc_id
                            ROWS UNBOUNDED PRECEDING) - tokens)::BIGINT AS start
  FROM toks
)
SELECT doc_id, tokens, shard, start,
       (start // {_BUDGET})::BIGINT AS pack,
       (start - (start // {_BUDGET}) * {_BUDGET})::BIGINT AS "offset",
       ((start + tokens - 1) // {_BUDGET}) > (start // {_BUDGET}) AS spans
FROM cum
"""


QUERIES = {"pack_training_sequences": pack_training_sequences}
ORACLES = {"pack_training_sequences": PACK_SQL}
