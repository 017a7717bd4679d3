"""Registry gate for trainset.shard_by_rank (exact global-rank sharding).

The op itself lives in crawlspark/trainset.py (the exporter's shard
assignment — two-phase prefix-range ranking, no single-task funnel);
this module gives it the registry ``(spark, sf_dir)`` gate + DuckDB
oracle shape. Driver-TAIL gate (the 50-row window is already full of
oracle-backed gates): oracle evidence runs in
tests/test_trainset.py::test_gate_oracle_parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..trainset import shard_by_rank

_SHARD_ROWS = 64


def trainset_shard_by_rank(spark: SparkSession, sf: str) -> DataFrame:
    """Exact global-rank sharding keyed on md5(doc_id) — unique by
    construction, satisfying shard_by_rank's order-key contract."""
    from . import load

    docs = load(spark, sf, "documents").select(
        "doc_id", F.md5(F.col("doc_id").cast("string")).alias("key")
    )
    return shard_by_rank(docs, "key", _SHARD_ROWS).select(
        "doc_id", "key", "shard"
    )


SHARD_SQL = f"""
SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS key,
       CAST(floor((row_number() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR))) - 1)
                  / {_SHARD_ROWS}) AS INT) AS shard
FROM documents
"""

QUERIES = {"trainset_shard_by_rank": trainset_shard_by_rank}
ORACLES = {"trainset_shard_by_rank": SHARD_SQL}
