"""Operator library exposed through __spark_entry__.queries().

Each module defines QUERIES (name -> callable(spark, sf_dir) ->
DataFrame) and ORACLES (name -> DuckDB SQL over the same parquet
views). Column names/aliases match exactly between the two so the
driver's order-insensitive value-hash comparison holds.
"""

from __future__ import annotations


def load(spark, sf_dir: str, table: str):
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def load_spread(spark, sf_dir: str, table: str, key: str | None = None):
    """Load a table for compute-heavy per-row pipelines (shingling,
    hashing, embedding math).

    Small test files arrive as a single parquet row group → ONE scan
    partition, which would run the whole explode/hash stage on one
    core. When the scan has fewer partitions than the cluster has
    slots, round-robin repartition so the compute stage uses them all.
    At production scale the scan already has >> defaultParallelism
    partitions and this is a no-op — no shuffle is added at 100 TB.

    ``key``: hash-partition by that column instead of round-robin, so
    every downstream aggregation/distinct keyed by ``key`` (or a
    superset — HashPartitioning on a subset satisfies the clustered
    distribution) runs WITHOUT further exchanges (guide §2.4: two
    operations keyed the same way share one exchange). Used by the
    signature pipelines whose whole chain is keyed by doc_id: one
    exchange of compact document rows replaces two exchanges of
    exploded token rows. With ``key`` the repartition applies at every
    scale (it replaces downstream shuffles rather than adding one).
    """
    df = load(spark, sf_dir, table)
    slots = spark.sparkContext.defaultParallelism
    if key is not None:
        n = max(df.rdd.getNumPartitions(), slots)
        return df.repartition(n, key)
    if df.rdd.getNumPartitions() < slots:
        df = df.repartition(slots)
    return df
