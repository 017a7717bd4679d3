"""Operator library exposed through __spark_entry__.queries().

Each module defines QUERIES (name -> callable(spark, sf_dir) ->
DataFrame) and ORACLES (name -> DuckDB SQL over the same parquet
views). Column names/aliases match exactly between the two so the
driver's order-insensitive value-hash comparison holds.
"""

from __future__ import annotations


def load(spark, sf_dir: str, table: str):
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")
