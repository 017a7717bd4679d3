"""Backup export + skip-if-exists restore (the reference's
contentful-backup / contentful-restore subcommands).

* ``backup_table`` — one JSON file tree per content type under
  ``<dir>/<table>/``, mirroring the reference's per-entry GSON files
  (contentful/backup/ContentfulBackup.java:98-145) but written as a
  partitioned distributed JSON export instead of one file per HTTP
  response.
* ``restore_table`` — reads the backup tree back, SKIPS rows whose key
  already exists in the target (the reference re-creates entries with
  skip-if-exists + publishes, contentful/backup/ContentfulRestore.java:
  62-120, 186-195), and lands all new rows in ONE atomic commit (the
  alias-publish analogue; the reference's 1 op/s RateLimiter at :46 is
  subsumed by writer batching). Corrupt-backup defense: the read is
  schema-pinned, matching the reference's malformed-JSON check.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from .snaptable import SnapTable


def backup_table(table: SnapTable, spark: SparkSession, out_dir: str) -> str:
    """Export a SnapTable snapshot as a JSON tree; returns the dir.
    Binary columns are hex-encoded (JSON-safe, bit-exact round trip)."""
    from pyspark.sql import functions as F

    df = table.read(spark)
    cols = []
    for f in df.schema.fields:
        if isinstance(f.dataType, T.BinaryType):
            cols.append(F.hex(F.col(f.name)).alias(f.name))
        else:
            cols.append(F.col(f.name))
    d = os.path.join(out_dir, table.name)
    df.select(*cols).write.mode("overwrite").json(d)
    return d


def restore_table(
    table: SnapTable,
    spark: SparkSession,
    backup_dir: str,
    key: str,
) -> int:
    """Restore rows from a backup tree into ``table``, skipping rows
    whose ``key`` already exists (idempotent — re-running a restore is
    a no-op). Returns the number of rows restored."""
    from pyspark.sql import functions as F

    schema = table.schema()
    read_schema = T.StructType(
        [
            T.StructField(
                f.name,
                T.StringType() if isinstance(f.dataType, T.BinaryType) else f.dataType,
                True,
            )
            for f in schema.fields
        ]
    )
    raw = spark.read.schema(read_schema).json(backup_dir)
    cols = []
    for f in schema.fields:
        if isinstance(f.dataType, T.BinaryType):
            cols.append(F.unhex(F.col(f.name)).alias(f.name))
        else:
            cols.append(F.col(f.name))
    restored = raw.select(*cols)
    existing = table.read(spark).select(key)
    new_rows = restored.join(existing, key, "left_anti")
    n = new_rows.count()
    if n:
        # single atomic commit = the reference's publish step
        table.append(new_rows)
    return n
