"""Portable deterministic hashing.

The reference engine has no hashing at all — identity is API-provided
UUIDs (SURVEY.md §2.9). At 10^10-URL frontier scale identity must be a
hash. We need ONE hash function computable bit-identically in three
places: Spark SQL (engine), DuckDB SQL (driver oracle), and plain Python
(golden single-threaded simulator). ``md5`` is the only cryptographic
hash all three share, so:

    h60(s)  = int(md5(s).hexdigest()[:15], 16)        # 60-bit int, >=0

Spark:  ``conv(substring(md5(s), 1, 15), 16, 10)`` cast to bigint
Python: ``int(hashlib.md5(s).hexdigest()[:15], 16)``
DuckDB: oracle queries avoid int conversion (no conv()); they compare on
        the md5 hex string directly, which is equally deterministic.

At a real 10^10 frontier a 60-bit hash collides (birthday ~2^30 keys);
the engine therefore joins the exact seen-set on the full URL string and
uses h60 only for partitioning/bucketing, and the cuckoo filter stores
16-bit fingerprints per bucket where false positives are re-checked
exactly. For raw speed in non-portable paths use Spark's built-in
``xxhash64``.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F

H60_MASK = (1 << 60) - 1


def py_h60(s: str) -> int:
    """60-bit md5 prefix hash — Python side (golden simulator)."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def h60(col: Column | str) -> Column:
    """60-bit md5 prefix hash — Spark side. Matches :func:`py_h60` exactly."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")


def h60_sql(expr: str) -> str:
    """Spark SQL text form of :func:`h60` for use in ``F.expr``/SQL."""
    return f"cast(conv(substring(md5({expr}), 1, 15), 16, 10) as bigint)"


def py_unit(s: str, salt: str = "") -> float:
    """Deterministic uniform in [0,1) from a string — Python side."""
    return (py_h60(s + salt) % 1_000_000) / 1_000_000.0


def unit(col: Column | str, salt: str = "") -> Column:
    """Deterministic uniform in [0,1) — Spark side, matches :func:`py_unit`."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.pmod(h60(F.concat(c, F.lit(salt))), F.lit(1_000_000)) / 1_000_000.0).cast(
        "double"
    )
