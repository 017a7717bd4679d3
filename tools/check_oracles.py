"""Local replica of the driver's correctness gate: run every
__spark_entry__.queries() entry and its oracle_sql() side-by-side at a
given sf, compare row count, column set and order-insensitive values.

Usage: python tools/check_oracles.py [sf_dir] [name_filter...]

When run unfiltered, also writes ORACLES_r5.json at the repo root —
the same per-gate shape as the driver's CORRECTNESS_r{N}.json
(rows/schema/value match vs DuckDB, plus a value hash) for ALL
registry entries, including the oracle-backed tail gates outside the
driver's 50-row window (r4 VERDICT "Next round" #5).
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        # The driver's canon does NOT handle list cells (pandas sort dies
        # with "unhashable type: 'list'") — so neither do we: any array
        # column reaching the gate is a hard failure here too. Serialize
        # arrays with array_join/to_json in the query itself.
        if s.dtype == object and len(s.dropna()) and isinstance(
            s.dropna().iloc[0], (list, tuple)
        ):
            raise TypeError(
                f"column {c!r} holds lists — the driver gate cannot sort "
                "these; serialize with array_join/to_json in the query"
            )
        try:
            import numpy as np

            if s.dtype.kind == "f":
                df[c] = s.round(6)
            elif s.dtype.kind in "iu":
                df[c] = s.astype("int64")
            elif str(s.dtype).startswith("datetime"):
                df[c] = s.astype("datetime64[us]")
        except TypeError:
            pass
    df = df.astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    name_filter = sys.argv[2:]

    import __spark_entry__ as E
    from crawlspark.session import get_spark

    spark = get_spark("local[8]")
    # Warm the session the way the DRIVER's gate is warm: the driver
    # runs entry() (a full crawl round with mapInPandas stages) before
    # any gate, so by gate time the Python/Arrow worker pool and
    # codegen paths are initialized. Without this, whichever gate first
    # touches a pandas UDF absorbs ~5-8 s of one-off session cost and
    # its bracket misreports the gate's own latency.
    import pandas as _pd
    from pyspark.sql import functions as _F

    _warm = spark.createDataFrame(_pd.DataFrame({"x": [[1.0] * 4]}))
    _warm.select(
        _F.pandas_udf(lambda s: s.map(lambda v: float(sum(v))), "double")("x")
    ).collect()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = E.queries(), E.oracle_sql()
    n_pass = n_fail = n_rows_only = 0
    report: dict[str, dict] = {}

    def _vhash(df: pd.DataFrame) -> str:
        import hashlib

        return hashlib.sha256(
            df.to_csv(index=False).encode()
        ).hexdigest()[:16]

    for name, fn in qs.items():
        if name_filter and not any(f in name for f in name_filter):
            continue
        t0 = time.time()
        rec: dict = {
            "rows_match": False,
            "schema_match": False,
            "hash_match": False,
            "spark_rows": None,
            "oracle_rows": None,
            "err": None,
        }
        report[name] = rec
        try:
            mine = fn(spark, sf_dir).toPandas()
            rec["spark_rows"] = len(mine)
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            rec["err"] = f"spark: {e}"[:300]
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(mine)} rows (rows-only, no oracle)  [{time.time()-t0:.1f}s]")
            assert len(mine) > 0, name
            rec["rows_only"] = True
            rec["rows_match"] = len(mine) > 0
            n_rows_only += 1
            continue
        try:
            ref = con.execute(oracles[name]).df()
            rec["oracle_rows"] = len(ref)
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            rec["err"] = f"duckdb: {e}"[:300]
            n_fail += 1
            continue
        try:
            a, b = _norm(mine), _norm(ref)
        except TypeError as e:
            print(f"FAIL  {name}: {e}")
            rec["err"] = str(e)[:300]
            n_fail += 1
            continue
        rec["rows_match"] = len(a) == len(b)
        if not rec["rows_match"]:
            print(f"FAIL  {name}: rowcount {len(a)} vs {len(b)}")
            n_fail += 1
            continue
        rec["schema_match"] = list(a.columns) == list(b.columns)
        if not rec["schema_match"]:
            print(f"FAIL  {name}: columns {list(a.columns)} vs {list(b.columns)}")
            n_fail += 1
            continue
        rec["hash_match"] = a.equals(b)
        if not rec["hash_match"]:
            neq = (a != b).any(axis=1)
            print(f"FAIL  {name}: {int(neq.sum())}/{len(a)} rows differ; first diffs:")
            print(pd.concat([a[neq].head(3), b[neq].head(3)], keys=["spark", "duckdb"]))
            n_fail += 1
            continue
        rec["value_hash"] = _vhash(a)
        print(f"PASS  {name}: {len(a)} rows  [{time.time()-t0:.1f}s]")
        n_pass += 1
    print(f"\n{n_pass} pass, {n_rows_only} rows-only, {n_fail} fail")
    if not name_filter:
        import json

        out = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "ORACLES_r5.json",
        )
        with open(out, "w") as f:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "pass": n_pass,
                    "rows_only": n_rows_only,
                    "fail": n_fail,
                    "gates": report,
                },
                f,
                indent=1,
            )
        print(f"wrote {out}")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
