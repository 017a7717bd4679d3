"""Spark/Python/DuckDB tri-parity of the portable hash + canonicalizer."""

import duckdb

from crawlspark.canon import canonicalize, canonicalize_duckdb_sql, py_canonicalize
from crawlspark.hashing import h60, py_h60, py_unit, unit

URLS = [
    "HTTPS://H3.Example.COM:443/img/5?s=5&p=2#frag",
    "http://h1.example.com:80/img/9?p=9&s=2",
    "https://h2.example.com/img/priv/7?s=0&p=7",
    "https://h10.example.com/x",
    "https://h4.example.com",
    "https://h5.example.com/a/b/c?z=1&a=2&m=3#x?y",
]


def test_spark_python_parity(spark):
    df = spark.createDataFrame([(u,) for u in URLS], "url string")
    rows = df.select(
        "url",
        canonicalize("url").alias("c"),
        h60("url").alias("h"),
        unit("url", "|prio").alias("u"),
    ).collect()
    for r in rows:
        assert r["c"] == py_canonicalize(r["url"])
        assert r["h"] == py_h60(r["url"])
        assert abs(r["u"] - py_unit(r["url"], "|prio")) < 1e-12


def test_duckdb_canon_parity():
    con = duckdb.connect()
    con.execute("CREATE TABLE t(url VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(u,) for u in URLS])
    got = con.execute(
        f"SELECT {canonicalize_duckdb_sql('url')} FROM t ORDER BY url"
    ).fetchall()
    want = sorted(URLS)
    for (g,), u in zip(got, want):
        assert g == py_canonicalize(u), (g, py_canonicalize(u))


def test_canonical_idempotent():
    for u in URLS:
        c = py_canonicalize(u)
        assert py_canonicalize(c) == c
