"""Crawl-scheduling analytics (ops/schedops.py): DuckDB oracle parity
for the three tail gates (the driver's 50-row window never records
them — this test IS their hard oracle evidence, per the registry
contract in __spark_entry__.py), plus semantic checks the oracle alone
can't state.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from crawlspark.ops import schedops as S

SF_DIR = "/root/testdata/sf0.01"


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
    df = df.astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.fixture(scope="module")
def oracle():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    return con


def test_oracle_parity(spark, oracle):
    for name, fn in S.QUERIES.items():
        mine = _norm(fn(spark, SF_DIR).toPandas())
        ref = _norm(oracle.execute(S.ORACLES[name]).df())
        assert len(mine) > 0, name
        pd.testing.assert_frame_equal(mine, ref, obj=name)


def test_recrawl_priority_semantics(spark):
    est = S.recrawl_priority(spark, SF_DIR).toPandas()
    # estimator bounds: lambda in (0, 1) => ttl in [1, 32]
    assert est.ttl.between(1, 32).all()
    assert (est.n_changes <= est.n_obs).all()
    # floor(1/lambda) is monotone: within a fixed n_obs, more observed
    # changes never LENGTHENS the revisit interval
    for _, g in est.groupby("n_obs"):
        g = g.sort_values("n_changes")
        assert g.groupby("n_changes").ttl.first().is_monotonic_decreasing
    # due iff age reached the ttl (the frontier re-entry predicate)
    assert ((est.age >= est.ttl) == est.is_due).all()
    # the floor never sees an exact .5 boundary: (n_obs+1)/(n_changes+.5)
    # = 2(n_obs+1)/(2*n_changes+1) has an odd denominator, so the
    # Spark/DuckDB float contract cannot diverge on rounding direction
    assert ((2 * (est.n_obs + 1)) % (2 * est.n_changes + 1) != 0).any()


def test_spider_trap_semantics(spark):
    t = S.spider_trap_templates(spark, SF_DIR).toPandas()
    cal = t[t.template == "/calendar/N/N"]
    art = t[t.template == "/article/N"]
    # every host carries both templates; the calendar trap (near-
    # constant content over dozens of URLs — trap docs on one host all
    # share parity, so exactly one fingerprint) is flagged on every
    # host, the healthy article template (distinct content per URL)
    # never is
    assert len(cal) == 6 and len(art) == 6
    assert cal.is_trap.all() and not art.is_trap.any()
    assert (cal.n_content == 1).all()
    assert (art.n_content == art.n_urls).all()


def test_mirror_pairs_semantics(spark):
    m = S.mirror_host_pairs(spark, SF_DIR).toPandas()
    # mirrors are the consecutive host pairs by construction (content
    # c lives on the hosts of docs 2c and 2c+1); the 1-in-5
    # host-unique slice keeps Jaccard strictly inside (0, 1).
    # host_a < host_b is LEXICOGRAPHIC (h10 < h9), so compare unordered.
    pairs = {
        frozenset((int(a[1:]), int(b[1:]))) for a, b in zip(m.host_a, m.host_b)
    }
    assert pairs == {frozenset((i, i + 1)) for i in (1, 3, 5, 7, 9, 11)}
    assert (m.jaccard > 0).all() and (m.jaccard < 1).all()
    # jaccard is consistent with the reported set sizes
    recomputed = m.n_shared / (m.n_a + m.n_b - m.n_shared)
    pd.testing.assert_series_equal(
        m.jaccard, recomputed.round(6), check_names=False
    )
