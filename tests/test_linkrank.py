"""PageRank frontier prioritization: DuckDB oracle parity, a numpy
power-iteration reference, and the probability-mass invariant."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
        elif df[c].dtype.kind in "iu":
            df[c] = df[c].astype("int64")
    df = df.astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    return con


def _numpy_pagerank(n: int, iters: int = 3, d: float = 0.85) -> np.ndarray:
    edges = [
        (i, (17 * i + j) % n)
        for i in range(n)
        if i % 11 != 0
        for j in (1, 2, 3)
    ]
    outdeg = np.zeros(n)
    for s, _ in edges:
        outdeg[s] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        contrib = np.zeros(n)
        for s, t in edges:
            contrib[t] += r[s] / outdeg[s]
        dangling = r[outdeg == 0].sum()
        r = (1 - d) / n + d * (contrib + dangling / n)
    return r


def test_oracle_parity(spark, duck):
    from crawlspark.ops.linkrank import PAGERANK_SQL, link_pagerank

    mine = _norm(link_pagerank(spark, SF_DIR).toPandas())
    ref = _norm(duck.execute(PAGERANK_SQL).df())
    assert len(mine) > 0
    pd.testing.assert_frame_equal(mine, ref)


def test_numpy_reference_and_mass(spark):
    from crawlspark.ops.linkrank import link_pagerank

    got = link_pagerank(spark, SF_DIR).toPandas().set_index("doc_id")["rank"]
    n = len(got)
    want = _numpy_pagerank(n)
    assert np.allclose(got.sort_index().to_numpy(), want, atol=1e-6)
    # damped PageRank with dangling redistribution conserves mass
    assert abs(got.sum() - 1.0) < 1e-4  # ranks are rounded to 6dp
    # dangling nodes (no outlinks) still receive rank via inlinks
    assert (got > 0).all()


def test_pagerank_generic_eager(spark):
    """The eager path (persist + unpersist per iteration) on a tiny
    hand-built graph: a 3-cycle plus a dangling sink must rank the
    sink's inlink source highest."""
    from crawlspark.ops.linkrank import pagerank

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (0, 3), (1, 3), (2, 3)], ["src", "dst"]
    )
    r = {
        row["node"]: row["rank"]
        for row in pagerank(edges, iters=4, eager=True).collect()
    }
    assert set(r) == {0, 1, 2, 3}
    # node 3 has three inlinks and no outlinks: highest rank
    assert r[3] == max(r.values())
    assert abs(sum(r.values()) - 1.0) < 1e-9
