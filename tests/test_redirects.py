"""HTTP 3xx redirect semantics (SynthConfig.redirect_permille).

The reference's HTTP client follows redirects transparently inside one
fetch (mendeley/MendeleyPager.java:85-131 via the shared HttpClient);
a distributed frontier cannot — the Location may sit on a different
host (politeness), may already be crawled (URL-seen), and chains can
loop. The engine therefore resolves 301s ACROSS rounds: the URL is
marked seen with status 301, its Location re-enters the frontier with
hops+1 under the max_redirect_hops cap, and loops terminate via the
seen anti-join + cap with no special casing.

Checks: engine == golden simulator exactly (fetch order + seen set),
chain/cap/termination behavior, and DuckDB oracle parity for the
redirect_chain_resolve gate (a tail registry gate — this test IS its
hard oracle evidence per the registry contract in __spark_entry__.py).
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from crawlspark.canon import py_canonicalize
from helpers import read_manifests

from crawlspark.engine import CrawlEngine
from crawlspark.golden import REDIRECT_STATUS, simulate
from crawlspark.ops import crawlops as C
from crawlspark.synth import (
    SynthConfig,
    gen_seeds,
    host_name,
    py_is_redirect,
    py_redirect_target,
)

SF_DIR = "/root/testdata/sf0.01"


def _pol(cfg, bf):
    return pd.DataFrame(
        {
            "host": [host_name(i) for i in range(1, cfg.n_hosts + 1)],
            "budget": [bf(i) for i in range(1, cfg.n_hosts + 1)],
        }
    )


def _run_both(spark, tmp_path, cfg, name):
    seeds = gen_seeds(cfg)

    def bf(i):
        return 50 if i <= 2 else 20

    golden = simulate(list(seeds["url"]), cfg, budget_fn=bf)
    eng = CrawlEngine(
        spark,
        str(tmp_path / name),
        cfg,
        politeness_pdf=_pol(cfg, bf),
        use_cuckoo=False,
    )
    eng.add_seeds(spark.createDataFrame(seeds))
    eng.run(max_rounds=60)
    return eng, golden


def _assert_match(spark, eng, golden):
    log = (
        eng.fetch_log.read(spark)
        .toPandas()
        .sort_values(["round_id", "host", "rank"])
        .reset_index(drop=True)
    )
    go = golden.fetch_order.sort_values(["round_id", "host", "rank"]).reset_index(
        drop=True
    )
    cast = {c: "int64" for c in ("round_id", "rank", "status", "retry_count")}
    assert len(log) == len(go) > 0
    pd.testing.assert_frame_equal(log[list(go.columns)].astype(cast), go.astype(cast))
    seen = eng.seen.read(spark).toPandas().sort_values("url").reset_index(drop=True)
    gs = golden.url_seen.sort_values("url").reset_index(drop=True)
    c = {"status": "int64", "round_id": "int64", "url_hash": "int64"}
    pd.testing.assert_frame_equal(seen.astype(c), gs.astype(c))
    return seen


def test_redirect_crawl_matches_golden(spark, tmp_path):
    """Mixed corpus (25% redirects + fault model + robots + budgets):
    the engine reproduces the golden ordering and seen set exactly, and
    multi-hop chains genuinely occur."""
    cfg = SynthConfig(n_seeds=250, n_hosts=10, max_depth=1, redirect_permille=250)
    eng, golden = _run_both(spark, tmp_path, cfg, "redir")
    seen = _assert_match(spark, eng, golden)
    statuses = set(seen["status"].unique())
    assert REDIRECT_STATUS in statuses and 200 in statuses
    # multi-hop evidence: some resolved 301's Location is itself a 301
    seen_301 = seen[seen.status == REDIRECT_STATUS].url
    chained = [
        u
        for u in seen_301
        if py_is_redirect(py_canonicalize(py_redirect_target(u, cfg)), cfg)
    ]
    assert chained, "no redirect chains exercised — rate too low?"
    # redirected counter recorded in the round manifests
    total = sum(
        m["counters"]["redirected"] for m in read_manifests(eng) if "counters" in m
    )
    assert total == len(seen_301) > 0




def test_all_redirects_terminate_at_hop_cap(spark, tmp_path):
    """Adversarial corpus: EVERY URL 301s (permille=1000), so chains
    can only end at the hop cap or on an already-seen target (loops).
    The crawl must terminate, fetch zero images, and still match the
    golden exactly."""
    cfg = SynthConfig(
        n_seeds=60,
        n_hosts=5,
        max_depth=1,
        redirect_permille=1000,
        max_redirect_hops=3,
    )
    eng, golden = _run_both(spark, tmp_path, cfg, "allredir")
    seen = _assert_match(spark, eng, golden)
    assert set(seen["status"].unique()) == {REDIRECT_STATUS}
    assert eng.images.read(spark).count() == 0
    # hop-cap bound: each seed opens a chain of at most cap+1 URLs, and
    # chains can only shrink by colliding with already-seen targets
    assert len(seen) <= cfg.n_seeds * (cfg.max_redirect_hops + 1)
    # the frontier drained — no livelock on redirect loops
    assert not eng.has_pending_work()


def test_gone_404_with_redirects_matches_golden(spark, tmp_path):
    """Full status taxonomy in one corpus: 200 / 301 / 404 / 504-retry /
    perm-fail / robots-denied. 404s are PERMANENT — seen immediately,
    zero retries — unlike the transient 504 model."""
    cfg = SynthConfig(
        n_seeds=250,
        n_hosts=10,
        max_depth=1,
        redirect_permille=150,
        gone_permille=150,
    )
    eng, golden = _run_both(spark, tmp_path, cfg, "gone")
    seen = _assert_match(spark, eng, golden)
    statuses = set(seen["status"].unique())
    assert {200, 301, 404}.issubset(statuses)
    # no 404 URL ever appears twice in the log (no retry path)
    log = eng.fetch_log.read(spark).toPandas()
    gone_urls = log[log.status == 404].url
    assert len(gone_urls) == gone_urls.nunique()
    # and none produced an image
    imgs = set(r["url"] for r in eng.images.read(spark).select("url").collect())
    assert not (set(gone_urls) & imgs)
    # gone counter recorded
    total = sum(m["counters"]["gone_404"] for m in read_manifests(eng))
    assert total == len(gone_urls) > 0


def test_redirect_default_off_is_byte_identical(spark, tmp_path):
    """permille=0 (default): the status expression and crawl results
    are the pre-redirect ones — golden parity on a faulty corpus plus
    an explicit no-301 assertion."""
    cfg = SynthConfig(n_seeds=120, n_hosts=8, max_depth=1)
    eng, golden = _run_both(spark, tmp_path, cfg, "noredir")
    seen = _assert_match(spark, eng, golden)
    assert REDIRECT_STATUS not in set(seen["status"].unique())


@pytest.fixture(scope="module")
def oracle():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    return con


def test_gate_oracle_parity(spark, oracle):
    """redirect_chain_resolve vs the DuckDB recursive-CTE oracle."""
    mine = C.redirect_chain_resolve(spark, SF_DIR).toPandas()
    ref = oracle.execute(C.ORACLES["redirect_chain_resolve"]).df()

    def norm(df):
        df = df[sorted(df.columns)].astype(str)
        return df.sort_values(list(df.columns)).reset_index(drop=True)

    assert len(mine) > 0
    pd.testing.assert_frame_equal(norm(mine), norm(ref))
    # the permutation target map guarantees both outcomes exist
    assert set(mine.resolved.unique()) == {0, 1}
    assert mine.hops.max() == 5  # some chain/loop runs into the cap
    assert (mine[mine.hops == 0].resolved == 1).all()
