"""429 Retry-After throttling (SynthConfig.throttle_permille).

Server back-pressure as data: a 429'd URL re-enters the frontier
UNCHANGED (no retry consumed — the request never reached the handler,
unlike the 504 fault model) and becomes eligible again exactly at
round + Retry-After. AIMD adaptive budgets treat a 429 like a 504: the
server explicitly asked to back off.
"""

from __future__ import annotations

import pandas as pd

from helpers import host_budgets_at, read_manifests

from crawlspark.engine import CrawlEngine
from crawlspark.golden import simulate
from crawlspark.synth import (
    SynthConfig,
    gen_seeds,
    host_name,
    py_retry_after,
)


def _pol(cfg, b):
    return pd.DataFrame(
        {
            "host": [host_name(i) for i in range(1, cfg.n_hosts + 1)],
            "budget": [b] * cfg.n_hosts,
        }
    )


def _run_both(spark, tmp_path, cfg, name, budget, **ekw):
    seeds = gen_seeds(cfg)
    golden = simulate(list(seeds["url"]), cfg, budget_fn=lambda i: budget, **{
        k: v for k, v in ekw.items() if k == "adaptive_budget"
    })
    eng = CrawlEngine(
        spark,
        str(tmp_path / name),
        cfg,
        politeness_pdf=_pol(cfg, budget),
        use_cuckoo=False,
        **ekw,
    )
    eng.add_seeds(spark.createDataFrame(seeds))
    eng.run(max_rounds=80)
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
    return log, seen


def test_throttle_matches_golden(spark, tmp_path):
    """Mixed corpus (20% per-round throttle + 504 fault model): engine
    == golden, Retry-After cadence honored, no retry consumed."""
    cfg = SynthConfig(n_seeds=200, n_hosts=8, max_depth=1, throttle_permille=200)
    eng, golden = _run_both(spark, tmp_path, cfg, "thr", budget=20)
    log, seen = _assert_match(spark, eng, golden)
    assert 429 in set(log.status)

    for url, g in log.groupby("url"):
        g = g.sort_values("round_id")
        rows = list(zip(g.round_id, g.status, g.retry_count))
        for i, (r, s, rc) in enumerate(rows):
            if s != 429:
                continue
            if i + 1 < len(rows):
                nr, _, nrc = rows[i + 1]
                # Retry-After honored: next attempt no earlier than r+ra
                assert nr >= r + py_retry_after(url), (url, r, nr)
                # and the retry budget was NOT consumed by the 429
                assert nrc == rc, (url, r)
    # every throttled URL eventually resolved (no livelock): the
    # frontier drained and each 429'd url has a terminal seen row
    assert not eng.has_pending_work()
    thr_urls = set(log[log.status == 429].url)
    assert thr_urls <= set(seen.url)
    # throttled counter recorded
    total = sum(m["counters"]["throttled"] for m in read_manifests(eng))
    assert total == int((log.status == 429).sum()) > 0


def test_throttle_drives_aimd_backoff(spark, tmp_path):
    """Fault-free corpus + throttle + AIMD: 429s alone halve host
    budgets (the server asked to back off), and engine == golden."""
    cfg = SynthConfig(
        n_seeds=200,
        n_hosts=6,
        max_depth=0,
        fault_free=True,
        throttle_permille=250,
    )
    eng, golden = _run_both(
        spark,
        tmp_path,
        cfg,
        "thr_aimd",
        budget=8,
        adaptive_budget=(2, 30),
        # budget history is read per-manifest from host_state snapshots
        snapshot_gc=False,
    )
    log, _ = _assert_match(spark, eng, golden)
    assert set(log.status) <= {200, 429} and 429 in set(log.status)
    per_round = [
        host_budgets_at(spark, eng, m) for m in read_manifests(eng)
    ]
    budgets = [b for d in per_round for b in d.values()]
    assert min(budgets) < 8, "429s did not trigger AIMD back-off"
    # at 25% per-URL throttle most host-rounds contain a 429, so
    # budgets live BELOW base; ramping shows as +1 recoveries between
    # halvings, i.e. successive manifests where a host's budget rose
    rose = False
    prev: dict[str, int] = {}
    for d in per_round:
        for h, b in d.items():
            if h in prev and b == prev[h] + 1:
                rose = True
            prev[h] = b
    assert rose, "no +1 recovery ever observed"
