"""AIMD per-host politeness (CrawlEngine adaptive_budget=(min_b,max_b)).

Budgets learned from observed server health: any 504 from a host halves
its next-round budget (floor min_b); an all-success host ramps +1 (cap
max_b). The distributed generalization of the reference's fixed page
size + linear retry backoff (conf/ContentCrawlConfiguration.java:87-93)
— back off sick hosts, ramp healthy ones. Learned budgets ride the
round manifest, so kill-resume replays bit-identically.
"""

from __future__ import annotations

import pandas as pd

from helpers import host_budgets_at, read_manifests

from crawlspark.engine import CrawlEngine
from crawlspark.golden import simulate
from crawlspark.synth import SynthConfig, gen_seeds, host_name

ADAPT = (2, 40)
BASE = 6


def _pol(cfg):
    return pd.DataFrame(
        {
            "host": [host_name(i) for i in range(1, cfg.n_hosts + 1)],
            "budget": [BASE] * cfg.n_hosts,
        }
    )


def _mk(spark, tmp_path, name, cfg):
    return CrawlEngine(
        spark,
        str(tmp_path / name),
        cfg,
        politeness_pdf=_pol(cfg),
        use_cuckoo=False,
        adaptive_budget=ADAPT,
        # budget-history assertions read host_state at every round's
        # manifest snapshot, so keep expired snapshots around
        snapshot_gc=False,
    )


def _log(spark, eng):
    return (
        eng.fetch_log.read(spark)
        .toPandas()
        .sort_values(["round_id", "host", "rank"])
        .reset_index(drop=True)
    )




def test_adaptive_budget_matches_golden(spark, tmp_path):
    cfg = SynthConfig(n_seeds=250, n_hosts=10, max_depth=1)
    seeds = gen_seeds(cfg)
    golden = simulate(
        list(seeds["url"]),
        cfg,
        budget_fn=lambda i: BASE,
        adaptive_budget=ADAPT,
    )
    eng = _mk(spark, tmp_path, "aimd", cfg)
    eng.add_seeds(spark.createDataFrame(seeds))
    eng.run(max_rounds=80)

    log = _log(spark, eng)
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

    # the learned budgets actually moved in BOTH directions: some host
    # got halved below base (504 observed), some ramped above base.
    # State lives in the host_state table (snapshot id per manifest) —
    # the manifests themselves stay O(1) in host cardinality.
    manifests = read_manifests(eng)
    assert all(
        "host_budget" not in m and "host_last" not in m for m in manifests
    ), "per-host dicts back in the manifest — host_state regressed"
    budgets = [
        b for m in manifests for b in host_budgets_at(spark, eng, m).values()
    ]
    assert budgets, "no adaptive state recorded in host_state"
    assert min(budgets) < BASE, "no halving event — fault model inert?"
    assert max(budgets) > BASE, "no ramp event"
    # AIMD invariants: every recorded budget inside [min_b, max_b]
    assert all(ADAPT[0] <= b <= ADAPT[1] for b in budgets)
    # the rank column proves budgets actually bound selection: once a
    # host's budget drops to min_b, its per-round rank never exceeds
    # budgets recorded for it (spot-check the global cap)
    assert log["rank"].max() <= max(budgets)


def test_adaptive_budget_kill_resume(spark, tmp_path):
    cfg = SynthConfig(n_seeds=150, n_hosts=8, max_depth=1)
    seeds = gen_seeds(cfg)

    full = _mk(spark, tmp_path, "full", cfg)
    full.add_seeds(spark.createDataFrame(seeds))
    full.run(max_rounds=60)

    broken = _mk(spark, tmp_path, "broken", cfg)
    broken.add_seeds(spark.createDataFrame(seeds))
    broken.run(max_rounds=60, stop_after=3)
    resumed = _mk(spark, tmp_path, "broken", cfg)  # same workdir: resume
    resumed.run(max_rounds=60)

    a, b = _log(spark, full), _log(spark, resumed)
    pd.testing.assert_frame_equal(a, b)
    # resumed run restored the learned budgets, not re-derived from base
    ma, mb = read_manifests(full)[-1], read_manifests(resumed)[-1]
    assert host_budgets_at(spark, full, ma) == host_budgets_at(
        spark, resumed, mb
    )
