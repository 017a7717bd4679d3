"""Priority aging (CrawlEngine priority_aging=alpha): selection ranks
by priority + alpha * rounds-ripe, so a URL passed over for k rounds
gains k*alpha and cannot starve behind a stream of higher-hash
discoveries on its host. Pure arithmetic on existing frontier columns —
no state, golden-mirrored bit-identically.
"""

from __future__ import annotations

import pandas as pd

from crawlspark.engine import CrawlEngine
from crawlspark.golden import simulate
from crawlspark.politeness import select_budget
from crawlspark.synth import SynthConfig, gen_seeds, host_name

ALPHA = 0.05


def test_select_budget_aging_unit(spark):
    """Direct unit: with a large enough age a low-priority URL overtakes
    a fresh high-priority one on the same budget-1 host."""
    rows = [
        # url, retry, not_before, depth, hops, etag, host, priority
        ("https://h1.example.com/old", 0, 0, 0, 0, -1, "h1.example.com", 0.1),
        ("https://h1.example.com/new", 0, 10, 0, 0, -1, "h1.example.com", 0.6),
    ]
    pending = spark.createDataFrame(
        rows,
        "url string, retry_count int, not_before int, depth int, hops int, "
        "etag_round int, host string, priority double",
    )
    pol = spark.createDataFrame(
        [("h1.example.com", 1)], "host string, budget int"
    )
    # at round 10: old's age = 10 (eff 0.1 + 0.5 = 0.6), new's age = 0
    # (eff 0.6); tie broken by url asc -> "new" < "old" lexically...
    # use alpha that makes old strictly win: 0.06 * 10 = 0.7
    top = select_budget(pending, pol, aging=(0.06, 10)).collect()
    assert len(top) == 1 and top[0]["url"].endswith("/old")
    # without aging the fresh high-priority URL wins
    top = select_budget(pending, pol).collect()
    assert len(top) == 1 and top[0]["url"].endswith("/new")


def test_aging_crawl_matches_golden(spark, tmp_path):
    """Full crawl with aging: engine == golden exactly, and the aged
    order genuinely differs from the un-aged one (outlink arrivals at
    different rounds make ages diverge)."""
    cfg = SynthConfig(n_seeds=200, n_hosts=8, max_depth=1)
    seeds = gen_seeds(cfg)

    def bf(i):
        return 3  # tight budgets: several rounds of queueing -> aging bites

    golden_aged = simulate(
        list(seeds["url"]), cfg, budget_fn=bf, priority_aging=ALPHA
    )
    golden_plain = simulate(list(seeds["url"]), cfg, budget_fn=bf)

    pol = pd.DataFrame(
        {
            "host": [host_name(i) for i in range(1, cfg.n_hosts + 1)],
            "budget": [3] * cfg.n_hosts,
        }
    )
    eng = CrawlEngine(
        spark,
        str(tmp_path / "aged"),
        cfg,
        politeness_pdf=pol,
        use_cuckoo=False,
        priority_aging=ALPHA,
    )
    eng.add_seeds(spark.createDataFrame(seeds))
    eng.run(max_rounds=80)

    log = (
        eng.fetch_log.read(spark)
        .toPandas()
        .sort_values(["round_id", "host", "rank"])
        .reset_index(drop=True)
    )
    go = golden_aged.fetch_order.sort_values(
        ["round_id", "host", "rank"]
    ).reset_index(drop=True)
    cast = {c: "int64" for c in ("round_id", "rank", "status", "retry_count")}
    assert len(log) == len(go) > 0
    pd.testing.assert_frame_equal(log[list(go.columns)].astype(cast), go.astype(cast))

    seen = eng.seen.read(spark).toPandas().sort_values("url").reset_index(drop=True)
    gs = golden_aged.url_seen.sort_values("url").reset_index(drop=True)
    c = {"status": "int64", "round_id": "int64", "url_hash": "int64"}
    pd.testing.assert_frame_equal(seen.astype(c), gs.astype(c))

    # aging actually changed the schedule vs the plain order
    ga = list(zip(golden_aged.fetch_order.round_id, golden_aged.fetch_order.url))
    gp = list(zip(golden_plain.fetch_order.round_id, golden_plain.fetch_order.url))
    assert ga != gp, "aging produced the identical schedule — inert test"
