"""Per-host min_delay cool-down (SURVEY §7.1 politeness.min_delay —
the reference's RateLimiter, ContentfulRestore.java:46, generalized):
a host selected in round r is untouched until round r + d. Engine must
match the golden simulator exactly, honor the cadence, and carry the
cool-down state across resume."""

from __future__ import annotations

import pandas as pd
import pytest

from crawlspark.engine import CrawlEngine
from crawlspark.golden import simulate
from crawlspark.synth import SynthConfig, gen_seeds, host_name

CFG = SynthConfig(n_seeds=200, n_hosts=6, max_depth=1)
DELAY_HOST = host_name(1)  # h1: min_delay 3
CAST = {"round_id": "int64", "rank": "int64", "status": "int64", "retry_count": "int64"}


def _budget(i):
    return 30 if i <= 2 else 15


def _delay(i):
    return 3 if i == 1 else 1


def _pol():
    return pd.DataFrame(
        {
            "host": [host_name(i) for i in range(1, 7)],
            "budget": [_budget(i) for i in range(1, 7)],
            "min_delay": [_delay(i) for i in range(1, 7)],
        }
    )


def _engine(spark, path):
    eng = CrawlEngine(
        spark, str(path), CFG, politeness_pdf=_pol(), use_cuckoo=False, cuckoo_pg=4
    )
    eng.add_seeds(spark.createDataFrame(gen_seeds(CFG)))
    return eng


@pytest.fixture(scope="module")
def crawled(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("mindelay")
    eng = _engine(spark, root / "a")
    eng.run(max_rounds=40)
    log = (
        eng.fetch_log.read(spark)
        .toPandas()
        .sort_values(["round_id", "host", "rank"])
        .reset_index(drop=True)
    )
    return eng, log, root


def test_matches_golden(crawled, spark):
    eng, log, _ = crawled
    g = simulate(
        list(gen_seeds(CFG)["url"]), CFG, budget_fn=_budget, min_delay_fn=_delay
    )
    go = g.fetch_order.sort_values(["round_id", "host", "rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        log[go.columns.tolist()].astype(CAST), go.astype(CAST)
    )
    seen = eng.seen.read(spark).toPandas().sort_values("url").reset_index(drop=True)
    gs = g.url_seen.sort_values("url").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        seen[gs.columns.tolist()].astype({"status": "int64", "round_id": "int64"}),
        gs.astype({"status": "int64", "round_id": "int64"}),
    )


def test_cadence_honored(crawled):
    _, log, _ = crawled
    rounds = sorted(log[log.host == DELAY_HOST].round_id.unique())
    assert len(rounds) >= 2, "delay host fetched in fewer than 2 rounds"
    gaps = [b - a for a, b in zip(rounds, rounds[1:])]
    assert all(g >= 3 for g in gaps), f"cool-down violated: rounds {rounds}"
    # non-delay hosts are NOT throttled: some consecutive-round fetches
    other = sorted(log[log.host == host_name(2)].round_id.unique())
    assert any(b - a == 1 for a, b in zip(other, other[1:]))


def test_cooldown_state_survives_resume(crawled, spark, tmp_path):
    _, log, _ = crawled
    b = _engine(spark, tmp_path / "b")
    b.run(max_rounds=40, stop_after=3)
    resumed = CrawlEngine(
        spark,
        str(tmp_path / "b"),
        CFG,
        politeness_pdf=_pol(),
        use_cuckoo=False,
        cuckoo_pg=4,
    )
    resumed.run(max_rounds=40)
    lb = (
        resumed.fetch_log.read(spark)
        .toPandas()
        .sort_values(["round_id", "host", "rank"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(log.astype(CAST), lb.astype(CAST))
