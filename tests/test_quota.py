"""Per-host cumulative page quota (`max_pages` politeness column).

The reference caps page counts per request (ContentTypeCrawler.java:49,
ContentfulBackup.java:57); here the cap is lifted to the whole crawl: a
host stops being selected once its cumulative status-200 body count
reaches max_pages. Semantics (documented in golden.simulate and
engine.__init__): only 200 bodies consume quota — robots denials,
3xx/404/429/504 and 304 revalidations don't; recrawl refetches do.
Quota-exhausted hosts' pending rows stay pending, resumable under a
raised quota. The meter lives in the host_state table (snapshot id per
round manifest), so kill-resume replays bit-identically.
"""

from __future__ import annotations

import pandas as pd
import pytest

from crawlspark.engine import CrawlEngine
from crawlspark.golden import simulate
from crawlspark.synth import SynthConfig, gen_seeds, host_name

CFG = SynthConfig(n_seeds=200, n_hosts=6, max_depth=1)
QUOTA_HOST = host_name(1)
QUOTA = 12
CAST = {"round_id": "int64", "rank": "int64", "status": "int64", "retry_count": "int64"}


def _budget(i):
    return 8


def _quota(i):
    return QUOTA if i == 1 else None


def _pol(quota=QUOTA):
    return pd.DataFrame(
        {
            "host": [host_name(i) for i in range(1, 7)],
            "budget": [_budget(i) for i in range(1, 7)],
            "max_pages": [quota if i == 1 else None for i in range(1, 7)],
        }
    )


def _engine(spark, path, quota=QUOTA):
    eng = CrawlEngine(
        spark,
        str(path),
        CFG,
        politeness_pdf=_pol(quota),
        use_cuckoo=False,
        cuckoo_pg=4,
    )
    return eng


def _log(spark, eng):
    return (
        eng.fetch_log.read(spark)
        .toPandas()
        .sort_values(["round_id", "host", "rank"])
        .reset_index(drop=True)
    )


@pytest.fixture(scope="module")
def crawled(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("quota")
    eng = _engine(spark, root / "a")
    eng.add_seeds(spark.createDataFrame(gen_seeds(CFG)))
    eng.run(max_rounds=40)
    return eng, _log(spark, eng)


def test_matches_golden(crawled, spark):
    eng, log = crawled
    g = simulate(
        list(gen_seeds(CFG)["url"]), CFG, budget_fn=_budget, max_pages_fn=_quota
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


def test_quota_binds_exactly(crawled, spark):
    eng, log = crawled
    qh = log[log.host == QUOTA_HOST]
    # only 200 bodies consume quota, and the cap binds exactly (the
    # host has far more than QUOTA pages' worth of frontier)
    assert int((qh.status == 200).sum()) == QUOTA
    # unquota'd hosts fetched well past it
    other = log[log.host == host_name(2)]
    assert int((other.status == 200).sum()) > QUOTA
    # exhausted host leaves pending work behind (resumable by design)
    assert eng.has_pending_work()
    pending_hosts = set(
        r["host"]
        for r in eng.frontier.read(spark).select("host").distinct().collect()
    )
    assert QUOTA_HOST in pending_hosts


def test_partial_round_respects_remainder(crawled):
    _, log = crawled
    # per-round 200-counts of the quota host never exceed the remaining
    # quota at that round's start (effective budget = min(budget,
    # remaining)) — the final round is a partial fill, not an overshoot
    qh = log[(log.host == QUOTA_HOST) & (log.status == 200)]
    cum = 0
    for _, n in sorted(
        qh.groupby("round_id").size().items(), key=lambda kv: kv[0]
    ):
        assert cum + n <= QUOTA
        cum += n
    assert cum == QUOTA


def test_kill_resume_and_raised_quota(crawled, spark, tmp_path):
    _, log = crawled
    b = _engine(spark, tmp_path / "b")
    b.add_seeds(spark.createDataFrame(gen_seeds(CFG)))
    b.run(max_rounds=40, stop_after=3)
    resumed = _engine(spark, tmp_path / "b")
    resumed.run(max_rounds=40)
    pd.testing.assert_frame_equal(log.astype(CAST), _log(spark, resumed).astype(CAST))
    # raising the quota on the SAME workdir resumes the held-back rows:
    # strictly more 200s from the quota host, and no URL fetched twice
    raised = _engine(spark, tmp_path / "b", quota=QUOTA * 50)
    raised.run(max_rounds=80)
    log2 = _log(spark, raised)
    qh2 = log2[(log2.host == QUOTA_HOST) & (log2.status == 200)]
    assert len(qh2) > QUOTA
    assert not qh2.url.duplicated().any()
