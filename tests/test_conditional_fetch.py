"""Conditional revalidation (CrawlEngine conditional_fetch=True).

On recrawl refetches the engine sends the ETag analogue (content
version at the last 200, carried by the frontier row's etag_round) and
the server
short-circuits unchanged content with 304: no body, no image append, no
outlink re-expansion — but the seen row's round_id refreshes and the
adaptive ttl doubles (a 304 IS an observed "unchanged"). HTTP
revalidation semantics (If-None-Match/ETag) applied to the recrawl
scheduler: the refetches the BENCH recrawl A/B counts as "wasted"
become header-only exchanges.
"""

from __future__ import annotations

import pandas as pd

from helpers import read_manifests

from crawlspark.engine import CrawlEngine
from crawlspark.hashing import py_h60
from crawlspark.synth import SynthConfig, gen_seeds, host_name


def _pol(n_hosts):
    return pd.DataFrame(
        {"host": [host_name(i) for i in range(1, n_hosts + 1)], "budget": [100] * n_hosts}
    )


def _engine(spark, path, cfg, **kw):
    eng = CrawlEngine(
        spark,
        str(path),
        cfg,
        politeness_pdf=_pol(cfg.n_hosts),
        use_cuckoo=False,
        cuckoo_pg=4,
        **kw,
    )
    eng.add_seeds(spark.createDataFrame(gen_seeds(cfg)))
    return eng


def _py_version(url: str, r: int, period: int | None) -> int:
    if not period or py_h60(url + "|vol") % 3 != 0:
        return 0
    p = 1 + py_h60(url + "|per") % period
    return r // p


def _log(spark, eng):
    return (
        eng.fetch_log.read(spark)
        .toPandas()
        .sort_values(["round_id", "host", "rank"])
        .reset_index(drop=True)
    )


def test_adaptive_ab_conditional_vs_plain(spark, tmp_path):
    """Same drifting corpus, adaptive recrawl with and without
    conditional fetch: identical crawl schedule, 304 exactly on
    version-unchanged refetches, image appends only on changed
    content, identical final seen state (round_id, ttl, phash)."""
    cfg = SynthConfig(
        n_seeds=40, n_hosts=3, max_depth=0, fault_free=True, change_period=2
    )
    a = _engine(spark, tmp_path / "plain", cfg, recrawl_adaptive=(2, 8))
    a.run(max_rounds=18, stop_after=14)
    b = _engine(
        spark, tmp_path / "cond", cfg, recrawl_adaptive=(2, 8), conditional_fetch=True
    )
    b.run(max_rounds=18, stop_after=14)

    la, lb = _log(spark, a), _log(spark, b)
    keys = ["round_id", "host", "rank", "url", "retry_count"]
    pd.testing.assert_frame_equal(la[keys], lb[keys])  # identical schedule
    assert set(la.status) == {200}
    assert set(lb.status) == {200, 304}

    # oracle for WHICH rows 304: version(url, r) unchanged since the
    # url's previous appearance in the log (pure python md5 math)
    prev_round: dict[str, int] = {}
    for _, row in lb.iterrows():
        u, r, s = row["url"], int(row["round_id"]), int(row["status"])
        if u in prev_round:
            unchanged = _py_version(u, r, cfg.change_period) == _py_version(
                u, prev_round[u], cfg.change_period
            )
            assert (s == 304) == unchanged, (u, r, s)
        else:
            assert s == 200, "first fetch can never be 304"
        prev_round[u] = r

    # image rows: plain appends a row per refetch; conditional appends
    # only on first fetch or content change
    ia = set(
        (r["url"], r["round_id"])
        for r in a.images.read(spark).select("url", "round_id").collect()
    )
    ib = set(
        (r["url"], r["round_id"])
        for r in b.images.read(spark).select("url", "round_id").collect()
    )
    expected_b = set(
        (row["url"], int(row["round_id"]))
        for _, row in lb.iterrows()
        if int(row["status"]) == 200
    )
    assert ib == expected_b and ib < ia

    # final seen state identical: the 304 path learns the same ttl and
    # carries the same stored phash as the fetch-and-compare path
    sa = a.seen.read(spark).toPandas().sort_values("url").reset_index(drop=True)
    sb = b.seen.read(spark).toPandas().sort_values("url").reset_index(drop=True)
    pd.testing.assert_frame_equal(sa, sb)

    # the saving is recorded: revalidated counters sum to the 304 count
    total_rv = sum(
        m["counters"].get("revalidated", 0) for m in read_manifests(b)
    )
    assert total_rv == int((lb.status == 304).sum()) > 0




def test_static_corpus_pure_revalidation(spark, tmp_path):
    """Static corpus + fixed recrawl TTL + conditional fetch: each URL
    fetches its body exactly once, then revalidates with 304 forever —
    and the all-304 rounds keep the recrawl schedule alive across
    multiple generations."""
    cfg = SynthConfig(n_seeds=30, n_hosts=3, max_depth=0, fault_free=True)
    eng = _engine(
        spark, tmp_path / "static", cfg, recrawl_after=2, conditional_fetch=True
    )
    eng.run(max_rounds=12, stop_after=9)
    log = _log(spark, eng)
    first = log.groupby("url").round_id.min()
    for _, row in log.iterrows():
        want = 200 if int(row["round_id"]) == int(first[row["url"]]) else 304
        assert int(row["status"]) == want
    # one body per URL, ever (seeds may collide → count unique URLs)
    assert eng.images.read(spark).count() == log.url.nunique()
    # >= 2 revalidation generations happened (the scheduling fix:
    # all-304 rounds must still schedule the next recrawl wave)
    rv_rounds = sorted(log[log.status == 304].round_id.unique())
    assert len(rv_rounds) >= 2


def test_conditional_kill_resume(spark, tmp_path):
    cfg = SynthConfig(
        n_seeds=30, n_hosts=3, max_depth=0, fault_free=True, change_period=3
    )
    kw = dict(recrawl_adaptive=(2, 8), conditional_fetch=True)
    full = _engine(spark, tmp_path / "full", cfg, **kw)
    full.run(max_rounds=14, stop_after=10)

    broken = _engine(spark, tmp_path / "broken", cfg, **kw)
    broken.run(max_rounds=14, stop_after=4)
    resumed = CrawlEngine(
        spark,
        str(tmp_path / "broken"),
        cfg,
        politeness_pdf=_pol(cfg.n_hosts),
        use_cuckoo=False,
        cuckoo_pg=4,
        **kw,
    )
    resumed.run(max_rounds=14, stop_after=10)

    pd.testing.assert_frame_equal(_log(spark, full), _log(spark, resumed))
    sa = full.seen.read(spark).toPandas().sort_values("url").reset_index(drop=True)
    sb = resumed.seen.read(spark).toPandas().sort_values("url").reset_index(drop=True)
    pd.testing.assert_frame_equal(sa, sb)
