"""Link-graph frontier reprioritization end-to-end: PageRank over the
crawl's derived edge relation rewrites pending priorities; order
changes, coverage and resume semantics do not."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from crawlspark.engine import CrawlEngine
from crawlspark.synth import SynthConfig, gen_seeds, host_name

CFG = SynthConfig(n_seeds=60, n_hosts=6, max_depth=1)


def _pol():
    return pd.DataFrame(
        {"host": [host_name(i) for i in range(1, 7)], "budget": [8] * 6}
    )


def _engine(spark, path):
    eng = CrawlEngine(
        spark, str(path), CFG, politeness_pdf=_pol(), use_cuckoo=False
    )
    eng.add_seeds(spark.createDataFrame(gen_seeds(CFG)))
    return eng


@pytest.fixture(scope="module")
def crawled(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("linkprio")
    eng = _engine(spark, root / "a")
    eng.run(max_rounds=2)
    ranks = eng.link_ranks().cache()
    return eng, ranks, root


def test_link_ranks_shape(crawled):
    eng, ranks, _ = crawled
    pdf = ranks.toPandas()
    assert len(pdf) > 0
    # probability mass over the link-graph universe
    assert abs(pdf["rank"].sum() - 1.0) < 1e-9
    assert (pdf["rank"] > 0).all()
    # universe covers crawled pages and their outlink targets
    n_ok = eng.seen.read(eng.spark).filter(F.col("status") == 200).count()
    assert len(pdf) >= n_ok


def test_reprioritize_orders_pending_by_rank(crawled):
    eng, ranks, _ = crawled
    eng.reprioritize(ranks)
    nxt = eng.last_round()["round_id"] + 1
    pending = (
        eng._pending(nxt)
        .join(ranks, "url", "left")
        .select("url", "priority", F.coalesce("rank", F.lit(0.0)).alias("rank"))
        .toPandas()
    )
    assert len(pending) > 0, "crawl exhausted before reprioritize — resize CFG"
    assert ((pending.priority >= 0) & (pending.priority < 1)).all()
    # selection order (priority DESC) must follow rank order wherever
    # the normalized ranks differ by more than the 1e-6 quantum
    mx = ranks.agg(F.max("rank")).collect()[0][0]
    pending["nr"] = (pending["rank"] / mx).round(6)
    s = pending.sort_values("priority", ascending=False)
    nr = s["nr"].to_numpy()
    assert (nr[:-1] - nr[1:] >= -1.5e-6).all(), "priority order violates rank order"


def test_reprioritize_survives_resume_and_keeps_coverage(crawled, spark, tmp_path):
    eng, ranks, root = crawled
    # resume on the same workdir: the manifest pointer advanced with the
    # rewrite, so a fresh engine sees the reprioritized priorities
    eng2 = CrawlEngine(
        spark, str(root / "a"), CFG, politeness_pdf=_pol(), use_cuckoo=False
    )
    p1 = eng._pending(99).select("url", "priority").toPandas()
    p2 = eng2._pending(99).select("url", "priority").toPandas()
    pd.testing.assert_frame_equal(
        p1.sort_values("url").reset_index(drop=True),
        p2.sort_values("url").reset_index(drop=True),
    )
    # run both to exhaustion: a plain crawl and the reprioritized one
    # fetch in different ORDER but converge to the same seen set
    eng2.run(max_rounds=40)
    plain = _engine(spark, tmp_path / "plain")
    plain.run(max_rounds=40)
    s_re = set(r["url"] for r in eng2.seen.read(spark).select("url").collect())
    s_pl = set(r["url"] for r in plain.seen.read(spark).select("url").collect())
    assert s_re == s_pl


def test_auto_reprioritize_every_and_resume_equivalence(spark, tmp_path):
    """reprioritize_every=k: the hook fires after every k committed
    rounds, and a kill between a round's commit and its due rewrite
    (simulated: run k rounds WITHOUT the hook, resume WITH it) replays
    to the bit-identical final state of the uninterrupted run."""
    cfg = SynthConfig(n_seeds=60, n_hosts=6, max_depth=1)
    pol = _pol()

    # A: uninterrupted, hook from the start
    a = CrawlEngine(
        spark, str(tmp_path / "a"), cfg, politeness_pdf=pol,
        use_cuckoo=False, reprioritize_every=2,
    )
    a.add_seeds(spark.createDataFrame(gen_seeds(cfg)))
    a.run(max_rounds=40)
    # the hook is guaranteed after round 1 ((1+1) % 2 == 0)
    import json
    import os

    with open(os.path.join(a.state_dir, "round-000001.json")) as f:
        assert json.load(f).get("reprioritized"), "hook never fired"

    # B: rounds 0..1 committed with NO hook (the crash window), then a
    # fresh engine with the hook resumes — run() applies the missed
    # rewrite before continuing
    b0 = CrawlEngine(
        spark, str(tmp_path / "b"), cfg, politeness_pdf=pol, use_cuckoo=False,
    )
    b0.add_seeds(spark.createDataFrame(gen_seeds(cfg)))
    b0.run(max_rounds=40, stop_after=2)
    assert not b0.last_round().get("reprioritized")
    b = CrawlEngine(
        spark, str(tmp_path / "b"), cfg, politeness_pdf=pol,
        use_cuckoo=False, reprioritize_every=2,
    )
    b.run(max_rounds=40)

    la = (
        a.fetch_log.read(spark).toPandas()
        .sort_values(["round_id", "host", "rank"]).reset_index(drop=True)
    )
    lb = (
        b.fetch_log.read(spark).toPandas()
        .sort_values(["round_id", "host", "rank"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(la, lb)
    sa = a.seen.read(spark).toPandas().sort_values("url").reset_index(drop=True)
    sb = b.seen.read(spark).toPandas().sort_values("url").reset_index(drop=True)
    pd.testing.assert_frame_equal(sa, sb)
