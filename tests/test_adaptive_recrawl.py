"""Adaptive recrawl (engine recrawl_adaptive=(min_ttl, max_ttl)):
per-URL revisit intervals learned from observed content change —
changed content resets the interval to min_ttl, unchanged content
doubles it up to max_ttl (the schedops.recrawl_priority policy wired
into the engine). Content drift comes from SynthConfig.change_period:
a deterministic third of URLs re-key their synthesis every p(url)
rounds.

Cadence math: a URL fetched in round f with interval t comes due in
round f + t (scheduled exactly by the seen merge), is re-enqueued with
not_before = f + t + 1 and fetched there — so observed fetch gaps are
ttl + 1.
"""

from __future__ import annotations

import pandas as pd
import pytest

from crawlspark.engine import CrawlEngine
from crawlspark.hashing import py_h60
from crawlspark.synth import SynthConfig, gen_seeds, host_name

MIN_TTL, MAX_TTL = 2, 8
# change_period=1 => every volatile URL (h60(url|vol) % 3 == 0) serves
# new content every round; the rest are static forever
CFG = SynthConfig(
    n_seeds=30, n_hosts=3, max_depth=0, fault_free=True, change_period=1
)


def _pol():
    return pd.DataFrame(
        {"host": [host_name(i) for i in range(1, 4)], "budget": [100] * 3}
    )


def _engine(spark, path):
    eng = CrawlEngine(
        spark,
        str(path),
        CFG,
        politeness_pdf=_pol(),
        use_cuckoo=False,
        cuckoo_pg=4,
        recrawl_adaptive=(MIN_TTL, MAX_TTL),
    )
    eng.add_seeds(spark.createDataFrame(gen_seeds(CFG)))
    return eng


def _is_volatile(url: str) -> bool:
    return py_h60(url + "|vol") % 3 == 0


@pytest.fixture(scope="module")
def crawled(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("adapt")
    eng = _engine(spark, root / "a")
    eng.run(max_rounds=20)
    img = (
        eng.images.read(spark)
        .select("url", "round_id", "phash")
        .toPandas()
        .sort_values(["url", "round_id"])
    )
    seen = eng.seen.read(spark).toPandas()
    return eng, img, seen


def test_volatile_refetched_at_min_interval(crawled):
    _, img, seen = crawled
    vol = img[img.url.map(_is_volatile)]
    assert vol.url.nunique() > 3
    # content actually drifts: every refetch of a volatile URL saw new
    # content (version increments every round for change_period=1)
    assert (vol.groupby("url").phash.nunique() == vol.groupby("url").size()).all()
    # the interval never backs off: every gap is exactly min_ttl + 1
    gaps = vol.groupby("url").round_id.agg(lambda s: set(s.diff().dropna()))
    assert all(g == {MIN_TTL + 1} for g in gaps), gaps
    # and the learned state says min_ttl
    svol = seen[(seen.status == 200) & seen.url.map(_is_volatile)]
    assert (svol.ttl == MIN_TTL).all()


def test_static_backoff_doubles_to_cap(crawled):
    _, img, seen = crawled
    st = img[~img.url.map(_is_volatile)]
    assert st.url.nunique() > 3
    # static content: every refetch returned identical bytes
    assert (st.groupby("url").phash.nunique() == 1).all()
    # gaps follow ttl+1 with ttl doubling from min to the cap:
    # 3, 5, 9 within 20 rounds (fetches at 0, 3, 8, 17)
    for _, s in st.groupby("url").round_id:
        gaps = list(s.diff().dropna().astype(int))
        assert gaps == [MIN_TTL + 1, 2 * MIN_TTL + 1, 4 * MIN_TTL + 1], gaps
    sst = seen[(seen.status == 200) & ~seen.url.map(_is_volatile)]
    assert (sst.ttl == MAX_TTL).all()


def test_seen_state_is_single_row_latest(crawled):
    _, img, seen = crawled
    # MERGE keeps one row per URL, pointing at the LATEST fetch
    assert seen.url.nunique() == len(seen)
    latest = img.groupby("url").round_id.max()
    s200 = seen[seen.status == 200].set_index("url").round_id
    pd.testing.assert_series_equal(
        s200.sort_index(), latest.sort_index(), check_names=False, check_dtype=False
    )
    # the stored phash is the latest fetch's phash
    last_ph = img.sort_values("round_id").groupby("url").phash.last()
    s_ph = seen[seen.status == 200].set_index("url").phash
    pd.testing.assert_series_equal(
        s_ph.sort_index().astype("int64"),
        last_ph.sort_index().astype("int64"),
        check_names=False,
    )


def test_adaptive_resume_bit_identical(spark, tmp_path, crawled):
    _, img_full, seen_full = crawled
    # same crawl, killed after 6 executed rounds, resumed in a fresh
    # engine instance: fetch history and final seen state must be
    # bit-identical (ttl/phash state rides the seen table + manifests)
    eng = _engine(spark, tmp_path / "b")
    eng.run(max_rounds=20, stop_after=6)
    eng2 = CrawlEngine(
        spark,
        str(tmp_path / "b"),
        CFG,
        politeness_pdf=_pol(),
        use_cuckoo=False,
        cuckoo_pg=4,
        recrawl_adaptive=(MIN_TTL, MAX_TTL),
    )
    eng2.run(max_rounds=20)
    img2 = (
        eng2.images.read(spark)
        .select("url", "round_id", "phash")
        .toPandas()
        .sort_values(["url", "round_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(img_full.reset_index(drop=True), img2)
    seen2 = eng2.seen.read(spark).toPandas()
    cols = ["url", "status", "round_id", "phash", "ttl"]
    pd.testing.assert_frame_equal(
        seen_full[cols].sort_values("url").reset_index(drop=True),
        seen2[cols].sort_values("url").reset_index(drop=True),
    )


def test_exclusive_with_fixed_ttl(spark, tmp_path):
    with pytest.raises(ValueError):
        CrawlEngine(
            spark,
            str(tmp_path / "x"),
            CFG,
            recrawl_after=3,
            recrawl_adaptive=(2, 8),
        )
    with pytest.raises(ValueError):
        CrawlEngine(
            spark, str(tmp_path / "y"), CFG, recrawl_adaptive=(0, 8)
        )
