"""robots `Sitemap:` directive → engine seed discovery.

A host may advertise a sitemap document (CrawlEngine sitemap_pdf —
(host, xml) rows, the content behind the robots.txt `Sitemap:` line;
reference analogue: the crawl bootstrap seeding, README.md:34-48). The
first round the host is selected, its sitemap's canonicalized <loc>
entries join the frontier for the next round, idempotent against seen
and pending URLs. First-contact state rides the host_state table, so
kill-resume never re-discovers. Engine must match golden.simulate's
sitemap_fn exactly.
"""

from __future__ import annotations

import pandas as pd
import pytest

from crawlspark.engine import CrawlEngine
from crawlspark.golden import simulate
from crawlspark.synth import SynthConfig, gen_seeds, host_name

CFG = SynthConfig(n_seeds=120, n_hosts=5, max_depth=1)
SM_HOST = host_name(2)
CAST = {"round_id": "int64", "rank": "int64", "status": "int64", "retry_count": "int64"}

# sitemap entries: 8 fresh URLs + 1 URL that needs canonicalizing +
# 1 duplicate of a likely-crawled page shape (idempotency paths)
SM_URLS = [f"https://{SM_HOST}/sm/page-{i}" for i in range(8)] + [
    f"HTTPS://{SM_HOST.upper()}:443/sm/messy?b=2&a=1#frag"
]


def _xml() -> str:
    entries = "".join(f"<url><loc>{u}</loc></url>" for u in SM_URLS)
    return (
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        + entries
        + "</urlset>"
    )


def _budget(i):
    return 10


def _pol():
    return pd.DataFrame(
        {
            "host": [host_name(i) for i in range(1, 6)],
            "budget": [_budget(i) for i in range(1, 6)],
        }
    )


def _sitemaps():
    return pd.DataFrame({"host": [SM_HOST], "xml": [_xml()]})


def _sitemap_fn(hostid):
    return SM_URLS if hostid == 2 else None


def _engine(spark, path):
    return CrawlEngine(
        spark,
        str(path),
        CFG,
        politeness_pdf=_pol(),
        use_cuckoo=False,
        cuckoo_pg=4,
        sitemap_pdf=_sitemaps(),
    )


def _log(spark, eng):
    return (
        eng.fetch_log.read(spark)
        .toPandas()
        .sort_values(["round_id", "host", "rank"])
        .reset_index(drop=True)
    )


@pytest.fixture(scope="module")
def crawled(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("smdisc")
    eng = _engine(spark, root / "a")
    eng.add_seeds(spark.createDataFrame(gen_seeds(CFG)))
    eng.run(max_rounds=40)
    return eng, _log(spark, eng)


def test_matches_golden(crawled, spark):
    eng, log = crawled
    g = simulate(
        list(gen_seeds(CFG)["url"]), CFG, budget_fn=_budget, sitemap_fn=_sitemap_fn
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


def test_sitemap_urls_crawled_after_first_contact(crawled):
    _, log = crawled
    sm = log[log.url.str.contains("/sm/")]
    # every fresh sitemap URL was eventually crawled (canonicalized —
    # the messy entry appears with sorted query and no fragment)
    assert set(u for u in sm.url if "page-" in u) == {
        u for u in SM_URLS if "page-" in u
    }
    assert any("?a=1&b=2" in u for u in sm.url), "canonicalizer bypassed"
    # none before (first contact round of the host) + 1
    first_contact = int(log[log.host == SM_HOST].round_id.min())
    assert int(sm.round_id.min()) >= first_contact + 1


def test_no_rediscovery_on_resume(crawled, spark, tmp_path):
    _, log = crawled
    b = _engine(spark, tmp_path / "b")
    b.add_seeds(spark.createDataFrame(gen_seeds(CFG)))
    b.run(max_rounds=40, stop_after=2)
    resumed = _engine(spark, tmp_path / "b")
    resumed.run(max_rounds=40)
    lb = _log(spark, resumed)
    pd.testing.assert_frame_equal(log.astype(CAST), lb.astype(CAST))
    # each sitemap URL fetched exactly once — discovery did not repeat
    sm = lb[lb.url.str.contains("/sm/") & (lb.status == 200)]
    assert not sm.url.duplicated().any()
