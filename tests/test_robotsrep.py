"""robots.txt REP matching (ops/robotsrep.py): DuckDB oracle parity
for the tail gate, RFC 9309 test vectors for the pattern compiler and
the longest-match / allow-tie-break winner logic.
"""

from __future__ import annotations

import re

import duckdb
import pandas as pd
import pytest

from crawlspark.ops.robotsrep import (
    ROBOTS_REP_SQL,
    compile_rep,
    rep_allowed,
    rep_rules_pdf,
    robots_rep_filter,
)

SF_DIR = "/root/testdata/sf0.01"


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_oracle_parity(spark):
    mine = _norm(robots_rep_filter(spark, SF_DIR).toPandas())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    ref = _norm(con.execute(ROBOTS_REP_SQL).df())
    assert len(mine) > 0
    pd.testing.assert_frame_equal(mine, ref)


@pytest.mark.parametrize(
    "pattern,path,matches",
    [
        # RFC 9309 §2.2.2-style vectors
        ("/fish", "/fish", True),
        ("/fish", "/fishheads/x", True),  # prefix match
        ("/fish", "/Fish", False),  # case-sensitive
        ("/fish*", "/fish.php?id=2", True),
        ("/fish/", "/fish", False),  # trailing slash binds
        ("/*.php", "/index.php", True),
        ("/*.php", "/a/x.php?p=1", True),
        ("/*.php$", "/index.php", True),
        ("/*.php$", "/index.php?x=1", False),  # end anchor
        ("/a*b$", "/axxb", True),
        ("/a*b$", "/axxbc", False),
        ("/p[1]", "/p[1]", True),  # regex specials are literal
        ("/p.q", "/pxq", False),  # dot is literal, not regex-any
    ],
)
def test_compile_rep_vectors(pattern, path, matches):
    assert bool(re.search(compile_rep(pattern), path)) == matches


def test_winner_logic(spark):
    # constructed frame: one host, paths picked to force each branch
    urls = spark.createDataFrame(
        pd.DataFrame(
            {
                "url": [f"https://h1.example.com{p}" for p in
                        ["/cal/2024/1", "/cal/pub/1", "/x.tmp", "/tie/x", "/free"]],
                "host": ["h1.example.com"] * 5,
                "_path": ["/cal/2024/1", "/cal/pub/1", "/x.tmp", "/tie/x", "/free"],
            }
        )
    )
    rules = spark.createDataFrame(rep_rules_pdf(1))
    out = (
        rep_allowed(urls, rules)
        .toPandas()
        .set_index("_path")
        .allowed.to_dict()
    )
    assert out == {
        "/cal/2024/1": False,  # /cal* disallow
        "/cal/pub/1": True,  # longer /cal/pub/* re-allows
        "/x.tmp": False,  # /*.tmp$ end-anchored disallow
        "/tie/x": True,  # exact specificity tie -> allow wins
        "/free": True,  # no rule matches -> default allow
    }


# ------------------------------------------------------------------
# engine integration: a crawl under full REP rules must match the
# golden simulator exactly (ordering + seen set), same contract as the
# prefix-robots golden tests
RULES = [
    ("/img/priv*", False),   # base deny of the sensitive prefix
    ("/img/priv/1*", True),  # longer rule re-allows ids starting 1
    ("/img/*?p=3&*", False), # wildcard deny of p=3 pages
    ("/*s=5$", False),       # end-anchored deny of trailing s=5
]
REP_HOSTS = 3  # hosts h1..h3 carry rules; the rest are unrestricted


def _rules_pdf():
    from crawlspark.synth import host_name

    return pd.DataFrame(
        [
            {"host": host_name(i), "pattern": p, "allow": a}
            for i in range(1, REP_HOSTS + 1)
            for p, a in RULES
        ]
    )


def _rules_fn(hostid: int):
    compiled = [(compile_rep(p), len(p), a) for p, a in RULES]
    return compiled if hostid <= REP_HOSTS else []


def test_engine_golden_rep(spark, tmp_path):
    from crawlspark.engine import CrawlEngine
    from crawlspark.golden import simulate
    from crawlspark.synth import SynthConfig, gen_seeds

    cfg = SynthConfig(n_seeds=300, n_hosts=8, max_depth=1)
    seeds = gen_seeds(cfg)
    g = simulate(list(seeds["url"]), cfg, robots_rep_fn=_rules_fn)
    # the REP rules must actually bite in this corpus: denials present,
    # and at least one deny-then-reallow pair exercised
    assert (g.url_seen.status == -1).any()
    assert g.url_seen[g.url_seen.status == -1].url.str.contains("p=3").any()

    eng = CrawlEngine(
        spark,
        str(tmp_path / "rep"),
        cfg,
        robots_pdf=_rules_pdf(),
        use_cuckoo=False,
        cuckoo_pg=8,
    )
    eng.add_seeds(spark.createDataFrame(seeds))
    eng.run(max_rounds=40)

    log = (
        eng.fetch_log.read(spark)
        .toPandas()
        .sort_values(["round_id", "host", "rank"])
        .reset_index(drop=True)
    )
    go = g.fetch_order.sort_values(["round_id", "host", "rank"]).reset_index(
        drop=True
    )
    cast = {c: "int64" for c in ("round_id", "rank", "status", "retry_count")}
    pd.testing.assert_frame_equal(log[go.columns.tolist()].astype(cast), go.astype(cast))
    seen = eng.seen.read(spark).toPandas().sort_values("url").reset_index(drop=True)
    gs = g.url_seen.sort_values("url").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        seen[["url", "status", "round_id"]].astype({"status": "int64", "round_id": "int64"}),
        gs[["url", "status", "round_id"]].astype({"status": "int64", "round_id": "int64"}),
    )


def test_crawl_delay_folds_into_min_delay(spark, tmp_path):
    """A robots Crawl-delay directive cools the host exactly like a
    politeness min_delay: engine == golden with BOTH robots_rep_fn and
    min_delay_fn active (h1 delayed by robots, h2 by politeness)."""
    from crawlspark.engine import CrawlEngine
    from crawlspark.golden import simulate
    from crawlspark.synth import SynthConfig, gen_seeds, host_name

    cfg = SynthConfig(n_seeds=200, n_hosts=5, max_depth=1)
    seeds = gen_seeds(cfg)
    rules_pdf = _rules_pdf()
    rules_pdf["crawl_delay"] = [3 if h == host_name(1) else 1 for h in rules_pdf.host]
    pol = pd.DataFrame(
        {
            "host": [host_name(i) for i in range(1, 6)],
            "budget": [30, 30, 15, 15, 15],
            "min_delay": [1, 2, 1, 1, 1],
        }
    )
    g = simulate(
        list(seeds["url"]),
        cfg,
        budget_fn=lambda i: 30 if i <= 2 else 15,
        min_delay_fn=lambda i: 3 if i == 1 else (2 if i == 2 else 1),
        robots_rep_fn=_rules_fn,
    )
    eng = CrawlEngine(
        spark,
        str(tmp_path / "cd"),
        cfg,
        robots_pdf=rules_pdf,
        politeness_pdf=pol,
        use_cuckoo=False,
        cuckoo_pg=8,
    )
    eng.add_seeds(spark.createDataFrame(seeds))
    eng.run(max_rounds=60)
    log = (
        eng.fetch_log.read(spark)
        .toPandas()
        .sort_values(["round_id", "host", "rank"])
        .reset_index(drop=True)
    )
    go = g.fetch_order.sort_values(["round_id", "host", "rank"]).reset_index(
        drop=True
    )
    cast = {c: "int64" for c in ("round_id", "rank", "status", "retry_count")}
    pd.testing.assert_frame_equal(log[go.columns.tolist()].astype(cast), go.astype(cast))
    # the robots-sourced delay actually throttled h1: its fetch rounds
    # are spaced >= 3 apart
    h1 = log[log.host == host_name(1)].round_id.drop_duplicates().sort_values()
    assert (h1.diff().dropna() >= 3).all()
