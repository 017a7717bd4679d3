"""Config-space property tests.

1. Engine-vs-golden equivalence over adversarial crawl configs: the
   exact fetch ordering and final seen set must match the
   single-threaded simulator for EVERY config, not just the shared
   conftest fixture — deep expansion, zero/long backoff, binding and
   non-binding budgets, extreme Zipf heat, alternate RNG seeds. These
   configs deliberately stress the round-3 paths: speculative
   next-round selection reuse (consecutive rounds), dirty-bucket
   frontier rewrites (budget leftovers keep buckets dirty across
   rounds), and retry scheduling across round gaps.

2. Canonicalization fuzz parity: the Spark SQL, plain-Python and
   DuckDB implementations of URL canonicalization must agree
   bit-for-bit over a deterministic corpus of messy URLs (ports,
   case, fragments, duplicate/empty query params, authority edge
   shapes) — the tri-implementation contract golden equivalence
   rests on (reference path surgery:
   contentful/backup/ContentfulBackup.java:215-224).
"""

import random

import pandas as pd
import pytest

from crawlspark.engine import CrawlEngine
from crawlspark.golden import simulate
from crawlspark.synth import SynthConfig, gen_seeds, host_name

CONFIGS = [
    # (name, cfg, budget_fn, cuckoo_auto_min) — budget_fn maps host id ->
    # per-round budget; cuckoo_auto_min is deliberately SMALL so every
    # config crosses the auto-cuckoo threshold at a different round,
    # fuzzing the filter's mid-crawl engage point across the space
    (
        "retry_stretch",  # depth 0, long backoff: retry rounds with gaps
        SynthConfig(n_seeds=120, n_hosts=6, max_depth=0, retry_backoff_step=2),
        lambda i: 7,
        25,
    ),
    (
        "deep_expand",  # depth 2, immediate retries, small budgets
        SynthConfig(n_seeds=50, n_hosts=5, max_depth=2, retry_backoff_step=0),
        lambda i: 8,
        40,
    ),
    (
        "burst",  # non-binding budgets: whole ripe frontier per round
        SynthConfig(n_seeds=150, n_hosts=8, max_depth=1, retry_backoff_step=1),
        lambda i: 1000,
        160,
    ),
    (
        "hot_host",  # extreme Zipf heat on 3 hosts, alternate RNG seed
        SynthConfig(n_seeds=130, n_hosts=3, max_depth=1, retry_backoff_step=1, seed=7),
        lambda i: 9,
        30,
    ),
    (
        "fault_free",  # steady-state bench mode: every fetch 200, no retry rounds
        SynthConfig(n_seeds=110, n_hosts=5, max_depth=1, fault_free=True),
        lambda i: 12,
        60,
    ),
]


@pytest.mark.parametrize(
    "name,cfg,bf,amin", CONFIGS, ids=[c[0] for c in CONFIGS]
)
def test_golden_equivalence_config_space(spark, tmp_path, name, cfg, bf, amin):
    seeds = gen_seeds(cfg)
    golden = simulate(list(seeds["url"]), cfg, budget_fn=bf)
    pol = pd.DataFrame(
        {
            "host": [host_name(i) for i in range(1, cfg.n_hosts + 1)],
            "budget": [bf(i) for i in range(1, cfg.n_hosts + 1)],
        }
    )
    eng = CrawlEngine(
        spark,
        str(tmp_path / name),
        cfg,
        politeness_pdf=pol,
        cuckoo_pg=8,
        cuckoo_auto_min=amin,
        frontier_buckets=8,
    )
    eng.add_seeds(spark.createDataFrame(seeds))
    eng.run(max_rounds=60)
    log = (
        eng.fetch_log.read(spark)
        .toPandas()
        .sort_values(["round_id", "host", "rank"])
        .reset_index(drop=True)
    )
    go = golden.fetch_order.sort_values(["round_id", "host", "rank"]).reset_index(
        drop=True
    )
    cast = {
        "round_id": "int64",
        "rank": "int64",
        "status": "int64",
        "retry_count": "int64",
    }
    pd.testing.assert_frame_equal(
        log[go.columns.tolist()].astype(cast), go.astype(cast)
    )
    seen = (
        eng.seen.read(spark)
        .toPandas()
        .sort_values("url")
        .reset_index(drop=True)[["url", "status", "round_id"]]
    )
    gseen = golden.url_seen.sort_values("url").reset_index(drop=True)[
        ["url", "status", "round_id"]
    ]
    pd.testing.assert_frame_equal(
        seen.astype({"status": "int64", "round_id": "int64"}),
        gseen.astype({"status": "int64", "round_id": "int64"}),
    )


def _fuzz_urls(n: int = 400) -> list[str]:
    """Deterministic corpus of messy URLs: mostly schemed (the engine's
    normal input), plus schemeless values (canonicalize passes them
    through), digit-led schemes, and a second '://' inside the path —
    all three implementations must agree even off the happy path."""
    rng = random.Random(0xC0FFEE)
    schemes = ["http", "https", "HTTP", "HtTpS", "ftp", "s3+x", "a-b.c", "1abc", ""]
    hosts = [
        "EXAMPLE.com",
        "h1.Example.COM:80",
        "h2.example.com:443",
        "h3.example.com:8080",
        "xn--bcher-kva.tld",
        "host",
        "127.0.0.1:80",
    ]
    paths = ["", "/", "/a/b", "/a%2Fb", "/IMG/priv", "/a//b/", "/..", "/a://b"]
    queries = [
        None,
        "",
        "b=2&a=1",
        "a=1&a=0",
        "z&y&x",
        "k=%41&k=A",
        "dup=1&dup=1",
        "=v&k=",
    ]
    frags = [None, "", "frag", "f#g"]
    urls = []
    for _ in range(n):
        s = rng.choice(schemes)
        sep = "://" if (s or rng.random() < 0.5) else ""  # '' + no sep → schemeless
        u = f"{s}{sep}{rng.choice(hosts)}{rng.choice(paths)}"
        q = rng.choice(queries)
        if q is not None:
            u += "?" + q
        fr = rng.choice(frags)
        if fr is not None:
            u += "#" + fr
        urls.append(u)
    return urls


def test_canonicalize_fuzz_tri_parity(spark):
    import duckdb

    from crawlspark.canon import (
        canonicalize,
        canonicalize_duckdb_sql,
        py_canonicalize,
    )

    urls = _fuzz_urls()
    expected = [py_canonicalize(u) for u in urls]
    # Spark column implementation — one job for the whole corpus
    got_spark = [
        r["c"]
        for r in spark.createDataFrame(pd.DataFrame({"url": urls}))
        .select(canonicalize("url").alias("c"))
        .collect()
    ]
    assert got_spark == expected
    # DuckDB oracle implementation
    con = duckdb.connect()
    con.register("u", pd.DataFrame({"url": urls}))
    got_duck = [
        r[0]
        for r in con.execute(
            f"SELECT {canonicalize_duckdb_sql('url')} FROM u"
        ).fetchall()
    ]
    assert got_duck == expected
