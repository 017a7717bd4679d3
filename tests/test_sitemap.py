"""Sitemap ingestion: oracle parity, canonicalization, engine feed.

The engine-feed test is the contract that matters: a crawl seeded
through sitemap XML must be byte-identical to one seeded from the
plain URL list — sitemap ingestion is a seed *source*, not a new
scheduling semantic.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from crawlspark.canon import py_canonicalize
from crawlspark.ops.sitemap import (
    SITEMAP_EXTRACT_SQL,
    parse_sitemap,
    seeds_from_sitemap,
    sitemap_extract,
)

SF_DIR = "/root/testdata/sf0.001"


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
    df = df.astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_oracle_parity(spark):
    mine = _norm(sitemap_extract(spark, SF_DIR).toPandas())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    ref = _norm(con.execute(SITEMAP_EXTRACT_SQL).df())
    assert len(mine) > 0
    pd.testing.assert_frame_equal(mine, ref)


def _wrap(host: str, urls: list[str]) -> dict:
    body = "".join(
        f"<url><loc>{u}</loc><lastmod>2024-01-0{1 + i % 9}</lastmod>"
        f"<priority>0.{i % 10}</priority></url>"
        for i, u in enumerate(urls)
    )
    return {
        "host": host,
        "xml": (
            '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
            + body
            + "</urlset>"
        ),
    }


def test_parse_canonicalizes_and_types(spark):
    messy = [
        "HTTP://Example.COM:80/a/b?z=1&a=2#frag",
        "https://example.com:443",
        "https://example.com/x?single=1",
    ]
    out = (
        parse_sitemap(spark.createDataFrame([_wrap("example.com", messy)]))
        .toPandas()
        .sort_values("priority")
        .reset_index(drop=True)
    )
    assert list(out["url"]) == [py_canonicalize(u) for u in messy]
    assert str(out["lastmod"].iloc[0]) == "2024-01-01"
    assert out["priority"].tolist() == [0.0, 0.1, 0.2]


def test_min_priority_filter(spark):
    urls = [f"https://h.com/{i}" for i in range(10)]
    df = spark.createDataFrame([_wrap("h.com", urls)])
    kept = seeds_from_sitemap(df, min_priority=0.5).toPandas()
    assert len(kept) == 5  # priorities 0.5-0.9 survive
    assert set(kept["depth"]) == {0}


def test_sitemap_seeded_crawl_identical(spark, tmp_path):
    """Same URL set via sitemap XML vs plain list → identical crawl."""
    from crawlspark.engine import CrawlEngine
    from crawlspark.synth import SynthConfig, gen_seeds

    cfg = SynthConfig(n_seeds=120, n_hosts=8, max_depth=0)
    seeds = gen_seeds(cfg)
    # group the seed list into per-host sitemap documents
    hosts = seeds["url"].str.split("/").str[2]
    xml_rows = [
        _wrap(h, list(g["url"])) for h, g in seeds.groupby(hosts)
    ]

    def run(workdir, seeds_df):
        eng = CrawlEngine(spark, workdir, cfg, use_cuckoo=False)
        eng.add_seeds(seeds_df)
        eng.run(max_rounds=10)
        return (
            eng.fetch_log.read(spark)
            .toPandas()
            .sort_values(["round_id", "host", "rank"])
            .reset_index(drop=True)
        )

    via_list = run(
        str(tmp_path / "list"),
        spark.createDataFrame(seeds),
    )
    via_sitemap = run(
        str(tmp_path / "sitemap"),
        seeds_from_sitemap(spark.createDataFrame(xml_rows)),
    )
    assert len(via_list) == len(via_sitemap) > 0
    pd.testing.assert_frame_equal(via_list, via_sitemap)
