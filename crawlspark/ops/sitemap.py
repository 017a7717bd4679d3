"""Sitemap ingestion — XML url-set parsing as a frontier seed source.

The reference discovers crawl targets by re-scanning content
directories and paged registry endpoints (SURVEY.md §2 S5/S3); the
web-crawl generalization of "a host tells you what it has" is
sitemap.xml: one XML document per host listing <url> entries with
<loc>, <lastmod> and <priority>. This module

* assembles deterministic per-host sitemap documents from the
  `documents` fixture table (same doc_id-derived fixtures as the rest
  of the query surface, so a DuckDB oracle can rebuild them),
* parses sitemap XML back into (host, url, lastmod, priority) rows
  with pure JVM-side built-ins — ``regexp_extract_all`` over the XML
  text, ``arrays_zip`` + explode, then the shared canonicalizer
  (sitemaps are a flat url-set; a full XML parser adds nothing), and
* feeds the parsed entries into ``CrawlEngine.add_seeds`` via
  :func:`seeds_from_sitemap`.

Scale: sitemap documents number one-per-host — millions of rows where
the frontier has 10^10 — and the parse is a narrow per-row pass with
no shuffle (the engine's own seed merge does the first shuffle). The
regexp stage stays inside whole-stage codegen; nothing here touches
Python row-at-a-time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from . import load
from ..canon import canonicalize, canonicalize_duckdb_sql

# --- deterministic sitemap fixture ------------------------------------
# loc is deliberately messy — uppercase scheme/host, https default
# port, unsorted query params, fragment — so the parse path exercises
# the full canonicalizer, not just string extraction.
_HOST_SPARK = "concat('h', pmod(doc_id, 7), '.example.com')"
_HOST_DUCK = "concat('h', doc_id % 7, '.example.com')"
_LOC_SPARK = (
    "concat('HTTPS://H', pmod(doc_id, 7), '.Example.COM:443/doc/', doc_id,"
    " '?b=', pmod(doc_id, 5), '&a=', pmod(doc_id, 3), '#sec')"
)
_LOC_DUCK = (
    "concat('HTTPS://H', doc_id % 7, '.Example.COM:443/doc/', doc_id,"
    " '?b=', doc_id % 5, '&a=', doc_id % 3, '#sec')"
)
# lastmod reuses the querysurface created-date fixture shape (ISO date)
_LASTMOD_SPARK = (
    "date_format(date_add(make_date(2012 + pmod(doc_id div 7, 6),"
    " 1 + pmod(doc_id, 12), 1), cast(pmod(doc_id, 31) as int)),"
    " 'yyyy-MM-dd')"
)
_LASTMOD_DUCK = (
    "strftime(make_date((2012 + (doc_id // 7) % 6)::INT,"
    " (1 + doc_id % 12)::INT, 1) + ((doc_id % 31)::INT) * INTERVAL 1 DAY,"
    " '%Y-%m-%d')"
)
_PRIO_SPARK = "format_string('%.1f', cast(pmod(doc_id, 11) as double) / 10.0)"
_PRIO_DUCK = "printf('%.1f', (doc_id % 11) / 10.0)"


def sitemap_documents(spark, sf_dir: str) -> DataFrame:
    """One sitemap XML document per host, built from `documents`.

    Entry order inside each document is fixed by doc_id via
    ``array_sort`` over (doc_id, entry) structs — ``collect_list`` has
    no deterministic order, and the oracle's ``string_agg ... ORDER
    BY`` must rebuild the identical byte string.
    """
    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr(_HOST_SPARK).alias("host"),
        F.concat(
            F.lit("<url><loc>"),
            F.expr(_LOC_SPARK),
            F.lit("</loc><lastmod>"),
            F.expr(_LASTMOD_SPARK),
            F.lit("</lastmod><priority>"),
            F.expr(_PRIO_SPARK),
            F.lit("</priority></url>"),
        ).alias("entry"),
    )
    return docs.groupBy("host").agg(
        F.concat(
            F.lit('<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("doc_id", "entry"))),
                    lambda s: s["entry"],
                ),
                "",
            ),
            F.lit("</urlset>"),
        ).alias("xml")
    )


def parse_sitemap(xml_df: DataFrame) -> DataFrame:
    """Parse (host, xml) rows into (host, url, lastmod, priority).

    ``regexp_extract_all`` yields the three tag streams as parallel
    arrays; a flat url-set guarantees they are positionally aligned, so
    ``arrays_zip`` + explode restores the entries without an XML
    parser. loc is canonicalized with the shared engine canonicalizer.
    """
    parsed = xml_df.select(
        "host",
        F.expr("regexp_extract_all(xml, '<loc>([^<]+)</loc>', 1)").alias("locs"),
        F.expr(
            "regexp_extract_all(xml, '<lastmod>([^<]+)</lastmod>', 1)"
        ).alias("mods"),
        F.expr(
            "regexp_extract_all(xml, '<priority>([^<]+)</priority>', 1)"
        ).alias("prios"),
    )
    z = parsed.select(
        "host",
        F.explode(F.arrays_zip("locs", "mods", "prios")).alias("e"),
    )
    return z.select(
        "host",
        canonicalize(F.col("e.locs")).alias("url"),
        F.to_date(F.col("e.mods")).alias("lastmod"),
        F.col("e.prios").cast("double").alias("priority"),
    )


def sitemap_extract(spark, sf_dir: str) -> DataFrame:
    """Gate: fixture sitemaps → parsed, canonicalized url entries."""
    return parse_sitemap(sitemap_documents(spark, sf_dir))


SITEMAP_EXTRACT_SQL = f"""
WITH entries AS (
  SELECT doc_id,
         {_HOST_DUCK} AS host,
         concat('<url><loc>', {_LOC_DUCK},
                '</loc><lastmod>', {_LASTMOD_DUCK},
                '</lastmod><priority>', {_PRIO_DUCK},
                '</priority></url>') AS entry
  FROM documents
), sitemaps AS (
  SELECT host,
         concat('<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">',
                string_agg(entry, '' ORDER BY doc_id), '</urlset>') AS xml
  FROM entries GROUP BY host
), parsed AS (
  SELECT host,
         unnest(regexp_extract_all(xml, '<loc>([^<]+)</loc>', 1)) AS loc,
         unnest(regexp_extract_all(xml, '<lastmod>([^<]+)</lastmod>', 1)) AS mod,
         unnest(regexp_extract_all(xml, '<priority>([^<]+)</priority>', 1)) AS prio
  FROM sitemaps
)
SELECT host,
       {canonicalize_duckdb_sql('loc')} AS url,
       CAST(mod AS DATE) AS lastmod,
       CAST(prio AS DOUBLE) AS priority
FROM parsed
"""


def seeds_from_sitemap(
    xml_df: DataFrame, min_priority: float = 0.0
) -> DataFrame:
    """Parsed sitemap entries shaped for ``CrawlEngine.add_seeds``.

    Returns (url, depth) — add_seeds re-canonicalizes (idempotent) and
    assigns frontier priority through the engine's own priority model,
    keeping sitemap-seeded and list-seeded crawls byte-identical for
    the same URL set. ``min_priority`` drops entries the host marked
    low-value before they ever reach the frontier merge.
    """
    entries = parse_sitemap(xml_df)
    if min_priority > 0.0:
        entries = entries.filter(F.col("priority") >= min_priority)
    return entries.select("url", F.lit(0).cast("int").alias("depth"))


QUERIES = {"sitemap_extract": sitemap_extract}
ORACLES = {"sitemap_extract": SITEMAP_EXTRACT_SQL}
