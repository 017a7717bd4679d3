"""Crawl-semantics operators exposed on the shared test tables (the
driver's correctness gate runs these against DuckDB oracles).

The synthetic URLs are derived deterministically from the ``documents``
table, so both engines compute over identical inputs without external
data. Each query is the SQL-expressible core of an engine stage in
engine.py / politeness.py / fetch.py.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..canon import canonicalize, canonicalize_duckdb_sql
from . import load, load_spread

# messy URL: uppercase scheme/host, default port, unsorted query, fragment
_URL_SPARK = (
    "concat('HTTPS://', upper(source), '.Example.COM:443/img/', cast(doc_id as string), "
    "'?b=', cast(doc_id % 3 as string), '&a=', cast(doc_id % 5 as string), '#f')"
)
_URL_DUCK = (
    "concat('HTTPS://', upper(source), '.Example.COM:443/img/', doc_id::VARCHAR, "
    "'?b=', (doc_id % 3)::VARCHAR, '&a=', (doc_id % 5)::VARCHAR, '#f')"
)
_CANON_DUCK = canonicalize_duckdb_sql("raw_url")


def _urls(spark, sf):
    # load_spread, not load: the documents file arrives as a single
    # parquet row group, so a plain scan runs the canonicalizer (the
    # expensive regex/array_sort expression chain shared by every URL
    # gate) on ONE core; the round-robin spread puts it on all slots
    # and is a no-op at production scale (guide §2.5 input skew).
    return (
        load_spread(spark, sf, "documents")
        .select("doc_id", "source", F.expr(_URL_SPARK).alias("raw_url"))
        .withColumn("url", canonicalize("raw_url"))
        .withColumn("host", F.regexp_extract("url", r"^[a-z]+://([^/]+)", 1))
    )


_URLS_DUCK = f"""
SELECT doc_id, source, raw_url,
       {_CANON_DUCK} AS url,
       lower(concat(source, '.example.com')) AS host
FROM (SELECT doc_id, source, {_URL_DUCK} AS raw_url FROM documents)
"""


# --- P11 generalized: full URL canonicalization
def url_canonicalize(spark, sf):
    return _urls(spark, sf).select("doc_id", "url")


CANON_SQL = f"SELECT doc_id, url FROM ({_URLS_DUCK})"


# --- F9/A5: URL-seen anti-join (the dedup heart of the engine)
def url_seen_antijoin(spark, sf):
    urls = _urls(spark, sf)
    seen = urls.filter(F.col("doc_id") % 3 == 0).select("url")
    return (
        urls.join(seen, "url", "left_anti")
        .select("doc_id", "url", F.md5("url").alias("url_hash_hex"))
    )


SEEN_SQL = f"""
WITH u AS ({_URLS_DUCK})
SELECT doc_id, url, md5(url) AS url_hash_hex
FROM u
WHERE url NOT IN (SELECT url FROM u WHERE doc_id % 3 = 0)
"""


# --- O1/O2: per-host politeness budget — naive window form
def politeness_topk(spark, sf):
    urls = _urls(spark, sf)
    w = Window.partitionBy("host").orderBy(F.md5("url").asc(), F.col("url").asc())
    return (
        urls.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("host", "rank", "doc_id", "url")
    )


TOPK_SQL = f"""
SELECT host, rank, doc_id, url FROM (
  SELECT host, doc_id, url,
         row_number() OVER (PARTITION BY host ORDER BY md5(url) ASC, url ASC) AS rank
  FROM ({_URLS_DUCK})
) WHERE rank <= 5
"""


# --- §4.2: the same selection via two-phase SALTED rank (hot-host skew
# splitting). Same oracle as politeness_topk — proves the skew path
# does not change semantics.
def politeness_topk_salted(spark, sf):
    urls = _urls(spark, sf).withColumn(
        "_salt", F.pmod(F.xxhash64("url"), F.lit(4)).cast("int")
    )
    order = [F.md5("url").asc(), F.col("url").asc()]
    w1 = Window.partitionBy("host", "_salt").orderBy(*order)
    w2 = Window.partitionBy("host").orderBy(*order)
    return (
        urls.withColumn("_rn1", F.row_number().over(w1))
        .filter(F.col("_rn1") <= 5)
        .withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= 5)
        .select("host", "rank", "doc_id", "url")
    )


# --- T2: retry-as-data with linear backoff schedule
# (MendeleyDocumentCrawler.java:72-87: retry <=3 on 504, delay retry#×10s)
def retry_backoff_schedule(spark, sf):
    urls = _urls(spark, sf)
    failing = F.substring(F.md5(F.concat(F.col("url"), F.lit("|fault"))), 1, 1).isin(
        "0", "1"
    )
    df = urls.withColumn("retry_count", (F.col("doc_id") % 5).cast("int"))
    return df.select(
        "doc_id",
        F.when(failing & (F.col("retry_count") < 3), 504)
        .when(failing, -504)
        .otherwise(200)
        .cast("int")
        .alias("status"),
        F.when(failing & (F.col("retry_count") < 3), F.col("retry_count") + 1)
        .otherwise(None)
        .cast("int")
        .alias("next_retry"),
        F.when(failing & (F.col("retry_count") < 3), 10 * (F.col("retry_count") + 1))
        .otherwise(None)
        .cast("int")
        .alias("backoff_s"),
    )


RETRY_SQL = f"""
SELECT doc_id,
       (CASE WHEN failing AND retry_count < 3 THEN 504
             WHEN failing THEN -504 ELSE 200 END)::INT AS status,
       (CASE WHEN failing AND retry_count < 3 THEN retry_count + 1 END)::INT AS next_retry,
       (CASE WHEN failing AND retry_count < 3 THEN 10 * (retry_count + 1) END)::INT AS backoff_s
FROM (
  SELECT doc_id,
         substring(md5(concat(url, '|fault')), 1, 1) IN ('0', '1') AS failing,
         (doc_id % 5)::INT AS retry_count
  FROM ({_URLS_DUCK})
)
"""


# --- robots.txt prefix filtering (politeness.py filter_robots)
def robots_filter(spark, sf):
    urls = _urls(spark, sf).withColumn(
        "path",
        F.when(F.col("doc_id") % 7 == 0, F.lit("/img/priv/x")).otherwise(
            F.lit("/img/pub/x")
        ),
    )
    denied_host = F.substring(
        F.md5(F.concat(F.col("host"), F.lit("|robots"))), 1, 1
    ).isin("0", "1", "2", "3")
    return (
        urls.withColumn(
            "allowed",
            ~(denied_host & F.col("path").startswith("/img/priv")),
        )
        .groupBy("host", "allowed")
        .agg(F.count("*").alias("n"))
    )


ROBOTS_SQL = f"""
SELECT host, allowed, count(*) AS n
FROM (
  SELECT host,
         NOT (substring(md5(concat(host, '|robots')), 1, 1) IN ('0','1','2','3')
              AND (CASE WHEN doc_id % 7 = 0 THEN '/img/priv/x' ELSE '/img/pub/x' END) LIKE '/img/priv%') AS allowed
  FROM ({_URLS_DUCK})
)
GROUP BY host, allowed
"""


# --- T2/S8 generalized: bounded redirect-chain resolution. The engine
# follows 301 Locations ACROSS rounds (engine.py run_round: redirs →
# arrival stream, frontier `hops` cap); this gate is the same semantics
# as one relational computation: resolve every URL's final destination
# through at most 5 redirect hops. The redirect map is a deterministic
# permutation (src doc → (48271*doc+7) mod n), so multi-hop chains AND
# genuine loops both occur and must terminate via the hop cap alone.
# Spark: 5 bounded self-left-joins (the iterative-resolution plan shape
# that scales — each pass is one shuffle, never a recursive blowup);
# DuckDB oracle: WITH RECURSIVE walk bounded at 5 hops.
# one constant for BOTH engines (md5-substring SQL is portable); the
# oracle rewrites the column reference with .replace where it aliases
_REDIR_COIN = "substring(md5(concat(url, '|redir')), 1, 1) IN ('0','1','2','3')"


def redirect_chain_resolve(spark, sf):
    u = _urls(spark, sf).select("doc_id", "url")
    n = u.count()  # one tiny scalar agg; the modulus is a plan literal
    edges = (
        u.filter(F.expr(_REDIR_COIN))
        .withColumn("_tgt", (F.col("doc_id").cast("bigint") * 48271 + 7) % n)
        .join(
            u.select(F.col("doc_id").alias("_tgt"), F.col("url").alias("dst")),
            "_tgt",
        )
        .select(F.col("url").alias("src"), "dst")
    )
    state = u.select(
        "doc_id", "url", F.col("url").alias("cur"), F.lit(0).alias("hops")
    )
    for _ in range(5):
        step = edges.select(F.col("src").alias("cur"), "dst")
        state = state.join(step, "cur", "left").select(
            "doc_id",
            "url",
            F.coalesce("dst", "cur").alias("cur"),
            (F.col("hops") + F.col("dst").isNotNull().cast("int")).alias("hops"),
        )
    is_src = edges.select(F.col("src").alias("cur")).distinct().withColumn(
        "_r", F.lit(1)
    )
    return state.join(is_src, "cur", "left").select(
        "doc_id",
        "url",
        F.col("cur").alias("final_url"),
        F.col("hops").cast("int").alias("hops"),
        F.col("_r").isNull().cast("int").alias("resolved"),
    )


REDIRECT_SQL = f"""
WITH RECURSIVE u AS (SELECT doc_id, url FROM ({_URLS_DUCK})),
n AS (SELECT count(*) AS c FROM u),
edges AS (
  SELECT r.url AS src, t.url AS dst
  FROM u r CROSS JOIN n
  JOIN u t ON t.doc_id = (r.doc_id::BIGINT * 48271 + 7) % n.c
  WHERE {_REDIR_COIN.replace('url', 'r.url')}
),
walk(doc_id, url, cur, hops) AS (
  SELECT doc_id, url, url, 0 FROM u
  UNION ALL
  SELECT w.doc_id, w.url, e.dst, w.hops + 1
  FROM walk w JOIN edges e ON e.src = w.cur
  WHERE w.hops < 5
)
SELECT doc_id, url, max_by(cur, hops) AS final_url, max(hops)::INT AS hops,
       (max_by(cur, hops) NOT IN (SELECT src FROM edges))::INT AS resolved
FROM walk GROUP BY doc_id, url
"""


# --- A4: crawl metrics rollup (counts per round/status), events as the
# fetch_log analogue; epoch arithmetic keeps it timezone-free
def crawl_metrics_rollup(spark, sf):
    ev = load(spark, sf, "events")
    return (
        ev.withColumn(
            "round_id", F.floor(F.unix_timestamp("ts") / 3600).cast("bigint")
        )
        .groupBy("round_id", "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
    )


METRICS_SQL = """
SELECT floor(epoch(ts) / 3600)::BIGINT AS round_id, event_type,
       count(*) AS n, round(sum(value), 2) AS sum_value
FROM events GROUP BY 1, 2
"""


QUERIES = {
    "url_canonicalize": url_canonicalize,
    "url_seen_antijoin": url_seen_antijoin,
    "politeness_topk": politeness_topk,
    "politeness_topk_salted": politeness_topk_salted,
    "retry_backoff_schedule": retry_backoff_schedule,
    "robots_filter": robots_filter,
    "redirect_chain_resolve": redirect_chain_resolve,
    "crawl_metrics_rollup": crawl_metrics_rollup,
}

ORACLES = {
    "url_canonicalize": CANON_SQL,
    "url_seen_antijoin": SEEN_SQL,
    "politeness_topk": TOPK_SQL,
    "politeness_topk_salted": TOPK_SQL,  # same oracle by design
    "retry_backoff_schedule": RETRY_SQL,
    "robots_filter": ROBOTS_SQL,
    "redirect_chain_resolve": REDIRECT_SQL,
    "crawl_metrics_rollup": METRICS_SQL,
}
