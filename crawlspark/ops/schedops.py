"""Crawl-scheduling analytics: the SQL-expressible cores of the three
frontier-health jobs a web-scale crawler runs beside the fetch loop.

* ``recrawl_priority`` — per-URL change-rate estimation driving the
  adaptive revisit interval (the engine's ``recrawl_adaptive`` mode,
  engine.py; generalizes the reference's fixed re-crawl cadence —
  its crawls re-run the full pager on a schedule,
  MendeleyDocumentCrawler.java:59-122 — into freshness-aware
  per-URL scheduling, the Cho/Garcia-Molina incremental-crawler
  policy shape).
* ``spider_trap_templates`` — per-(host, path-template) URL vs content
  cardinality: templates that mint unbounded URLs over near-constant
  content (calendar pages, session-id links) are flagged so the
  frontier can stop feeding them.
* ``mirror_host_pairs`` — hosts serving the same content corpus
  (mirrors / CDNs) found by content-fingerprint co-occurrence, NOT by
  pairwise host comparison: the join is keyed on the fingerprint, so
  cost scales with shared content, never with hosts².

All inputs derive deterministically from the shared ``documents``
table (both engines compute over identical rows — no external data).
Every float lands through round(x, 6); integer logic is kept in
integers so the DuckDB oracle parity is exact.

Scale notes (100 TB): ``recrawl_priority`` is one explode + one
hash-agg per URL (the explode models the fetch-history table a real
deployment already has — there it is a plain groupBy(url)).
``spider_trap_templates`` is a single two-key hash-agg; distinct
counts are per-group, never global. ``mirror_host_pairs`` joins the
(host, fingerprint) distinct set to itself on fingerprint — worst
case is quadratic only in per-fingerprint host fan-out (bounded in
practice; a mirror family of m hosts costs m² rows per fingerprint,
which IS the answer's size), and the per-host size dim is tiny and
broadcast.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import load

# ------------------------------------------------------------------
# shared deterministic URL derivation (documents → one URL per doc)
_N_HOSTS = 6


def _sched_urls(spark, sf):
    d = load(spark, sf, "documents")
    return d.select(
        "doc_id",
        F.concat(
            F.lit("https://h"),
            (1 + F.col("doc_id") % _N_HOSTS).cast("string"),
            F.lit(".example.com/doc/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
        F.concat(
            F.lit("h"),
            (1 + F.col("doc_id") % _N_HOSTS).cast("string"),
            F.lit(".example.com"),
        ).alias("host"),
    )


_SCHED_URLS_DUCK = f"""
SELECT doc_id,
       concat('https://h', (1 + doc_id % {_N_HOSTS})::VARCHAR,
              '.example.com/doc/', doc_id::VARCHAR) AS url,
       concat('h', (1 + doc_id % {_N_HOSTS})::VARCHAR, '.example.com') AS host
FROM documents
"""


# ------------------------------------------------------------------
# 1) adaptive recrawl priority from a synthetic fetch history
#
# Each URL carries n_obs past fetches; fetch k "changed" the content
# with a deterministic md5 coin (p = 4/16). The estimator is the
# smoothed change rate lambda = (changes + 0.5) / (obs + 1); the
# revisit interval is ttl = clamp(floor(1/lambda), 1, 32) rounds and a
# URL is due when its age reaches the ttl. floor (not round) keeps the
# Spark/DuckDB float contract trivial; (obs+1)/(changes+0.5) is never
# an exact .5 anyway (odd×even argument in the module tests).
def recrawl_priority(spark, sf):
    u = _sched_urls(spark, sf).withColumn(
        "n_obs", (2 + F.col("doc_id") % 7).cast("int")
    )
    hist = u.select(
        "url",
        "n_obs",
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.col("n_obs") - 1)).alias("k"),
    ).withColumn(
        "changed",
        F.substring(
            F.md5(F.concat(F.col("url"), F.lit("|chg"), F.col("k").cast("string"))),
            1,
            1,
        ).isin("0", "1", "2", "3"),
    )
    est = hist.groupBy("url", "n_obs", "doc_id").agg(
        F.sum(F.col("changed").cast("int")).cast("int").alias("n_changes")
    )
    lam = (F.col("n_changes") + F.lit(0.5)) / (F.col("n_obs") + F.lit(1.0))
    est = (
        est.withColumn(
            "ttl",
            F.greatest(
                F.lit(1),
                F.least(F.lit(32), F.floor(F.lit(1.0) / lam).cast("int")),
            ).cast("int"),
        )
        .withColumn("age", (1 + F.col("doc_id") % 11).cast("int"))
        .withColumn("due_score", F.round(lam * F.col("age"), 6))
        .withColumn("is_due", F.col("age") >= F.col("ttl"))
    )
    return est.select(
        "url", "n_obs", "n_changes", "ttl", "age", "due_score", "is_due"
    )


RECRAWL_PRIORITY_SQL = f"""
WITH u AS (
  SELECT url, doc_id, (2 + doc_id % 7)::INT AS n_obs
  FROM ({_SCHED_URLS_DUCK})
),
hist AS (
  SELECT u.url, u.n_obs, u.doc_id,
         substring(md5(concat(u.url, '|chg', k.k::VARCHAR)), 1, 1)
           IN ('0','1','2','3') AS changed
  FROM u, LATERAL UNNEST(range(u.n_obs)) AS k(k)
),
est AS (
  SELECT url, n_obs, doc_id, sum(changed::INT)::INT AS n_changes
  FROM hist GROUP BY 1, 2, 3
)
SELECT url, n_obs, n_changes,
       greatest(1, least(32,
         floor(1.0 / ((n_changes + 0.5) / (n_obs + 1.0)))::INT))::INT AS ttl,
       (1 + doc_id % 11)::INT AS age,
       round(((n_changes + 0.5) / (n_obs + 1.0)) * (1 + doc_id % 11), 6)
         AS due_score,
       (1 + doc_id % 11) >= greatest(1, least(32,
         floor(1.0 / ((n_changes + 0.5) / (n_obs + 1.0)))::INT)) AS is_due
FROM est
"""


# ------------------------------------------------------------------
# 2) spider-trap detection: URL-template cardinality vs content
#    cardinality per host. A template minting >= 8 URLs whose distinct
#    content covers <= 1/4 of them is a trap (integer comparison —
#    no float threshold).
def spider_trap_templates(spark, sf):
    # host decoupled from the trap flag (doc_id//3 vs doc_id%3) so every
    # host carries BOTH a trap and a healthy template
    u = _sched_urls(spark, sf).withColumn(
        "host",
        F.concat(
            F.lit("h"),
            (1 + F.floor(F.col("doc_id") / 3) % _N_HOSTS).cast("string"),
            F.lit(".example.com"),
        ),
    )
    trap = F.col("doc_id") % 3 == 0
    u = u.withColumn(
        "path",
        F.when(
            trap,
            F.concat(F.lit("/calendar/2024/"), F.col("doc_id").cast("string")),
        ).otherwise(F.concat(F.lit("/article/"), F.col("doc_id").cast("string"))),
    ).withColumn(
        "fingerprint",
        F.when(
            trap, F.md5(F.concat(F.lit("trap|"), (F.col("doc_id") % 2).cast("string")))
        ).otherwise(F.md5(F.concat(F.lit("page|"), F.col("doc_id").cast("string")))),
    )
    agg = (
        u.withColumn("template", F.regexp_replace("path", "[0-9]+", "N"))
        .groupBy("host", "template")
        .agg(
            F.countDistinct("path").cast("bigint").alias("n_urls"),
            F.countDistinct("fingerprint").cast("bigint").alias("n_content"),
        )
    )
    return agg.withColumn(
        "is_trap",
        (F.col("n_urls") >= 8) & (F.col("n_content") * 4 <= F.col("n_urls")),
    )


SPIDER_TRAP_SQL = f"""
WITH u AS (
  SELECT concat('h', (1 + (doc_id // 3) % {_N_HOSTS})::VARCHAR,
                '.example.com') AS host,
         CASE WHEN doc_id % 3 = 0
              THEN concat('/calendar/2024/', doc_id::VARCHAR)
              ELSE concat('/article/', doc_id::VARCHAR) END AS path,
         CASE WHEN doc_id % 3 = 0
              THEN md5(concat('trap|', (doc_id % 2)::VARCHAR))
              ELSE md5(concat('page|', doc_id::VARCHAR)) END AS fingerprint
  FROM ({_SCHED_URLS_DUCK})
),
agg AS (
  SELECT host, regexp_replace(path, '[0-9]+', 'N', 'g') AS template,
         count(DISTINCT path) AS n_urls,
         count(DISTINCT fingerprint) AS n_content
  FROM u GROUP BY 1, 2
)
SELECT host, template, n_urls, n_content,
       (n_urls >= 8 AND n_content * 4 <= n_urls) AS is_trap
FROM agg
"""


# ------------------------------------------------------------------
# 3) mirror-host detection by fingerprint co-occurrence. Content c is
#    served by the two consecutive hosts carrying doc 2c and 2c+1,
#    except a 1-in-5 slice that stays host-unique, so the Jaccard
#    scores are non-trivial. The join is keyed on fingerprint (the
#    scalable shape); host sizes come from a tiny broadcast dim.
def mirror_host_pairs(spark, sf):
    d = load(spark, sf, "documents").select(
        "doc_id",
        F.concat(
            F.lit("h"), (1 + F.col("doc_id") % 12).cast("string")
        ).alias("host"),
        F.md5(
            F.concat(
                F.lit("c|"),
                F.when(F.col("doc_id") % 5 == 0, F.col("doc_id"))
                .otherwise(F.floor(F.col("doc_id") / 2))
                .cast("string"),
            )
        ).alias("fingerprint"),
    )
    hc = d.select("host", "fingerprint").distinct()
    sizes = hc.groupBy("host").agg(F.count("*").cast("bigint").alias("n"))
    a = hc.alias("a")
    b = hc.alias("b")
    co = (
        a.join(b, "fingerprint")
        .filter(F.col("a.host") < F.col("b.host"))
        .groupBy(F.col("a.host").alias("host_a"), F.col("b.host").alias("host_b"))
        .agg(F.count("*").cast("bigint").alias("n_shared"))
    )
    sizes_a = sizes.select(F.col("host").alias("host_a"), F.col("n").alias("n_a"))
    sizes_b = sizes.select(F.col("host").alias("host_b"), F.col("n").alias("n_b"))
    out = (
        co.join(F.broadcast(sizes_a), "host_a")
        .join(F.broadcast(sizes_b), "host_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_shared") / (F.col("n_a") + F.col("n_b") - F.col("n_shared")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= 0.2)
    )
    return out.select("host_a", "host_b", "n_shared", "n_a", "n_b", "jaccard")


MIRROR_HOSTS_SQL = """
WITH d AS (
  SELECT DISTINCT
         concat('h', (1 + doc_id % 12)::VARCHAR) AS host,
         md5(concat('c|', (CASE WHEN doc_id % 5 = 0 THEN doc_id
                                ELSE doc_id // 2 END)::VARCHAR)) AS fingerprint
  FROM documents
),
sizes AS (SELECT host, count(*) AS n FROM d GROUP BY 1),
co AS (
  SELECT a.host AS host_a, b.host AS host_b, count(*) AS n_shared
  FROM d a JOIN d b USING (fingerprint)
  WHERE a.host < b.host
  GROUP BY 1, 2
)
SELECT host_a, host_b, n_shared, sa.n AS n_a, sb.n AS n_b,
       round(n_shared / (sa.n + sb.n - n_shared), 6) AS jaccard
FROM co
JOIN sizes sa ON sa.host = co.host_a
JOIN sizes sb ON sb.host = co.host_b
WHERE round(n_shared / (sa.n + sb.n - n_shared), 6) >= 0.2
"""


QUERIES = {
    "recrawl_priority": recrawl_priority,
    "spider_trap_templates": spider_trap_templates,
    "mirror_host_pairs": mirror_host_pairs,
}

ORACLES = {
    "recrawl_priority": RECRAWL_PRIORITY_SQL,
    "spider_trap_templates": SPIDER_TRAP_SQL,
    "mirror_host_pairs": MIRROR_HOSTS_SQL,
}
