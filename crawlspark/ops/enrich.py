"""Remaining reference-pipeline operators (SURVEY.md §2.3-§2.5):
vocabulary term extraction (P8), meta-created override (P9), blocks
flattening (P10), nested-entry regex projection (P7), controlled-term
allowlist filter (F3), download-DOI filter (F4), two-hop enrichment
(J2), and the reverse-link aggregation (J6) that replaces the
reference's per-document painless upsert scripts with one inverted-edge
aggregation + idempotent merge.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import load

# controlled allowlist (reference: resources/configuration.yml topics)
_TOPICS = ["spark", "join", "filter", "window", "merge"]


# --- F3 + P8: keep only allowlisted terms, normalize UPPER_SNAKE
# (VocabularyBuilder.java:122-145: term -> upper(replace(' ', '_')))
def vocab_term_extract(spark, sf):
    docs = load(spark, sf, "documents")
    words = F.array_distinct(F.split("text", " "))
    allow = F.array([F.lit(t) for t in _TOPICS])
    kept = F.array_intersect(words, allow)
    return docs.select(
        "doc_id",
        F.array_join(
            F.array_sort(
                F.transform(kept, lambda t: F.upper(F.regexp_replace(t, " ", "_")))
            ),
            ",",
        ).alias("terms"),
        (F.size(kept) > 0).alias("has_controlled_term"),
    )


VOCAB_SQL = f"""
SELECT doc_id,
       coalesce(array_to_string(list_sort(list_transform(list_intersect(list_distinct(str_split(text, ' ')),
                 {_TOPICS}), t -> upper(replace(t, ' ', '_')))), ','), '') AS terms,
       len(list_intersect(list_distinct(str_split(text, ' ')), {_TOPICS})) > 0 AS has_controlled_term
FROM documents
"""


# --- F4: download-DOI regex filter (UpdateRegistryHandler.java:45-47,
# pattern ^gbifDOI:10.15468/dl.)
def download_doi_filter(spark, sf):
    docs = load(spark, sf, "documents")
    doi = F.concat(
        F.lit("gbifDOI:10.15468/"),
        F.when(F.col("doc_id") % 2 == 0, F.lit("dl.")).otherwise(F.lit("ds.")),
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 6),
    )
    return (
        docs.select("doc_id", doi.alias("tag"))
        .filter(F.col("tag").rlike(r"^gbifDOI:10\.15468/dl\."))
        .select("doc_id", F.regexp_replace("tag", "^gbifDOI:", "").alias("download_doi"))
    )


DOWNLOAD_DOI_SQL = """
SELECT doc_id, regexp_replace(tag, '^gbifDOI:', '') AS download_doi
FROM (
  SELECT doc_id,
         concat('gbifDOI:10.15468/', CASE WHEN doc_id % 2 = 0 THEN 'dl.' ELSE 'ds.' END,
                substring(md5(doc_id::VARCHAR), 1, 6)) AS tag
  FROM documents
)
WHERE regexp_matches(tag, '^gbifDOI:10\\.15468/dl\\.')
"""


# --- J2: two-hop broadcast enrichment (dataset -> project -> programme;
# DatasetEsClient.java:94-121 + ContentEsClient.java:115-141)
def two_hop_enrich(spark, sf):
    cust = load(spark, sf, "customer")
    nation = load(spark, sf, "nation")
    region = load(spark, sf, "region")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey, "left")
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey, "left")
        .groupBy(F.col("r_name").alias("programme"))
        .agg(F.count("*").alias("n_customers"))
    )


TWO_HOP_SQL = """
SELECT r_name AS programme, count(*) AS n_customers
FROM customer
LEFT JOIN nation ON c_nationkey = n_nationkey
LEFT JOIN region ON n_regionkey = r_regionkey
GROUP BY 1
"""


# --- J6: reverse-link aggregation. The reference appends parent ids to
# nested entries one HTTP script call at a time with retryOnConflict(3)
# (ESDocumentLinker.java:41-121); the Spark shape is one inverted-edge
# aggregation merged idempotently (array_union == retry-safe upsert).
def reverse_link_agg(spark, sf):
    orders = load(spark, sf, "orders")
    li = load(spark, sf, "lineitem")
    # edges: order (parent) -> part (target); existing tag state: empty
    links = li.select(
        F.col("l_partkey").alias("target_id"), F.col("l_orderkey").alias("parent_id")
    )
    inverted = links.groupBy("target_id").agg(
        F.array_sort(F.collect_set("parent_id")).alias("parent_ids")
    )
    # idempotent merge: re-applying the same links changes nothing
    merged = inverted.select(
        "target_id",
        F.array_sort(F.array_union("parent_ids", "parent_ids")).alias("parent_ids"),
    )
    return merged.select(
        "target_id",
        F.size("parent_ids").alias("n_parents"),
        F.array_join(
            F.transform("parent_ids", lambda x: x.cast("string")), ","
        ).alias("parent_ids"),
    )


REVERSE_LINK_SQL = """
SELECT l_partkey AS target_id,
       len(list_sort(list_distinct(list(l_orderkey)))) AS n_parents,
       coalesce(array_to_string(list_sort(list_distinct(list(l_orderkey))), ','), '') AS parent_ids
FROM lineitem GROUP BY 1
"""


# --- P9: meta-created override (Meta.java:41-46 — coalesce precedence)
# + P10: blocks flattening (EsDocBuilder.java:106-119 — transform over
# an array of structs) + P7: regex projection of nested fields
def blocks_flatten(spark, sf):
    docs = load(spark, sf, "documents")
    # slice(..., 1, n) handles n=0 (sequence(1, 0) would descend)
    blocks = F.expr(
        "slice(transform(sequence(1, 3), "
        "i -> named_struct('id', concat(cast(doc_id as string), '-', cast(i as string)), "
        "'title', concat('block ', cast(i as string)), "
        "'internal_field', 'dropme')), 1, cast(doc_id % 4 as int))"
    )
    df = docs.select("doc_id", blocks.alias("blocks"))
    # P7: keep only fields matching the projection regex (id|title)
    projected = F.transform(
        F.col("blocks"),
        lambda b: F.struct(b["id"].alias("id"), b["title"].alias("title")),
    )
    # P9: meta override — prefer meta_created when present
    meta_created = F.when(
        F.col("doc_id") % 5 == 0, F.concat(F.lit("2020-01-0"), (F.col("doc_id") % 9 + 1).cast("string"))
    )
    return df.select(
        "doc_id",
        F.to_json(projected).alias("blocks_json"),
        F.coalesce(meta_created, F.lit("1970-01-01")).alias("created_at"),
        F.size("blocks").alias("n_blocks"),
    )


BLOCKS_SQL = """
SELECT doc_id,
       CASE WHEN doc_id % 4 = 0 THEN '[]'
            ELSE concat('[', array_to_string(list_transform(generate_series(1, (doc_id % 4)::INT),
                 i -> concat('{"id":"', doc_id::VARCHAR, '-', i::VARCHAR, '","title":"block ', i::VARCHAR, '"}')), ','), ']')
       END AS blocks_json,
       coalesce(CASE WHEN doc_id % 5 = 0 THEN concat('2020-01-0', (doc_id % 9 + 1)::VARCHAR) END,
                '1970-01-01') AS created_at,
       (doc_id % 4)::INT AS n_blocks
FROM documents
"""


# --- K6: registry side-effect sink, as data. The reference clears a
# download's eraseAfter via one authenticated REST call per cited DOI,
# idempotently skipping already-cleared rows (UpdateRegistryHandler.
# java:86-138, skip at :124-126). Spark-first: compute the update SET
# as a DataFrame (download-DOI docs semi-joined to the registry,
# already-cleared rows excluded) and apply it with an idempotent
# keyed MERGE — no per-row REST, no read-modify-write races. This
# query returns the update set; test_registry_sink applies it via
# SnapTable.merge twice and proves idempotence.
def registry_erase_clear(spark, sf):
    docs = load(spark, sf, "documents")
    cited = (
        docs.select(
            F.concat(
                F.lit("10.15468/"),
                F.when(F.col("doc_id") % 2 == 0, F.lit("dl.")).otherwise(F.lit("ds.")),
                F.substring(F.md5(F.col("doc_id").cast("string")), 1, 6),
            ).alias("doi")
        )
        .filter(F.col("doi").rlike(r"^10\.15468/dl\."))
        .distinct()
    )
    # registry dim synthesized from orders: every even orderkey download
    # has a pending erase_after; odd ones are already cleared (NULL)
    orders = load(spark, sf, "orders")
    registry = orders.filter(F.col("o_orderkey") < 2000).select(
        F.concat(
            F.lit("10.15468/dl."),
            F.substring(F.md5((F.col("o_orderkey") % 500).cast("string")), 1, 6),
        ).alias("doi"),
        F.when(F.col("o_orderkey") % 2 == 0, F.lit("2030-01-01")).alias("erase_after"),
    ).groupBy("doi").agg(F.max("erase_after").alias("erase_after"))
    return (
        registry.join(cited, "doi", "left_semi")
        .filter(F.col("erase_after").isNotNull())  # idempotent skip
        .select("doi", F.lit(None).cast("string").alias("erase_after"))
    )


REGISTRY_SQL = """
WITH cited AS (
  SELECT DISTINCT concat('10.15468/', CASE WHEN doc_id % 2 = 0 THEN 'dl.' ELSE 'ds.' END,
                         substring(md5(doc_id::VARCHAR), 1, 6)) AS doi
  FROM documents
  WHERE doc_id % 2 = 0
),
registry AS (
  SELECT doi, max(erase_after) AS erase_after FROM (
    SELECT concat('10.15468/dl.', substring(md5((o_orderkey % 500)::VARCHAR), 1, 6)) AS doi,
           CASE WHEN o_orderkey % 2 = 0 THEN '2030-01-01' END AS erase_after
    FROM orders WHERE o_orderkey < 2000
  ) GROUP BY doi
)
SELECT doi, NULL::VARCHAR AS erase_after
FROM registry
WHERE erase_after IS NOT NULL AND doi IN (SELECT doi FROM cited)
"""


QUERIES = {
    "vocab_term_extract": vocab_term_extract,
    "registry_erase_clear": registry_erase_clear,
    "download_doi_filter": download_doi_filter,
    "two_hop_enrich": two_hop_enrich,
    "reverse_link_agg": reverse_link_agg,
    "blocks_flatten": blocks_flatten,
}

ORACLES = {
    "vocab_term_extract": VOCAB_SQL,
    "registry_erase_clear": REGISTRY_SQL,
    "download_doi_filter": DOWNLOAD_DOI_SQL,
    "two_hop_enrich": TWO_HOP_SQL,
    "reverse_link_agg": REVERSE_LINK_SQL,
    "blocks_flatten": BLOCKS_SQL,
}
