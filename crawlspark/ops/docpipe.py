"""The Mendeley per-document rewrite pipeline, Spark-first.

This is the parity module for the reference's densest code path —
mendeley/ElasticSearchIndexHandler.java:189-517 — which per document:
renames snake_case→camelCase (P1/P2), injects constants (P3), assembles
a clamped date (P4), normalizes language (P5), routes tags through an
8-way prefix dispatch (F1), guards numeric parses (F7), accumulates 17
sets (A1) + boolean ORs (A2), and enriches via DOI→citation lookups
(J1) and country decodes (J5).

The reference does all of this as per-JsonNode mutations in one thread.
Here: a deterministic `tags` array is synthesized per document (pure
SQL, identical in DuckDB), exploded ONCE, classified with a single
`CASE` chain, re-aggregated in ONE hash-agg pass, and enriched with
broadcast joins. At 100 TB this is one shuffle keyed by doc_id plus
map-side broadcast joins — the optimal shape.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import load

# deterministic tag synthesis: each doc gets 0-5 tags drawn from the
# reference's observed tag families (mendeley fixture shape, FIXTURES.md §6)
_TAG_SPARK = """
filter(array(
  CASE WHEN doc_id % 3 = 0  THEN concat('gbifDOI:10.15468/dl.', substring(md5(concat('d', cast(doc_id as string))), 1, 6)) END,
  CASE WHEN doc_id % 4 = 0  THEN concat('peer_review:', CASE WHEN doc_id % 8 = 0 THEN 'true' ELSE 'false' END) END,
  CASE WHEN doc_id % 5 = 0  THEN 'open_access:true' END,
  CASE WHEN doc_id % 6 = 0  THEN concat('gbifTaxon:', CASE WHEN doc_id % 12 = 0 THEN 'notanumber' ELSE cast(doc_id * 7 as string) END) END,
  CASE WHEN doc_id % 7 = 0  THEN concat('gbifOccurrence:', cast(doc_id * 1000003 as string)) END,
  CASE WHEN doc_id % 11 = 0 THEN concat('citation_type:', CASE WHEN doc_id % 22 = 0 THEN 'journal' ELSE 'thesis' END) END,
  CASE WHEN doc_id % 13 = 0 THEN concat(upper(substring(md5(cast(doc_id as string)), 1, 2)), '_biodiversity') END,
  CASE WHEN doc_id % 2 = 0  THEN upper(substring(md5(concat('c', cast(doc_id as string))), 1, 2)) END
), t -> t IS NOT NULL)
"""

_TAG_DUCK = """
list_filter([
  CASE WHEN doc_id % 3 = 0  THEN concat('gbifDOI:10.15468/dl.', substring(md5(concat('d', doc_id::VARCHAR)), 1, 6)) END,
  CASE WHEN doc_id % 4 = 0  THEN concat('peer_review:', CASE WHEN doc_id % 8 = 0 THEN 'true' ELSE 'false' END) END,
  CASE WHEN doc_id % 5 = 0  THEN 'open_access:true' END,
  CASE WHEN doc_id % 6 = 0  THEN concat('gbifTaxon:', CASE WHEN doc_id % 12 = 0 THEN 'notanumber' ELSE (doc_id * 7)::VARCHAR END) END,
  CASE WHEN doc_id % 7 = 0  THEN concat('gbifOccurrence:', (doc_id * 1000003)::VARCHAR) END,
  CASE WHEN doc_id % 11 = 0 THEN concat('citation_type:', CASE WHEN doc_id % 22 = 0 THEN 'journal' ELSE 'thesis' END) END,
  CASE WHEN doc_id % 13 = 0 THEN concat(upper(substring(md5(doc_id::VARCHAR), 1, 2)), '_biodiversity') END,
  CASE WHEN doc_id % 2 = 0  THEN upper(substring(md5(concat('c', doc_id::VARCHAR)), 1, 2)) END
], t -> t IS NOT NULL)
"""


# --- F1 + F7 + A1 + A2: one explode → CASE dispatch → one hash-agg.
# (reference: 8-way prefix router :268-351, numeric guard :310-325,
#  17 HashSet accumulators :249-267, boolean ORs :306-309)
def tag_dispatch_accumulate(spark, sf):
    docs = load(spark, sf, "documents").withColumn("tags", F.expr(_TAG_SPARK))
    t = docs.select("doc_id", F.explode_outer("tags").alias("tag"))
    cls = t.select(
        "doc_id",
        F.when(F.col("tag").startswith("gbifDOI:"), "doi")
        .when(F.col("tag").startswith("peer_review:"), "peer")
        .when(F.col("tag").startswith("open_access:"), "oa")
        .when(F.col("tag").startswith("gbifTaxon:"), "taxon")
        .when(F.col("tag").startswith("gbifOccurrence:"), "occ")
        .when(F.col("tag").startswith("citation_type:"), "cit")
        .when(F.col("tag").endswith("_biodiversity"), "biocountry")
        .otherwise("country")
        .alias("kind"),
        F.regexp_replace("tag", "^[a-zA-Z_]+:", "").alias("val"),
        "tag",
    )
    # F7: invalid ints → NULL via try_cast (ANSI-safe), dropped from the set
    taxon_val = F.when(
        F.col("kind") == "taxon", F.expr("try_cast(val as bigint)")
    )
    occ_val = F.when(F.col("kind") == "occ", F.expr("try_cast(val as bigint)"))

    # arrays are serialized to sorted CSV scalars so the result is
    # hashable/sortable by any downstream comparator (driver canon,
    # pandas) — sort happens on the native type, join on the string.
    def _csv(col):
        return F.array_join(
            F.transform(F.array_sort(col), lambda x: x.cast("string")), ","
        )

    return cls.groupBy("doc_id").agg(
        _csv(F.collect_set(F.when(F.col("kind") == "doi", F.col("val")))).alias("dois"),
        _csv(F.collect_set(taxon_val)).alias("taxon_keys"),
        _csv(F.collect_set(occ_val)).alias("occurrence_keys"),
        _csv(
            F.collect_set(
                F.when(F.col("kind") == "biocountry", F.regexp_replace("tag", "_biodiversity$", ""))
            )
        ).alias("coverage_countries"),
        _csv(
            F.collect_set(F.when(F.col("kind") == "country", F.col("tag")))
        ).alias("researcher_countries"),
        F.coalesce(
            F.max(F.when((F.col("kind") == "peer") & (F.col("val") == "true"), True)),
            F.lit(False),
        ).alias("peer_review"),
        F.coalesce(F.max(F.when(F.col("kind") == "oa", True)), F.lit(False)).alias(
            "open_access"
        ),
        F.max(F.when(F.col("kind") == "cit", F.col("val"))).alias("citation_type"),
        F.count(F.col("tag")).alias("n_tags"),
    )


TAG_DISPATCH_SQL = f"""
WITH t AS (
  SELECT doc_id, unnest({_TAG_DUCK}) AS tag FROM documents
  UNION ALL
  SELECT doc_id, NULL AS tag FROM documents WHERE len({_TAG_DUCK}) = 0
), cls AS (
  SELECT doc_id, tag,
         CASE WHEN tag LIKE 'gbifDOI:%' THEN 'doi'
              WHEN tag LIKE 'peer_review:%' THEN 'peer'
              WHEN tag LIKE 'open_access:%' THEN 'oa'
              WHEN tag LIKE 'gbifTaxon:%' THEN 'taxon'
              WHEN tag LIKE 'gbifOccurrence:%' THEN 'occ'
              WHEN tag LIKE 'citation_type:%' THEN 'cit'
              WHEN tag LIKE '%\\_biodiversity' ESCAPE '\\' THEN 'biocountry'
              ELSE 'country' END AS kind,
         regexp_replace(tag, '^[a-zA-Z_]+:', '') AS val
  FROM t
)
SELECT doc_id,
  coalesce(array_to_string(list_sort(list_distinct(list_filter(list(CASE WHEN kind = 'doi' THEN val END), x -> x IS NOT NULL))), ','), '') AS dois,
  coalesce(array_to_string(list_sort(list_distinct(list_filter(list(CASE WHEN kind = 'taxon' THEN try_cast(val AS BIGINT) END), x -> x IS NOT NULL))), ','), '') AS taxon_keys,
  coalesce(array_to_string(list_sort(list_distinct(list_filter(list(CASE WHEN kind = 'occ' THEN try_cast(val AS BIGINT) END), x -> x IS NOT NULL))), ','), '') AS occurrence_keys,
  coalesce(array_to_string(list_sort(list_distinct(list_filter(list(CASE WHEN kind = 'biocountry' THEN regexp_replace(tag, '_biodiversity$', '') END), x -> x IS NOT NULL))), ','), '') AS coverage_countries,
  coalesce(array_to_string(list_sort(list_distinct(list_filter(list(CASE WHEN kind = 'country' THEN tag END), x -> x IS NOT NULL))), ','), '') AS researcher_countries,
  coalesce(max(CASE WHEN kind = 'peer' AND val = 'true' THEN true END), false) AS peer_review,
  coalesce(max(CASE WHEN kind = 'oa' THEN true END), false) AS open_access,
  max(CASE WHEN kind = 'cit' THEN val END) AS citation_type,
  count(tag) AS n_tags
FROM cls GROUP BY doc_id
"""


# --- P1/P2/P3 + P5: projection normalization + language decode via a
# broadcast dimension (reference Language enum matching :470-485)
_LANGS = [
    ("en", "eng", "English"),
    ("de", "deu", "German"),
    ("es", "spa", "Spanish"),
    ("fr", "fra", "French"),
    ("zh", "zho", "Chinese"),
]


def normalize_documents(spark, sf):
    docs = load(spark, sf, "documents")
    lang_dim = spark.createDataFrame(_LANGS, "iso2 string, iso3 string, title string")
    return (
        docs.join(F.broadcast(lang_dim), docs.lang == lang_dim.iso2, "left")
        .select(
            F.col("doc_id").alias("docId"),  # P1 camelCase
            F.col("n_chars").alias("nChars"),
            F.coalesce("iso3", F.lit("und")).alias("languageIso3"),  # P5
            F.lit("literature").alias("contentType"),  # P3 constant
            F.lit(True).alias("searchable"),  # P3
            F.upper("source").alias("sourceKey"),  # P6 case-format
        )
    )


NORMALIZE_SQL = """
SELECT doc_id AS docId, n_chars AS nChars,
       CASE lang WHEN 'en' THEN 'eng' WHEN 'de' THEN 'deu' WHEN 'es' THEN 'spa'
                 WHEN 'fr' THEN 'fra' WHEN 'zh' THEN 'zho' ELSE 'und' END AS languageIso3,
       'literature' AS contentType, true AS searchable,
       upper(source) AS sourceKey
FROM documents
"""


# --- J1: explode DOI tags → broadcast-join a citations dimension →
# collect enriched arrays (reference: DOI → {datasetKey, orgKey, ...}
# via cached JDBC lookups, DatasetUsagesCollector.java:76-126)
def doi_citation_enrich(spark, sf):
    docs = load(spark, sf, "documents").withColumn("tags", F.expr(_TAG_SPARK))
    dois = docs.select(
        "doc_id", F.explode("tags").alias("tag")
    ).filter(F.col("tag").startswith("gbifDOI:")).select(
        "doc_id", F.regexp_replace("tag", "^gbifDOI:", "").alias("doi")
    )
    # citations dimension synthesized from nation (stands in for the
    # JDBC dim; at scale: spark.read.jdbc once, then broadcast)
    nation = load(spark, sf, "nation")
    # portable 2-hex-digit hash mod 25 (instr exists in both engines)
    nkey_expr = (
        "pmod((instr('0123456789abcdef', substring(md5(doi), 1, 1)) - 1) * 16 "
        "+ instr('0123456789abcdef', substring(md5(doi), 2, 1)) - 1, 25)"
    )
    cites = dois.select("doi").distinct().withColumn(
        "nkey", F.expr(nkey_expr).cast("int")
    )
    dim = cites.join(F.broadcast(nation), cites.nkey == nation.n_nationkey, "left").select(
        "doi", F.col("n_name").alias("publishing_country")
    )
    return (
        dois.join(F.broadcast(dim), "doi", "left")
        .groupBy("doc_id")
        .agg(
            F.array_join(F.array_sort(F.collect_set("doi")), ",").alias("dois"),
            F.array_join(
                F.array_sort(F.collect_set("publishing_country")), ","
            ).alias("publishing_countries"),
        )
    )


DOI_ENRICH_SQL = f"""
WITH dois AS (
  SELECT doc_id, regexp_replace(tag, '^gbifDOI:', '') AS doi
  FROM (SELECT doc_id, unnest({_TAG_DUCK}) AS tag FROM documents)
  WHERE tag LIKE 'gbifDOI:%'
), dim AS (
  SELECT doi, n_name AS publishing_country
  FROM (SELECT DISTINCT doi,
               (((strpos('0123456789abcdef', substring(md5(doi), 1, 1)) - 1) * 16
                 + strpos('0123456789abcdef', substring(md5(doi), 2, 1)) - 1) % 25)::INT AS nkey
        FROM dois)
  LEFT JOIN nation ON nkey = n_nationkey
)
SELECT doc_id,
       coalesce(array_to_string(list_sort(list_distinct(list(doi))), ','), '') AS dois,
       coalesce(array_to_string(list_sort(list_distinct(list_filter(list(publishing_country), x -> x IS NOT NULL))), ','), '') AS publishing_countries
FROM dois LEFT JOIN dim USING (doi)
GROUP BY doc_id
"""


QUERIES = {
    "tag_dispatch_accumulate": tag_dispatch_accumulate,
    "normalize_documents": normalize_documents,
    "doi_citation_enrich": doi_citation_enrich,
}

ORACLES = {
    "tag_dispatch_accumulate": TAG_DISPATCH_SQL,
    "normalize_documents": NORMALIZE_SQL,
    "doi_citation_enrich": DOI_ENRICH_SQL,
}
