"""Nested-data operators closing the reference's deep-structure paths:

* P1 GENERIC recursive key rename (snake_case → lowerCamel at EVERY
  nesting level, including inside arrays of structs) — the reference
  walks the JsonNode tree per document
  (mendeley/ElasticSearchIndexHandler.java:493-517); here the walk
  happens ONCE over the static schema and compiles to a plain
  struct/transform projection (zero per-row interpretation).
* J3 taxonomy 1:N enrichment — taxonKey → higher-classification keys
  via a broadcast taxonomy dimension
  (ElasticSearchIndexHandler.java:380-406, clients/SpeciesService.java:
  28-43): explode → broadcast join → re-collect.
* Localized map fields — Contentful keeps raw locale→value maps for
  localized fields (contentful/crawl/EsDocBuilder.java:89-90); modeled
  as MapType with locale fallback + an ``extra`` overflow (SURVEY
  §1.2/§1.3 dynamic-template analogue).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import load


# --------------------------------------------------------- P1 generic
def snake_to_lower_camel(name: str) -> str:
    parts = name.split("_")
    return parts[0] + "".join(p[:1].upper() + p[1:] for p in parts[1:])


def rename_keys_recursive(col: Column, dtype: T.DataType, fn=snake_to_lower_camel) -> Column:
    """Rebuild ``col`` with every struct key at every nesting level
    renamed by ``fn`` — recursing through structs, arrays and maps.
    The recursion runs over the STATIC schema at plan-build time; the
    emitted plan is ordinary struct()/transform() expressions."""
    if isinstance(dtype, T.StructType):
        return F.struct(
            *[
                rename_keys_recursive(col[f.name], f.dataType, fn).alias(fn(f.name))
                for f in dtype.fields
            ]
        )
    if isinstance(dtype, T.ArrayType):
        return F.transform(
            col, lambda x: rename_keys_recursive(x, dtype.elementType, fn)
        )
    if isinstance(dtype, T.MapType):
        return F.map_from_arrays(
            F.map_keys(col),
            F.transform(
                F.map_values(col),
                lambda v: rename_keys_recursive(v, dtype.valueType, fn),
            ),
        )
    return col


# deterministic nested fixture: snake_case keys at 3 levels incl. an
# array of structs — the exact shape the reference's renamer walks
_NESTED_SPARK = """
named_struct(
  'last_modified', concat('2020-01-', lpad(cast(1 + pmod(doc_id, 28) as string), 2, '0')),
  'page_count', cast(pmod(doc_id, 50) as int),
  'author_info', named_struct(
     'first_name', concat('fn', cast(pmod(doc_id, 9) as string)),
     'last_name',  concat('ln', cast(pmod(doc_id, 7) as string))),
  'tag_list', transform(sequence(1, cast(1 + pmod(doc_id, 2) as int)),
     i -> named_struct('tag_name', concat('t', cast(i as string)),
                       'tag_value', cast(pmod(doc_id + i, 100) as int)))
)
"""


def nested_rename(spark, sf):
    docs = load(spark, sf, "documents").withColumn("doc", F.expr(_NESTED_SPARK))
    dtype = docs.schema["doc"].dataType
    renamed = rename_keys_recursive(F.col("doc"), dtype)
    return docs.select("doc_id", F.to_json(renamed).alias("doc_json"))


# oracle builds the camelCase JSON directly (field order matches the
# Spark struct order, so to_json output is byte-identical)
NESTED_RENAME_SQL = """
SELECT doc_id, to_json({
  'lastModified': concat('2020-01-', lpad((1 + doc_id % 28)::VARCHAR, 2, '0')),
  'pageCount': (doc_id % 50)::INT,
  'authorInfo': {'firstName': concat('fn', (doc_id % 9)::VARCHAR),
                 'lastName':  concat('ln', (doc_id % 7)::VARCHAR)},
  'tagList': list_transform(generate_series(1, (1 + doc_id % 2)::INT),
               i -> {'tagName': concat('t', i::VARCHAR),
                     'tagValue': ((doc_id + i) % 100)::INT})
}) AS doc_json
FROM documents
"""


# ------------------------------------------------------------------ J3
# taxonKey → higher-classification keys: explode the doc's taxon keys,
# broadcast-join the taxonomy dimension, re-collect. The dimension is
# synthesized from `part` (stands in for the species service; at scale:
# one bulk read of the taxonomy table, then broadcast).
_TAXA_SPARK = (
    "filter(transform(sequence(1, 3), i -> CASE WHEN pmod(doc_id + i, 4) < 2 "
    "THEN pmod(doc_id * 7 + i * 31, 200) END), x -> x IS NOT NULL)"
)
_TAXA_DUCK = (
    "list_filter(list_transform(generate_series(1, 3), i -> CASE WHEN (doc_id + i) % 4 < 2 "
    "THEN (doc_id * 7 + i * 31) % 200 END), x -> x IS NOT NULL)"
)


def taxonomy_enrich(spark, sf):
    docs = load(spark, sf, "documents").withColumn("taxa", F.expr(_TAXA_SPARK))
    part = load(spark, sf, "part")
    dim = part.select(
        F.col("p_partkey").alias("taxon_key"),
        F.pmod(F.col("p_partkey"), F.lit(7)).alias("kingdom_key"),
        F.pmod(F.col("p_partkey"), F.lit(61)).alias("phylum_key"),
        F.pmod(F.col("p_partkey"), F.lit(199)).alias("class_key"),
    )
    exploded = docs.select("doc_id", F.explode("taxa").alias("taxon_key"))
    joined = exploded.join(F.broadcast(dim), "taxon_key", "left")
    higher = F.array_sort(
        F.array_distinct(
            F.flatten(
                F.collect_list(
                    F.array("kingdom_key", "phylum_key", "class_key")
                )
            )
        )
    )
    return joined.groupBy("doc_id").agg(
        F.array_join(
            F.transform(higher, lambda x: x.cast("string")), ","
        ).alias("higher_taxon_keys"),
        F.count("taxon_key").alias("n_taxa"),
    )


TAXONOMY_SQL = f"""
WITH e AS (
  SELECT doc_id, unnest({_TAXA_DUCK}) AS taxon_key FROM documents
), j AS (
  SELECT doc_id, taxon_key,
         p_partkey % 7 AS kingdom_key, p_partkey % 61 AS phylum_key,
         p_partkey % 199 AS class_key
  FROM e LEFT JOIN part ON taxon_key = p_partkey
)
SELECT doc_id,
  coalesce(array_to_string(list_sort(list_distinct(
    flatten(list(CASE WHEN kingdom_key IS NULL THEN [] ELSE [kingdom_key, phylum_key, class_key] END)))), ','), '') AS higher_taxon_keys,
  count(taxon_key) AS n_taxa
FROM j GROUP BY doc_id
"""


# ----------------------------------------------------- localized maps
# locale→value map + extra overflow map (dynamic-template analogue):
# resolve with en → de → any fallback; report sorted locale inventory
def localized_fields(spark, sf):
    docs = load(spark, sf, "documents")
    title_map = F.map_filter(
        F.create_map(
            F.lit("en"),
            F.concat(F.lit("title-"), F.col("doc_id").cast("string")),
            F.lit("de"),
            F.when(
                F.col("doc_id") % 2 == 0,
                F.concat(F.lit("titel-"), F.col("doc_id").cast("string")),
            ),
            F.lit("fr"),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(F.lit("titre-"), F.col("doc_id").cast("string")),
            ),
        ),
        lambda k, v: v.isNotNull(),
    )
    extra = F.map_filter(
        F.create_map(
            F.lit("x_flag"),
            F.when(F.col("doc_id") % 5 == 0, F.lit("on")),
        ),
        lambda k, v: v.isNotNull(),
    )
    df = docs.select("doc_id", title_map.alias("title_loc"), extra.alias("extra"))
    label = F.coalesce(
        F.element_at("title_loc", F.lit("en")), F.element_at("title_loc", F.lit("de"))
    )
    return df.select(
        "doc_id",
        label.alias("label"),
        F.size("title_loc").alias("n_locales"),
        F.array_join(F.array_sort(F.map_keys("title_loc")), ",").alias("locales"),
        F.coalesce(F.element_at("extra", F.lit("x_flag")), F.lit("")).alias("x_flag"),
    )


LOCALIZED_SQL = """
WITH m AS (
  SELECT doc_id,
         map_from_entries(list_filter([
           {'k': 'en', 'v': concat('title-', doc_id::VARCHAR)},
           {'k': 'de', 'v': CASE WHEN doc_id % 2 = 0 THEN concat('titel-', doc_id::VARCHAR) END},
           {'k': 'fr', 'v': CASE WHEN doc_id % 3 = 0 THEN concat('titre-', doc_id::VARCHAR) END}
         ], e -> e.v IS NOT NULL)) AS title_loc,
         CASE WHEN doc_id % 5 = 0 THEN 'on' ELSE '' END AS x_flag
  FROM documents
)
SELECT doc_id,
       coalesce(element_at(title_loc, 'en')[1], element_at(title_loc, 'de')[1]) AS label,
       cardinality(title_loc) AS n_locales,
       array_to_string(list_sort(map_keys(title_loc)), ',') AS locales,
       x_flag
FROM m
"""


QUERIES = {
    "nested_rename": nested_rename,
    "taxonomy_enrich": taxonomy_enrich,
    "localized_fields": localized_fields,
}

ORACLES = {
    "nested_rename": NESTED_RENAME_SQL,
    "taxonomy_enrich": TAXONOMY_SQL,
    "localized_fields": LOCALIZED_SQL,
}
