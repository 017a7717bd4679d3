"""The reference's PUBLISHED query surface, re-expressed as DataFrame
queries over the materialized documents table. These are the searches
the reference's index must answer (SURVEY.md §5 "manual query probes"):

* date-range on the assembled ``created`` date
  (src/main/resources/mendeley_query_examples.txt:1-13)
* completion-suggest prefix top-k on ``title`` (:15-27)
* nested filter on ``authors.last_name`` (array-of-structs) (:41-57)
* match + bool/term text query
  (src/main/resources/data_use_query_examples.txt:3-21)

Fixture columns (created date parts, title, authors) are synthesized
deterministically from doc_id with identical Spark/DuckDB expressions,
like the tag fixture in docpipe. All plans are scan + filter + small
agg — at 100 TB each is one pushdown-pruned pass over the table.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import load

# --- deterministic fixture expressions -------------------------------
# date parts: year 2012-2017, month 1-12, day 1-31; the assembly below
# clamps overflow days by arithmetic carry, exactly the reference's
# createdAt tolerance (ElasticSearchIndexHandler.java:440-457)
_CREATED_SPARK = (
    "date_add(make_date(2012 + pmod(doc_id div 7, 6), 1 + pmod(doc_id, 12), 1), "
    "cast(pmod(doc_id, 31) as int))"
)
_CREATED_DUCK = (
    "make_date((2012 + (doc_id // 7) % 6)::INT, (1 + doc_id % 12)::INT, 1) "
    "+ ((doc_id % 31)::INT) * INTERVAL 1 DAY"
)

_FIRSTS = ["Ada", "Carl", "Emmy", "Alan"]
_LASTS = ["Smith", "Guralnick", "Curie", "Turing", "Noether"]

_AUTHORS_SPARK = f"""
transform(sequence(1, 1 + cast(pmod(doc_id, 3) as int)), i -> named_struct(
  'first_name', element_at(array({", ".join(repr(n) for n in _FIRSTS)}), cast(pmod(doc_id * 7 + i * 13, {len(_FIRSTS)}) + 1 as int)),
  'last_name',  element_at(array({", ".join(repr(n) for n in _LASTS)}), cast(pmod(doc_id * 11 + i * 17, {len(_LASTS)}) + 1 as int))))
"""
_AUTHORS_DUCK = f"""
list_transform(generate_series(1, (1 + doc_id % 3)::INT), i -> {{
  'first_name': [{", ".join(repr(n) for n in _FIRSTS)}][((doc_id * 7 + i * 13) % {len(_FIRSTS)})::INT + 1],
  'last_name':  [{", ".join(repr(n) for n in _LASTS)}][((doc_id * 11 + i * 17) % {len(_LASTS)})::INT + 1]}})
"""


# --- range query on created (ES: range gte 2014/10 lte 2015/02) ------
def date_range_created(spark, sf):
    docs = load(spark, sf, "documents").withColumn(
        "created", F.expr(_CREATED_SPARK)
    )
    return (
        docs.filter(
            (F.col("created") >= F.lit("2014-10-01"))
            & (F.col("created") < F.lit("2015-03-01"))
        )
        .select("doc_id", F.date_format("created", "yyyy-MM-dd").alias("created_at"))
    )


DATE_RANGE_SQL = f"""
SELECT doc_id, strftime(created, '%Y-%m-%d') AS created_at
FROM (SELECT doc_id, {_CREATED_DUCK} AS created FROM documents)
WHERE created >= DATE '2014-10-01' AND created < DATE '2015-03-01'
"""


# --- completion suggest: prefix top-k on title ------------------------
# title = first three words of the document text; suggestions = the 10
# lexicographically-first distinct titles matching the prefix (the ES
# completion suggester returns deduped, ordered suggestions)
_PREFIX = "ke"


def title_prefix_suggest(spark, sf):
    docs = load(spark, sf, "documents").withColumn(
        "title", F.concat_ws(" ", F.slice(F.split("text", " "), 1, 3))
    )
    return (
        docs.filter(F.col("title").startswith(_PREFIX))
        .groupBy("title")
        .agg(F.min("doc_id").alias("first_doc"), F.count("*").alias("n_docs"))
        .orderBy("title")
        .limit(10)
    )


PREFIX_SQL = f"""
SELECT title, min(doc_id) AS first_doc, count(*) AS n_docs
FROM (SELECT doc_id, array_to_string(str_split(text, ' ')[1:3], ' ') AS title FROM documents)
WHERE title LIKE '{_PREFIX}%'
GROUP BY title ORDER BY title LIMIT 10
"""


# --- nested query: filter on authors.last_name ------------------------
def nested_author_filter(spark, sf):
    docs = load(spark, sf, "documents").withColumn(
        "authors", F.expr(_AUTHORS_SPARK)
    )
    hit = F.exists("authors", lambda a: a["last_name"] == F.lit("Guralnick"))
    matched_firsts = F.array_join(
        F.array_sort(
            F.transform(
                F.filter("authors", lambda a: a["last_name"] == F.lit("Guralnick")),
                lambda a: a["first_name"],
            )
        ),
        ",",
    )
    return docs.filter(hit).select(
        "doc_id",
        F.size("authors").alias("n_authors"),
        matched_firsts.alias("matched_first_names"),
    )


NESTED_AUTHOR_SQL = f"""
SELECT doc_id, len(authors) AS n_authors,
       coalesce(array_to_string(list_sort(list_transform(
         list_filter(authors, a -> a['last_name'] = 'Guralnick'),
         a -> a['first_name'])), ','), '') AS matched_first_names
FROM (SELECT doc_id, {_AUTHORS_DUCK} AS authors FROM documents)
WHERE len(list_filter(authors, a -> a['last_name'] = 'Guralnick')) > 0
"""


# --- match + bool/term query ------------------------------------------
# tokenized match on text ("scan") AND term filter (source = 'src3');
# tf = naive term frequency, the match score analogue
def match_bool_query(spark, sf):
    docs = load(spark, sf, "documents")
    tf = F.size(F.filter(F.split("text", " "), lambda t: t == F.lit("scan")))
    return (
        docs.withColumn("tf", tf)
        .filter((F.col("tf") > 0) & (F.col("source") == "src3"))
        .select("doc_id", "source", "tf")
    )


MATCH_BOOL_SQL = """
SELECT doc_id, source, tf FROM (
  SELECT doc_id, source,
         len(list_filter(str_split(text, ' '), t -> t = 'scan')) AS tf
  FROM documents
) WHERE tf > 0 AND source = 'src3'
"""


QUERIES = {
    "date_range_created": date_range_created,
    "title_prefix_suggest": title_prefix_suggest,
    "nested_author_filter": nested_author_filter,
    "match_bool_query": match_bool_query,
}

ORACLES = {
    "date_range_created": DATE_RANGE_SQL,
    "title_prefix_suggest": PREFIX_SQL,
    "nested_author_filter": NESTED_AUTHOR_SQL,
    "match_bool_query": MATCH_BOOL_SQL,
}
