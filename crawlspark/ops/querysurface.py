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


# --- geo bounding-box + distance (geo_point mapping) -------------------
# The reference maps Contentful `Location` fields to an ES `geo_point`
# (MappingGenerator.java:82-91) — the one §1.2 type with no analogue
# here until now. The reference performs no geo computation itself, so
# this closes the TYPE mapping with the two standard queries a
# geo_point index serves: bounding-box filter and haversine distance.
# lat/lon derive deterministically from doc_id like the other fixture
# columns; the Spark side materializes them as a (lat, lon) STRUCT —
# the geo_point shape — and filters/projects through the struct. At
# 100 TB this is one pushdown-pruned scan; a real deployment would
# range-partition or Z-order on (lat, lon) so the bbox prunes files.
# explicit double casts: Spark parses the 100.0 literal as DECIMAL, and
# bigint/decimal arithmetic would surface DECIMAL lat/lon to the gate
_LAT_SPARK = "cast(pmod(doc_id * 7919, 18000) as double) / 100.0 - 90.0"
_LON_SPARK = "cast(pmod(doc_id * 104729, 36000) as double) / 100.0 - 180.0"
_LAT_DUCK = "(doc_id * 7919) % 18000 / 100.0 - 90.0"
_LON_DUCK = "(doc_id * 104729) % 36000 / 100.0 - 180.0"
_BBOX = (-25.0, 25.0, 10.0, 80.0)  # lat_min, lat_max, lon_min, lon_max
_CENTER = (0.0, 45.0)  # haversine reference point (lat, lon)


def _haversine(lat: str, lon: str, lat0: float, lon0: float) -> str:
    """Great-circle km, IDENTICAL expression text for Spark and DuckDB
    (both expose radians/sin/cos/asin/sqrt/pow with these semantics);
    rounded to 3 decimals so the driver's 6-decimal float canon can
    never straddle a libm 1-ulp difference."""
    return (
        f"round(2 * 6371.0088 * asin(sqrt("
        f"pow(sin(radians(({lat}) - ({lat0})) / 2), 2) + "
        f"cos(radians({lat})) * cos(radians({lat0})) * "
        f"pow(sin(radians(({lon}) - ({lon0})) / 2), 2))), 3)"
    )


def geo_bbox_filter(spark, sf):
    lat0, lon0 = _CENTER
    docs = load(spark, sf, "documents").withColumn(
        "location",
        F.struct(
            F.expr(_LAT_SPARK).alias("lat"), F.expr(_LON_SPARK).alias("lon")
        ),
    )
    return docs.filter(
        F.col("location.lat").between(_BBOX[0], _BBOX[1])
        & F.col("location.lon").between(_BBOX[2], _BBOX[3])
    ).select(
        "doc_id",
        F.col("location.lat").alias("lat"),
        F.col("location.lon").alias("lon"),
        F.expr(_haversine("location.lat", "location.lon", lat0, lon0)).alias(
            "dist_km"
        ),
    )


GEO_BBOX_SQL = f"""
SELECT doc_id, lat, lon,
       {_haversine("lat", "lon", _CENTER[0], _CENTER[1])} AS dist_km
FROM (SELECT doc_id, {_LAT_DUCK} AS lat, {_LON_DUCK} AS lon FROM documents)
WHERE lat BETWEEN {_BBOX[0]} AND {_BBOX[1]}
  AND lon BETWEEN {_BBOX[2]} AND {_BBOX[3]}
"""


QUERIES = {
    "date_range_created": date_range_created,
    "title_prefix_suggest": title_prefix_suggest,
    "nested_author_filter": nested_author_filter,
    "match_bool_query": match_bool_query,
    "geo_bbox_filter": geo_bbox_filter,
}

ORACLES = {
    "date_range_created": DATE_RANGE_SQL,
    "title_prefix_suggest": PREFIX_SQL,
    "nested_author_filter": NESTED_AUTHOR_SQL,
    "match_bool_query": MATCH_BOOL_SQL,
    "geo_bbox_filter": GEO_BBOX_SQL,
}
