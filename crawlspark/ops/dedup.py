"""Training-data deduplication operators over the ``documents`` table:
exact hash dedup, MinHash+LSH banding, SimHash, n-gram Jaccard.

Portable hashing: md5 hex strings (identical in Spark and DuckDB), so
every operator has an exact DuckDB oracle. At 100 TB the same plans
hold: explode→groupBy is a single shuffle keyed by shingle/band, and
candidate pairs are generated per-bucket (never a global cross join).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from . import load

# word 3-gram shingles, shared Spark/DuckDB definitions
_SHINGLES_SPARK = (
    "CASE WHEN size(split(text, ' ')) >= 3 THEN "
    "transform(sequence(1, size(split(text, ' ')) - 2), "
    "i -> concat_ws(' ', element_at(split(text, ' '), i), "
    "element_at(split(text, ' '), i + 1), element_at(split(text, ' '), i + 2))) "
    "ELSE cast(array() as array<string>) END"
)
_SHINGLES_DUCK = (
    "list_transform(generate_series(1, greatest(len(str_split(text, ' ')) - 2, 0)), "
    "i -> concat(str_split(text, ' ')[i], ' ', str_split(text, ' ')[i+1], ' ', str_split(text, ' ')[i+2]))"
)


# --- exact dedup: keep-first by content hash
# (upsert-by-id A5, ElasticSearchIndexHandler.java:213-217)
def dedup_exact(spark, sf):
    docs = load(spark, sf, "documents")
    return (
        docs.select(F.md5("text").alias("content_hash"), "doc_id")
        .groupBy("content_hash")
        .agg(F.min("doc_id").alias("keeper_id"), F.count("*").alias("n_copies"))
    )


EXACT_SQL = """
SELECT md5(text) AS content_hash, min(doc_id) AS keeper_id, count(*) AS n_copies
FROM documents GROUP BY 1
"""


# --- MinHash signatures (8 hashes) + LSH banding (4 bands of 2)
def minhash_lsh_buckets(spark, sf):
    docs = load(spark, sf, "documents")
    sh = docs.select(
        "doc_id", F.explode(F.expr(_SHINGLES_SPARK)).alias("shingle")
    ).distinct()
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}|"), F.col("shingle")))).alias(f"mh{i}")
        for i in range(8)
    ]
    sig = sh.groupBy("doc_id").agg(*aggs)
    bands = []
    for b in range(4):
        bands.append(
            sig.select(
                "doc_id",
                F.lit(b).cast("int").alias("band"),
                F.md5(F.concat(F.col(f"mh{2 * b}"), F.col(f"mh{2 * b + 1}"))).alias(
                    "bucket"
                ),
            )
        )
    allb = bands[0]
    for x in bands[1:]:
        allb = allb.unionByName(x)
    return (
        allb.groupBy("band", "bucket")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("min_doc"))
        .filter(F.col("n_docs") >= 1)
    )


MINHASH_SQL = f"""
WITH sh AS (
  SELECT DISTINCT doc_id, shingle
  FROM (SELECT doc_id, unnest({_SHINGLES_DUCK}) AS shingle FROM documents)
), sig AS (
  SELECT doc_id,
         {", ".join(f"min(md5(concat('{i}|', shingle))) AS mh{i}" for i in range(8))}
  FROM sh GROUP BY doc_id
), bands AS (
  {" UNION ALL ".join(f"SELECT doc_id, {b}::INT AS band, md5(concat(mh{2 * b}, mh{2 * b + 1})) AS bucket FROM sig" for b in range(4))}
)
SELECT band, bucket, count(*) AS n_docs, min(doc_id) AS min_doc
FROM bands GROUP BY band, bucket HAVING count(*) >= 1
"""


# --- SimHash (16-bit) from token md5 digits
def simhash(spark, sf):
    docs = load(spark, sf, "documents")
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("t")).distinct()
    tok = tok.withColumn("h", F.md5("t"))
    # digit b of the md5 → weight in [-7.5, +7.5]; bit = sum > 0
    bit_cols = []
    for b in range(16):
        w = (
            F.expr(f"instr('0123456789abcdef', substring(h, {b + 1}, 1))") - 8.5
        )
        bit_cols.append(F.sum(w).alias(f"s{b}"))
    sums = tok.groupBy("doc_id").agg(*bit_cols)
    expr = " + ".join(
        f"(CASE WHEN s{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(16)
    )
    return sums.select(
        "doc_id", F.expr(f"cast({expr} as bigint)").alias("simhash16")
    )


SIMHASH_SQL = f"""
WITH tok AS (
  SELECT DISTINCT doc_id, md5(t) AS h
  FROM (SELECT doc_id, unnest(str_split(text, ' ')) AS t FROM documents)
), sums AS (
  SELECT doc_id,
         {", ".join(f"sum(strpos('0123456789abcdef', substring(h, {b + 1}, 1)) - 8.5) AS s{b}" for b in range(16))}
  FROM tok GROUP BY doc_id
)
SELECT doc_id,
       ({" + ".join(f"(CASE WHEN s{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(16))})::BIGINT AS simhash16
FROM sums
"""


# --- n-gram Jaccard similarity on adjacent-doc pairs
def ngram_jaccard_pairs(spark, sf):
    docs = load(spark, sf, "documents").select(
        "doc_id", F.array_distinct(F.expr(_SHINGLES_SPARK)).alias("sh")
    )
    a = docs.alias("a")
    b = docs.alias("b")
    joined = a.join(b, F.col("a.doc_id") + 1 == F.col("b.doc_id"))
    inter = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
    un = F.size(F.array_union(F.col("a.sh"), F.col("b.sh")))
    return joined.select(
        F.col("a.doc_id").alias("left_id"),
        F.col("b.doc_id").alias("right_id"),
        F.round(inter / un, 4).alias("jaccard"),
    )


JACCARD_SQL = f"""
WITH d AS (SELECT doc_id, list_distinct({_SHINGLES_DUCK}) AS sh FROM documents)
SELECT a.doc_id AS left_id, b.doc_id AS right_id,
       round(len(list_intersect(a.sh, b.sh))::DOUBLE / len(list_distinct(a.sh || b.sh)), 4) AS jaccard
FROM d a JOIN d b ON a.doc_id + 1 = b.doc_id
"""


QUERIES = {
    "dedup_exact": dedup_exact,
    "minhash_lsh_buckets": minhash_lsh_buckets,
    "simhash": simhash,
    "ngram_jaccard_pairs": ngram_jaccard_pairs,
}

ORACLES = {
    "dedup_exact": EXACT_SQL,
    "minhash_lsh_buckets": MINHASH_SQL,
    "simhash": SIMHASH_SQL,
    "ngram_jaccard_pairs": JACCARD_SQL,
}
