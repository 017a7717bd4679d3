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

from . import load, load_spread

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
    # plain load, no spread: a single md5 + one partial-agg pass gains
    # nothing from a pre-shuffle and measurably loses (r2 VERDICT #7:
    # the load_spread repartition quadrupled this query's time). Spread
    # stays reserved for multi-pass pipelines (shingling, LSH).
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


# --- MinHash signatures + LSH banding. 16 hashes in 8 bands of 2: the
# signature is computed ONCE (one explode→distinct→hash-agg pass) and
# all band buckets are emitted from it in a single explode(array(...))
# projection — no per-band unions, so the upstream is never re-executed.
_N_HASHES = 16
_N_BANDS = 8
_ROWS_PER_BAND = _N_HASHES // _N_BANDS


def _minhash_sig(spark, sf):
    # keyed spread: the only shuffle in the signature pass is one
    # exchange of compact document rows; the doc_id aggregation below
    # then runs exchange-free (guide §2.4). The former
    # ``.distinct()`` on (doc_id, shingle) is dropped outright:
    # ``min`` is duplicate-insensitive, so the per-doc minima are
    # identical with or without it — and it planned as TWO
    # SortAggregates around a full exchange of raw shingle strings
    # (the dominant cost of this query at sf1.0, see
    # OPTIMIZATION_r06.md).
    docs = load_spread(spark, sf, "documents", key="doc_id")
    sh = docs.select("doc_id", F.explode(F.expr(_SHINGLES_SPARK)).alias("shingle"))
    # (A distinct-shingle dictionary join was tried here in round 6 —
    # hash each distinct shingle once, attach by join — but the static
    # planner broadcasts whichever side the 5.7MB file-size estimate
    # says is smaller, i.e. the multi-million-row occurrence stream,
    # and the honest fix, forcing a broadcast of a corpus-derived
    # dictionary, does not hold at 100 TB. Hashing per occurrence into
    # a doc_id-clustered single-exchange aggregation is the shape that
    # scales; measured 2.6s vs 8.2s for the join form at sf1.0.)
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}|"), F.col("shingle")))).alias(f"mh{i}")
        for i in range(_N_HASHES)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def _band_buckets(sig):
    """(doc_id, band, bucket) — one row per band, emitted in one pass."""
    entries = F.array(
        *[
            F.struct(
                F.lit(b).cast("int").alias("band"),
                F.md5(
                    F.concat(
                        *[F.col(f"mh{_ROWS_PER_BAND * b + r}") for r in range(_ROWS_PER_BAND)]
                    )
                ).alias("bucket"),
            )
            for b in range(_N_BANDS)
        ]
    )
    return sig.select("doc_id", F.explode(entries).alias("e")).select(
        "doc_id", "e.band", "e.bucket"
    )


_SIG_DUCK = f"""
sh AS (
  SELECT DISTINCT doc_id, shingle
  FROM (SELECT doc_id, unnest({_SHINGLES_DUCK}) AS shingle FROM documents)
), sig AS (
  SELECT doc_id,
         {", ".join(f"min(md5(concat('{i}|', shingle))) AS mh{i}" for i in range(_N_HASHES))}
  FROM sh GROUP BY doc_id
), bands AS (
  {" UNION ALL ".join(
      f"SELECT doc_id, {b}::INT AS band, md5(concat("
      + ", ".join(f"mh{_ROWS_PER_BAND * b + r}" for r in range(_ROWS_PER_BAND))
      + ")) AS bucket FROM sig"
      for b in range(_N_BANDS)
  )}
)
"""


def minhash_lsh_buckets(spark, sf):
    allb = _band_buckets(_minhash_sig(spark, sf))
    return (
        allb.groupBy("band", "bucket")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("min_doc"))
        .filter(F.col("n_docs") >= 1)
    )


MINHASH_SQL = f"""
WITH {_SIG_DUCK}
SELECT band, bucket, count(*) AS n_docs, min(doc_id) AS min_doc
FROM bands GROUP BY band, bucket HAVING count(*) >= 1
"""


# --- SimHash (64-bit, classic Charikar ±1 bit weights) from token
# md5s. 64 bits = two 32-bit halves so each half stays comfortably
# inside a signed BIGINT in both engines: bits 0-31 from md5(t), bits
# 32-63 from md5('s|' || t). One explode + one hash-agg pass — and the
# per-token work is 2 md5s + 2 hex parses + 64 integer shift/mask ops
# (whole-stage-codegen ints), not 64 substring/instr string ops: bit b
# contributes +1 if set else -1, and the doc bit is set iff the sum is
# positive, i.e. iff popcount_b(tokens) > n_tokens/2.
def _simhash_sig(spark, sf):
    """64-bit signature DF (doc_id, simhash_lo, simhash_hi) — shared by
    the simhash gate and the Hamming near-dup/top-k operators."""
    # keyed spread (guide §2.4): HashPartitioning(doc_id) satisfies the
    # clustered distribution of BOTH the (doc_id, t) distinct and the
    # doc_id aggregation below, so the whole signature chain runs on a
    # single exchange of compact document rows — the former plan
    # shuffled exploded token rows twice (distinct + agg).
    docs = load_spread(spark, sf, "documents", key="doc_id")
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("t")).distinct()
    # parse the top 8 hex chars of each md5 into a 32-bit int once;
    # every bit weight is then a shift+mask on that int
    tok = tok.select(
        "doc_id",
        F.expr("cast(conv(substring(md5(t), 1, 8), 16, 10) as bigint)").alias("v1"),
        F.expr(
            "cast(conv(substring(md5(concat('s|', t)), 1, 8), 16, 10) as bigint)"
        ).alias("v2"),
    )
    agg = [F.count(F.lit(1)).alias("n")]
    for b in range(32):
        agg.append(F.expr(f"sum((v1 >> {b}) & 1)").alias(f"c{b}"))
        agg.append(F.expr(f"sum((v2 >> {b}) & 1)").alias(f"d{b}"))
    sums = tok.groupBy("doc_id").agg(*agg)
    lo = " + ".join(f"(CASE WHEN 2*c{b} > n THEN {1 << b} ELSE 0 END)" for b in range(32))
    hi = " + ".join(f"(CASE WHEN 2*d{b} > n THEN {1 << b} ELSE 0 END)" for b in range(32))
    return sums.select(
        "doc_id",
        F.expr(f"cast({lo} as bigint)").alias("simhash_lo"),
        F.expr(f"cast({hi} as bigint)").alias("simhash_hi"),
    )


def simhash(spark, sf):
    return _simhash_sig(spark, sf)


# DuckDB CTE producing sig(doc_id, simhash_lo, simhash_hi) — shared by
# SIMHASH_SQL, the Hamming near-dup oracle and the top-k oracle.
_SIG64_DUCK = f"""tok AS (
  SELECT DISTINCT doc_id,
         ('0x' || substring(md5(t), 1, 8))::BIGINT AS v1,
         ('0x' || substring(md5(concat('s|', t)), 1, 8))::BIGINT AS v2
  FROM (SELECT doc_id, unnest(str_split(text, ' ')) AS t FROM documents)
), sums AS (
  SELECT doc_id, count(*) AS n,
         {", ".join(f"sum((v1 >> {b}) & 1) AS c{b}" for b in range(32))},
         {", ".join(f"sum((v2 >> {b}) & 1) AS d{b}" for b in range(32))}
  FROM tok GROUP BY doc_id
), sig AS (
  SELECT doc_id,
       ({" + ".join(f"(CASE WHEN 2*c{b} > n THEN {1 << b} ELSE 0 END)" for b in range(32))})::BIGINT AS simhash_lo,
       ({" + ".join(f"(CASE WHEN 2*d{b} > n THEN {1 << b} ELSE 0 END)" for b in range(32))})::BIGINT AS simhash_hi
  FROM sums
)"""

SIMHASH_SQL = f"""
WITH {_SIG64_DUCK}
SELECT doc_id, simhash_lo, simhash_hi FROM sig
"""


# --- 64-bit Hamming near-dup join (the image-pHash dedup primitive,
# re-expressed over any 64-bit perceptual/similarity hash carried as
# two 32-bit halves so the values stay portable to DuckDB BIGINTs —
# the engine's real DCT pHash, engine.py images.phash, splits into the
# same halves via split_phash64). Candidates come from 4 x 16-bit band
# buckets: by pigeonhole, any pair within Hamming distance tau <= 3
# agrees exactly on at least one band, so banding is EXACT (recall
# 1.0) for tau <= 3 while never scoring a global cross join. At 10^10
# images the per-band self-join is keyed on (band, bucket) — the same
# bounded-bucket shape as MinHash banding.
_HAM_TAU = 3


def split_phash64(df, phash_col: str, lo: str = "phash_lo", hi: str = "phash_hi"):
    """Split a signed int64 pHash column into two unsigned-32-bit-in-
    BIGINT halves (the portable representation hamming_near_dup takes)."""
    return df.withColumn(lo, F.expr(f"{phash_col} & 4294967295")).withColumn(
        hi, F.expr(f"({phash_col} >> 32) & 4294967295")
    )


def hamming_near_dup(
    sig, id_col: str, lo_col: str, hi_col: str, tau: int = _HAM_TAU, n_bands: int | None = None
):
    """All pairs with popcount(xor) <= tau over a 64-bit hash in two
    32-bit halves. By pigeonhole, banding into n_bands equal slices is
    EXACT (recall 1.0) whenever tau <= n_bands - 1 — the default picks
    the smallest band count that keeps that guarantee (tau+1, rounded
    up to a divisor of 32 so no band spans the lo/hi boundary: 4, 8,
    16 or 32 bands of 16/8/4/2 bits). More bands = more candidate rows
    but smaller buckets; for tau <= 3 the classic 4x16-bit layout wins.

    Scale note: band width w gives 2^w distinct buckets, so expected
    bucket size is n/2^w and the per-band self-join costs ~n^2/2^w
    comparisons. At 16-bit bands (tau<=3) that is n^2/65536 — fine at
    10^10 with the (band,bucket)-keyed shuffle; at 2-bit bands
    (tau>15) banding degenerates toward a cross join. Perceptual-hash
    near-dup thresholds in practice are tau<=10 (<=16 bands)."""
    # FIRST-BAND emission (round 6): a near-dup pair agrees on one or
    # more bands and the former plan emitted it once per agreeing band,
    # relying on a full .distinct() exchange of the output to dedupe
    # (36M pre-distinct rows for 9M pairs at sf1.0 — a duplicate-heavy
    # corpus agrees on ALL bands for its exact-dup clusters). Instead,
    # emit each pair only from its MINIMAL agreeing band: the join
    # additionally requires bucket_{b'}(a) != bucket_{b'}(b) for every
    # band b' below the joined band. Exactly one minimal band exists
    # per qualifying pair, so the output is duplicate-free by
    # construction and the distinct (an exchange of the whole result)
    # is dropped. Identical pair set, identical hamming values.
    bb = _ham_band_explode(sig, id_col, lo_col, hi_col, tau, n_bands)
    a, b = bb.alias("a"), bb.alias("b")
    ham = F.expr(
        f"bit_count(a.{lo_col} ^ b.{lo_col}) + bit_count(a.{hi_col} ^ b.{hi_col})"
    )
    first_band = _ham_first_band_cond(lo_col, hi_col, tau, n_bands)
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .filter(first_band)
        .select(
            F.col(f"a.{id_col}").alias("left_id"),
            F.col(f"b.{id_col}").alias("right_id"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= tau)
    )


def _ham_bands_for(tau: int, n_bands: int | None) -> int:
    if n_bands is None:
        n_bands = next(nb for nb in (4, 8, 16, 32) if nb - 1 >= tau or nb == 32)
    return n_bands


def _ham_first_band_cond(lo_col: str, hi_col: str, tau: int, n_bands: int | None):
    """Predicate: the joined band is the MINIMAL band on which the two
    signatures agree — for every band b' strictly below the join row's
    band, the b' buckets differ. Pure int shift/mask comparisons on
    columns both join sides already carry."""
    n_bands = _ham_bands_for(tau, n_bands)
    width = 64 // n_bands
    mask = (1 << width) - 1
    conds = []
    for bp, off in enumerate(range(0, 64, width)):
        src = lo_col if off < 32 else hi_col
        sh = off % 32
        conds.append(
            f"(band <= {bp} OR ((a.{src} >> {sh}) & {mask}) != "
            f"((b.{src} >> {sh}) & {mask}))"
        )
    return F.expr(" AND ".join(conds))


def _ham_band_explode(sig, id_col, lo_col, hi_col, tau, n_bands):
    """(id, lo, hi) → one row per (band, bucket) slice, pigeonhole-exact
    band layout shared by the self-join and delta variants."""
    n_bands = _ham_bands_for(tau, n_bands)
    assert n_bands in (4, 8, 16, 32), "band width must divide 32"
    assert tau <= n_bands - 1, f"banding not exact: tau={tau} needs >= {tau + 1} bands"
    width = 64 // n_bands
    mask = (1 << width) - 1
    parts = [
        F.struct(
            F.lit(b).alias("band"),
            F.expr(f"({lo_col if off < 32 else hi_col} >> {off % 32}) & {mask}").alias(
                "bucket"
            ),
        )
        for b, off in enumerate(range(0, 64, width))
    ]
    return sig.select(
        F.col(id_col), F.col(lo_col), F.col(hi_col), F.explode(F.array(*parts)).alias("bb")
    ).select(id_col, lo_col, hi_col, "bb.band", "bb.bucket")


def hamming_near_dup_delta(
    sig_delta,
    sig_full,
    id_col: str,
    lo_col: str,
    hi_col: str,
    tau: int = _HAM_TAU,
    n_bands: int | None = None,
):
    """The NEW near-dup pairs created by appending ``sig_delta`` rows to
    a corpus whose full signature set (old rows PLUS the delta) is
    ``sig_full``: every pair with popcount(xor) <= tau and at least one
    delta endpoint, each exactly once as (left_id < right_id). Because
    the corpus is append-only and signatures immutable,
    pairs(full) = pairs(old) ∪ this — the incremental maintenance
    identity behind CrawlEngine.publish_dedup(incremental=True).

    Same pigeonhole-exact banding as hamming_near_dup, but the join is
    delta × full instead of full × full: cost ~|delta|·n/2^w per band,
    O(delta) for a bounded round delta no matter how large the table.
    A delta-delta pair is produced from both sides of the join, so
    pairs are normalized with least/greatest before the distinct."""
    da = _ham_band_explode(sig_delta, id_col, lo_col, hi_col, tau, n_bands).alias("a")
    fb = _ham_band_explode(sig_full, id_col, lo_col, hi_col, tau, n_bands).alias("b")
    ham = F.expr(
        f"bit_count(a.{lo_col} ^ b.{lo_col}) + bit_count(a.{hi_col} ^ b.{hi_col})"
    )
    l, r = F.col(f"a.{id_col}"), F.col(f"b.{id_col}")
    return (
        da.join(fb, ["band", "bucket"])
        .filter(l != r)
        .filter(ham <= tau)
        .select(
            F.least(l, r).alias("left_id"),
            F.greatest(l, r).alias("right_id"),
            ham.alias("hamming"),
        )
        .distinct()  # band collisions + both-delta double emission
    )


def phash_hamming_near_dup(spark, sf):
    """Gate: Hamming near-dup over the deterministic 64-bit document
    signature (the text stand-in for image pHash — same int domain,
    same banding; the oracle brute-forces all pairs, the Spark side
    must reach identical recall through the buckets).

    The signature relation is cached: the band self-join reads it on
    both sides, and without a cache the 65-aggregate signature pass
    runs twice (measured 21s -> ~2s at sf0.1). In production the
    signatures ARE a table (computed once per corpus, like the engine's
    images.phash column), so one-pass semantics is also the honest
    scale model. Rows are 3 BIGINTs each — negligible cache footprint."""
    sig = _simhash_sig(spark, sf).cache()
    return hamming_near_dup(sig, "doc_id", "simhash_lo", "simhash_hi")


HAMMING_NEAR_DUP_SQL = f"""
WITH {_SIG64_DUCK}
SELECT a.doc_id AS left_id, b.doc_id AS right_id,
       bit_count(xor(a.simhash_lo, b.simhash_lo))
       + bit_count(xor(a.simhash_hi, b.simhash_hi)) AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash_lo, b.simhash_lo))
      + bit_count(xor(a.simhash_hi, b.simhash_hi)) <= {_HAM_TAU}
"""


# --- n-gram Jaccard verify over LSH candidate pairs. This is the real
# near-dup pipeline end to end: candidates are generated WITHIN MinHash
# band buckets (a self-join keyed on (band, bucket), never all-pairs),
# deduped across bands, then verified with exact shingle Jaccard. At
# 100 TB the candidate join is bounded by bucket sizes (b·r tuned so
# buckets stay small), and the verify join touches only candidates.
def ngram_jaccard_pairs(spark, sf):
    docs = load_spread(spark, sf, "documents").select(
        "doc_id", F.array_distinct(F.expr(_SHINGLES_SPARK)).alias("sh")
    )
    allb = _band_buckets(_minhash_sig(spark, sf))
    a, b = allb.alias("a"), allb.alias("b")
    cand = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("left_id"), F.col("b.doc_id").alias("right_id")
        )
        .distinct()
    )
    joined = cand.join(
        docs.select(F.col("doc_id").alias("left_id"), F.col("sh").alias("sh_a")),
        "left_id",
    ).join(
        docs.select(F.col("doc_id").alias("right_id"), F.col("sh").alias("sh_b")),
        "right_id",
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    un = F.size(F.array_union("sh_a", "sh_b"))
    return joined.select(
        "left_id", "right_id", F.round(inter / un, 4).alias("jaccard")
    )


JACCARD_SQL = f"""
WITH {_SIG_DUCK},
cand AS (
  SELECT DISTINCT a.doc_id AS left_id, b.doc_id AS right_id
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
),
d AS (SELECT doc_id, list_distinct({_SHINGLES_DUCK}) AS sh FROM documents)
SELECT left_id, right_id,
       round(len(list_intersect(a.sh, b.sh))::DOUBLE / len(list_distinct(a.sh || b.sh)), 4) AS jaccard
FROM cand JOIN d a ON left_id = a.doc_id JOIN d b ON right_id = b.doc_id
"""


# --- embedding-cosine near-dup: candidate pairs from the hyperplane
# LSH tables (similarity.py), verified by exact cosine >= threshold,
# then reduced to a keeper mapping (keeper = min id among a doc's
# near-dup neighborhood ∪ itself — one agg, no iterative connected
# components; at corpus scale the same map is applied per-bucket).
_COS_THRESHOLD = 0.35


def embedding_near_dup(spark, sf):
    from .similarity import _bucket_entries, _cosine_fn

    emb = load_spread(spark, sf, "embeddings")
    # cached: the band self-join consumes the bucket relation on BOTH
    # sides, and without a cache the Arrow bucket-hash pass runs twice.
    # In production the buckets ARE a table (computed once per corpus),
    # so one-pass semantics is also the honest scale model — same
    # reasoning as phash_hamming_near_dup's cached signature relation.
    entries = _bucket_entries(emb).cache()
    a, b = entries.alias("a"), entries.alias("b")
    cand = (
        a.join(b, ["tbl", "bucket"])
        .filter(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(F.col("a.vec_id").alias("l"), F.col("b.vec_id").alias("r"))
        .distinct()
    )
    vl = emb.select(F.col("vec_id").alias("l"), F.col("embedding").alias("lv"))
    vr = emb.select(F.col("vec_id").alias("r"), F.col("embedding").alias("rv"))
    # Arrow-vectorized cosine (bit-identical to the expression-form
    # fold — see similarity._cosine_fn); per-plan UDF creation
    cos_udf = F.pandas_udf(_cosine_fn, "double")
    pairs = (
        cand.join(vl, "l")
        .join(vr, "r")
        .select(
            "l",
            "r",
            F.round(cos_udf(F.col("lv"), F.col("rv")), 4).alias("cosine"),
        )
        .filter(F.col("cosine") >= _COS_THRESHOLD)
    )
    edges = pairs.select(F.col("l").alias("v"), F.col("r").alias("o")).unionByName(
        pairs.select(F.col("r").alias("v"), F.col("l").alias("o"))
    )
    return (
        edges.groupBy("v")
        .agg(F.min("o").alias("mo"), F.count("*").alias("n_dups"))
        .select(
            F.col("v").alias("vec_id"),
            F.least(F.col("mo"), F.col("v")).alias("keeper_id"),
            "n_dups",
        )
    )


def _pair_dot(a: str, b: str, dim: int = 64) -> str:
    """Explicit left-fold dot product (SQL + is left-associative — the
    same IEEE accumulation order as the Spark fold; the lambda/
    generate_series form was the oracle's hot spot at gate scale)."""
    return " + ".join(f"{a}[{i}]::DOUBLE * {b}[{i}]::DOUBLE" for i in range(1, dim + 1))


def _near_dup_sql() -> str:
    from .similarity import _BUCKETS_DUCK

    return f"""
WITH entries AS ({_BUCKETS_DUCK}),
cand AS (
  SELECT DISTINCT a.vec_id AS l, b.vec_id AS r
  FROM entries a JOIN entries b
    ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id < b.vec_id
),
scored AS (
  SELECT l, r,
         round(
           ({_pair_dot("x.embedding", "y.embedding")})
           / (sqrt(list_sum(list_transform(x.embedding, v -> v::DOUBLE * v::DOUBLE)))
              * sqrt(list_sum(list_transform(y.embedding, v -> v::DOUBLE * v::DOUBLE)))), 4) AS cosine
  FROM cand JOIN embeddings x ON l = x.vec_id JOIN embeddings y ON r = y.vec_id
),
pairs AS (SELECT l, r FROM scored WHERE cosine >= {_COS_THRESHOLD}),
edges AS (SELECT l AS v, r AS o FROM pairs UNION ALL SELECT r AS v, l AS o FROM pairs)
SELECT v AS vec_id, least(min(o), v) AS keeper_id, count(*) AS n_dups
FROM edges GROUP BY v
"""


QUERIES = {
    "dedup_exact": dedup_exact,
    "minhash_lsh_buckets": minhash_lsh_buckets,
    "simhash": simhash,
    "phash_hamming_near_dup": phash_hamming_near_dup,
    "ngram_jaccard_pairs": ngram_jaccard_pairs,
    "embedding_near_dup": embedding_near_dup,
}

ORACLES = {
    "dedup_exact": EXACT_SQL,
    "minhash_lsh_buckets": MINHASH_SQL,
    "simhash": SIMHASH_SQL,
    "phash_hamming_near_dup": HAMMING_NEAR_DUP_SQL,
    "ngram_jaccard_pairs": JACCARD_SQL,
    "embedding_near_dup": _near_dup_sql(),
}
