"""Text-analysis operators for a training-data pipeline: token stats,
stopword language-ID, quality scoring, mod-p document fingerprinting.
All built-in SQL expressions (JVM-side, codegen) with DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import load_spread

# tiny per-language stopword lists (n-gram heuristic stand-in)
_STOPWORDS = {
    "en": ["the", "a", "of", "and", "to"],
    "de": ["der", "die", "das", "und", "ein"],
    "es": ["el", "la", "los", "y", "un"],
    "fr": ["le", "la", "les", "et", "un"],
    "zh": ["de5", "shi4", "he2", "yi1", "zai4"],
}
# the synthetic corpus is English-ish filler; query words double as "en"
_QUERY_WORDS = ["scan", "join", "filter", "group", "sort", "hash", "merge"]


def _arr_sql_spark(words):
    return "array(" + ", ".join(f"'{w}'" for w in words) + ")"


def _arr_sql_duck(words):
    return "[" + ", ".join(f"'{w}'" for w in words) + "]"


def token_stats(spark, sf):
    docs = load_spread(spark, sf, "documents")
    w = F.split("text", " ")
    return docs.select(
        "doc_id",
        F.size(w).alias("n_tokens"),
        F.size(F.array_distinct(w)).alias("n_distinct"),
        # sum(length(token)) == length(text) - (n_tokens - 1) exactly:
        # split(' ') partitions the string, so total chars = token chars
        # + separator count, and both sides are integers exactly
        # representable in double — bit-identical to the former
        # O(n_tokens) interpreted aggregate() fold, at O(1) per row.
        F.round(
            (F.length("text") - F.size(w) + F.lit(1)).cast("double") / F.size(w),
            4,
        ).alias("avg_token_len"),
        # BPE-ish tokenization estimate: alpha runs split into <=4-char
        # subword pieces, digits and punctuation one token each (the
        # regex shape of byte-pair pretokenizers, deterministic here).
        # (Round 6 note: summing three regexp_count calls over the
        # disjoint alternation branches is value-identical but 4x
        # SLOWER — three full regex scans per row lose to one scan that
        # materializes the match array. Measured and reverted.)
        F.size(
            F.expr(r"regexp_extract_all(text, '[a-z]{1,4}|[0-9]|[^a-z0-9 ]', 0)")
        ).alias("n_bpe_tokens"),
    )


TOKEN_SQL = """
SELECT doc_id,
       len(str_split(text, ' ')) AS n_tokens,
       len(list_distinct(str_split(text, ' '))) AS n_distinct,
       round(list_sum(list_transform(str_split(text, ' '), t -> length(t)))::DOUBLE
             / len(str_split(text, ' ')), 4) AS avg_token_len,
       len(regexp_extract_all(text, '[a-z]{1,4}|[0-9]|[^a-z0-9 ]', 0)) AS n_bpe_tokens
FROM documents
"""


# --- language ID by stopword-hit scoring with deterministic tiebreak
def langid_stopwords(spark, sf):
    docs = load_spread(spark, sf, "documents")
    w = "array_distinct(split(text, ' '))"
    scores = {
        lang: f"size(array_intersect({w}, {_arr_sql_spark(sw + _QUERY_WORDS if lang == 'en' else sw)}))"
        for lang, sw in _STOPWORDS.items()
    }
    # fixed precedence on ties: en > de > es > fr > zh
    order = ["en", "de", "es", "fr", "zh"]
    case = "CASE "
    for i, lang in enumerate(order):
        conds = [f"{scores[lang]} >= {scores[o]}" for o in order[i + 1 :]]
        conds += [f"{scores[lang]} > {scores[o]}" for o in order[:i]]
        case += f"WHEN {' AND '.join(conds) if conds else 'true'} THEN '{lang}' "
    case += "ELSE 'und' END"
    return docs.select(
        "doc_id", "lang", F.expr(case).alias("pred_lang"), F.expr(scores["en"]).alias("en_hits")
    )


def _langid_duck():
    w = "list_distinct(str_split(text, ' '))"
    scores = {
        lang: f"len(list_intersect({w}, {_arr_sql_duck(sw + _QUERY_WORDS if lang == 'en' else sw)}))"
        for lang, sw in _STOPWORDS.items()
    }
    order = ["en", "de", "es", "fr", "zh"]
    case = "CASE "
    for i, lang in enumerate(order):
        conds = [f"{scores[lang]} >= {scores[o]}" for o in order[i + 1 :]]
        conds += [f"{scores[lang]} > {scores[o]}" for o in order[:i]]
        case += f"WHEN {' AND '.join(conds) if conds else 'true'} THEN '{lang}' "
    case += "ELSE 'und' END"
    return f"SELECT doc_id, lang, {case} AS pred_lang, {scores['en']} AS en_hits FROM documents"


LANGID_SQL = _langid_duck()


# --- quality scoring: length/stopword/diversity ratios
def quality_score(spark, sf):
    docs = load_spread(spark, sf, "documents")
    w = "split(text, ' ')"
    stop = _arr_sql_spark(_STOPWORDS["en"] + _QUERY_WORDS)
    return docs.select(
        "doc_id",
        F.length("text").alias("n_chars_real"),
        F.expr(f"size({w})").alias("n_words"),
        F.round(
            F.expr(f"size(array_intersect(array_distinct({w}), {stop}))")
            / F.expr(f"size(array_distinct({w}))"),
            4,
        ).alias("stopword_ratio"),
        F.round(
            F.expr(f"size(array_distinct({w}))") / F.expr(f"size({w})"), 4
        ).alias("diversity"),
        (
            (F.length("text") >= 50)
            & (F.expr(f"size({w})") >= 10)
        ).alias("passes_quality"),
    )


QUALITY_SQL = f"""
SELECT doc_id,
       length(text) AS n_chars_real,
       len(str_split(text, ' ')) AS n_words,
       round(len(list_intersect(list_distinct(str_split(text, ' ')), {_arr_sql_duck(_STOPWORDS["en"] + _QUERY_WORDS)}))::DOUBLE
             / len(list_distinct(str_split(text, ' '))), 4) AS stopword_ratio,
       round(len(list_distinct(str_split(text, ' ')))::DOUBLE / len(str_split(text, ' ')), 4) AS diversity,
       (length(text) >= 50 AND len(str_split(text, ' ')) >= 10) AS passes_quality
FROM documents
"""


# --- mod-p fingerprinting (winnowing-style selection): keep the word
# 2-gram hashes whose first md5 hex digit is 0-3 (~25%)
def doc_fingerprint(spark, sf):
    docs = load_spread(spark, sf, "documents")
    grams = (
        "CASE WHEN size(split(text, ' ')) >= 2 THEN "
        "transform(sequence(1, size(split(text, ' ')) - 1), "
        "i -> md5(concat_ws(' ', element_at(split(text, ' '), i), element_at(split(text, ' '), i + 1)))) "
        "ELSE cast(array() as array<string>) END"
    )
    return docs.select(
        "doc_id",
        F.array_join(
            F.array_sort(
                F.array_distinct(
                    F.expr(
                        f"filter({grams}, h -> substring(h, 1, 1) in ('0','1','2','3'))"
                    )
                )
            ),
            ",",
        ).alias("fingerprints"),
    )


FINGERPRINT_SQL = """
SELECT doc_id, coalesce(fp0, '') AS fingerprints FROM (
SELECT doc_id,
       array_to_string(list_sort(list_distinct(list_filter(
         list_transform(generate_series(1, greatest(len(str_split(text, ' ')) - 1, 0)),
                        i -> md5(concat(str_split(text, ' ')[i], ' ', str_split(text, ' ')[i+1]))),
         h -> substring(h, 1, 1) IN ('0','1','2','3')))), ',') AS fp0
FROM documents
)
"""


QUERIES = {
    "token_stats": token_stats,
    "langid_stopwords": langid_stopwords,
    "quality_score": quality_score,
    "doc_fingerprint": doc_fingerprint,
}

ORACLES = {
    "token_stats": TOKEN_SQL,
    "langid_stopwords": LANGID_SQL,
    "quality_score": QUALITY_SQL,
    "doc_fingerprint": FINGERPRINT_SQL,
}


def _shingle_expr(text_col: str, n: int) -> str:
    """SQL expr: md5 hashes of the word ``n``-grams of ``text_col``
    (single-space tokenization, matching the corpus convention used by
    doc_fingerprint above). md5 keeps the shingle relation thin (32
    bytes vs up-to-n-word strings) AND portable to the DuckDB oracle,
    unlike xxhash64."""
    toks = f"split({text_col}, ' ')"
    return (
        f"CASE WHEN size({toks}) >= {n} THEN "
        f"transform(sequence(1, size({toks}) - {n} + 1), "
        f"i -> md5(concat_ws(' ', slice({toks}, i, {n})))) "
        "ELSE cast(array() as array<string>) END"
    )


def decontaminate(docs_df, benchmark_df, n: int = 8, text_col: str = "text",
                  id_col: str = "doc_id"):
    """Benchmark decontamination: flag every document sharing at least
    one word ``n``-gram with the benchmark corpus (the standard
    pre-training hygiene step — eval questions that leaked into the
    crawl must not be trained on). Returns ``docs_df`` plus
    ``n_hit_shingles`` (distinct overlapping shingles) and a
    ``contaminated`` flag; callers drop with ``filter(~contaminated)``.

    Scale shape (10^10 docs vs a benchmark of ~10^5 rows): the
    benchmark's distinct-shingle dim is tiny and BROADCAST, so the
    corpus side is one scan → explode → broadcast semi-join; only HIT
    (doc, shingle) rows reach the per-doc count (partial map-side agg,
    O(contamination) not O(corpus)), and the flag join-back is a small
    -side join AQE turns into a broadcast. No full-corpus shuffle
    anywhere. Matching is by md5 of the shingle text — a false flag
    needs an md5 collision (~2^-128), and false negatives are
    impossible."""
    sh_docs = F.expr(_shingle_expr(text_col, n))
    sh_bench = F.expr(_shingle_expr(text_col, n))
    bench_dim = (
        benchmark_df.select(F.explode(sh_bench).alias("_sh")).distinct()
    )
    hits = (
        docs_df.select(F.col(id_col), F.explode(sh_docs).alias("_sh"))
        .join(F.broadcast(bench_dim), "_sh")
        .groupBy(id_col)
        .agg(F.count_distinct("_sh").alias("n_hit_shingles"))
    )
    return (
        docs_df.join(hits, id_col, "left")
        .withColumn(
            "n_hit_shingles", F.coalesce("n_hit_shingles", F.lit(0))
        )
        .withColumn("contaminated", F.col("n_hit_shingles") > 0)
    )


# PII scrubbing: conservative patterns written in the common subset of
# Java regex (Spark) and RE2 (DuckDB) — char classes, bounded repeats,
# \b — so the oracle replays them verbatim. Order matters: emails are
# redacted before phone numbers so a number inside a local-part can't
# be half-eaten first.
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\+?[0-9]{1,3}[- .]\(?[0-9]{3}\)?[- .][0-9]{3}[- .][0-9]{4}\b", "<PHONE>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
]


def redact_pii(df, text_col: str = "text"):
    """Scrub common PII shapes (emails, separator-formed phone numbers,
    IPv4 addresses) from ``text_col`` in place — the hygiene pass a
    crawled corpus gets before release. Pure chained regexp_replace:
    JVM codegen, no shuffle, no UDF; patterns are deliberately in the
    Java-regex/RE2 common subset so tests/test_decontaminate.py replays
    them bit-identically in DuckDB."""
    out = F.col(text_col)
    for _, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return df.withColumn(text_col, out)


def _gram_expr(text_col: str, n: int) -> str:
    """SQL expr: the word n-gram strings of ``text_col`` (unhashed —
    repetition_stats groups on them; contrast _shingle_expr's md5)."""
    toks = f"split({text_col}, ' ')"
    return (
        f"CASE WHEN size({toks}) >= {n} THEN "
        f"transform(sequence(1, size({toks}) - {n} + 1), "
        f"i -> concat_ws(' ', slice({toks}, i, {n}))) "
        "ELSE cast(array() as array<string>) END"
    )


def repetition_stats(df, text_col: str = "text", id_col: str = "doc_id",
                     max_dup_2gram: float = 0.5, max_top_2gram: float = 0.15):
    """Within-document repetition signals (the Gopher-rules family):
    per doc, the fraction of 2-/3-grams that are repeats of an earlier
    one (``dup_{2,3}gram_frac`` = 1 − distinct/total) and the fraction
    of 2-gram slots taken by the single most frequent 2-gram
    (``top_2gram_frac``), plus an ``is_repetitive`` flag at the given
    thresholds — boilerplate, keyword-stuffed and looping machine text
    score high on these while clean prose stays low.

    Scale shape: the dup fractions are pure array expressions on the
    row (no shuffle at all). Only the top-gram count groups: explode →
    hash-agg keyed (doc, gram) — partial aggregation collapses each
    doc's grams map-side since a doc's grams start on one row, so
    shuffle volume is O(distinct grams), then a per-doc max and one
    join back on the id. No row UDFs anywhere."""
    g2, g3 = F.expr(_gram_expr(text_col, 2)), F.expr(_gram_expr(text_col, 3))

    def dup_frac(g):
        return F.round(
            F.coalesce(
                1.0 - F.size(F.array_distinct(g)) / F.nullif(F.size(g), F.lit(0)),
                F.lit(0.0),
            ),
            4,
        )

    top = (
        df.select(F.col(id_col), F.explode(g2).alias("_g"))
        .groupBy(id_col, "_g")
        .count()
        .groupBy(id_col)
        .agg(F.max("count").alias("_topc"))
    )
    out = (
        df.withColumn("dup_2gram_frac", dup_frac(g2))
        .withColumn("dup_3gram_frac", dup_frac(g3))
        .join(top, id_col, "left")
        .withColumn(
            "top_2gram_frac",
            F.round(
                F.coalesce(
                    F.col("_topc") / F.nullif(F.size(g2), F.lit(0)), F.lit(0.0)
                ),
                4,
            ),
        )
        .drop("_topc")
    )
    return out.withColumn(
        "is_repetitive",
        (F.col("dup_2gram_frac") > max_dup_2gram)
        | (F.col("top_2gram_frac") > max_top_2gram),
    )


# ------------------------------------------------- hygiene gate shapes
# Driver-TAIL gates (window already full of oracle-backed gates): their
# oracle evidence runs in
# tests/test_decontaminate.py::test_gate_oracle_parity.

_DECON_N = 8


def text_decontaminate(spark, sf):
    """decontaminate in gate shape: the benchmark corpus is the
    deterministic doc_id % 97 == 0 slice of documents (standing in for
    an eval set that leaked into the crawl)."""
    from . import load_spread

    docs = load_spread(spark, sf, "documents")
    bench = docs.filter("doc_id % 97 = 0").select("text")
    return decontaminate(docs, bench, n=_DECON_N).select(
        "doc_id", "n_hit_shingles", "contaminated"
    )


def text_repetition_stats(spark, sf):
    """repetition_stats (Gopher-rules family) in gate shape over the
    documents table."""
    from . import load

    docs = load(spark, sf, "documents")
    return repetition_stats(docs).select(
        "doc_id",
        "dup_2gram_frac",
        "dup_3gram_frac",
        "top_2gram_frac",
        "is_repetitive",
    )


def _duck_shingles(n: int) -> str:
    """DuckDB mirror of _shingle_expr (md5 of word n-grams)."""
    toks = "str_split(text, ' ')"
    return (
        f"list_transform(generate_series(1, greatest(len({toks}) - {n - 1}, 0)), "
        f"i -> md5(array_to_string({toks}[i:i + {n - 1}], ' ')))"
    )


def _duck_grams(n: int) -> str:
    """DuckDB mirror of _gram_expr (unhashed word n-grams)."""
    toks = "str_split(text, ' ')"
    return (
        f"CASE WHEN len({toks}) >= {n} THEN "
        f"list_transform(generate_series(1, len({toks}) - {n} + 1), "
        f"i -> array_to_string({toks}[i:i + {n} - 1], ' ')) "
        "ELSE [] END"
    )


DECONTAMINATE_SQL = f"""
WITH bsh AS (
  SELECT DISTINCT unnest({_duck_shingles(_DECON_N)}) AS sh
  FROM documents WHERE doc_id % 97 = 0
),
dsh AS (
  SELECT doc_id, unnest({_duck_shingles(_DECON_N)}) AS sh FROM documents
),
hits AS (
  SELECT doc_id, count(DISTINCT dsh.sh) AS n
  FROM dsh JOIN bsh ON dsh.sh = bsh.sh GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(h.n, 0)::BIGINT AS n_hit_shingles,
       coalesce(h.n, 0) > 0 AS contaminated
FROM documents d LEFT JOIN hits h USING (doc_id)
"""

REPETITION_SQL = f"""
WITH base AS (
  SELECT doc_id,
         round(coalesce(1.0 - len(list_distinct({_duck_grams(2)}))::DOUBLE
                        / nullif(len({_duck_grams(2)}), 0), 0.0), 4) AS dup_2gram_frac,
         round(coalesce(1.0 - len(list_distinct({_duck_grams(3)}))::DOUBLE
                        / nullif(len({_duck_grams(3)}), 0), 0.0), 4) AS dup_3gram_frac,
         len({_duck_grams(2)}) AS n2
  FROM documents
),
top AS (
  SELECT doc_id, max(c) AS topc FROM (
    SELECT doc_id, g, count(*) AS c
    FROM (SELECT doc_id, unnest({_duck_grams(2)}) AS g FROM documents)
    GROUP BY doc_id, g
  ) GROUP BY doc_id
)
SELECT b.doc_id, b.dup_2gram_frac, b.dup_3gram_frac,
       round(coalesce(topc::DOUBLE / nullif(n2, 0), 0.0), 4) AS top_2gram_frac,
       (b.dup_2gram_frac > 0.5 OR
        round(coalesce(topc::DOUBLE / nullif(n2, 0), 0.0), 4) > 0.15)
         AS is_repetitive
FROM base b LEFT JOIN top USING (doc_id)
"""

QUERIES.update(
    {
        "text_decontaminate": text_decontaminate,
        "text_repetition_stats": text_repetition_stats,
    }
)
ORACLES.update(
    {
        "text_decontaminate": DECONTAMINATE_SQL,
        "text_repetition_stats": REPETITION_SQL,
    }
)
