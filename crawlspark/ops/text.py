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
        F.round(
            F.aggregate(w, F.lit(0).cast("double"), lambda acc, x: acc + F.length(x))
            / F.size(w),
            4,
        ).alias("avg_token_len"),
        # BPE-ish tokenization estimate: alpha runs split into <=4-char
        # subword pieces, digits and punctuation one token each (the
        # regex shape of byte-pair pretokenizers, deterministic here)
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
