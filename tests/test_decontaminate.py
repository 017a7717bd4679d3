"""Benchmark decontamination (ops/text.decontaminate): DuckDB oracle
parity on the n-gram overlap semantics, planted-leak recall, clean-doc
precision, and the plan contract (broadcast benchmark dim, no row
UDFs)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from crawlspark.ops.sampling import sample_by_rate
from crawlspark.ops.text import decontaminate

SF_DIR = "/root/testdata/sf0.001"
N = 8


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="module")
def bench(spark, docs):
    """Synthetic benchmark: a deterministic 3% slice of the corpus
    (verbatim leaks) plus one hand-planted row that copies an 8-gram
    from a specific non-slice document."""
    leak = sample_by_rate(docs, "doc_id", 0.03, "bench").select("text")
    victim = (
        sample_by_rate(docs, "doc_id", 0.97, "bench")
        .filter(F.size(F.split("text", " ")) >= N)
        .orderBy("doc_id")
        .limit(1)
        .collect()[0]
    )
    planted = " ".join(victim["text"].split(" ")[:N])
    extra = docs.sparkSession.createDataFrame(
        pd.DataFrame({"text": [f"benchmark question: {planted} (answer: 42)"]})
    )
    return leak.unionByName(extra), victim["doc_id"]


def _duck_oracle(docs_pdf, bench_pdf):
    con = duckdb.connect()
    con.register("documents", docs_pdf)
    con.register("benchmark", bench_pdf)
    sh = (
        "list_transform(generate_series(1, greatest(len(str_split({c}, ' ')) "
        f"- {N} + 1, 0)), "
        f"i -> md5(array_to_string(str_split({{c}}, ' ')[i:i + {N} - 1], ' ')))"
    )
    return con.execute(
        f"""
        WITH bsh AS (
          SELECT DISTINCT unnest({sh.format(c='text')}) AS sh FROM benchmark
        ),
        dsh AS (
          SELECT doc_id, unnest({sh.format(c='text')}) AS sh FROM documents
        )
        SELECT d.doc_id,
               coalesce(h.n, 0) AS n_hit_shingles,
               coalesce(h.n, 0) > 0 AS contaminated
        FROM documents d
        LEFT JOIN (
          SELECT doc_id, count(DISTINCT dsh.sh) AS n
          FROM dsh JOIN bsh ON dsh.sh = bsh.sh GROUP BY doc_id
        ) h USING (doc_id)
        """
    ).df()


def test_decontaminate_matches_duckdb(spark, docs, bench):
    bench_df, victim_id = bench
    mine = (
        decontaminate(docs, bench_df, n=N)
        .select("doc_id", "n_hit_shingles", "contaminated")
        .toPandas()
    )
    ref = _duck_oracle(
        docs.select("doc_id", "text").toPandas(), bench_df.toPandas()
    )
    for df in (mine, ref):
        df["n_hit_shingles"] = df["n_hit_shingles"].astype("int64")
        df["contaminated"] = df["contaminated"].astype(bool)
    pd.testing.assert_frame_equal(
        mine.sort_values("doc_id").reset_index(drop=True),
        ref.sort_values("doc_id").reset_index(drop=True),
    )
    assert ref["contaminated"].sum() > 0


def test_decontaminate_flags_leaks_and_plant(spark, docs, bench):
    bench_df, victim_id = bench
    out = decontaminate(docs, bench_df, n=N)
    flagged = {r[0] for r in out.filter("contaminated").select("doc_id").collect()}
    # every verbatim-leaked doc long enough to shingle is flagged
    leaked = {
        r[0]
        for r in sample_by_rate(docs, "doc_id", 0.03, "bench")
        .filter(F.size(F.split("text", " ")) >= N)
        .select("doc_id")
        .collect()
    }
    assert leaked and leaked <= flagged
    # the planted 8-gram catches its victim even though the victim's
    # full text never appears in the benchmark
    assert victim_id in flagged and victim_id not in leaked
    # dropping flagged rows leaves zero overlap (self-check)
    clean = out.filter("NOT contaminated").select("doc_id", "text")
    assert decontaminate(clean, bench_df, n=N).filter("contaminated").count() == 0


def test_decontaminate_plan(spark, docs, bench):
    bench_df, _ = bench
    plan = (
        decontaminate(docs, bench_df, n=N)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan
    assert "BroadcastHashJoin" in plan  # benchmark shingle dim broadcast


def test_redact_pii_matches_duckdb(spark):
    from crawlspark.ops.text import PII_PATTERNS, redact_pii

    rows = pd.DataFrame(
        {
            "doc_id": range(8),
            "text": [
                "contact alice.smith+work@sub.example.org today",
                "call +1 (555) 123-4567 or 555.987.6543 now",
                "server at 192.168.0.1 and 10.0.0.255 replied",
                "version 1.2.3.4.5 is not an ip boundary case",
                "mixed bob@x.io from 8.8.8.8 dial +44 207 946-0958",
                "clean text with no pii at all",
                "almost@an email but not: a@b (tld too short)",
                "edge 999.999.999.999 still matches the shape",
            ],
        }
    )
    df = spark.createDataFrame(rows)
    mine = redact_pii(df).toPandas().sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("t", rows)
    expr = "text"
    for _, pat, repl in PII_PATTERNS:
        expr = f"regexp_replace({expr}, '{pat}', '{repl}', 'g')"
    ref = (
        con.execute(f"SELECT doc_id, {expr} AS text FROM t ORDER BY doc_id")
        .df()
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(mine, ref)
    red = "\n".join(mine["text"])
    assert "<EMAIL>" in red and "<PHONE>" in red and "<IP>" in red
    assert "alice" not in red and "192.168" not in red
    # the synthetic corpus is PII-free: redaction is an exact no-op
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    assert redact_pii(docs).exceptAll(docs).count() == 0
    # plan: chained regexp_replace projections, no UDF, no shuffle
    plan = redact_pii(docs)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "Exchange" not in plan


def test_repetition_stats_matches_duckdb(spark):
    from crawlspark.ops.text import repetition_stats

    rows = pd.DataFrame(
        {
            "doc_id": range(6),
            "text": [
                "buy now buy now buy now buy now buy now",  # one looping 2-gram
                "the quick brown fox jumps over the lazy dog",  # clean prose
                "a b a b c d a b e f a b",  # frequent but diluted pair
                "word",  # too short for any 2-gram
                "spam spam spam spam spam spam spam spam",  # unigram loop
                "alpha beta gamma delta epsilon zeta eta theta",  # all distinct
            ],
        }
    )
    df = spark.createDataFrame(rows)
    mine = (
        repetition_stats(df)
        .select(
            "doc_id", "dup_2gram_frac", "dup_3gram_frac", "top_2gram_frac",
            "is_repetitive",
        )
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", rows)
    gram = (
        "CASE WHEN len(str_split(text, ' ')) >= {n} THEN "
        "list_transform(generate_series(1, len(str_split(text, ' ')) - {n} + 1), "
        "i -> array_to_string(str_split(text, ' ')[i:i + {n} - 1], ' ')) "
        "ELSE [] END"
    )
    g2, g3 = gram.format(n=2), gram.format(n=3)
    ref = con.execute(
        f"""
        WITH base AS (
          SELECT doc_id,
                 round(coalesce(1.0 - len(list_distinct({g2}))::DOUBLE
                                / nullif(len({g2}), 0), 0.0), 4) AS dup_2gram_frac,
                 round(coalesce(1.0 - len(list_distinct({g3}))::DOUBLE
                                / nullif(len({g3}), 0), 0.0), 4) AS dup_3gram_frac,
                 len({g2}) AS n2
          FROM t
        ),
        top AS (
          SELECT doc_id, max(c) AS topc FROM (
            SELECT doc_id, g, count(*) AS c
            FROM (SELECT doc_id, unnest({g2}) AS g FROM t) GROUP BY doc_id, g
          ) GROUP BY doc_id
        )
        SELECT b.doc_id, b.dup_2gram_frac, b.dup_3gram_frac,
               round(coalesce(topc::DOUBLE / nullif(n2, 0), 0.0), 4) AS top_2gram_frac,
               (b.dup_2gram_frac > 0.5 OR
                round(coalesce(topc::DOUBLE / nullif(n2, 0), 0.0), 4) > 0.15)
                 AS is_repetitive
        FROM base b LEFT JOIN top USING (doc_id) ORDER BY doc_id
        """
    ).df()
    pd.testing.assert_frame_equal(mine, ref.reset_index(drop=True))
    rep = dict(zip(mine["doc_id"], mine["is_repetitive"]))
    assert rep[0] and rep[4] and not rep[1] and not rep[3] and not rep[5]

    # corpus sanity: synthetic prose-like docs are mostly non-repetitive,
    # and the op's plan has no row UDFs
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = repetition_stats(docs)
    frac = out.filter("is_repetitive").count() / docs.count()
    assert frac < 0.5
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan


def test_gate_oracle_parity(spark):
    """Driver-tail gates (text_decontaminate, text_repetition_stats):
    this test IS their hard oracle evidence — the driver's 50-row window
    never records them (registry contract in __spark_entry__.py)."""
    from crawlspark.ops import text as T

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    for name in ("text_decontaminate", "text_repetition_stats"):
        mine = T.QUERIES[name](spark, SF_DIR).toPandas()
        ref = con.execute(T.ORACLES[name]).df()
        mine = mine[sorted(mine.columns)].astype(str)
        ref = ref[sorted(ref.columns)].astype(str)
        mine = mine.sort_values(list(mine.columns)).reset_index(drop=True)
        ref = ref.sort_values(list(ref.columns)).reset_index(drop=True)
        assert len(mine) > 0, name
        pd.testing.assert_frame_equal(mine, ref, obj=name)
