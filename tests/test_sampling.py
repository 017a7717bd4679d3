"""Deterministic sampling / data-mixing: DuckDB oracle parity + the
exactness, nesting, and determinism contracts.

Same rigor as the driver's correctness gate (these ops stay out of the
registry only because the 50-row driver window is already exactly the
50 oracle-backed gates — see __spark_entry__._registry): every sampling
op is checked against an independent DuckDB run of the SAME portable
md5-hex predicate, with the driver's normalization.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from crawlspark.ops.sampling import (
    hex15,
    quotas_for_mix,
    sample_by_rate,
    stratified_quota,
    stratified_sample,
)

SF_DIR = "/root/testdata/sf0.001"
SALT = "mix-r4"


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    return con


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_sample_by_rate_matches_duckdb(spark, docs, duck):
    mine = sample_by_rate(docs, "doc_id", 0.25, SALT).select("doc_id", "lang")
    ref = duck.execute(
        f"""
        SELECT doc_id, lang FROM documents
        WHERE substring(md5(CAST(doc_id AS VARCHAR) || '{SALT}'), 1, 15)
              < '{hex15(0.25)}'
        """
    ).df()
    assert len(ref) > 0
    pd.testing.assert_frame_equal(_norm(mine.toPandas()), _norm(ref))
    # realized rate ~ nominal (md5 uniformity at corpus scale)
    n = docs.count()
    assert abs(len(ref) / n - 0.25) < 0.1


def test_sample_rate_edges(spark, docs):
    assert sample_by_rate(docs, "doc_id", 1.0).count() == docs.count()
    assert sample_by_rate(docs, "doc_id", 0.0).count() == 0


def test_samples_nest(spark, docs):
    """Raising the rate only ADDS rows — the 10% sample is a subset of
    the 30% sample (per-row hash decides, threshold just moves)."""
    small = {r[0] for r in sample_by_rate(docs, "doc_id", 0.1, SALT).select("doc_id").collect()}
    big = {r[0] for r in sample_by_rate(docs, "doc_id", 0.3, SALT).select("doc_id").collect()}
    assert small and small < big


def test_salt_changes_membership(spark, docs):
    a = {r[0] for r in sample_by_rate(docs, "doc_id", 0.2, "a").select("doc_id").collect()}
    b = {r[0] for r in sample_by_rate(docs, "doc_id", 0.2, "b").select("doc_id").collect()}
    assert a != b


RATES = {"en": 0.6, "de": 0.25, "fr": 0.05}


def test_stratified_sample_matches_duckdb(spark, docs, duck):
    mine = stratified_sample(docs, "lang", RATES, "doc_id", SALT).select(
        "doc_id", "lang"
    )
    cases = " ".join(
        f"WHEN '{s}' THEN '{hex15(r)}'" for s, r in RATES.items()
    )
    ref = duck.execute(
        f"""
        SELECT doc_id, lang FROM documents
        WHERE substring(md5(CAST(doc_id AS VARCHAR) || '{SALT}'), 1, 15)
              < CASE lang {cases} ELSE '' END
        """
    ).df()
    assert len(ref) > 0
    pd.testing.assert_frame_equal(_norm(mine.toPandas()), _norm(ref))
    # unlisted strata dropped at default_rate=0
    langs = {r[0] for r in mine.select("lang").distinct().collect()}
    assert langs <= set(RATES)


def test_stratified_sample_default_rate_keeps_all(spark, docs):
    out = stratified_sample(
        docs, "lang", {"en": 0.5}, "doc_id", SALT, default_rate=1.0
    )
    n_other = docs.filter("lang <> 'en'").count()
    assert out.filter("lang <> 'en'").count() == n_other


QUOTAS = {"en": 40, "de": 25, "fr": 10}


def _quota_oracle_sql(quotas: dict[str, int]) -> str:
    cases = " ".join(f"WHEN '{s}' THEN {q}" for s, q in quotas.items())
    return f"""
        SELECT doc_id, lang FROM (
          SELECT doc_id, lang,
                 row_number() OVER (
                   PARTITION BY lang
                   ORDER BY substring(md5(CAST(doc_id AS VARCHAR) || '{SALT}'), 1, 15),
                            CAST(doc_id AS VARCHAR)
                 ) AS rn
          FROM documents
          WHERE lang IN ({",".join(repr(s) for s in quotas)})
        ) WHERE rn <= CASE lang {cases} END
    """


def test_stratified_quota_matches_duckdb(spark, docs, duck):
    """The scalable prefilter+window path returns the EXACT same row
    set as the naive full-data window DuckDB runs."""
    mine = stratified_quota(docs, "lang", QUOTAS, "doc_id", SALT).select(
        "doc_id", "lang"
    )
    ref = duck.execute(_quota_oracle_sql(QUOTAS)).df()
    assert len(ref) > 0
    pd.testing.assert_frame_equal(_norm(mine.toPandas()), _norm(ref))


def test_stratified_quota_escalation_matches_oracle(spark, docs, duck):
    """margin so thin the prefilter underflows every stratum — the
    escalation path must still return the exact oracle rows."""
    mine = stratified_quota(
        docs, "lang", QUOTAS, "doc_id", SALT, margin=0.05
    ).select("doc_id", "lang")
    ref = duck.execute(_quota_oracle_sql(QUOTAS)).df()
    pd.testing.assert_frame_equal(_norm(mine.toPandas()), _norm(ref))


def test_stratified_quota_counts_exact(spark, docs):
    counts = {r[0]: r[1] for r in docs.groupBy("lang").count().collect()}
    big = {s: counts[s] + 1000 for s in QUOTAS}  # quota above population
    out = stratified_quota(docs, "lang", big, "doc_id", SALT)
    got = {r[0]: r[1] for r in out.groupBy("lang").count().collect()}
    assert got == {s: counts[s] for s in QUOTAS}


def test_quota_plan_no_python_row_udfs(spark, docs):
    plan = stratified_quota(docs, "lang", QUOTAS, "doc_id", SALT)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "BroadcastHashJoin" in plan  # quota dim broadcast, never shuffled


def test_quotas_for_mix_water_filling():
    counts = {"en": 1000, "de": 500, "fr": 30, "xx": 0}
    weights = {"en": 0.5, "de": 0.3, "fr": 0.2}
    q = quotas_for_mix(counts, weights, 600)
    # fr can seat only 30 of its 120 share; shortfall refills en/de 5:3
    assert q["fr"] == 30 and sum(q.values()) == 600
    assert q["en"] > 300 and q["de"] > 180
    assert all(q[s] <= counts[s] for s in q)
    # budget above availability: everything ships
    q2 = quotas_for_mix(counts, weights, 10_000)
    assert q2 == {"en": 1000, "de": 500, "fr": 30}
    # zero-weight / absent strata never appear
    assert "xx" not in q and quotas_for_mix(counts, {}, 100) == {}


def test_quotas_for_mix_budget_exact():
    counts = {"a": 7, "b": 7, "c": 7}
    q = quotas_for_mix(counts, {"a": 1, "b": 1, "c": 1}, 20)
    assert sum(q.values()) == 20 and all(v <= 7 for v in q.values())


SPLITS = {"train": 0.9, "val": 0.06, "test": 0.04}


def test_split_assign_matches_duckdb(spark, docs, duck):
    from crawlspark.ops.sampling import split_assign

    mine = split_assign(docs, "doc_id", SPLITS, SALT).select("doc_id", "split")
    t1, t2 = hex15(0.9), hex15(0.96)
    ref = duck.execute(
        f"""
        SELECT doc_id,
               CASE WHEN substring(md5(CAST(doc_id AS VARCHAR) || '{SALT}'), 1, 15) < '{t1}'
                    THEN 'train'
                    WHEN substring(md5(CAST(doc_id AS VARCHAR) || '{SALT}'), 1, 15) < '{t2}'
                    THEN 'val' ELSE 'test' END AS split
        FROM documents
        """
    ).df()
    pd.testing.assert_frame_equal(_norm(mine.toPandas()), _norm(ref))


def test_split_assign_contracts(spark, docs):
    from crawlspark.ops.sampling import split_assign

    out = split_assign(docs, "doc_id", SPLITS, SALT)
    n = docs.count()
    got = {r[0]: r[1] for r in out.groupBy("split").count().collect()}
    # exhaustive + disjoint (split is a single column), realized sizes
    # near nominal
    assert sum(got.values()) == n and set(got) == set(SPLITS)
    assert abs(got["train"] / n - 0.9) < 0.08
    # one-way leak safety: shrinking the LAST fraction in favor of a
    # new tail split never moves rows between train and val
    out2 = split_assign(
        docs, "doc_id", {"train": 0.9, "val": 0.06, "test": 0.02, "holdout": 0.02}, SALT
    )
    a = {r[0]: r[1] for r in out.select("doc_id", "split").collect()}
    b = {r[0]: r[1] for r in out2.select("doc_id", "split").collect()}
    moved = {k for k in a if a[k] != b[k]}
    assert all(a[k] == "test" and b[k] == "holdout" for k in moved)
    # invalid fractions are loud
    with pytest.raises(ValueError):
        split_assign(docs, "doc_id", {"train": 0.5, "val": 0.4}, SALT)
    # no shuffle: pure projection over the scan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_int_typed_strata(spark, docs, duck):
    """Strata need not be strings: quality buckets are ints. The dim
    key is cast to the input column's own type, so the broadcast join
    stays exact (no string<->int implicit-cast surprises)."""
    from pyspark.sql import functions as F

    bucketed = docs.withColumn("qb", F.floor(F.col("n_chars") / 200).cast("int"))
    mine = stratified_quota(
        bucketed, "qb", {0: 15, 1: 10, 2: 5}, "doc_id", SALT
    ).select("doc_id", "qb")
    ref = duck.execute(
        f"""
        SELECT doc_id, qb FROM (
          SELECT doc_id, CAST(floor(n_chars / 200) AS INT) AS qb,
                 row_number() OVER (
                   PARTITION BY CAST(floor(n_chars / 200) AS INT)
                   ORDER BY substring(md5(CAST(doc_id AS VARCHAR) || '{SALT}'), 1, 15),
                            CAST(doc_id AS VARCHAR)
                 ) AS rn
          FROM documents WHERE CAST(floor(n_chars / 200) AS INT) IN (0, 1, 2)
        ) WHERE rn <= CASE qb WHEN 0 THEN 15 WHEN 1 THEN 10 ELSE 5 END
        """
    ).df()
    assert len(ref) == 30
    pd.testing.assert_frame_equal(_norm(mine.toPandas()), _norm(ref))
    s = stratified_sample(bucketed, "qb", {0: 0.5, 1: 0.2}, "doc_id", SALT)
    assert {r[0] for r in s.select("qb").distinct().collect()} <= {0, 1}


def test_gate_oracle_parity(spark, duck):
    """Driver-tail gates (sampling_split_assign, sampling_stratified_quota):
    this test IS their hard oracle evidence — the driver's 50-row window
    never records them (registry contract in __spark_entry__.py)."""
    from crawlspark.ops import sampling as S

    for name, fn in S.QUERIES.items():
        mine = _norm(fn(spark, SF_DIR).toPandas())
        ref = _norm(duck.execute(S.ORACLES[name]).df())
        assert len(mine) > 0, name
        pd.testing.assert_frame_equal(mine, ref, obj=name)
