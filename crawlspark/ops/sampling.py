"""Deterministic sampling and data mixing over training corpora.

The reference has no sampling — its pipeline ships every fetched entity
(ContentCrawlService.java runs each configured crawl to completion). A
training-data pipeline at 10^10 rows needs the opposite: shippable
releases are MIXED (so much web, so much reference text, per language)
and SAMPLED (a 2% slice that is the same 2% on every rerun, machine
count, and engine). Everything here is hash-deterministic — no
``rand()``, no seeds threaded through partitions — so results are
bit-stable across reruns, cluster sizes, AND engines (Spark / DuckDB /
plain Python), which is what makes the driver-style oracle checks in
tests/test_sampling.py possible.

Portability trick: a row is kept iff

    substring(md5(key || salt), 1, 15)  <  hex15(rate)

where hex15(rate) = format(floor(rate * 16^15), '015x'). Fixed-width
hex strings compare lexicographically exactly as their numeric values,
so the predicate needs NO engine-specific hex->int conversion (DuckDB
has no conv()) — the same text predicate runs everywhere. See
hashing.py for the md5-prefix identity argument.

Scale notes (10^10 rows):
- sample_by_rate / stratified_sample are filter-only: the rates dim is
  broadcast (strata cardinality = languages x quality buckets, tiny),
  the md5 predicate is codegen JVM, no shuffle at all.
- stratified_quota is exact top-q-by-hash per stratum WITHOUT a
  window over the full data: a rate prefilter (margin * quota / count)
  cuts each stratum to O(quota) survivor rows first, so the
  row_number window runs over O(total quota) rows, not O(corpus).
  Hash order is preserved by the prefilter (it keeps exactly the
  smallest-hash rows), so the result equals the full-window answer;
  the one-in-a-million stratum where the margin was too thin is
  detected by a per-stratum count check and recomputed without the
  prefilter (escalation touches only that stratum's rows).
- quotas_for_mix is driver-side arithmetic over the per-stratum count
  dict (already tiny) — water-filling redistribution when a stratum
  cannot fill its share.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SPACE = 16**15  # md5 15-hex-char prefix space


def hex15(rate: float) -> str:
    """15-hex-char keep-threshold for a rate in (0, 1); lexicographic
    compare against md5-prefix strings == numeric compare."""
    if not 0.0 < rate < 1.0:
        raise ValueError(f"rate must be in (0,1) for a threshold: {rate}")
    return format(int(rate * _SPACE), "015x")


def _hkey(key_col: str, salt: str):
    """The portable sampling hash: md5 prefix of key (stringified) +
    salt. Cast-to-string makes int keys portable (Spark and DuckDB
    render integers identically)."""
    return F.substring(
        F.md5(F.concat(F.col(key_col).cast("string"), F.lit(salt))), 1, 15
    )


def sample_by_rate(
    df: DataFrame, key_col: str, rate: float, salt: str = ""
) -> DataFrame:
    """Deterministic Bernoulli(rate) sample keyed on ``key_col``: the
    same rows survive on every run, engine, and cluster size. Realized
    rate differs from nominal by < 16^-15. Plain filter — no shuffle,
    predicate is codegen."""
    if rate >= 1.0:
        return df
    if rate <= 0.0:
        return df.filter(F.lit(False))
    return df.filter(_hkey(key_col, salt) < F.lit(hex15(rate)))


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    rates: dict[str, float],
    key_col: str,
    salt: str = "",
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic rate sampling (the data-mixing
    primitive): stratum s keeps each row with probability rates[s],
    decided by the row's own hash — so enlarging a rate only ADDS rows
    (nested samples), and two strata never interact. Unlisted strata
    get ``default_rate``. Broadcast join of the tiny rates dim +
    codegen filter; no shuffle."""
    spark = df.sparkSession
    rows = [
        (str(s), None if r >= 1.0 else (hex15(r) if r > 0.0 else ""))
        for s, r in rates.items()
    ]
    # build the dim as strings, then cast the key to the input column's
    # own type so int/date strata join without implicit-cast surprises
    dim = spark.createDataFrame(
        rows, f"{stratum_col} string, _thr string"
    ).withColumn(
        stratum_col, F.col(stratum_col).cast(df.schema[stratum_col].dataType)
    )
    if default_rate >= 1.0:
        dflt = F.lit(None).cast("string")
    elif default_rate > 0.0:
        dflt = F.lit(hex15(default_rate))
    else:
        dflt = F.lit("")
    joined = df.join(F.broadcast(dim), stratum_col, "left").withColumn(
        "_thr", F.coalesce(F.col("_thr"), dflt)
    )
    # _thr NULL => keep-all (rate 1); '' => keep-none (every md5 prefix
    # sorts after the empty string, so hash < '' is vacuously false)
    return joined.filter(
        F.col("_thr").isNull() | (_hkey(key_col, salt) < F.col("_thr"))
    ).drop("_thr")


def stratified_quota(
    df: DataFrame,
    stratum_col: str,
    quotas: dict[str, int],
    key_col: str,
    salt: str = "",
    margin: float = 2.0,
    counts: dict[str, int] | None = None,
) -> DataFrame:
    """EXACT per-stratum quotas: for each stratum s, the min(quotas[s],
    |s|) rows with the smallest sampling hash, deterministically. Equal
    to the naive full-data window

        row_number() OVER (PARTITION BY stratum
                           ORDER BY hash, key) <= quota

    (the DuckDB oracle in tests/test_sampling.py runs exactly that) but
    scalable: a rate prefilter at margin*quota/|s| bounds the window
    input to O(total quota) rows. Strata not in ``quotas`` are dropped.

    Exactness: the prefilter keeps precisely the rows whose hash falls
    below a threshold, i.e. a PREFIX of the hash order the window
    ranks by — so whenever a stratum's survivor count reaches its
    quota, the top-q sets coincide. Underflowing strata (survivors <
    min(quota, |s|): the quota-th smallest hash landed above the
    margin, Beta-tail probability ~e^-q at margin 2) are recomputed
    without the prefilter; the escalation re-scans only those strata.

    Cardinality bound: counts/quotas live in driver dicts and a
    broadcast dim, so this op targets POLICY strata — languages,
    formats, quality buckets, top-level domains: ≤ ~10^5 distinct
    values. For per-HOST caps at web scale (~10^7+ strata) the right
    tool is the politeness machinery's salted two-phase window rank
    (politeness.select_budget) with the cap relation as a shuffle-join
    dim — same top-k-per-key semantics, nothing through the driver.
    """
    from pyspark.sql.window import Window

    quotas = {s: int(q) for s, q in quotas.items() if int(q) > 0}
    if not quotas:
        return df.filter(F.lit(False))
    spark = df.sparkSession
    if counts is None:
        # one tiny hash-agg: per-stratum population (strata cardinality
        # = languages x buckets — bounded, like the bucket-id collects
        # in snaptable.py); callers that already counted (the mix
        # planner) pass theirs in to skip the pass
        counts = {
            r[0]: r[1]
            for r in df.filter(F.col(stratum_col).isin(list(quotas)))
            .groupBy(stratum_col)
            .count()
            .collect()
        }

    def top_q(frame: DataFrame) -> DataFrame:
        w = Window.partitionBy(stratum_col).orderBy(
            F.col("_h"), F.col(key_col).cast("string")
        )
        return (
            frame.withColumn("_h", _hkey(key_col, salt))
            .withColumn("_rn", F.row_number().over(w))
            .join(
                F.broadcast(
                    spark.createDataFrame(
                        [(str(s), q) for s, q in quotas.items()],
                        f"{stratum_col} string, _q int",
                    ).withColumn(
                        stratum_col,
                        F.col(stratum_col).cast(df.schema[stratum_col].dataType),
                    )
                ),
                stratum_col,
            )
            .filter(F.col("_rn") <= F.col("_q"))
            .drop("_h", "_rn", "_q")
        )

    rates = {
        s: min(1.0, margin * q / counts[s])
        for s, q in quotas.items()
        if counts.get(s)
    }
    if not rates:
        return df.filter(F.lit(False))
    pre = stratified_sample(
        df.filter(F.col(stratum_col).isin(list(rates))),
        stratum_col,
        rates,
        key_col,
        salt,
        default_rate=0.0,
    )
    picked = top_q(pre)
    # exactness check: tiny agg over the O(total quota) result
    got = {r[0]: r[1] for r in picked.groupBy(stratum_col).count().collect()}
    short = [
        s
        for s, q in quotas.items()
        if counts.get(s) and got.get(s, 0) < min(q, counts[s])
    ]
    if short:
        # margin too thin for these strata: exact recompute, no prefilter
        redo = top_q(df.filter(F.col(stratum_col).isin(short)))
        picked = picked.filter(~F.col(stratum_col).isin(short)).unionByName(redo)
    return picked


def quotas_for_mix(
    counts: dict[str, int], weights: dict[str, float], total: int
) -> dict[str, int]:
    """Turn a target mixture (per-stratum weights, any positive scale)
    plus a row budget into per-stratum quotas, water-filling strata
    that cannot fill their share: a short stratum contributes all its
    rows and its unmet share is redistributed over the remaining
    strata in weight proportion (repeat until stable). Driver-side
    arithmetic over the tiny counts dict; sum(quotas) == min(total,
    available rows in weighted strata)."""
    if total <= 0:
        return {}
    wsum = sum(w for w in weights.values() if w > 0)
    if wsum <= 0:
        return {}
    live = {s: w for s, w in weights.items() if w > 0 and counts.get(s, 0) > 0}
    quotas: dict[str, int] = {}
    budget = min(total, sum(counts[s] for s in live))
    while live and budget > 0:
        wsum = sum(live.values())
        # largest-remainder apportionment of the remaining budget
        shares = {s: budget * w / wsum for s, w in live.items()}
        floors = {s: int(shares[s]) for s in live}
        rem = budget - sum(floors.values())
        for s in sorted(
            live, key=lambda s: (-(shares[s] - floors[s]), s)
        )[:rem]:
            floors[s] += 1
        capped = {s: min(floors[s], counts[s] - quotas.get(s, 0)) for s in live}
        for s, q in capped.items():
            quotas[s] = quotas.get(s, 0) + q
        budget -= sum(capped.values())
        live = {
            s: w for s, w in live.items() if counts[s] - quotas.get(s, 0) > 0
        }
        if all(capped[s] == floors[s] for s in capped):
            break  # everyone filled their share: done
    return {s: q for s, q in quotas.items() if q > 0}


def split_assign(
    df: DataFrame,
    key_col: str,
    fractions: dict[str, float],
    salt: str = "",
) -> DataFrame:
    """Deterministic train/val/test assignment: adds a ``split`` column
    mapping each row to the named fraction its hash falls in —
    key-stable (the same row lands in the same split on every run,
    engine, and cluster size; growing the corpus never moves old rows)
    and exactly disjoint/exhaustive. Cumulative hex thresholds chain
    the same portable predicate as sample_by_rate, so membership is
    checkable in DuckDB with a CASE over the identical md5 prefix.
    Leak direction is one-way by construction: resizing the LAST
    fraction never moves rows between the earlier ones (order the dict
    train-first, eval splits last). Pure projection — no shuffle."""
    if not fractions or any(f <= 0 for f in fractions.values()):
        raise ValueError(f"fractions must be positive: {fractions}")
    if abs(sum(fractions.values()) - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1: {fractions}")
    h = _hkey(key_col, salt)
    expr = None
    acc = 0.0
    names = list(fractions)
    for name in names[:-1]:
        acc += fractions[name]
        cond = h < F.lit(hex15(min(acc, 1.0 - 1e-15)))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(names[-1])
    return df.withColumn("split", expr)


# --------------------------------------------------------------- gates
# Registry gates (driver TAIL — the 50-row driver window is already
# exactly the 50 oracle-backed gates, so these two carry their oracle
# evidence via tests/test_sampling.py::test_gate_oracle_parity, per the
# tail contract in __spark_entry__._registry).

_GATE_SALT = "|gate"
_GATE_SPLITS = {"train": 0.9, "val": 0.06, "test": 0.04}
_GATE_QUOTAS = {"en": 40, "de": 25, "fr": 10}


def sampling_split_assign(spark, sf: str) -> DataFrame:
    """split_assign in gate shape: deterministic train/val/test
    assignment over the documents table."""
    from . import load

    docs = load(spark, sf, "documents")
    return split_assign(docs, "doc_id", _GATE_SPLITS, _GATE_SALT).select(
        "doc_id", "lang", "split"
    )


def sampling_stratified_quota(spark, sf: str) -> DataFrame:
    """stratified_quota in gate shape: exact per-language quotas over
    the documents table (the data-mixing primitive)."""
    from . import load

    docs = load(spark, sf, "documents")
    return stratified_quota(
        docs, "lang", _GATE_QUOTAS, "doc_id", _GATE_SALT
    ).select("doc_id", "lang")


def _md5p(key_sql: str) -> str:
    return f"substring(md5(CAST({key_sql} AS VARCHAR) || '{_GATE_SALT}'), 1, 15)"


SPLIT_SQL = f"""
SELECT doc_id, lang,
       CASE WHEN {_md5p('doc_id')} < '{hex15(0.9)}' THEN 'train'
            WHEN {_md5p('doc_id')} < '{hex15(0.96)}' THEN 'val'
            ELSE 'test' END AS split
FROM documents
"""

# the naive full-window form; stratified_quota's prefilter+window path
# must return the exact same row set (proven in tests/test_sampling.py)
QUOTA_SQL = f"""
SELECT doc_id, lang FROM (
  SELECT doc_id, lang,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY {_md5p('doc_id')}, CAST(doc_id AS VARCHAR)
         ) AS rn
  FROM documents
  WHERE lang IN ('en', 'de', 'fr')
) WHERE rn <= CASE lang WHEN 'en' THEN 40 WHEN 'de' THEN 25 WHEN 'fr' THEN 10 END
"""

QUERIES = {
    "sampling_split_assign": sampling_split_assign,
    "sampling_stratified_quota": sampling_stratified_quota,
}
ORACLES = {
    "sampling_split_assign": SPLIT_SQL,
    "sampling_stratified_quota": QUOTA_SQL,
}
