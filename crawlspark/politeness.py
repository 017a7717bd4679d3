"""Robots filtering + per-host politeness budget via salted window rank.

Generalizes the reference's fixed page-size limits
(conf/ContentCrawlConfiguration.java:87, ContentTypeCrawler.java:49),
crawl-order priority (contentful/crawl/ContentfulCrawler.java:133-149)
and 1-op/s rate limiter (contentful/backup/ContentfulRestore.java:46)
into a declarative per-host budget: each round a host contributes at
most ``budget`` URLs, chosen by (priority DESC, url ASC) — a total
order, so the selection is bit-identical at any parallelism.

Skew: hosts are Zipfian (north_rule), so a naive
``Window.partitionBy(host)`` puts the hottest host's entire pending set
in one task. Two-phase salted ranking bounds per-task work without
changing the selected set:

  phase 1: rank within (host, salt) where salt = pmod(url_hash, nsplits)
           and keep rank <= budget   (the true per-host top-budget rows
           are each top-budget within their split → no losses)
  phase 2: rank the <= nsplits*budget survivors within host, keep budget.

Phase 2 sees at most nsplits*budget rows per host — constant, not
frontier-sized. AQE skew handling covers the joins; this covers the
window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .hashing import h60_sql

HOT_SPLITS = 16


def filter_robots(pending: DataFrame, robots: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split pending into (allowed, denied) per robots deny rules
    (host, path_prefix). Deny dimension is broadcast — it is tiny
    relative to the frontier at any scale."""
    with_path = pending.withColumn(
        "_path", F.regexp_replace("url", r"^[a-z]+://[^/]+", "")
    )
    cond = (with_path.host == robots.host) & with_path._path.startswith(
        robots.path_prefix
    )
    allowed = with_path.join(F.broadcast(robots), cond, "left_anti").drop("_path")
    denied = with_path.join(F.broadcast(robots), cond, "left_semi").drop("_path")
    return allowed, denied


def filter_robots_rep(
    pending: DataFrame, rules: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """Split pending into (allowed, denied) per full REP rules
    (host, rx, spec, allow) — wildcard/anchor patterns with RFC 9309
    longest-match + allow-tie-break semantics (ops/robotsrep.py
    compiles the patterns and owns the winner logic). Same broadcast
    shape as the prefix filter: the rules dim is tiny at any scale."""
    from .ops.robotsrep import rep_allowed

    with_path = pending.withColumn(
        "_path", F.regexp_replace("url", r"^[a-z]+://[^/]+", "")
    )
    flagged = rep_allowed(with_path, rules).drop("_path")
    allowed = flagged.filter(F.col("allowed")).drop("allowed")
    denied = flagged.filter(~F.col("allowed")).drop("allowed")
    return allowed, denied


def select_budget(
    pending: DataFrame,
    politeness: DataFrame,
    default_budget: int = 16,
    aging: tuple[float, int] | None = None,
) -> DataFrame:
    """Pick the per-host top-``budget`` pending URLs by
    (priority DESC, url ASC); adds ``rank``. Deterministic total order.

    Hosts absent from the politeness table get ``default_budget`` (left
    join) — an inner join would silently drop their URLs every round:
    never fetched, never marked seen, rescheduled forever.

    ``aging=(alpha, round_id)`` (optional): starvation-freedom for
    budget-bound hosts — rank by priority + alpha * rounds-ripe
    (round_id - not_before) instead of raw priority. A URL passed over
    for k rounds gains k*alpha; with alpha > 0 every pending URL's
    effective priority eventually exceeds any fixed hash priority
    (< 1), bounding its wait by budget turnover. Both engines compute
    the same IEEE double, so the order stays bit-identical.
    """
    df = pending.join(F.broadcast(politeness), "host", "left").withColumn(
        "budget", F.coalesce(F.col("budget"), F.lit(default_budget))
    )
    nsplits = F.when(F.col("budget") >= 50, F.lit(HOT_SPLITS)).otherwise(F.lit(1))
    df = df.withColumn(
        "_salt", F.pmod(F.expr(h60_sql("concat(url, '|salt')")), nsplits).cast("int")
    )
    eff = F.col("priority")
    if aging is not None:
        alpha, round_id = aging
        eff = eff + F.lit(float(alpha)) * (
            F.lit(int(round_id)) - F.col("not_before")
        ).cast("double")
    order = [eff.desc(), F.col("url").asc()]
    w1 = Window.partitionBy("host", "_salt").orderBy(*order)
    survivors = (
        df.withColumn("_rn1", F.row_number().over(w1))
        .filter(F.col("_rn1") <= F.col("budget"))
        .drop("_rn1", "_salt")
    )
    w2 = Window.partitionBy("host").orderBy(*order)
    return (
        survivors.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= F.col("budget"))
        .drop("budget")
    )
