"""Link-graph PageRank for frontier prioritization.

The reference crawls content types in a hand-configured priority order
(ContentfulCrawler.java:133-149) and appends reverse links so that
linked entries gain tags (ESDocumentLinker.java:41-121) — i.e. link
structure exists in the data model but never feeds scheduling. At
web scale the frontier's crawl order SHOULD follow link structure:
pages referenced by many already-crawled pages are fetched first.
This module computes a fixed-iteration damped PageRank over the
outlink graph as a pure DataFrame program, and the engine consumes it
via ``CrawlEngine.reprioritize`` (a deterministic priority rewrite of
the pending frontier between rounds).

Scale notes (the plan a 1000-executor cluster wants):
- The out-degree join is loop-invariant: edges are joined with
  out-degrees ONCE, outside the iteration loop, and the joined
  relation is persisted — each iteration then costs exactly one
  shuffle (ranks re-keyed by src) plus one hash aggregation (contrib
  by dst), which is the Spark-native floor for power iteration.
- The dangling-node set is also loop-invariant: each node carries an
  ``is_dangling`` flag from iteration 0, so the per-iteration dangling
  mass is a 1-row aggregate (broadcast back with a crossJoin), never a
  per-iteration anti-join.
- Each iteration is eagerly materialized (persist + count) and its
  predecessor unpersisted, so lineage stays O(1) deep — at 10^10
  nodes an unrolled 3-deep lineage would recompute the full graph
  join three times inside one action.
- No driver-side data: N and the dangling mass travel as broadcast
  1-row DataFrames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import load

DAMPING = 0.85
ITERS = 3


def pagerank(
    edges: DataFrame,
    *,
    iters: int = ITERS,
    damping: float = DAMPING,
    src: str = "src",
    dst: str = "dst",
    nodes: DataFrame | None = None,
    eager: bool = True,
) -> DataFrame:
    """Fixed-iteration damped PageRank. Returns (node, rank) with
    sum(rank) == 1 (dangling mass redistributed uniformly).

    ``nodes`` (single column ``node``) may widen the universe beyond
    endpoints appearing in ``edges``; by default the universe is the
    distinct union of both endpoint columns.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    if nodes is None:
        nodes = (
            e.select(F.col("src").alias("node"))
            .unionByName(e.select(F.col("dst").alias("node")))
            .distinct()
        )
    else:
        nodes = nodes.select(F.col(nodes.columns[0]).alias("node")).distinct()

    n_row = nodes.agg(F.count("*").cast("double").alias("n"))  # 1-row, lazy

    outdeg = e.groupBy("src").agg(F.count("*").cast("double").alias("deg"))
    # Loop-invariant: every edge pre-weighted by 1/outdeg(src).
    e_w = e.join(outdeg, "src").select(
        "src", "dst", (F.lit(1.0) / F.col("deg")).alias("inv_deg")
    )
    e_w = e_w.persist()

    flagged = nodes.join(
        outdeg.select(F.col("src").alias("node"), F.lit(True).alias("has_out")),
        "node",
        "left",
    ).select("node", F.coalesce("has_out", F.lit(False)).alias("has_out"))

    ranks = flagged.crossJoin(F.broadcast(n_row)).select(
        "node", "has_out", (F.lit(1.0) / F.col("n")).alias("rank")
    )

    prev = None
    for _ in range(iters):
        dangling = ranks.filter(~F.col("has_out")).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("mass")
        )  # 1-row
        contrib = (
            e_w.join(ranks.select(F.col("node").alias("src"), "rank"), "src")
            .groupBy("dst")
            .agg(F.sum(F.col("rank") * F.col("inv_deg")).alias("contrib"))
        )
        ranks = (
            flagged.join(contrib.withColumnRenamed("dst", "node"), "node", "left")
            .crossJoin(F.broadcast(n_row))
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                "has_out",
                (
                    (1.0 - damping) / F.col("n")
                    + damping
                    * (
                        F.coalesce("contrib", F.lit(0.0))
                        + F.col("mass") / F.col("n")
                    )
                ).alias("rank"),
            )
        )
        if eager:
            ranks = ranks.persist()
            ranks.count()
            if prev is not None:
                prev.unpersist()
            prev = ranks
    e_w.unpersist()
    return ranks.select("node", "rank")


# ---------------------------------------------------------------- gate
# Deterministic synthetic link graph over the shared documents table:
# doc i links to (17*i + j) % N for j in 1..3, except docs with
# i % 11 == 0, which have NO outlinks (dangling — exercises the mass
# redistribution path). Both engines derive the identical graph.


def _edges(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents").select("doc_id")
    n_row = docs.agg(F.count("*").alias("n"))
    return (
        docs.filter(F.col("doc_id") % 11 != 0)
        .crossJoin(F.broadcast(n_row))
        .select(
            F.col("doc_id").alias("src"),
            F.explode(
                F.array(
                    *[
                        F.pmod(F.col("doc_id") * 17 + F.lit(j), F.col("n"))
                        for j in (1, 2, 3)
                    ]
                )
            ).alias("dst"),
        )
    )


def link_pagerank(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents").select(F.col("doc_id").alias("node"))
    ranks = pagerank(_edges(spark, sf), nodes=docs, eager=False)
    return ranks.select(
        F.col("node").alias("doc_id"), F.round("rank", 6).alias("rank")
    )


def _iter_sql(i: int) -> str:
    """One unrolled PageRank iteration as DuckDB CTE clauses."""
    p = i - 1
    return f"""
d{p} AS (
  SELECT coalesce(sum(rank), 0) AS mass FROM r{p}
  WHERE node NOT IN (SELECT src FROM outdeg)
),
r{i} AS (
  SELECT d.doc_id AS node,
         (1 - {DAMPING}) / (SELECT n FROM nn)
         + {DAMPING} * (coalesce(c.contrib, 0)
                        + (SELECT mass FROM d{p}) / (SELECT n FROM nn)) AS rank
  FROM documents d
  LEFT JOIN (
    SELECT e.dst, sum(r.rank / o.deg) AS contrib
    FROM edges e
    JOIN r{p} r ON r.node = e.src
    JOIN outdeg o ON o.src = e.src
    GROUP BY e.dst
  ) c ON c.dst = d.doc_id
)"""


PAGERANK_SQL = (
    """
WITH nn AS (SELECT count(*)::DOUBLE AS n FROM documents),
edges AS (
  SELECT doc_id AS src, (doc_id * 17 + j.j) % (SELECT count(*) FROM documents) AS dst
  FROM documents, (SELECT unnest([1, 2, 3]) AS j) j
  WHERE doc_id % 11 <> 0
),
outdeg AS (SELECT src, count(*)::DOUBLE AS deg FROM edges GROUP BY src),
r0 AS (SELECT doc_id AS node, 1.0 / (SELECT n FROM nn) AS rank FROM documents),"""
    + ",".join(_iter_sql(i) for i in range(1, ITERS + 1))
    + f"""
SELECT node AS doc_id, round(rank, 6) AS rank FROM r{ITERS}
"""
)


QUERIES = {"link_pagerank": link_pagerank}
ORACLES = {"link_pagerank": PAGERANK_SQL}
