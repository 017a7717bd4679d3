"""Persisted IVF-flat ANN index whose PHYSICAL layout is the inverted
file, with O(delta) incremental maintenance.

``ops/similarity.ivf_topk`` computes an IVF search as one plan over an
in-memory assignment; this module is the STORED counterpart a crawl
deployment needs: the (vec_id, cell, embedding) posting table lives in
a BucketedTable bucketed BY CELL ID, so one leaf directory per cell IS
the inverted list. A search therefore prunes physically — it opens
only the n_probe probed cells' directories (``read_buckets``) and
never scans the other (n_cells - n_probe)/n_cells of the corpus; at
10^9 vectors with 16 cells / 4 probes, 3/4 of the data is never read.

Maintenance mirrors CrawlEngine.publish_dedup's incremental contract:
the source embeddings snapshot is recorded in the index manifest meta;
``update`` assigns ONLY the rows appended since (SnapTable.
read_incremental) under the FROZEN stored centroids and MERGEs them
into their cells' buckets — exact, because with frozen centroids and
immutable embeddings an assignment never moves cells, so incremental
build == full build with the same centroids (asserted in
tests/test_ivf_index.py). A source history that stops being
append-diffable triggers a full rebuild (fresh centroids), the IVF
analogue of the backup module's generation roll. Centroid drift under
distribution shift is the standard IVF trade: recall degrades
gracefully and ``build`` re-trains — the same dial FAISS/Milvus expose
as periodic re-clustering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..snaptable import BucketedTable, SnapTable
from .quantize import dequantize, quantize_embeddings
from .similarity import _cell_assign, _cosine_fn, _sq_dist, ivf_kmeans_centroids


class IvfIndex:
    def __init__(self, path: str, n_cells: int = 16) -> None:
        self.n_cells = n_cells
        self.table = BucketedTable(path, n_buckets=n_cells, name="ivf_index")

    @staticmethod
    def _stored_form(assigned: DataFrame, quantize: bool) -> DataFrame:
        """Posting-row storage form. Quantized: per-vector int8 codes +
        scale (ops/quantize.py) — 3.8× narrower posting rows in
        memory, measured 1.8× smaller parquet cells at dim 64.
        Assignment always happens on the fp32 source vectors (exact,
        same as full build), only STORAGE is quantized, so the
        incremental == full parity argument is unchanged."""
        if not quantize:
            return assigned.select("vec_id", "cell", "embedding")
        return quantize_embeddings(assigned).select("vec_id", "cell", "q", "scale")

    # ------------------------------------------------------------ build
    def build(
        self,
        spark: SparkSession,
        source: SnapTable,
        centroids: DataFrame | None = None,
        quantize: bool = False,
    ) -> dict:
        """Full (re)build: train centroids over a bounded sample (unless
        given), assign every vector, commit all cells. Records the
        source snapshot so later updates can diff from it."""
        emb = source.read(spark).select("vec_id", "embedding")
        if centroids is None:
            if emb.isEmpty():
                # no vectors to train on: commit an empty index (zero
                # centroids, every cell empty) instead of crashing
                # inside the k-means sampler — search over it returns
                # no rows, and a later build/update retrains normally
                empty = self._stored_form(
                    emb.limit(0).select(
                        "vec_id", F.lit(0).cast("int").alias("cell"), "embedding"
                    ),
                    quantize,
                )
                self.table.replace_buckets(
                    empty,
                    list(range(self.n_cells)),
                    F.col("cell"),
                    meta=self._meta([], source.current_snapshot_id(), quantize),
                )
                return {"mode": "build", "cells": self.n_cells, "empty": True}
            centroids = ivf_kmeans_centroids(spark, emb, n_cells=self.n_cells)
        rows = centroids.collect()
        cent_meta = [[int(r["cell"]), [float(v) for v in r["cv"]]] for r in rows]
        assigned = self._stored_form(
            emb.join(_cell_assign(emb, centroids), "vec_id"), quantize
        )
        self.table.replace_buckets(
            assigned,
            list(range(self.n_cells)),
            F.col("cell"),
            meta=self._meta(cent_meta, source.current_snapshot_id(), quantize),
        )
        return {"mode": "build", "cells": self.n_cells, "quantized": quantize}

    def update(
        self, spark: SparkSession, source: SnapTable, quantize: bool = False
    ) -> dict:
        """O(delta) maintenance: assign only the rows appended to
        ``source`` since the last build/update, under the stored
        centroids, and merge them into their cells' buckets. Falls back
        to a full rebuild when the source history is not
        append-diffable. ``quantize`` applies only when this update
        falls through to a first/full build; an existing index keeps
        its stored form (manifest ``ivf_quantized``)."""
        m = self.table.current_manifest()
        if m is None:
            return self.build(spark, source, quantize=quantize)
        meta = m.get("meta") or {}
        if not meta.get("ivf_centroids"):
            # index was built over an empty source (no centroids):
            # incremental assignment has nothing to assign INTO — the
            # first real data triggers the full build/train path
            return self.build(spark, source, quantize=quantize)
        try:
            delta = source.read_incremental(spark, int(meta["ivf_source_snapshot"]))
        except ValueError:
            # history rewrote → retrain (keep the stored form)
            return self.build(
                spark, source, quantize=bool(meta.get("ivf_quantized"))
            )
        sid = source.current_snapshot_id()
        quantize = bool(meta.get("ivf_quantized"))  # storage form is sticky
        delta = delta.select("vec_id", "embedding")
        assigned = self._stored_form(
            delta.join(_cell_assign(delta, self.centroids_df(spark)), "vec_id"),
            quantize,
        )
        self.table.merge(
            assigned,
            ["vec_id"],
            F.col("cell"),
            meta=self._meta(meta["ivf_centroids"], sid, quantize),
        )
        # an empty delta commits nothing in merge(); still advance the
        # recorded base so the next update diffs from here
        head = self.table.current_manifest()
        if (head.get("meta") or {}).get("ivf_source_snapshot") != sid:
            self.table.commit_dirs(
                head["dirs"],
                self.table.schema(),
                {**head.get("meta", {}), "ivf_source_snapshot": sid},
                op="ivf-meta",
            )
        return {"mode": "update", "source_snapshot": sid}

    def _meta(self, cent: list, sid, quantize: bool = False) -> dict:
        return {
            "ivf_centroids": cent,
            "ivf_source_snapshot": sid,
            "ivf_quantized": quantize,
        }

    def centroids_df(self, spark: SparkSession) -> DataFrame:
        meta = (self.table.current_manifest() or {}).get("meta") or {}
        return spark.createDataFrame(
            [(int(c), [float(v) for v in cv]) for c, cv in meta["ivf_centroids"]],
            schema="cell int, cv array<double>",
        )

    # ----------------------------------------------------------- search
    def search(
        self,
        spark: SparkSession,
        queries: DataFrame,
        n_probe: int = 4,
        top_k: int = 3,
    ) -> DataFrame:
        """ANN top-k for ``queries`` (qid, embedding): probe the n_probe
        nearest cells per query, score exactly within probed cells only.
        The candidate scan opens ONLY the probed cells' leaf dirs — the
        union over queries, collected as at most n_cells ints (never a
        data-scale collect).

        A never-built index returns an empty result (same behavior as
        an index built over an empty source), not a KeyError."""
        meta = (self.table.current_manifest() or {}).get("meta") or {}
        if not meta.get("ivf_centroids"):
            return queries.select(
                "qid", F.col("qid").alias("nid")
            ).limit(0).select(
                "qid",
                F.lit(0).alias("rank"),
                "nid",
                F.lit(0.0).alias("cosine"),
            )
        centroids = self.centroids_df(spark)
        qd = F.round(_sq_dist(F.col("embedding"), F.col("cv")), 6)
        probes = (
            queries.crossJoin(F.broadcast(centroids))
            .select(F.col("qid"), "cell", qd.alias("d"))
            .withColumn(
                "pr", F.row_number().over(Window.partitionBy("qid").orderBy("d", "cell"))
            )
            .filter(F.col("pr") <= n_probe)
            .select("qid", "cell")
            .cache()
        )
        probed = sorted(int(r["cell"]) for r in probes.select("cell").distinct().collect())
        cand = self.table.read_buckets(spark, probed)
        if meta.get("ivf_quantized"):
            # int8 posting rows: reconstruct fp32 candidates from codes
            # + per-vector scale — probed-cell rows stay 3.8× narrower
            # in memory (1.8× on disk); scoring is unchanged downstream
            cand = dequantize(cand, out="embedding").drop("q", "scale")
        joined = (
            probes.join(cand.select("cell", F.col("vec_id").alias("nid"),
                                    F.col("embedding").alias("nv")), "cell")
            .join(queries.select("qid", F.col("embedding").alias("qv")), "qid")
            .filter(F.col("qid") != F.col("nid"))
            .select("qid", "nid", "qv", "nv")
            .distinct()
        )
        cos_udf = F.pandas_udf(_cosine_fn, "double")
        scored = joined.select(
            "qid", "nid", F.round(cos_udf(F.col("qv"), F.col("nv")), 4).alias("cosine")
        )
        w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("nid").asc())
        out = (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= top_k)
            .select("qid", "rank", "nid", "cosine")
        )
        probes.unpersist()
        return out
