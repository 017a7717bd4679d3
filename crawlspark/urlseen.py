"""URL-seen set: exact dedup table + partitioned cuckoo pre-filter.

Generalizes the reference's skip-if-exists fetch dedup
(contentful/backup/ContentfulBackup.java:180-182) and upsert-by-id
indexing (mendeley/ElasticSearchIndexHandler.java:213-217) to a
10^10-URL frontier:

* **Exact layer** — a SnapTable of (url, url_hash, status, round_id),
  bucketed by ``pmod(url_hash, n_buckets)``; novelty = LEFT ANTI join.
  At real scale this is the Iceberg dedup table of the north_rule.
* **Approximate layer** — a *partitioned cuckoo filter* materialized as
  a table of (pg, bucket, fp) rows. Membership has NO false negatives,
  so the engine uses it to split candidates into definitely-new
  (skip the expensive exact join entirely) and maybe-seen (exact-check
  only those). False-positive rate ~ 2*slots/2^fp_bits per bucket pair.

Partition-local eviction: a fingerprint's two candidate buckets are
constructed to share the same partition group ``pg``, so filter
maintenance is an ``applyInPandas`` over pg groups — one shuffle, no
cross-partition races, deterministic regardless of input partitioning
(inserts are sorted within each group before the cuckoo walk).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .hashing import h60_sql
from .snaptable import SnapTable

FP_MOD = 65535  # 16-bit fingerprints, 0 reserved for "empty"
SLOTS = 4
MAX_KICKS = 500
OVERFLOW_BUCKET = -1
# delta files per pg before the next insert compacts it (full rebuild)
MAX_DELTAS = 4

FILTER_SCHEMA = T.StructType(
    [
        T.StructField("pg", T.IntegerType(), False),
        T.StructField("bucket", T.LongType(), False),
        T.StructField("fp", T.IntegerType(), False),
    ]
)


def _with_fp_buckets(df: DataFrame, url_col: str, n_pg: int, k: int) -> DataFrame:
    """Add (pg, fp, b1, b2) columns. Both candidate buckets live in the
    same partition group: bucket = pg * k + bk, alt bk = bk XOR h(fp)."""
    h_sql = h60_sql(url_col)
    fph = F.expr(h60_sql(f"concat({url_col}, '|fp')"))
    fp = (F.pmod(fph, F.lit(FP_MOD)) + 1).cast("int")
    pg = F.pmod(F.expr(h_sql), F.lit(n_pg)).cast("int")
    bk1 = F.pmod(F.expr(f"({h_sql}) div {n_pg}"), F.lit(k))  # exact int division
    bk2 = F.pmod(bk1.bitwiseXOR(fp.cast("bigint") * F.lit(0x5BD1)), F.lit(k))
    return (
        df.withColumn("pg", pg)
        .withColumn("fp", fp)
        .withColumn("b1", (pg.cast("bigint") * k + bk1).cast("bigint"))
        .withColumn("b2", (pg.cast("bigint") * k + bk2).cast("bigint"))
    )


class CuckooSeen:
    """Partitioned cuckoo filter over a SnapTable."""

    def __init__(self, path: str, n_pg: int = 32, buckets_per_pg: int = 4096) -> None:
        # alt-bucket math (bk ^ fp*C) % k is an involution ONLY for
        # power-of-two k — any other k silently relocates evicted
        # fingerprints to buckets the read path never probes, breaking
        # the no-false-negatives invariant
        if buckets_per_pg <= 0 or buckets_per_pg & (buckets_per_pg - 1):
            raise ValueError(
                f"buckets_per_pg must be a power of two, got {buckets_per_pg}"
            )
        self.table = SnapTable(path, "cuckoo_seen")
        self.n_pg = n_pg
        self.k = buckets_per_pg
        # read-path caches handed out by split_candidates, released by
        # the engine once the round's frontier-update job has consumed
        # them (r2 ADVICE #3: one leaked cached DF per round otherwise)
        self._caches: list = []
        if not self.table.exists():
            self.table.commit_empty(FILTER_SCHEMA)

    # ------------------------------------------------------------ write
    def insert(self, urls: DataFrame, url_col: str = "url") -> int:
        """Merge new URLs into the filter state. One shuffle (groupBy pg);
        the cuckoo walk runs vectorized per partition group.

        INCREMENTAL at two levels (the Iceberg partition-overwrite +
        delta-file analogue — at 10^10 URLs the filter is tens of GB, so
        full rewrites per insert batch would dominate maintenance cost):

        * only partition groups receiving inserts are touched at all;
          untouched pgs keep their existing data files in the new
          snapshot;
        * a dirty pg whose inserts all place WITHOUT eviction writes
          only a DELTA file holding the newly placed fingerprints (write
          volume ∝ insert batch, not pg size). A pg is fully rebuilt —
          compacting its base + deltas into one file — only when an
          insert triggers an eviction walk / saturates, or when the pg
          has accumulated MAX_DELTAS delta files.

        The read path is unaffected: the manifest's dirs are base +
        delta files, and membership probes union them, so the
        no-false-negatives contract holds across both layouts."""
        spark = urls.sparkSession
        cand = _with_fp_buckets(urls.select(url_col), url_col, self.n_pg, self.k)
        new_rows = cand.select("pg", "fp", "b1", "b2")
        m = self.table.current_manifest()
        meta = (m.get("meta") or {}) if m else {}
        old_pg_dirs: dict[str, str] = dict(meta.get("pg_dirs", {}))
        old_deltas: dict[str, list[str]] = {
            p: list(ds) for p, ds in meta.get("pg_deltas", {}).items()
        }
        tracked = set(old_pg_dirs.values()) | {
            d for ds in old_deltas.values() for d in ds
        }
        cur_dirs = set(m["dirs"]) if m else set()
        if not cur_dirs <= tracked:
            # MIGRATION (r2 ADVICE #2): the current snapshot holds data
            # dirs the pg_dirs/pg_deltas meta does not track (a
            # pre-pg-layout write, or an external overwrite/compact of
            # this table). Silently committing only tracked dirs would
            # DROP those fingerprints and break the no-false-negatives
            # contract — instead fold the FULL current table into this
            # rebuild and re-derive every pg dir from scratch.
            state = self.table.read(spark)
            old_pg_dirs, old_deltas = {}, {}
            force_pgs: set[int] | None = None  # None = force ALL pgs full
        else:
            dirty = sorted(
                int(r["pg"]) for r in new_rows.select("pg").distinct().collect()
            )
            if not dirty:
                return self.table.current_snapshot_id()
            dirty_dirs = []
            for p in dirty:
                sp = str(p)
                if sp in old_pg_dirs:
                    dirty_dirs.append(old_pg_dirs[sp])
                dirty_dirs.extend(old_deltas.get(sp, ()))
            state = (
                spark.read.schema(FILTER_SCHEMA).parquet(*dirty_dirs)
                if dirty_dirs
                else spark.createDataFrame([], FILTER_SCHEMA)
            )
            # compaction trigger: pgs already carrying MAX_DELTAS files
            force_pgs = {
                int(p) for p, ds in old_deltas.items() if len(ds) >= MAX_DELTAS
            }
        # pack existing state rows alongside inserts; b1 = bucket marks state
        state_packed = state.select(
            "pg", "fp", F.col("bucket").alias("b1"), F.lit(None).cast("bigint").alias("b2")
        )
        both = state_packed.unionByName(new_rows.select("pg", "fp", "b1", "b2"))
        k = self.k
        out_schema = T.StructType(
            FILTER_SCHEMA.fields + [T.StructField("mode", T.StringType(), False)]
        )

        def rebuild(pdf: pd.DataFrame) -> pd.DataFrame:
            pg = int(pdf["pg"].iloc[0])
            force = force_pgs is None or pg in force_pgs
            buckets: dict[int, list[int]] = {}
            base_overflow = False
            new_overflow = False
            evicted = False
            placements: list[tuple[int, int]] = []  # (bucket, fp) added
            existing = pdf[pdf["b2"].isna()]
            inserts = pdf[pdf["b2"].notna()]
            for b, fp in zip(existing["b1"].astype("int64"), existing["fp"]):
                if b == OVERFLOW_BUCKET:
                    base_overflow = True
                    continue
                buckets.setdefault(int(b), []).append(int(fp))
            # deterministic insert order regardless of shuffle layout
            ins = inserts[["fp", "b1", "b2"]].astype("int64").drop_duplicates()
            ins = ins.sort_values(["b1", "fp"]).itertuples(index=False)
            for fp, b1, b2 in ins:
                if fp in buckets.get(b1, ()) or fp in buckets.get(b2, ()):
                    continue  # already present (dedup within filter)
                placed = False
                for b in (b1, b2):
                    slot = buckets.setdefault(b, [])
                    if len(slot) < SLOTS:
                        slot.append(fp)
                        placements.append((b, fp))
                        placed = True
                        break
                if placed:
                    continue
                # cuckoo eviction walk (deterministic victim choice) —
                # moves EXISTING fingerprints, so the pg can no longer
                # be expressed as base + additions: full rebuild below
                evicted = True
                cur_b, cur_fp = b1, fp
                for kick in range(MAX_KICKS):
                    slot = buckets[cur_b]
                    victim_i = (cur_fp + kick) % SLOTS
                    victim = slot[victim_i]
                    slot[victim_i] = cur_fp
                    bk = cur_b - pg * k
                    alt_bk = (bk ^ (victim * 0x5BD1)) % k
                    cur_b, cur_fp = pg * k + alt_bk, victim
                    aslot = buckets.setdefault(cur_b, [])
                    if len(aslot) < SLOTS:
                        aslot.append(cur_fp)
                        break
                else:
                    new_overflow = True  # filter saturated for this pg
            if force or evicted or new_overflow:
                out = [
                    {"pg": pg, "bucket": b, "fp": fp, "mode": "full"}
                    for b, fps in buckets.items()
                    for fp in fps
                ]
                if base_overflow or new_overflow:
                    out.append(
                        {"pg": pg, "bucket": OVERFLOW_BUCKET, "fp": 0, "mode": "full"}
                    )
            else:
                # delta: ONLY the newly placed fps; base files untouched.
                # Placement is identical to the full path (greedy b1/b2,
                # no eviction happened), so state rows are byte-identical
                # to what a full rebuild would produce.
                out = [
                    {"pg": pg, "bucket": b, "fp": fp, "mode": "delta"}
                    for b, fp in placements
                ]
            return pd.DataFrame(out, columns=["pg", "bucket", "fp", "mode"])

        new_state = both.groupBy("pg").applyInPandas(rebuild, out_schema)
        # write partitioned by "<pg>-<mode>" (single partition level so
        # snapshot expiry's parent/leaf walk keeps working; pg stays a
        # data column too, so leaf dirs read back standalone), then
        # commit a manifest mapping every pg to its base dir + deltas
        d = self.table.new_data_dir()
        new_state.withColumn(
            "pg_part", F.concat_ws("-", F.col("pg"), F.col("mode"))
        ).drop("mode").write.partitionBy("pg_part").mode("overwrite").parquet(d)
        pg_dirs = dict(old_pg_dirs)
        pg_deltas = {p: list(ds) for p, ds in old_deltas.items()}
        import os as _os

        for sub in sorted(_os.listdir(d)):
            if not sub.startswith("pg_part="):
                continue
            pg_s, mode = sub.split("=", 1)[1].rsplit("-", 1)
            leaf = _os.path.join(d, sub)
            if mode == "full":
                pg_dirs[pg_s] = leaf
                pg_deltas.pop(pg_s, None)
            else:
                pg_deltas.setdefault(pg_s, []).append(leaf)
        dirs = sorted(
            set(pg_dirs.values()) | {x for ds in pg_deltas.values() for x in ds}
        )
        return self.table.commit_dirs(
            dirs,
            FILTER_SCHEMA,
            {"pg_dirs": pg_dirs, "pg_deltas": pg_deltas},
            "overwrite",
        )

    # ------------------------------------------------------------- read
    def split_candidates(
        self, cand: DataFrame, url_col: str = "url"
    ) -> tuple[DataFrame, DataFrame]:
        """Return (definitely_new, maybe_seen). No false negatives: any
        URL previously inserted is guaranteed to land in maybe_seen."""
        spark = cand.sparkSession
        state = self.table.read(spark)
        overflow_pgs = state.filter(F.col("bucket") == OVERFLOW_BUCKET).select("pg")
        c = _with_fp_buckets(cand, url_col, self.n_pg, self.k)
        probes = c.select(
            url_col, "pg", "fp", F.explode(F.array("b1", "b2")).alias("bucket")
        )
        hits = (
            probes.join(state, ["pg", "bucket", "fp"], "left_semi")
            .select(url_col)
            .distinct()
        )
        over = c.join(F.broadcast(overflow_pgs), "pg", "left_semi").select(url_col)
        # cached: consumed by BOTH the maybe-semi and the new-anti join;
        # it is small (true hits + ~2*slots/2^16 false positives).
        # Tracked in self._caches — the caller releases it via
        # release_caches() after the consuming job completes.
        maybe_urls = hits.unionByName(over).distinct().cache()
        self._caches.append(maybe_urls)
        maybe = cand.join(maybe_urls, url_col, "left_semi")
        new = cand.join(maybe_urls, url_col, "left_anti")
        return new, maybe

    def release_caches(self) -> None:
        """Unpersist the cached candidate-split DataFrames handed out by
        split_candidates. The engine calls this once per round after the
        frontier-update job has consumed them."""
        for df in self._caches:
            df.unpersist()
        self._caches.clear()

    def rollback(self, snapshot_id: int) -> None:
        self.table.rollback(snapshot_id)
