"""Versioned training-set export — the consumable end-product of the
crawl: dedup keepers only, curation-filtered, packed into deterministic
fixed-row shards with an atomic manifest.

Reference parity: the reference's consumable product is a search index
published by bulk upsert + alias swap (ElasticSearchIndexHandler.java
bulk flush, EsService.java swapIndexInAlias); a training-data pipeline's
consumable product is a sharded corpus release. This module re-expresses
that publish step Spark-first: one DataFrame job curates (near-dup
keeper anti-join + quality thresholds), assigns every surviving row an
exact global rank WITHOUT a global sort, writes one parquet directory
per fixed-size shard, and commits the release with a single atomic
manifest replace (the alias-swap analogue) so readers see the previous
release or the new one, never a partial write.

Scale notes (10^10 images):
- The whole export is ONE full-data shuffle: ranking shuffles by a
  coarse prefix of the order key (parallel local windows, same
  two-phase shape as relational.batch_grouping/A3 generalized to string
  keys), the per-coarse-key offsets relation is tiny and broadcast
  back, and the partitionBy(shard) write needs no second repartition
  because rank shards are contiguous in shard space — each write task
  emits files for only the few shards its coarse range covers.
- Pixel decoding happens at most ONCE: not at all without quality
  thresholds, and exactly once (shuffle-free Arrow stage + DISK_ONLY
  persist of the curated rows) with them — see export_training_set.
- Per-shard row counts and an order-independent checksum are computed
  from a read-back of the written files (footer-cheap: only the id
  column is scanned), so the manifest attests what actually landed.
- Releases are immutable and versioned; expire_exports() GCs data dirs
  no manifest references, mirroring SnapTable.expire.
- A series grows by O(delta) releases (export_training_delta): new
  shards append to the manifest's data-dir list, and a full export over
  the same series is the compaction release — readers union one parquet
  relation per release dir, so compaction cadence bounds both the dir
  count and the union width.
"""

from __future__ import annotations

import os
import shutil
import uuid
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from .snaptable import atomic_write_json

MANIFEST = "MANIFEST.json"


def shard_by_rank(
    df: DataFrame,
    order_col: str,
    shard_rows: int,
    coarse_chars: int = 2,
) -> DataFrame:
    """Add an exact global-rank ``shard`` column (floor(rank/shard_rows)
    over rows ordered by ``order_col``) without funneling the table
    through one task: rank locally within prefix ranges of the order
    key (a string prefix respects lexicographic order, so per-range
    local ranks + cumulative range offsets = the exact global rank),
    aggregate per-range counts (tiny — at most 16^coarse_chars rows for
    hex keys), turn them into offsets with a window over the RANGE rows
    only, and broadcast the offsets back. Two-phase shape shared with
    relational.batch_grouping (A3), generalized from integer division
    to string-prefix ranges.

    ``order_col`` values must be unique (image_id is, by construction):
    with duplicates the global rank — hence which duplicate lands in
    which shard — is not deterministic, though shard SIZES still are."""
    rk = F.substring(F.col(order_col), 1, coarse_chars)
    local = df.withColumn("_rk", rk).withColumn(
        "_lrn",
        F.row_number().over(Window.partitionBy("_rk").orderBy(order_col)),
    )
    # per-range count = max local row_number, aggregated from the SAME
    # windowed relation as the main branch (not a fresh groupBy on df):
    # the two branches then share one canonical Exchange subtree, so
    # ReuseExchange runs everything below the shuffle — including any
    # upstream Arrow decode stage — exactly once
    counts = local.groupBy("_rk").agg(F.max("_lrn").alias("_c"))
    w_off = Window.orderBy("_rk").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.withColumn(
        "_off", F.coalesce(F.sum("_c").over(w_off), F.lit(0))
    ).select("_rk", "_off")
    return (
        local.join(F.broadcast(offsets), "_rk")
        .withColumn(
            "shard",
            F.floor((F.col("_off") + F.col("_lrn") - 1) / shard_rows).cast("int"),
        )
        .drop("_rk", "_lrn", "_off")
    )


_QUALITY_COLS = [
    T.StructField("entropy", T.DoubleType(), False),
    T.StructField("laplacian_var", T.DoubleType(), False),
    T.StructField("contrast", T.DoubleType(), False),
]


def with_quality(images_df: DataFrame) -> DataFrame:
    """Append curation stats (entropy / Laplacian variance / RMS
    contrast, imageops.quality_stats) to full image rows in one
    shuffle-free Arrow stage — bytes cross into Python exactly once and
    come straight back, so the stage pipelines into whatever shuffle or
    write follows it."""
    out_schema = T.StructType(
        list(images_df.schema.fields) + list(_QUALITY_COLS)
    )
    cols = [f.name for f in out_schema.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .codec import decode
        from .ops.imageops import quality_stats

        for pdf in batches:
            if pdf.empty:
                continue
            stats = [
                quality_stats(decode(b, f))
                for b, f in zip(pdf["bytes"], pdf["fmt"])
            ]
            for k in ("entropy", "laplacian_var", "contrast"):
                pdf[k] = [s[k] for s in stats]
            yield pdf[cols]

    return images_df.mapInPandas(run, out_schema)


def _dirs(m: dict) -> list[str]:
    """A release's data dirs — [] for an empty release (data_dir None)."""
    d = m.get("data_dirs")
    if d is not None:
        return list(d)
    return [m["data_dir"]] if m.get("data_dir") else []


def _read_manifest(out_root: str) -> dict | None:
    import json

    try:
        with open(os.path.join(out_root, MANIFEST)) as f:
            return json.load(f)
    except FileNotFoundError:
        return None


def read_training_set(spark: SparkSession, out_root: str) -> DataFrame:
    """Read the current release through its manifest (never by listing
    out_root — a concurrent export's uncommitted data dir must stay
    invisible, exactly like SnapTable.read)."""
    m = _read_manifest(out_root)
    if m is None:
        raise FileNotFoundError(f"no training-set release at {out_root}")
    dirs = _dirs(m)
    if not dirs:
        # empty release: no files were written; the manifest pins the
        # schema so readers still get a correctly-typed frame
        import json

        return spark.createDataFrame(
            [], T.StructType.fromJson(json.loads(m["schema"]))
        )
    # one read per release dir, unioned BY NAME: a single multi-path
    # read trips partition discovery (each dir has its own shard=N
    # layout under a different base), and by-name union tolerates
    # column-order drift between releases
    parts = [spark.read.parquet(os.path.join(out_root, d)) for d in dirs]
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    return df


def export_training_set(
    spark: SparkSession,
    images_df: DataFrame,
    out_root: str,
    dedup_df: DataFrame | None = None,
    shard_rows: int = 10_000,
    min_entropy: float | None = None,
    min_lap_var: float | None = None,
    mix: dict | None = None,
    redact_captions: bool = False,
    sources: dict | None = None,
    decontaminate_df: DataFrame | None = None,
    decontaminate_n: int = 8,
) -> dict:
    """Curate + shard + atomically publish one training-set release.

    images_df: full image rows (image_id, bytes, fmt, caption, ...).
    dedup_df:  optional keeper map (image_id, is_dup) from the pHash
               near-dup publish; rows flagged is_dup are dropped
               (keepers and never-paired rows survive).
    min_entropy / min_lap_var: optional curation thresholds; when set,
               quality stats are computed inline (one decode pass) and
               recorded as columns in the shards; when both are None the
               export does no pixel decoding at all (use the standalone
               image_quality op for stats without thresholds).
    mix:       optional data-mixing policy applied AFTER dedup and
               curation (quotas count shippable rows): {"stratum_col":
               str, "weights": {stratum: w}, "total": int, "salt": str}
               — quotas_for_mix water-fills the weights into exact
               per-stratum quotas, stratified_quota picks them
               hash-deterministically (ops/sampling.py), and the
               realized quotas land in the manifest. Mixed series
               release by FULL exports only (a delta re-mix would
               silently skew the global composition — see
               export_training_delta).
    redact_captions: scrub PII shapes from the caption column before
               shipping (ops/text.redact_pii — chained regexp_replace,
               free inside the existing projection). Recorded in the
               manifest filters; deltas inherit it from the series.
    sources:   provenance to pin in the manifest (snapshot ids).
    decontaminate_df: optional benchmark corpus (must expose a
               `caption` column). Rows sharing any word n-gram
               (decontaminate_n) with it are DROPPED before curation —
               ops/text.decontaminate run over (image_id, caption)
               only, so the broadcast-shingle semi-join never carries
               image bytes and the flagged-id relation is
               O(contamination). The policy ({n}) lands in the
               manifest filters (deltas must honor it) and every
               release attests its own dropped count.
    """
    df = images_df
    if dedup_df is not None:
        flags = dedup_df.select("image_id", "is_dup")
        df = (
            df.join(flags, "image_id", "left")
            .filter(~F.coalesce(F.col("is_dup"), F.lit(False)))
            .drop("is_dup")
        )
    decon_dropped = None
    bad = None
    if decontaminate_df is not None:
        from .ops.text import decontaminate

        bad = (
            decontaminate(
                df.select("image_id", "caption"),
                decontaminate_df,
                n=decontaminate_n,
                text_col="caption",
                id_col="image_id",
            )
            .filter(F.col("contaminated"))
            .select("image_id")
            .cache()
        )
        decon_dropped = bad.count()  # O(contamination) rows
        df = df.join(bad, "image_id", "left_anti")
    df, filters, persisted = _curate(df, min_entropy, min_lap_var)
    if decontaminate_df is not None:
        filters["decontaminate"] = {"n": decontaminate_n}
    if mix:
        from .ops.sampling import quotas_for_mix, stratified_quota

        scol, salt = mix["stratum_col"], mix.get("salt", "")
        dropped = None
        if mix.get("stratum_expr"):
            # derived stratum (e.g. the URL's host: parse_url(url,
            # 'HOST')) — materialize it as a column for the quota
            # machinery, drop it before shipping. Plain projection;
            # costs nothing beyond the expression itself.
            df = df.withColumn(scol, F.expr(mix["stratum_expr"]))
            dropped = scol
        counts = {r[0]: r[1] for r in df.groupBy(scol).count().collect()}
        quotas = quotas_for_mix(counts, mix["weights"], mix["total"])
        df = stratified_quota(
            df, scol, quotas, "image_id", salt, counts=counts
        )
        if dropped:
            df = df.drop(dropped)
        filters["mix"] = {
            "stratum_col": scol,
            "stratum_expr": mix.get("stratum_expr"),
            "weights": mix["weights"],
            "total": mix["total"],
            "salt": salt,
            "quotas": quotas,
        }
    if redact_captions:
        from .ops.text import redact_pii

        df = redact_pii(df, "caption")
        filters["redact_captions"] = True

    prev = _read_manifest(out_root)
    version = (prev["version"] + 1) if prev else 1
    if df.isEmpty():
        # zero survivors (nothing crawled yet, or thresholds above the
        # corpus): publish an honest EMPTY release — partitionBy of an
        # empty frame writes no parquet files, so the attestation
        # read-back could not even infer a schema. The schema is pinned
        # in the manifest so read_training_set can still return a
        # correctly-typed empty frame.
        if persisted is not None:
            persisted.unpersist()
        os.makedirs(out_root, exist_ok=True)
        manifest = {
            "version": version,
            "data_dir": None,
            "data_dirs": [],
            "shard_rows": shard_rows,
            "n_rows": 0,
            "n_shards": 0,
            "shards": {},
            "filters": filters,
            # pinned read schema matches a written release's: data
            # columns plus the shard partition column (int, nullable as
            # parquet partition discovery types it)
            "schema": T.StructType(
                list(df.schema.fields)
                + [T.StructField("shard", T.IntegerType(), True)]
            ).json(),
            "sources": sources or {},
            "previous_data_dirs": _dirs(prev) if prev else [],
        }
        if decon_dropped is not None:
            manifest["decontamination"] = {"dropped": decon_dropped}
        if bad is not None:
            bad.unpersist()
        atomic_write_json(os.path.join(out_root, MANIFEST), manifest)
        return manifest
    df = shard_by_rank(df, "image_id", shard_rows)
    data_dir = f"v{version:06d}-{uuid.uuid4().hex[:8]}"
    shards = _write_release(spark, df, out_root, data_dir)
    if persisted is not None:
        persisted.unpersist()
    if bad is not None:
        bad.unpersist()
    n_rows = sum(s["rows"] for s in shards.values())
    _assert_full_shards(shards, shard_rows)
    manifest = {
        "version": version,
        "data_dir": data_dir,
        "data_dirs": [data_dir],
        "shard_rows": shard_rows,
        "n_rows": n_rows,
        "n_shards": len(shards),
        "shards": {str(k): v for k, v in sorted(shards.items())},
        "filters": filters,
        "sources": sources or {},
        "previous_data_dirs": _dirs(prev) if prev else [],
    }
    if decon_dropped is not None:
        manifest["decontamination"] = {"dropped": decon_dropped}
    atomic_write_json(os.path.join(out_root, MANIFEST), manifest)
    return manifest


def export_training_delta(
    spark: SparkSession,
    delta_images_df: DataFrame,
    out_root: str,
    dedup_df: DataFrame | None = None,
    sources: dict | None = None,
    decontaminate_df: DataFrame | None = None,
) -> dict:
    """Append one DELTA release to an existing series: only the rows in
    ``delta_images_df`` (the images added since the series' recorded
    source snapshot) are curated and packed into NEW shards numbered
    after the existing ones — the O(delta) analogue of the full export,
    completing the incremental-maintenance family through the release
    step. The series pins shard_rows and quality filters at creation so
    every release is schema- and policy-consistent.

    Near-dup semantics across releases: a delta row is shipped only if
    (a) the current keeper map does not flag it as a dup AND (b) its
    near-dup cluster does not intersect the already-released ids — so a
    new image that pairs with a released one is dropped even when its
    id would make it the cluster keeper (the cluster is already
    represented). The released-ids relation is a thin id-column scan of
    the prior releases (parquet column pruning: ~16 bytes/row of
    multi-KB rows), and the keeper-map joins touch only paired rows.
    Released shards are immutable: a dup discovered BETWEEN two already
    -released rows is not revoked by a delta — a full export over the
    same out_root re-materializes the exact current keeper set as a
    compaction release.
    """
    prev = _read_manifest(out_root)
    if prev is None:
        raise FileNotFoundError(
            f"no release series at {out_root}: run export_training_set first"
        )
    if prev["filters"].get("mix"):
        # a mixture is a GLOBAL property of the release; applying the
        # weights to the delta alone would skew the series composition
        # toward whatever the delta happens to contain. Mixed series
        # re-release by full export (the compaction release re-mixes
        # over the whole corpus with the same policy).
        raise ValueError(
            "series was created with a mix policy: re-release with "
            "export_training_set (full re-mix), not a delta append"
        )
    shard_rows = prev["shard_rows"]
    df = delta_images_df
    if dedup_df is not None:
        released = read_training_set(spark, out_root).select("image_id")
        touched = (
            dedup_df.join(released, "image_id", "left_semi")
            .select("keeper_id")
            .distinct()
        )
        flags = dedup_df.select("image_id", "keeper_id", "is_dup")
        df = (
            df.join(flags, "image_id", "left")
            .filter(~F.coalesce(F.col("is_dup"), F.lit(False)))
            # null keeper_id (never paired) never matches → row kept
            .join(touched, "keeper_id", "left_anti")
            .drop("keeper_id", "is_dup")
        )
    # series decontamination policy: a delta must ship with the same
    # hygiene — the caller re-supplies the benchmark corpus (the policy
    # pins n; the manifest attests this release's dropped count)
    dec = prev["filters"].get("decontaminate")
    decon_dropped = None
    bad = None
    if dec:
        if decontaminate_df is None:
            raise ValueError(
                "series decontaminates against a benchmark (filters."
                "decontaminate): pass decontaminate_df to the delta"
            )
        from .ops.text import decontaminate

        bad = (
            decontaminate(
                df.select("image_id", "caption"),
                decontaminate_df,
                n=int(dec["n"]),
                text_col="caption",
                id_col="image_id",
            )
            .filter(F.col("contaminated"))
            .select("image_id")
            .cache()
        )
        decon_dropped = bad.count()
        df = df.join(bad, "image_id", "left_anti")
    elif decontaminate_df is not None:
        raise ValueError(
            "series has no decontamination policy: re-release with "
            "export_training_set to introduce one"
        )
    df, _, persisted = _curate(
        df, prev["filters"].get("min_entropy"), prev["filters"].get("min_lap_var")
    )
    if prev["filters"].get("redact_captions"):
        # series policy: deltas ship with the same caption hygiene
        from .ops.text import redact_pii

        df = redact_pii(df, "caption")
    version = prev["version"] + 1
    if df.isEmpty():
        # nothing new: advance the series' recorded sources without a
        # data dir, so the next delta diffs from the right snapshot
        if persisted is not None:
            persisted.unpersist()
        if bad is not None:
            bad.unpersist()
        manifest = {**prev, "version": version, "sources": sources or {}}
        if decon_dropped is not None:
            manifest["decontamination"] = {"dropped": decon_dropped}
        atomic_write_json(os.path.join(out_root, MANIFEST), manifest)
        return manifest
    df = shard_by_rank(df, "image_id", shard_rows).withColumn(
        "shard", (F.col("shard") + prev["n_shards"]).cast("int")
    )
    data_dir = f"v{version:06d}-delta-{uuid.uuid4().hex[:8]}"
    new_shards = _write_release(spark, df, out_root, data_dir)
    if persisted is not None:
        persisted.unpersist()
    if bad is not None:
        bad.unpersist()
    _assert_full_shards(new_shards, shard_rows)
    assert min(new_shards) == prev["n_shards"], "shard numbering must continue"
    shards = {int(k): v for k, v in prev["shards"].items()} | new_shards
    manifest = {
        "version": version,
        "data_dir": data_dir,
        "data_dirs": _dirs(prev) + [data_dir],
        "shard_rows": shard_rows,
        "n_rows": sum(s["rows"] for s in shards.values()),
        "n_shards": len(shards),
        "shards": {str(k): v for k, v in sorted(shards.items())},
        "filters": prev["filters"],
        "sources": sources or {},
        "previous_data_dirs": _dirs(prev),
    }
    if decon_dropped is not None:
        manifest["decontamination"] = {"dropped": decon_dropped}
    atomic_write_json(os.path.join(out_root, MANIFEST), manifest)
    return manifest


def _curate(df: DataFrame, min_entropy, min_lap_var):
    """Optional decode-backed quality stage. The curated relation is
    persisted to disk before ranking: shard_by_rank's offsets branch
    re-evaluates its input (column pruning makes its Exchange subtree
    differ from the main branch's, so ReuseExchange cannot merge them —
    verified on the executed plan), and without the persist every image
    would be decoded twice. DISK_ONLY materializes exactly the rows the
    write is about to read — the same O(release) local footprint as the
    rank shuffle itself. Threshold-free exports skip all of this: no
    decode at all, and the offsets branch's re-scan reads only the thin
    id column (bytes pruned)."""
    filters: dict = {}
    persisted = None
    if min_entropy is not None or min_lap_var is not None:
        from pyspark import StorageLevel

        # Decode is the dominant cost of a curated export, and its
        # parallelism is whatever the parquet read gave us: a small
        # corpus (or one packed into few large files) can land far
        # fewer input partitions than cores (472 MB / 128 MB
        # maxPartitionBytes = 4 tasks on 32 cores — measured 135 vs
        # 1040 rows/s). When under-partitioned, buy full decode width
        # with one extra shuffle of the bytes; the branch never fires
        # when input partitions already cover the cluster (the 100 TB
        # case), and when it does fire the shuffle is strictly cheaper
        # than the decode serialization it removes.
        par = df.sparkSession.sparkContext.defaultParallelism
        if df.rdd.getNumPartitions() < par:
            df = df.repartition(par)
        df = with_quality(df)
        if min_entropy is not None:
            df = df.filter(F.col("entropy") >= min_entropy)
            filters["min_entropy"] = min_entropy
        if min_lap_var is not None:
            df = df.filter(F.col("laplacian_var") >= min_lap_var)
            filters["min_lap_var"] = min_lap_var
        persisted = df.persist(StorageLevel.DISK_ONLY)
        df = persisted
    return df, filters, persisted


def _write_release(
    spark: SparkSession, df: DataFrame, out_root: str, data_dir: str
) -> dict:
    """Write one release's shards and attest what actually landed:
    counts + an order-independent id checksum per shard from a
    read-back (id column only — footers + one thin column, no image
    bytes decoded)."""
    os.makedirs(out_root, exist_ok=True)
    full = os.path.join(out_root, data_dir)
    df.write.partitionBy("shard").parquet(full)
    back = spark.read.parquet(full).select("image_id", "shard")
    stats = (
        back.groupBy("shard")
        .agg(
            F.count("*").alias("rows"),
            # bit_xor, not sum: order-independent AND overflow-free
            # (ANSI mode makes a long-sum of random 64-bit hashes raise)
            F.bit_xor(F.xxhash64("image_id")).alias("checksum"),
        )
        .collect()
    )
    return {
        int(r["shard"]): {"rows": int(r["rows"]), "checksum": int(r["checksum"])}
        for r in stats
    }


def _assert_full_shards(shards: dict, shard_rows: int) -> None:
    """Within one release, every shard but the last holds exactly
    shard_rows (across a series, each release's own tail shard may be
    partial — shards are immutable once shipped)."""
    if shards:
        full_shards = sorted(shards)[:-1]
        assert all(shards[s]["rows"] == shard_rows for s in full_shards), (
            "internal: every shard but the last must hold exactly shard_rows"
        )


def expire_exports(out_root: str) -> int:
    """GC every data dir the current manifest does not reference (its
    own data dirs plus the immediately-previous release's, kept so a
    reader that opened the old manifest just before the swap can
    finish). Returns the number of directories removed."""
    m = _read_manifest(out_root)
    if m is None:
        return 0
    keep = set(_dirs(m)) | set(
        m.get("previous_data_dirs") or []
    )
    removed = 0
    for d in os.listdir(out_root):
        p = os.path.join(out_root, d)
        if d != MANIFEST and os.path.isdir(p) and d not in keep:
            shutil.rmtree(p)
            removed += 1
    return removed
