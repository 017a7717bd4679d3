"""SnapTable — atomic-snapshot parquet tables (local Iceberg stand-in).

The reference publishes crawl output via a single atomic Elasticsearch
alias swap (es/ElasticSearchUtils.java:137-183) and rolls back failed
runs by deleting the in-progress index
(mendeley/ElasticSearchIndexHandler.java:239-242). The Spark-native
equivalent is an Iceberg table's snapshot commit / rollback. No Iceberg
runtime jar ships in this sandbox, so SnapTable provides the same
contract over plain parquet:

* every commit writes data to a fresh directory, then atomically
  republishes a JSON manifest via ``os.replace`` (readers see the old or
  the new snapshot, never a mix);
* ``append`` = new manifest referencing parent files + new files;
* ``overwrite`` = new manifest referencing only new files;
* ``rollback(snapshot_id)`` = republish an older manifest;
* snapshots carry arbitrary metadata (lineage, counters).

On a real cluster every call here maps 1:1 onto Iceberg operations
(``writeTo(...).append()``, ``CREATE OR REPLACE``, snapshot rollback);
the engine only talks to this interface.
"""

from __future__ import annotations

import json
import os
import threading
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def atomic_write_json(path: str, obj) -> None:
    """Write JSON via tmp-file + rename — readers see the old or the
    new content, never a torn write. Shared by every manifest/state
    file in the package (snapshot manifests, round manifests, backup
    STATE) so the durability pattern lives in one place."""
    tmp = path + f".tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        json.dump(obj, f)
    os.replace(tmp, path)


class SnapTable:
    def __init__(
        self,
        path: str,
        name: str | None = None,
        write_options: dict[str, str] | None = None,
    ) -> None:
        self.path = path
        self.name = name or os.path.basename(path.rstrip("/"))
        # per-table parquet writer options. The images table sets
        # compression=uncompressed: its bytes column is already
        # zlib-compressed by the codec, so snappy on top burns CPU in
        # the round's critical path (the append rides the fetch stage)
        # for ~0% size win — the standard columnar-storage rule that
        # pre-compressed binary columns ship uncompressed.
        self.write_options = dict(write_options or {})
        self.meta_dir = os.path.join(path, "_meta")
        self.data_dir = os.path.join(path, "data")
        # commits are a read-modify-write of HEAD + the max snapshot id;
        # the engine's concurrent round jobs write to DISTINCT tables,
        # but guard same-table races anyway (ADVICE: lost-commit risk).
        # RLock: merge holds it across its read-manifest → write → commit
        # sequence, and commit re-acquires.
        self._lock = threading.RLock()
        os.makedirs(self.meta_dir, exist_ok=True)
        os.makedirs(self.data_dir, exist_ok=True)

    # ------------------------------------------------------------ state
    def _head_path(self) -> str:
        return os.path.join(self.meta_dir, "HEAD")

    def current_snapshot_id(self) -> int | None:
        try:
            with open(self._head_path()) as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return None

    def _manifest_path(self, sid: int) -> str:
        return os.path.join(self.meta_dir, f"snap-{sid:08d}.json")

    def _read_manifest(self, sid: int) -> dict:
        with open(self._manifest_path(sid)) as f:
            return json.load(f)

    def current_manifest(self) -> dict | None:
        sid = self.current_snapshot_id()
        return None if sid is None else self._read_manifest(sid)

    # ---------------------------------------------------------- commits
    def _max_snapshot_id(self) -> int:
        mx = 0
        for f in os.listdir(self.meta_dir):
            if f.startswith("snap-") and f.endswith(".json"):
                mx = max(mx, int(f[5:-5]))
        return mx

    def _commit(self, dirs: list[str], schema_json: str, meta: dict | None, op: str) -> int:
        with self._lock:
            return self._commit_locked(dirs, schema_json, meta, op)

    def _commit_locked(self, dirs: list[str], schema_json: str, meta: dict | None, op: str) -> int:
        # ids never reused, even after rollback (history stays intact)
        sid = self._max_snapshot_id() + 1
        manifest = {
            "snapshot_id": sid,
            "op": op,
            "dirs": dirs,
            "schema": schema_json,
            "meta": meta or {},
            "parent": self.current_snapshot_id(),
        }
        mpath = self._manifest_path(sid)
        tmp = mpath + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, mpath)
        # atomic publish: HEAD pointer flip is the commit point
        tmp = self._head_path() + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            f.write(str(sid))
        os.replace(tmp, self._head_path())
        return sid

    def _write_data(self, df: DataFrame) -> str:
        d = os.path.join(self.data_dir, f"d-{uuid.uuid4().hex}")
        w = df.write.mode("overwrite")
        for k, v in self.write_options.items():
            w = w.option(k, v)
        w.parquet(d)
        return d

    def append(self, df: DataFrame, meta: dict | None = None, nfiles: int | None = None) -> int:
        if nfiles is not None:
            df = df.coalesce(nfiles)
        d = self._write_data(df)
        # manifest read + commit under the lock so two concurrent
        # appends cannot both extend the same stale parent
        with self._lock:
            cur = self.current_manifest()
            dirs = (cur["dirs"] if cur else []) + [d]
            return self._commit_locked(dirs, df.schema.json(), meta, "append")

    def maybe_compact(self, spark: SparkSession, max_dirs: int = 24, nfiles: int = 8) -> bool:
        """Rewrite many small append dirs into one (Iceberg
        ``rewrite_data_files`` analogue). Old dirs are kept so earlier
        snapshots stay readable for rollback/time-travel."""
        m = self.current_manifest()
        if m is None or len(m["dirs"]) <= max_dirs:
            return False
        df = self.read(spark).coalesce(nfiles)
        self.overwrite(df)
        return True

    def overwrite(self, df: DataFrame, meta: dict | None = None) -> int:
        d = self._write_data(df)
        return self._commit([d], df.schema.json(), meta, "overwrite")

    def merge(self, df: DataFrame, keys: list[str], nfiles: int | None = None) -> int:
        """Keyed last-write-wins upsert (Iceberg ``MERGE INTO ... WHEN
        MATCHED THEN UPDATE WHEN NOT MATCHED THEN INSERT`` analogue) —
        the reference's upsert-by-_id bulk indexing semantics
        (mendeley/ElasticSearchIndexHandler.java:213-217): a re-crawled
        row replaces the previous row with the same key, never
        duplicates it. Current rows not matched by ``df``'s keys carry
        over unchanged.

        COST NOTE: this base implementation rewrites the ENTIRE table
        per call — acceptable as a local Iceberg-MERGE stand-in at test
        scale, a scale-killer on a 10^10-row table. The engine's hot
        recrawl path uses the bucketed variant (BucketedTable.merge),
        which rewrites only the hash buckets containing merge keys.
        The lock is held across read-manifest → write → commit so a
        concurrent append cannot be silently dropped by the overwrite."""
        spark = df.sparkSession
        with self._lock:
            cur = self.read(spark)
            merged = cur.join(
                df.select(*keys).distinct(), keys, "left_anti"
            ).unionByName(df)
            if nfiles is not None:
                merged = merged.coalesce(nfiles)
            return self.overwrite(merged)

    def new_data_dir(self) -> str:
        """Reserve a fresh data directory for a caller-managed write
        (e.g. a partitioned write whose leaf dirs become manifest
        entries via ``commit_dirs``)."""
        return os.path.join(self.data_dir, f"d-{uuid.uuid4().hex}")

    def commit_dirs(
        self,
        dirs: list[str],
        schema: T.StructType,
        meta: dict | None = None,
        op: str = "overwrite",
    ) -> int:
        """Commit an explicit set of data directories — the partition-
        overwrite analogue: callers replace only the dirs they rewrote
        and carry forward the untouched ones."""
        return self._commit(list(dirs), schema.json(), meta, op)

    def commit_empty(self, schema: T.StructType, meta: dict | None = None) -> int:
        """Create the table at snapshot 1 with zero rows (schema pinned)."""
        return self._commit([], schema.json(), meta, "create")

    # ------------------------------------------------------------- pins
    # Externally-owned snapshot retention (Iceberg ref/branch analogue):
    # an incremental consumer OUTSIDE the engine (e.g. the CDC backup in
    # backup.py) records a base snapshot it will diff from later; without
    # a pin, the engine's per-round expire() would reclaim that base and
    # every incremental export would degrade to a full-generation roll.
    def _pins_path(self) -> str:
        return os.path.join(self.meta_dir, "PINS.json")

    def _read_pins(self) -> dict:
        try:
            with open(self._pins_path()) as f:
                return json.load(f)
        except FileNotFoundError:
            return {}

    def pin_snapshot(self, owner: str, snapshot_id: int) -> None:
        """Add ``snapshot_id`` to ``owner``'s pin set (append — the
        owner's previous pins stay until set_pin compacts them, so a
        crash mid-operation leaves at worst an extra pinned snapshot,
        never an expired base)."""
        with self._lock:
            pins = self._read_pins()
            pins[owner] = sorted(set(pins.get(owner, [])) | {int(snapshot_id)})
            atomic_write_json(self._pins_path(), pins)

    def set_pin(self, owner: str, snapshot_ids: list[int]) -> None:
        """Replace ``owner``'s pin set (empty list = release)."""
        with self._lock:
            pins = self._read_pins()
            if snapshot_ids:
                pins[owner] = sorted({int(s) for s in snapshot_ids})
            else:
                pins.pop(owner, None)
            atomic_write_json(self._pins_path(), pins)

    def pinned_snapshots(self) -> set[int]:
        return {int(s) for sids in self._read_pins().values() for s in sids}

    def expire(self, keep_snapshots: list[int] | None = None) -> int:
        """Iceberg ``expire_snapshots`` analogue (r2 VERDICT "Next
        round" #2): delete every manifest and data directory not
        reachable from the kept snapshots (always including HEAD).

        Without this the table retains one full data copy per
        overwrite/merge forever — the engine overwrites the frontier
        EVERY round, so a crawl's workdir (tmpfs = RAM in the bench)
        grows O(rounds × table size) instead of O(live data).

        Manifests may reference a data dir directly (``d-xxx``) or a
        partition leaf under it (``d-xxx/bucket_part=3``); expiry keeps
        referenced leaves and removes unreferenced siblings, then the
        parent when nothing kept remains. Returns the number of data
        dirs removed. Note: after a rollback, expiring the abandoned
        higher snapshot ids lets their numeric ids be reused — harmless,
        their dirs and manifests are gone together."""
        import shutil

        with self._lock:
            head = self.current_snapshot_id()
            if head is None:
                return 0
            keep = set(keep_snapshots or ()) | {head} | self.pinned_snapshots()
            kept_dirs: set[str] = set()
            for sid in keep:
                try:
                    kept_dirs.update(self._read_manifest(sid)["dirs"])
                except FileNotFoundError:
                    continue
            for f in os.listdir(self.meta_dir):
                if f.startswith("snap-") and f.endswith(".json"):
                    if int(f[5:-5]) not in keep:
                        os.remove(os.path.join(self.meta_dir, f))
            removed = 0
            for d in os.listdir(self.data_dir):
                parent = os.path.join(self.data_dir, d)
                if parent in kept_dirs or not os.path.isdir(parent):
                    continue
                # partitioned parent: subdirectories may be individually
                # referenced leaves (cuckoo pg dirs, frontier buckets)
                kept_leaf = False
                for sub in os.listdir(parent):
                    leaf = os.path.join(parent, sub)
                    if not os.path.isdir(leaf):
                        continue
                    if leaf in kept_dirs:
                        kept_leaf = True
                    else:
                        shutil.rmtree(leaf, ignore_errors=True)
                        removed += 1
                if not kept_leaf:
                    shutil.rmtree(parent, ignore_errors=True)
                    removed += 1
            return removed

    def rollback(self, snapshot_id: int) -> None:
        """Point HEAD back at an older snapshot (atomic)."""
        if not os.path.exists(self._manifest_path(snapshot_id)):
            raise ValueError(f"unknown snapshot {snapshot_id} for {self.name}")
        tmp = self._head_path() + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            f.write(str(snapshot_id))
        os.replace(tmp, self._head_path())

    # ------------------------------------------------------------ reads
    def exists(self) -> bool:
        return self.current_snapshot_id() is not None

    def schema(self) -> T.StructType:
        m = self.current_manifest()
        if m is None:
            raise ValueError(f"table {self.name} has no snapshot")
        return T.StructType.fromJson(json.loads(m["schema"]))

    def read(self, spark: SparkSession, snapshot_id: int | None = None) -> DataFrame:
        m = (
            self._read_manifest(snapshot_id)
            if snapshot_id is not None
            else self.current_manifest()
        )
        if m is None:
            raise ValueError(f"table {self.name} has no snapshot")
        schema = T.StructType.fromJson(json.loads(m["schema"]))
        if not m["dirs"]:
            return spark.createDataFrame([], schema)
        # explicit schema → no inference pass; Catalyst still prunes
        # columns and pushes filters into each parquet scan
        return spark.read.schema(schema).parquet(*m["dirs"])

    def read_incremental(self, spark: SparkSession, since_snapshot_id: int) -> DataFrame:
        """Iceberg incremental-append scan analogue: the rows ADDED
        after ``since_snapshot_id``, read from only the data dirs that
        appeared since — an O(delta) scan regardless of table size,
        which is what lets downstream maintenance (e.g. the image
        near-dup publish) stay O(new rows) on a 10^10-row table.

        Sound only over an append-only history: every dir of the base
        snapshot must still be live at HEAD. An overwrite / merge /
        compact in between rewrites dirs, so "added rows" is no longer
        dirs-diffable — like Iceberg's incremental scan, this raises
        and the caller falls back to a full read. An expired (GC'd)
        base snapshot raises for the same reason."""
        cur = self.current_manifest()
        if cur is None:
            raise ValueError(f"table {self.name} has no snapshot")
        try:
            base = self._read_manifest(since_snapshot_id)
        except FileNotFoundError:
            raise ValueError(
                f"table {self.name}: base snapshot {since_snapshot_id} "
                "is unknown or expired; incremental scan invalid"
            )
        base_dirs = set(base["dirs"])
        if not base_dirs <= set(cur["dirs"]):
            raise ValueError(
                f"table {self.name}: history since snapshot "
                f"{since_snapshot_id} rewrote data (overwrite/merge/"
                "compact); incremental scan invalid"
            )
        schema = T.StructType.fromJson(json.loads(cur["schema"]))
        new_dirs = [d for d in cur["dirs"] if d not in base_dirs]
        if not new_dirs:
            return spark.createDataFrame([], schema)
        return spark.read.schema(schema).parquet(*new_dirs)


class BucketedTable(SnapTable):
    """SnapTable hash-bucketed by a caller-supplied key expression —
    the Iceberg ``bucket(N, key)`` partition-transform analogue, stored
    as one leaf directory per bucket and tracked in manifest meta
    (``bucket_dirs``), exactly like the cuckoo filter's pg dirs
    (urlseen.py commit_dirs pattern).

    The point (r2 VERDICT "Next round" #4/#5): per-round maintenance of
    a 10^10-row table must write O(round delta), not O(table). Writers
    compute the round's dirty buckets, read ONLY those buckets' leaf
    dirs, and commit new leaves for them while untouched buckets carry
    their existing leaf dirs forward — a storage-partitioned partial
    overwrite with no full-table rewrite anywhere.

    The bucket id never lives in the data files (schemas stay exactly
    what callers write); it is encoded by the directory a row lives in.
    Full-table ``read`` is the plain union of all leaf dirs."""

    def __init__(self, path: str, n_buckets: int, name: str | None = None) -> None:
        super().__init__(path, name)
        if n_buckets <= 0:
            raise ValueError(f"n_buckets must be positive, got {n_buckets}")
        self.n_buckets = n_buckets

    def bucket_dirs(self) -> dict[str, str]:
        m = self.current_manifest()
        return dict((m.get("meta") or {}).get("bucket_dirs", {})) if m else {}

    def read_buckets(self, spark: SparkSession, buckets: list[int]) -> DataFrame:
        """Scan ONLY the given buckets' leaf dirs (partition pruning by
        construction — untouched buckets are never opened)."""
        bd = self.bucket_dirs()
        dirs = [bd[str(b)] for b in buckets if str(b) in bd]
        schema = self.schema()
        if not dirs:
            return spark.createDataFrame([], schema)
        return spark.read.schema(schema).parquet(*dirs)

    def replace_buckets(
        self,
        df: DataFrame,
        dirty: list[int],
        bucket_col,
        meta: dict | None = None,
    ) -> int:
        """Commit ``df`` as the NEW full content of the ``dirty``
        buckets; every other bucket carries its current leaf dir
        forward. ``bucket_col`` is a Column evaluating to the row's
        bucket id (pmod(hash(key), n_buckets)); it is used only to
        route rows to leaf dirs and is not stored. A dirty bucket with
        no rows in ``df`` is dropped from the table."""
        dirty_set = {int(b) for b in dirty}
        with self._lock:
            m = self.current_manifest()
            old_map = self.bucket_dirs()
            cur_dirs = set(m["dirs"]) if m else set()
            if not cur_dirs <= set(old_map.values()) and dirty_set != set(
                range(self.n_buckets)
            ):
                # a partial replace over untracked data would silently
                # drop it (same failure mode as the cuckoo pre-pg
                # layout); only an all-buckets replace may rebuild over
                # arbitrary prior commits
                raise ValueError(
                    f"table {self.name} has data dirs untracked by "
                    "bucket_dirs; use an all-buckets replace to migrate"
                )
            out_schema = df.schema
            d = self.new_data_dir()
            w = (
                df.withColumn("bucket_part", bucket_col)
                .write.partitionBy("bucket_part")
                .mode("overwrite")
            )
            for k, v in self.write_options.items():
                w = w.option(k, v)
            w.parquet(d)
            new_map = {
                b: p for b, p in old_map.items() if int(b) not in dirty_set
            }
            for sub in os.listdir(d):
                if sub.startswith("bucket_part="):
                    new_map[sub.split("=", 1)[1]] = os.path.join(d, sub)
            dirs = sorted(set(new_map.values()))
            return self._commit_locked(
                dirs,
                out_schema.json(),
                {**(meta or {}), "bucket_dirs": new_map},
                "overwrite",
            )

    def merge(
        self,
        df: DataFrame,
        keys: list[str],
        bucket_col=None,
        nfiles: int | None = None,
        meta: dict | None = None,
    ) -> int:
        """Keyed last-write-wins upsert touching ONLY the buckets that
        contain merge keys: dirty = distinct buckets of ``df``, current
        rows are read from those buckets' leaf dirs alone, and the
        partial overwrite commits new leaves for them. Write volume is
        O(|df| + |dirty buckets|), not O(table) — the scale-correct
        Iceberg MERGE for the seen table's per-round recrawl refresh."""
        if bucket_col is None:
            raise ValueError("BucketedTable.merge requires bucket_col")
        spark = df.sparkSession
        with self._lock:
            df = df.cache()
            dirty = sorted(
                int(r["b"])
                for r in df.select(bucket_col.alias("b")).distinct().collect()
            )
            if not dirty:
                df.unpersist()
                return self.current_snapshot_id()
            cur = self.read_buckets(spark, dirty)
            merged = cur.join(
                df.select(*keys).distinct(), keys, "left_anti"
            ).unionByName(df)
            sid = self.replace_buckets(merged, dirty, bucket_col, meta=meta)
            df.unpersist()
            return sid
