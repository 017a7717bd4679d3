"""Atomic snapshot table semantics: append/overwrite/rollback/compact/expire."""

import os

from pyspark.sql import types as T

from crawlspark.snaptable import SnapTable


def test_append_overwrite_rollback(spark, tmp_path):
    t = SnapTable(str(tmp_path / "t"))
    schema = T.StructType([T.StructField("x", T.LongType(), False)])
    s0 = t.commit_empty(schema)
    assert t.read(spark).count() == 0
    s1 = t.append(spark.range(5).selectExpr("id as x"))
    s2 = t.append(spark.range(5, 8).selectExpr("id as x"))
    assert t.read(spark).count() == 8
    # time travel: older snapshot still readable
    assert t.read(spark, snapshot_id=s1).count() == 5
    t.rollback(s1)
    assert t.read(spark).count() == 5
    s3 = t.overwrite(spark.range(2).selectExpr("id as x"))
    assert t.read(spark).count() == 2
    assert sorted(r["x"] for r in t.read(spark).collect()) == [0, 1]
    assert t.current_snapshot_id() == s3 > s2 > s1 > s0


def test_compact_preserves_rows_and_old_snapshots(spark, tmp_path):
    t = SnapTable(str(tmp_path / "c"))
    schema = T.StructType([T.StructField("x", T.LongType(), False)])
    t.commit_empty(schema)
    for i in range(6):
        t.append(spark.range(i * 10, i * 10 + 10).selectExpr("id as x"), nfiles=1)
    pre = t.current_snapshot_id()
    assert t.maybe_compact(spark, max_dirs=3, nfiles=1)
    assert t.read(spark).count() == 60
    assert len(t.current_manifest()["dirs"]) == 1
    # rollback across a compaction still works (old dirs retained)
    t.rollback(pre)
    assert t.read(spark).count() == 60


def test_expire_reclaims_old_snapshots(spark, tmp_path):
    """expire() removes data dirs and manifests not reachable from HEAD
    (Iceberg expire_snapshots analogue); current reads are unaffected
    and disk stays O(live data) across repeated overwrites."""
    t = SnapTable(str(tmp_path / "e"))
    schema = T.StructType([T.StructField("x", T.LongType(), False)])
    t.commit_empty(schema)
    for i in range(5):
        t.overwrite(spark.range(i, i + 3).selectExpr("id as x"))
    assert len(os.listdir(t.data_dir)) == 5  # one copy per overwrite
    removed = t.expire()
    assert removed == 4
    assert len(os.listdir(t.data_dir)) == 1
    assert sorted(r["x"] for r in t.read(spark).collect()) == [4, 5, 6]
    # append lineage: expire keeps every dir HEAD references
    t.append(spark.range(10, 12).selectExpr("id as x"))
    assert t.expire() == 0
    assert t.read(spark).count() == 5
    # keep_snapshots preserves an older rollback target
    keep = t.current_snapshot_id()
    t.overwrite(spark.range(1).selectExpr("id as x"))
    t.expire(keep_snapshots=[keep])
    t.rollback(keep)
    assert t.read(spark).count() == 5


def test_write_options_control_parquet_codec(spark, tmp_path):
    """Per-table write_options reach every parquet writer (the images
    table writes compression=uncompressed because its bytes column is
    already zlib-compressed by the codec — re-compressing is wasted
    CPU on the round's critical path)."""
    import glob

    import pyarrow.parquet as pq

    t = SnapTable(
        str(tmp_path / "u"), write_options={"compression": "uncompressed"}
    )
    schema = T.StructType([T.StructField("x", T.LongType(), False)])
    t.commit_empty(schema)
    t.append(spark.range(100).selectExpr("id as x"))
    files = glob.glob(os.path.join(t.data_dir, "*", "*.parquet"))
    assert files
    codecs = {
        pq.ParquetFile(f).metadata.row_group(0).column(0).compression
        for f in files
        if pq.ParquetFile(f).metadata.num_rows
    }
    assert codecs == {"UNCOMPRESSED"}
    assert t.read(spark).count() == 100


def test_read_incremental(spark, tmp_path):
    """Iceberg incremental-append scan analogue: rows added since a
    snapshot, O(delta) dirs; raises (→ caller full-reads) whenever the
    history rewrote data or the base snapshot is gone."""
    import pytest

    t = SnapTable(str(tmp_path / "inc"))
    schema = T.StructType([T.StructField("x", T.LongType(), False)])
    s0 = t.commit_empty(schema)
    s1 = t.append(spark.range(5).selectExpr("id as x"))
    s2 = t.append(spark.range(5, 8).selectExpr("id as x"))
    assert sorted(r["x"] for r in t.read_incremental(spark, s0).collect()) == list(
        range(8)
    )
    assert sorted(r["x"] for r in t.read_incremental(spark, s1).collect()) == [5, 6, 7]
    # empty delta at HEAD
    assert t.read_incremental(spark, s2).count() == 0
    # an overwrite invalidates dirs-diffing
    t.overwrite(spark.range(2).selectExpr("id as x"))
    with pytest.raises(ValueError, match="rewrote"):
        t.read_incremental(spark, s1)
    # append-after-overwrite diffs fine against the overwrite snapshot
    s4 = t.current_snapshot_id()
    t.append(spark.range(100, 103).selectExpr("id as x"))
    assert t.read_incremental(spark, s4).count() == 3
    # expired base snapshot raises rather than lying
    t.expire()
    with pytest.raises(ValueError, match="unknown or expired"):
        t.read_incremental(spark, s4)
    # rollback + expire drops the later dirs: diffing from a dropped
    # future snapshot must refuse too (manifest gone)
    with pytest.raises(ValueError):
        t.read_incremental(spark, s2)


def test_read_incremental_random_histories(spark, tmp_path):
    """Property over random append/overwrite histories: for every base
    snapshot with an append-only suffix, read_incremental returns
    exactly rows(HEAD) - rows(base); any base separated from HEAD by a
    rewrite must raise; after expire every non-kept base must raise."""
    import random

    import pytest

    schema = T.StructType([T.StructField("x", T.LongType(), False)])

    def df(vals):
        return spark.createDataFrame([(int(v),) for v in sorted(vals)], schema)

    rng = random.Random(5)
    for trial in range(3):
        t = SnapTable(str(tmp_path / f"rh{trial}"))
        t.commit_empty(schema)
        rows_now: set[int] = set()
        epoch, nxt = 0, 0
        history = [(t.current_snapshot_id(), frozenset(), 0)]
        for _ in range(10):
            if rng.random() < 0.75 or not rows_now:
                batch = set(range(nxt, nxt + rng.randint(1, 4)))
                nxt += len(batch)
                rows_now |= batch
                sid = t.append(df(rows_now & batch))
            else:
                rows_now = set(rng.sample(sorted(rows_now), len(rows_now) // 2))
                sid = t.overwrite(df(rows_now))
                epoch += 1
            history.append((sid, frozenset(rows_now), epoch))
        sid0 = history[0][0]
        for sid, rowset, ep in history:
            # the invariant is dirs-subset, not "no rewrite happened":
            # the initial empty snapshot (zero dirs) diffs successfully
            # across any history, and its delta — all HEAD rows — is
            # still exactly rows(HEAD) - rows(base)
            if ep == epoch or sid == sid0:
                got = sorted(
                    r["x"] for r in t.read_incremental(spark, sid).collect()
                )
                assert got == sorted(rows_now - rowset), f"trial {trial} sid {sid}"
            else:
                with pytest.raises(ValueError):
                    t.read_incremental(spark, sid)
        t.expire()
        head = t.current_snapshot_id()
        for sid, _, _ in history:
            if sid != head:
                with pytest.raises(ValueError):
                    t.read_incremental(spark, sid)
