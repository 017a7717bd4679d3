"""Backup → restore round trip (contentful-backup / contentful-restore):
binary-safe export, skip-if-exists restore, idempotent re-restore."""

import pandas as pd

from crawlspark.backup import backup_table, restore_table
from crawlspark.engine import IMAGES_SCHEMA
from crawlspark.snaptable import SnapTable


def _images_df(spark, ids):
    rows = [
        (
            f"img-{i}",
            f"https://h1.example.com/img/{i}",
            bytes([i % 256, 0, 255, i % 7]),
            32,
            32,
            "png",
            f"caption {i}",
            i * 1000003,
            0,
        )
        for i in ids
    ]
    return spark.createDataFrame(rows, IMAGES_SCHEMA)


def test_backup_restore_roundtrip(spark, tmp_path):
    src = SnapTable(str(tmp_path / "images_src"))
    src.commit_empty(IMAGES_SCHEMA)
    src.append(_images_df(spark, range(20)))
    bdir = backup_table(src, spark, str(tmp_path / "bk"))

    # target already holds a subset → restore must skip those
    dst = SnapTable(str(tmp_path / "images_dst"))
    dst.commit_empty(IMAGES_SCHEMA)
    dst.append(_images_df(spark, range(5)))
    n = restore_table(dst, spark, bdir, key="image_id")
    assert n == 15

    a = src.read(spark).toPandas().sort_values("image_id").reset_index(drop=True)
    b = dst.read(spark).toPandas().sort_values("image_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)  # bytes round-trip bit-exact

    # idempotent: re-running the restore is a no-op
    assert restore_table(dst, spark, bdir, key="image_id") == 0
    assert dst.read(spark).count() == 20


def test_backup_incremental_generations(spark, tmp_path):
    """CDC backup: each call exports only the rows appended since the
    previous one; a non-append rewrite opens a new generation with a
    fresh full base; restore replays the latest generation exactly."""
    from crawlspark.backup import backup_table_incremental, restore_backup_incremental

    src = SnapTable(str(tmp_path / "images_src"))
    src.commit_empty(IMAGES_SCHEMA)
    src.append(_images_df(spark, range(20)))
    bk = str(tmp_path / "bk")

    r0 = backup_table_incremental(src, spark, bk)
    assert (r0["mode"], r0["generation"]) == ("full", 0)
    # unchanged table → noop, nothing written
    assert backup_table_incremental(src, spark, bk)["mode"] == "noop"

    src.append(_images_df(spark, range(20, 30)))
    r1 = backup_table_incremental(src, spark, bk)
    assert (r1["mode"], r1["generation"]) == ("delta", 0)
    assert "delta-0" in r1["dir"]

    dst = SnapTable(str(tmp_path / "images_dst"))
    dst.commit_empty(IMAGES_SCHEMA)
    assert restore_backup_incremental(dst, spark, r1["root"], key="image_id") == 30
    a = src.read(spark).toPandas().sort_values("image_id").reset_index(drop=True)
    b = dst.read(spark).toPandas().sort_values("image_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)

    # a rewrite breaks the diff chain → new generation, full base
    src.overwrite(src.read(spark).filter("w = 32").limit(12))
    n_now = src.read(spark).count()
    r2 = backup_table_incremental(src, spark, bk)
    assert (r2["mode"], r2["generation"]) == ("full", 1)
    src.append(_images_df(spark, range(100, 105)))
    r3 = backup_table_incremental(src, spark, bk)
    assert (r3["mode"], r3["generation"]) == ("delta", 1)

    dst2 = SnapTable(str(tmp_path / "images_dst2"))
    dst2.commit_empty(IMAGES_SCHEMA)
    assert restore_backup_incremental(dst2, spark, r3["root"], key="image_id") == n_now + 5
    a = src.read(spark).toPandas().sort_values("image_id").reset_index(drop=True)
    b = dst2.read(spark).toPandas().sort_values("image_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    # idempotent replay
    assert restore_backup_incremental(dst2, spark, r3["root"], key="image_id") == 0
