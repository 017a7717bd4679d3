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
