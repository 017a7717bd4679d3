"""Production streaming sink: file (parquet) sink with a checkpoint —
exactly-once per micro-batch, and a restarted query resumes from the
checkpoint without duplicating output (the memory sink used by the
gate queries is test-only; this is the sink a real deployment runs)."""

import os

from pyspark.sql import functions as F

SF = os.environ.get("CRAWLSPARK_TEST_SF", "/root/testdata/sf0.001")


def _stream(spark, out, ckpt):
    from crawlspark.ops.streaming import EVENTS_SCHEMA

    events = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .parquet(f"{SF}/")
    )
    q = (
        events.select("event_id", "user_id", "event_type", "value")
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def test_parquet_sink_checkpoint_resume(spark, tmp_path):
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _stream(spark, out, ckpt)
    n_src = spark.read.parquet(f"{SF}/events.parquet").count()
    assert spark.read.parquet(out).count() == n_src

    # restart with the same checkpoint: source unchanged → no new
    # batches, no duplicated rows (exactly-once file sink)
    _stream(spark, out, ckpt)
    got = spark.read.parquet(out)
    assert got.count() == n_src
    assert got.select("event_id").distinct().count() == n_src
