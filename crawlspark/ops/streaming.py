"""Structured Streaming re-expression of the reference's manual
micro-batching (SURVEY.md §2.10: Observable.buffer pages →
micro-batches, MendeleyDocumentCrawler.java:40,92).

The queries run a real streaming query to completion over the parquet
fixture (memory sink + processAllAvailable) and return the final
batch result, so the driver can compare it against a plain SQL oracle.
Window starts are reported as epoch seconds — timezone-free on both
engines.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)


# --- T1: micro-batch ingestion + event-time tumbling window agg with a
# watermark (the reference has no event-time semantics; this is the
# Spark-native generalization of its page-buffer micro-batching)
def stream_windowed_counts(spark, sf):
    events = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("pathGlobFilter", "events.parquet")  # source dir holds all tables
        .parquet(f"{sf}/")
    )
    agg = (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("crawlspark_stream_counts")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table("crawlspark_stream_counts").select(
        F.unix_timestamp(F.col("window.start")).alias("window_epoch"),
        "event_type",
        "n",
        "sum_value",
    )


STREAM_COUNTS_SQL = """
SELECT (floor(epoch(ts) / 3600) * 3600)::BIGINT AS window_epoch, event_type,
       count(*) AS n, round(sum(value), 2) AS sum_value
FROM events GROUP BY 1, 2
"""


# --- T1+T4: streaming dedup-by-id (the reference's upsert semantics,
# ElasticSearchIndexHandler.java:213-217) — dropDuplicates on a stream
def stream_dedup_users(spark, sf):
    events = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("pathGlobFilter", "events.parquet")  # source dir holds all tables
        .parquet(f"{sf}/")
    )
    firsts = events.withWatermark("ts", "24 hours").dropDuplicates(["user_id"])
    q = (
        firsts.select("user_id")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("crawlspark_stream_dedup")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return (
        spark.table("crawlspark_stream_dedup")
        .groupBy()
        .agg(F.count("*").alias("n_users"))
    )


STREAM_DEDUP_SQL = "SELECT count(DISTINCT user_id) AS n_users FROM events"


QUERIES = {
    "stream_windowed_counts": stream_windowed_counts,
    "stream_dedup_users": stream_dedup_users,
}

ORACLES = {
    "stream_windowed_counts": STREAM_COUNTS_SQL,
    "stream_dedup_users": STREAM_DEDUP_SQL,
}
