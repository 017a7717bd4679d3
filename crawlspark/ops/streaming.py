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


# --- custom stateful operator: applyInPandasWithState. Per-user
# running aggregates kept in explicit group state across micro-batches
# — the Spark-native home for stateful logic no built-in operator
# expresses (the engine's crawl rounds never need it because retry/
# backoff state is data, but a production stream-side enrichment does).
# Emits the running state in update mode; the final per-user update
# equals the batch aggregate, which is the oracle.
_STATE_OUT = T.StructType(
    [
        T.StructField("user_id", T.LongType(), True),
        T.StructField("n_events", T.LongType(), True),
        T.StructField("sum_value", T.DoubleType(), True),
    ]
)
_STATE = T.StructType(
    [
        T.StructField("n", T.LongType(), True),
        T.StructField("s", T.DoubleType(), True),
    ]
)


def _user_totals(key, pdfs, state):
    import pandas as pd

    n, s = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].sum())
    state.update((n, s))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "sum_value": [s]}
    )


def stream_stateful_user_totals(spark, sf):
    from pyspark.sql.streaming.state import GroupStateTimeout

    events = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .parquet(f"{sf}/")
    )
    totals = events.groupBy("user_id").applyInPandasWithState(
        _user_totals,
        outputStructType=_STATE_OUT,
        stateStructType=_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    q = (
        totals.writeStream.outputMode("update")
        .format("memory")
        .queryName("crawlspark_stream_state")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # the LAST update per user is the final state: running n is
    # monotonic, so max(n) picks it (and its sum) deterministically
    return (
        spark.table("crawlspark_stream_state")
        .groupBy("user_id")
        .agg(
            F.max(F.struct("n_events", "sum_value")).alias("s")
        )
        .select(
            "user_id",
            F.col("s.n_events").alias("n_events"),
            F.round(F.col("s.sum_value"), 2).alias("sum_value"),
        )
    )


STREAM_STATE_SQL = """
SELECT user_id, count(*) AS n_events, round(sum(value), 2) AS sum_value
FROM events GROUP BY user_id
"""


QUERIES = {
    "stream_windowed_counts": stream_windowed_counts,
    "stream_dedup_users": stream_dedup_users,
    "stream_stateful_user_totals": stream_stateful_user_totals,
}

ORACLES = {
    "stream_windowed_counts": STREAM_COUNTS_SQL,
    "stream_dedup_users": STREAM_DEDUP_SQL,
    "stream_stateful_user_totals": STREAM_STATE_SQL,
}
