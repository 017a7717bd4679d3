"""Salted two-phase politeness rank must select exactly what the naive
single-window per-host top-budget selects (skew handling must not change
semantics), and robots filtering must split correctly."""

import pandas as pd
from pyspark.sql import Window
from pyspark.sql import functions as F

from crawlspark.hashing import unit
from crawlspark.politeness import filter_robots, select_budget


def _pending(spark, n=2000):
    # heavily skewed: 80% of URLs on one host (Zipf head)
    return (
        spark.range(n)
        .selectExpr(
            "concat('https://h', cast(CASE WHEN id % 10 < 8 THEN 1 ELSE id % 10 END as string), '.example.com/img/', cast(id as string)) as url"
        )
        .withColumn("host", F.regexp_extract("url", r"^[a-z]+://([^/]+)", 1))
        .withColumn("priority", unit(F.col("url"), "|prio"))
    )


def test_salted_rank_equals_naive(spark):
    pending = _pending(spark)
    pol = spark.createDataFrame(
        [(f"h{i}.example.com", 50 if i == 1 else 7) for i in range(10)],
        "host string, budget int",
    )
    sel = select_budget(pending, pol).select("url", "rank")
    w = Window.partitionBy("host").orderBy(F.col("priority").desc(), F.col("url").asc())
    naive = (
        pending.join(pol, "host")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= F.col("budget"))
        .select("url", "rank")
    )
    a = sel.orderBy("url").toPandas()
    b = naive.orderBy("url").toPandas()
    pd.testing.assert_frame_equal(a, b)
    # hosts present are h1 (80% of rows, budget 50), h8 and h9 (budget 7)
    assert len(a) == 50 + 7 + 7


def test_robots_split(spark):
    pending = spark.createDataFrame(
        [
            ("https://h1.example.com/img/priv/1", "h1.example.com"),
            ("https://h1.example.com/img/ok/2", "h1.example.com"),
            ("https://h2.example.com/img/priv/3", "h2.example.com"),
        ],
        "url string, host string",
    )
    robots = spark.createDataFrame(
        [("h1.example.com", "/img/priv")], "host string, path_prefix string"
    )
    allowed, denied = filter_robots(pending, robots)
    assert sorted(r["url"] for r in allowed.collect()) == [
        "https://h1.example.com/img/ok/2",
        "https://h2.example.com/img/priv/3",
    ]
    assert [r["url"] for r in denied.collect()] == [
        "https://h1.example.com/img/priv/1"
    ]
