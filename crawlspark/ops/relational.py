"""Relational operator coverage (SURVEY.md §2.3-§2.8) over the shared
TPC-H-ish tables: scans, filters, equi-joins (broadcast + shuffle),
semi/anti joins, hash aggregation, windows, set ops, date assembly.

Each query is the Spark-first re-expression of a reference behavior;
the reference citation sits in each docstring comment.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from . import load


# --- A1/A2: multi-aggregate hash agg in one pass
# (ElasticSearchIndexHandler.java:249-267 fills 17 accumulators per doc)
def q1_pricing_summary(spark, sf):
    li = load(spark, sf, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(avg(l_quantity), 4) AS avg_qty,
       round(avg(l_discount), 4) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


# --- J1-style enrichment join chain + top-k
# (broadcast dims replace the reference's point-lookup caches,
#  mendeley/DatasetUsagesCollector.java:121-126)
def q3_top_orders(spark, sf):
    cust = load(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load(spark, sf, "orders")
    li = load(spark, sf, "lineitem")
    # Apply the selective dimension first (guide §3.1: pre-filter the
    # side you broadcast): the planner already chose to broadcast the
    # FULL orders projection against lineitem; joining customer into
    # orders first shrinks that broadcast ~5x (only BUILDING-segment
    # orders survive) and drops a probe chain from the 6M-row stream
    # side. Inner-join associativity — identical rows.
    ords = orders.join(
        F.broadcast(cust), orders.o_custkey == cust.c_custkey
    ).select("o_orderkey")
    return (
        li.join(F.broadcast(ords), li.l_orderkey == ords.o_orderkey)
        .groupBy("o_orderkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


Q3_SQL = """
SELECT o_orderkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY o_orderkey
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
"""


# --- J5/J7: snowflake join region->nation->customer->orders->lineitem
def q5_revenue_by_nation(spark, sf):
    region = load(spark, sf, "region")
    nation = load(spark, sf, "nation")
    cust = load(spark, sf, "customer")
    orders = load(spark, sf, "orders")
    li = load(spark, sf, "lineitem")
    # Same broadcast bytes as before (the planner already broadcast the
    # full orders projection), but the 6M-row lineitem side now probes
    # ONE hash relation (orderkey -> nationkey) instead of a 4-deep
    # BHJ chain, and the nation/region name joins run on the 25
    # aggregated rows instead of 6M pre-agg rows. n_nationkey ->
    # (n_name, r_name) is 1:1 (25 distinct nations), so grouping by
    # c_nationkey partitions the rows identically — same sums, same
    # row count.
    okey_nation = orders.join(
        F.broadcast(cust), orders.o_custkey == cust.c_custkey
    ).select("o_orderkey", "c_nationkey")
    agg = (
        li.join(F.broadcast(okey_nation), li.l_orderkey == okey_nation.o_orderkey)
        .groupBy("c_nationkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )
    return (
        agg.join(F.broadcast(nation), agg.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("n_name", "r_name", "revenue", "n_items")
    )


Q5_SQL = """
SELECT n_name, r_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_items
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY n_name, r_name
"""


# --- O1/O2: top-k per group via salted-safe window
# (politeness budget row_number <= k; ContentfulCrawler.java:133-149)
def top3_orders_per_customer(spark, sf):
    orders = load(spark, sf, "orders")
    # scan-starvation fix (few parquet row groups -> 2 scan tasks): the
    # partial WindowGroupLimit sort would run 750k rows per core on 2
    # cores; pre-partitioning by the window key moves the sort onto all
    # slots and the window's own exchange is subsumed (same key). Only
    # applied when the scan is narrower than the cluster — at scale the
    # scan has >> slots partitions and the partial WindowGroupLimit
    # prune before the exchange is worth more than this swap.
    if orders.rdd.getNumPartitions() < spark.sparkContext.defaultParallelism:
        orders = orders.repartition(
            spark.sparkContext.defaultParallelism, "o_custkey"
        )
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("o_custkey", "o_orderkey", F.round("o_totalprice", 2).alias("price"), "rnk")
    )


TOP3_SQL = """
SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS price, rnk
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
  FROM orders
) WHERE rnk <= 3
"""


# --- J4 semi-join (EXISTS; DatasetUsagesCollector.java:109)
def semi_join_customers(spark, sf):
    cust = load(spark, sf, "customer")
    orders = load(spark, sf, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
    )


SEMI_SQL = """
SELECT c_mktsegment, count(*) AS n_customers
FROM customer WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_mktsegment
"""


# --- F9 anti-join (skip-if-exists; ContentfulBackup.java:180-182):
# customers with no high-value order — the filtered right side keeps
# the anti-join non-trivial at every sf. RETIRED from the driver
# registry in round 4 (the 50-row gate window must hold every
# oracle-backed gate): the identical left-anti plan shape is recorded
# by url_seen_antijoin — the actual engine F9 operator — so this
# generic demo added no marginal gate information. It stays verified
# locally by tests/test_retired_gates.py against ANTI_SQL.
def anti_join_customers(spark, sf):
    cust = load(spark, sf, "customer")
    big = load(spark, sf, "orders").filter(F.col("o_totalprice") > 400000)
    return (
        cust.join(big, cust.c_custkey == big.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("n_customers"))
    )


ANTI_SQL = """
SELECT c_nationkey, count(*) AS n_customers
FROM customer WHERE NOT EXISTS (
  SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000)
GROUP BY c_nationkey
"""


# --- U1: UNION + dedup (DatasetUsagesCollector.java:76-107)
def union_dedup_nationkeys(spark, sf):
    cust = load(spark, sf, "customer").select(
        F.col("c_nationkey").cast("int").alias("nationkey")
    )
    supp = load(spark, sf, "supplier").select(
        F.col("s_nationkey").cast("int").alias("nationkey")
    )
    return cust.unionByName(supp).distinct()


UNION_SQL = """
SELECT c_nationkey::INT AS nationkey FROM customer
UNION
SELECT s_nationkey::INT AS nationkey FROM supplier
"""


# --- A3: batch grouping by running counter
# (groupingBy(counter/batchSize), ElasticSearchIndexHandler.java:191-201)
def batch_grouping(spark, sf):
    """Two-phase global row-number: a naive Window.orderBy(event_id)
    funnels the ENTIRE table through one task. Instead: rank locally
    within id-range shards (parallel windows), aggregate per-shard
    counts (tiny), turn them into cumulative offsets with a window
    over the SHARD-LEVEL rows only, and broadcast the offsets back.
    Identical result, no global sort, no single-task stage."""
    ev = load(spark, sf, "events")
    shard = F.floor(F.col("event_id") / 10_000).alias("rk")
    local = ev.select("event_id", shard).withColumn(
        "lrn", F.row_number().over(Window.partitionBy("rk").orderBy("event_id"))
    )
    counts = local.groupBy("rk").agg(F.count("*").alias("c"))
    w_off = Window.orderBy("rk").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.withColumn(
        "off", F.coalesce(F.sum("c").over(w_off), F.lit(0))
    ).select("rk", "off")
    return (
        local.join(F.broadcast(offsets), "rk")
        .withColumn("rn", F.col("off") + F.col("lrn"))
        .withColumn("batch_id", F.floor((F.col("rn") - 1) / 50).cast("bigint"))
        .groupBy("batch_id")
        .agg(F.count("*").alias("n"), F.min("event_id").alias("first_event"))
    )


BATCH_SQL = """
SELECT floor((rn - 1) / 50)::BIGINT AS batch_id, count(*) AS n, min(event_id) AS first_event
FROM (SELECT event_id, row_number() OVER (ORDER BY event_id ASC) AS rn FROM events)
GROUP BY 1
"""


# --- P4: date assembly with day-overflow clamping by arithmetic carry
# (ElasticSearchIndexHandler.java:440-457)
def date_clamp_assembly(spark, sf):
    orders = load(spark, sf, "orders")
    df = orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        # synthetic overflowing day-of-month, like the reference's bad input
        (F.dayofmonth("o_orderdate") + 25).alias("d"),
    )
    return df.select(
        "o_orderkey",
        F.date_format(
            F.date_add(F.make_date("y", "m", F.lit(1)), F.col("d") - 1),
            "yyyy-MM-dd'T00:00:00.000Z'",
        ).alias("created_at"),
    )


DATE_SQL = """
SELECT o_orderkey,
       strftime(make_date(year(o_orderdate)::INT, month(o_orderdate)::INT, 1)
                + to_days((day(o_orderdate) + 25 - 1)::INT),
                '%Y-%m-%dT00:00:00.000Z') AS created_at
FROM orders
"""


# --- F1/A1: tag-style dispatch + conditional aggregation
# (8-way tag prefix router, ElasticSearchIndexHandler.java:268-351)
def event_type_dispatch(spark, sf):
    ev = load(spark, sf, "events")
    return ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("n_purchase"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias("n_error"),
        F.sum(F.when(F.col("event_type") == "signup", 1).otherwise(0)).alias("n_signup"),
        F.max(F.when(F.col("event_type") == "purchase", F.col("value"))).alias("max_purchase"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


DISPATCH_SQL = """
SELECT user_id,
       sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS n_purchase,
       sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)::BIGINT AS n_error,
       sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)::BIGINT AS n_signup,
       max(CASE WHEN event_type = 'purchase' THEN value END) AS max_purchase,
       round(sum(value), 2) AS total_value
FROM events GROUP BY user_id
"""


# --- F8 + scalar extraction: exists-predicate on a JSON-ish prop
# (exists query, DatasetEsClient.java:131)
def props_exists_filter(spark, sf):
    ev = load(spark, sf, "events")
    k = F.regexp_extract("props", r'"k": (\d+)', 1)
    return (
        ev.withColumn("k", k)
        .filter(F.col("k") != "")
        .withColumn("k", F.col("k").cast("bigint"))
        .groupBy("event_type")
        .agg(F.count("*").alias("n"), F.sum("k").alias("sum_k"))
    )


EXISTS_SQL = """
SELECT event_type, count(*) AS n, sum(k)::BIGINT AS sum_k
FROM (SELECT event_type, regexp_extract(props, '"k": (\\d+)', 1) AS ks,
             CASE WHEN regexp_extract(props, '"k": (\\d+)', 1) <> '' THEN regexp_extract(props, '"k": (\\d+)', 1)::BIGINT END AS k
      FROM events)
WHERE ks <> ''
GROUP BY event_type
"""


# --- T-streaming analogue: gap sessionization in batch
def sessionize_users(spark, sf):
    ev = load(spark, sf, "events")
    # same scan-starvation fix as top3_orders_per_customer: the events
    # file is ONE row group, so the window's partial sort would run on
    # a single core; no-op when the scan is already wide.
    if ev.rdd.getNumPartitions() < spark.sparkContext.defaultParallelism:
        ev = ev.repartition(spark.sparkContext.defaultParallelism, "user_id")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    return (
        ev.withColumn("new_sess", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0))
        .groupBy("user_id")
        .agg(F.sum("new_sess").alias("n_sessions"), F.count("*").alias("n_events"))
    )


SESSION_SQL = """
SELECT user_id, sum(new_sess)::BIGINT AS n_sessions, count(*) AS n_events
FROM (
  SELECT user_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR date_diff('second', lag(ts) OVER w, ts) > 1800
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
)
GROUP BY user_id
"""


QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "q3_top_orders": q3_top_orders,
    "q5_revenue_by_nation": q5_revenue_by_nation,
    "top3_orders_per_customer": top3_orders_per_customer,
    "semi_join_customers": semi_join_customers,
    "union_dedup_nationkeys": union_dedup_nationkeys,
    "batch_grouping": batch_grouping,
    "date_clamp_assembly": date_clamp_assembly,
    "event_type_dispatch": event_type_dispatch,
    "props_exists_filter": props_exists_filter,
    "sessionize_users": sessionize_users,
}

ORACLES = {
    "q1_pricing_summary": Q1_SQL,
    "q3_top_orders": Q3_SQL,
    "q5_revenue_by_nation": Q5_SQL,
    "top3_orders_per_customer": TOP3_SQL,
    "semi_join_customers": SEMI_SQL,
    "union_dedup_nationkeys": UNION_SQL,
    "batch_grouping": BATCH_SQL,
    "date_clamp_assembly": DATE_SQL,
    "event_type_dispatch": DISPATCH_SQL,
    "props_exists_filter": EXISTS_SQL,
    "sessionize_users": SESSION_SQL,
}
