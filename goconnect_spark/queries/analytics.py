"""Keyed/windowed analytics — the relational layer the reference lacks.

The reference has exactly one aggregation (a global non-keyed Fold,
reference fn.go:154-193) and no joins/windows (SURVEY.md §2.8). Spark
gives keyed aggregation, joins, window functions, rollup and
sessionization for free; this module exposes them as first-class engine
queries over the driver tables.

Scale notes (100 TB): every query here is pure DataFrame API so
Catalyst applies predicate pushdown + column pruning to the parquet
scans; dimension tables (region/nation/supplier/customer-at-SF) are
broadcast; fact-fact joins shuffle on their join key where AQE handles
skew. No Python UDFs anywhere — everything stays in whole-stage
codegen.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from goconnect_spark.tables import load

# Deterministic-hash arithmetic: cast money/rate doubles to exact
# decimals before summing (order-independent), back to double at the
# end. See queries/__init__ docstring.
_PRICE = "decimal(12,2)"
_RATE = "decimal(6,4)"


def _dec(col: str, t: str) -> F.Column:
    return F.col(col).cast(t)


# --------------------------------------------------------------------
# q1: pricing summary (TPC-H Q1 shape) — the flagship query.
# Keyed aggregation with exact-decimal money math.
# --------------------------------------------------------------------
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, "lineitem", sf_dir)
    disc_price = _dec("l_extendedprice", _PRICE) * (F.lit(1).cast(_RATE) - _dec("l_discount", _RATE))
    charge = disc_price * (F.lit(1).cast(_RATE) + _dec("l_tax", _RATE))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity", _PRICE)).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice", _PRICE)).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            (F.sum(_dec("l_quantity", _PRICE)).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            (F.sum(_dec("l_extendedprice", _PRICE)).cast("double") / F.count(F.lit(1))).alias("avg_price"),
            (F.sum(_dec("l_discount", _RATE)).cast("double") / F.count(F.lit(1))).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


_Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sum_qty,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sum_base_price,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(6,4)))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(6,4))) * (1 + CAST(l_tax AS DECIMAL(6,4)))) AS VARCHAR) AS DOUBLE) AS sum_charge,
       (CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) / COUNT(*)) AS avg_qty,
       (CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) / COUNT(*)) AS avg_price,
       (CAST(CAST(SUM(CAST(l_discount AS DECIMAL(6,4))) AS VARCHAR) AS DOUBLE) / COUNT(*)) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# --------------------------------------------------------------------
# q3: shipping priority (TPC-H Q3 shape) — 3-way join + top-k.
# customer is the small side at any SF ratio -> broadcast; the
# orders⋈lineitem join shuffles on o_orderkey (the natural key).
# --------------------------------------------------------------------
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, "customer", sf_dir).where(F.col("c_mktsegment") == "BUILDING")
    orders = load(spark, "orders", sf_dir).where(F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    li = load(spark, "lineitem", sf_dir).where(F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp"))
    revenue = _dec("l_extendedprice", _PRICE) * (F.lit(1).cast(_RATE) - _dec("l_discount", _RATE))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
        )
    )


_Q3_SQL = """
SELECT l_orderkey,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(6,4)))) AS VARCHAR) AS DOUBLE) AS revenue,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       o_orderpriority
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING'
  AND c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


# --------------------------------------------------------------------
# q5: revenue by nation (TPC-H Q5 shape) — 6-way star join.
# region/nation/supplier are broadcast dims; only the orders⋈lineitem
# spine shuffles.
# --------------------------------------------------------------------
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, "customer", sf_dir)
    orders = load(spark, "orders", sf_dir).where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    li = load(spark, "lineitem", sf_dir)
    supp = load(spark, "supplier", sf_dir)
    nation = load(spark, "nation", sf_dir)
    region = load(spark, "region", sf_dir)
    revenue = _dec("l_extendedprice", _PRICE) * (F.lit(1).cast(_RATE) - _dec("l_discount", _RATE))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .where(cust.c_nationkey == supp.s_nationkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


_Q5_SQL = """
SELECT n_name,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(6,4)))) AS VARCHAR) AS DOUBLE) AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC, n_name ASC
"""


# --------------------------------------------------------------------
# Window functions: top-3 customers per market segment by balance.
# --------------------------------------------------------------------
def top_customers_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, "customer", sf_dir)
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        cust.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 3)
        .select("c_mktsegment", "rnk", "c_custkey", "c_name", F.col("c_acctbal").cast("double").alias("c_acctbal"))
        .orderBy("c_mktsegment", "rnk")
    )


_TOPCUST_SQL = """
SELECT c_mktsegment, rnk, c_custkey, c_name, CAST(c_acctbal AS DOUBLE) AS c_acctbal
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC) AS rnk
  FROM customer
) WHERE rnk <= 3
ORDER BY c_mktsegment, rnk
"""


# --------------------------------------------------------------------
# Event-time tumbling window over the events stream table. In
# streaming mode the same expression runs under a watermark
# (streaming/run.py); here it is the batch view of that computation.
# --------------------------------------------------------------------
def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, "events", sf_dir)
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_dec("value", _PRICE)).cast("double").alias("sum_value"),
        )
        .orderBy("hour", "event_type")
    )


_EVENTS_HOURLY_SQL = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
       event_type,
       COUNT(*) AS n_events,
       CAST(CAST(SUM(CAST(value AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
ORDER BY hour, event_type
"""


# --------------------------------------------------------------------
# Sessionization: 30-minute-gap sessions per user (lag + cumulative
# sum). The streaming twin is session_window in streaming/run.py.
# --------------------------------------------------------------------
def user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    with_break = ev.withColumn("is_new", F.when(gap.isNull() | (gap > 1800 * 1_000_000), 1).otherwise(0))
    sess = with_break.withColumn("session_id", F.sum("is_new").over(w))
    return (
        sess.groupBy("user_id", "session_id")
        .agg(F.count(F.lit(1)).alias("session_events"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.max("session_events").alias("max_session_events"),
        )
        .orderBy("user_id")
    )


_SESSIONS_SQL = """
WITH g AS (
  SELECT user_id, event_id, ts,
         CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w IS NULL
               OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800000000 THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT user_id,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS session_id
  FROM g
), per_sess AS (
  SELECT user_id, session_id, COUNT(*) AS session_events
  FROM s GROUP BY user_id, session_id
)
SELECT user_id, COUNT(*) AS n_sessions, MAX(session_events) AS max_session_events
FROM per_sess GROUP BY user_id ORDER BY user_id
"""


# --------------------------------------------------------------------
# Rollup (grouping sets) over orders.
# --------------------------------------------------------------------
def orders_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, "orders", sf_dir)
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(_dec("o_totalprice", _PRICE)).cast("double").alias("sum_total"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("o_orderstatus"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("o_orderpriority"),
            "n_orders",
            "sum_total",
        )
        .orderBy("o_orderstatus", "o_orderpriority")
    )


_ROLLUP_SQL = """
SELECT COALESCE(o_orderstatus, 'ALL') AS o_orderstatus,
       COALESCE(o_orderpriority, 'ALL') AS o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sum_total
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus, o_orderpriority
"""


# --------------------------------------------------------------------
# Exact distinct per key (the scalable twin approx_count_distinct is
# exercised in tests; exact here so the oracle hash-matches).
# --------------------------------------------------------------------
def distinct_users_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, "events", sf_dir)
    return (
        ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n_users"), F.count(F.lit(1)).alias("n_events"))
        .orderBy("event_type")
    )


_DISTINCT_USERS_SQL = """
SELECT event_type, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events
FROM events GROUP BY event_type ORDER BY event_type
"""


# --------------------------------------------------------------------
# Anti / semi joins.
# --------------------------------------------------------------------
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, "customer", sf_dir)
    orders = load(spark, "orders", sf_dir)
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_nationkey")
        .orderBy("c_custkey")
    )


_ANTI_SQL = """
SELECT c_custkey, c_name, c_nationkey
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
ORDER BY c_custkey
"""


def customers_with_open_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, "customer", sf_dir)
    orders = load(spark, "orders", sf_dir).where(F.col("o_orderstatus") == "O")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
        .select("c_custkey", "c_mktsegment")
        .orderBy("c_custkey")
    )


_SEMI_SQL = """
SELECT c_custkey, c_mktsegment
FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
ORDER BY c_custkey
"""


QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "q3_shipping_priority": q3_shipping_priority,
    "q5_region_revenue": q5_region_revenue,
    "top_customers_per_segment": top_customers_per_segment,
    "events_hourly": events_hourly,
    "user_sessions": user_sessions,
    "orders_rollup": orders_rollup,
    "distinct_users_by_type": distinct_users_by_type,
    "customers_without_orders": customers_without_orders,
    "customers_with_open_orders": customers_with_open_orders,
}

ORACLE = {
    "q1_pricing_summary": _Q1_SQL,
    "q3_shipping_priority": _Q3_SQL,
    "q5_region_revenue": _Q5_SQL,
    "top_customers_per_segment": _TOPCUST_SQL,
    "events_hourly": _EVENTS_HOURLY_SQL,
    "user_sessions": _SESSIONS_SQL,
    "orders_rollup": _ROLLUP_SQL,
    "distinct_users_by_type": _DISTINCT_USERS_SQL,
    "customers_without_orders": _ANTI_SQL,
    "customers_with_open_orders": _SEMI_SQL,
}
