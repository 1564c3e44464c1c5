"""TPC-H-shape batch 2 (round 2): six more relational shapes over the
driver tables, widening the engine's query surface — semi-join
existence (q4), pure-scan aggregate (q6), multi-dim trade matrix (q7),
returned-item ranking (q10), conditional ratio (q14), and
having-filtered fact rollup (q18). The shipped tables are slimmer than
full TPC-H (no l_shipmode/l_commitdate/partsupp), so predicates are
adapted where noted; the plan SHAPES — which is what scale cares
about — are the canonical ones.

Scale notes: q6 is the pushdown showcase (3 predicates + 3 columns
reach the scan); q4/q18 shuffle lineitem once on l_orderkey; q7/q10
broadcast every dimension; no Python anywhere.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from goconnect_spark.tables import load

_PRICE = "decimal(12,2)"
_RATE = "decimal(6,4)"


def _dec(col: str, t: str) -> F.Column:
    return F.col(col).cast(t)


def _disc_price() -> F.Column:
    return _dec("l_extendedprice", _PRICE) * (F.lit(1).cast(_RATE) - _dec("l_discount", _RATE))


# --------------------------------------------------------------------
# q4: order priority checking — EXISTS semi-join. Adapted predicate
# (no l_commitdate/l_receiptdate in this schema): an order counts when
# some lineitem shipped more than 60 days after the order date.
# --------------------------------------------------------------------
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, "orders", sf_dir).where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load(spark, "lineitem", sf_dir)
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


_Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  )
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


# --------------------------------------------------------------------
# q6: forecast revenue change — the pushdown showcase: one scan, three
# pushed predicates, two read columns, one global sum.
# --------------------------------------------------------------------
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, "lineitem", sf_dir)
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(_dec("l_extendedprice", _PRICE) * _dec("l_discount", _RATE))
            .cast("double")
            .alias("revenue")
        )
    )


_Q6_SQL = """
SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(6,4))) AS VARCHAR) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


# --------------------------------------------------------------------
# q7: trade volume matrix — supplier nation x customer nation x year.
# TPC-H picks two nations; keeping the full matrix exercises the same
# plan (two broadcast nation dims, one lineitem shuffle) with a
# constant-size result at any SF.
# --------------------------------------------------------------------
def q7_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, "lineitem", sf_dir)
    orders = load(spark, "orders", sf_dir)
    cust = load(spark, "customer", sf_dir)
    supp = load(spark, "supplier", sf_dir)
    nation = load(spark, "nation", sf_dir)
    n1 = nation.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    n2 = nation.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


_Q7_SQL = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       year(l_shipdate) AS l_year,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(6,4)))) AS VARCHAR) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE n1.n_name <> n2.n_name
GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
"""


# --------------------------------------------------------------------
# q10: returned item reporting — top 20 customers by lost revenue.
# --------------------------------------------------------------------
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, "lineitem", sf_dir).where(F.col("l_returnflag") == "R")
    orders = load(spark, "orders", sf_dir).where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    cust = load(spark, "customer", sf_dir)
    nation = load(spark, "nation", sf_dir)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


_Q10_SQL = """
SELECT c_custkey, c_name, c_acctbal, n_name,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(6,4)))) AS VARCHAR) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


# --------------------------------------------------------------------
# q14: promotion effect — conditional-sum ratio over one ship month.
# --------------------------------------------------------------------
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, "lineitem", sf_dir).where(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    part = load(spark, "part", sf_dir)
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    promo = F.when(F.col("p_type").startswith("PROMO"), _disc_price()).otherwise(
        F.lit(0).cast(_PRICE)
    )
    return joined.agg(
        (
            F.lit(100.0)
            * F.sum(promo).cast("double")
            / F.sum(_disc_price()).cast("double")
        ).alias("promo_revenue_pct")
    )


_Q14_SQL = """
SELECT (100.0
        * CAST(CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
                 THEN CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(6,4)))
                 ELSE CAST(0 AS DECIMAL(12,2)) END) AS VARCHAR) AS DOUBLE)
        / CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(6,4)))) AS VARCHAR) AS DOUBLE)
       ) AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
"""


# --------------------------------------------------------------------
# q18: large-volume customers — HAVING-filtered fact rollup joined
# back to its dimensions.
# --------------------------------------------------------------------
_Q18_QTY = 300


def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, "lineitem", sf_dir)
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity", _PRICE)).cast("double").alias("sum_qty"))
        .where(F.col("sum_qty") > _Q18_QTY)
    )
    orders = load(spark, "orders", sf_dir)
    cust = load(spark, "customer", sf_dir)
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_totalprice",
            "sum_qty",
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


_Q18_SQL = f"""
WITH big AS (
  SELECT l_orderkey,
         CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sum_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) > {_Q18_QTY}
)
SELECT c_name, c_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       o_totalprice, sum_qty
FROM big
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 100
"""


QUERIES = {
    "q4_order_priority": q4_order_priority,
    "q6_forecast_revenue": q6_forecast_revenue,
    "q7_trade_volume": q7_trade_volume,
    "q10_returned_items": q10_returned_items,
    "q14_promo_revenue": q14_promo_revenue,
    "q18_large_volume_customers": q18_large_volume_customers,
}

ORACLE = {
    "q4_order_priority": _Q4_SQL,
    "q6_forecast_revenue": _Q6_SQL,
    "q7_trade_volume": _Q7_SQL,
    "q10_returned_items": _Q10_SQL,
    "q14_promo_revenue": _Q14_SQL,
    "q18_large_volume_customers": _Q18_SQL,
}


# --------------------------------------------------------------------
# CDC-style compaction: the latest event per user (the "upsert
# materialization" every changelog pipeline runs). Window partitioned
# by the key — parallel across keys, no global sort; ties on ts break
# on event_id desc (a changelog's sequence number).
# --------------------------------------------------------------------
def events_latest_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select(
            "user_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("last_ts"),
            F.col("event_type").alias("last_type"),
            F.col("value").alias("last_value"),
        )
        .orderBy("user_id")
    )


_LATEST_SQL = """
SELECT user_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS last_ts,
       event_type AS last_type,
       value AS last_value
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rk
  FROM events
) WHERE rk = 1
ORDER BY user_id
"""

QUERIES["events_latest_per_user"] = events_latest_per_user
ORACLE["events_latest_per_user"] = _LATEST_SQL


# --------------------------------------------------------------------
# q8: market share — each supplier nation's revenue share of the
# EUROPE customer market per year. Share = partitioned window sum
# over the (year, nation) aggregate — constant-size, parallel by year.
# --------------------------------------------------------------------
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = load(spark, "lineitem", sf_dir)
    orders = load(spark, "orders", sf_dir)
    cust = load(spark, "customer", sf_dir)
    supp = load(spark, "supplier", sf_dir)
    nation = load(spark, "nation", sf_dir)
    region = load(spark, "region", sf_dir).where(F.col("r_name") == "EUROPE")
    n_cust = nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey).select(
        F.col("n_nationkey").alias("c_nk")
    )
    n_supp = nation.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    per_nation = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n_cust), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n_supp), F.col("s_nationkey") == F.col("s_nk"))
        .groupBy(F.year("l_shipdate").alias("l_year"), "supp_nation")
        .agg(F.sum(_disc_price()).alias("rev_dec"))
    )
    w = Window.partitionBy("l_year")
    return (
        per_nation.select(
            "l_year",
            "supp_nation",
            F.col("rev_dec").cast("double").alias("revenue"),
            (F.col("rev_dec").cast("double") / F.sum("rev_dec").over(w).cast("double")).alias(
                "mkt_share"
            ),
        )
        .orderBy("l_year", "supp_nation")
    )


_Q8_SQL = """
WITH per_nation AS (
  SELECT year(l_shipdate) AS l_year, n2.n_name AS supp_nation,
         SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(6,4)))) AS rev_dec
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region ON n1.n_regionkey = r_regionkey AND r_name = 'EUROPE'
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  GROUP BY 1, 2
)
SELECT l_year, supp_nation,
       CAST(CAST(rev_dec AS VARCHAR) AS DOUBLE) AS revenue,
       (CAST(CAST(rev_dec AS VARCHAR) AS DOUBLE)
        / CAST(CAST(SUM(rev_dec) OVER (PARTITION BY l_year) AS VARCHAR) AS DOUBLE)) AS mkt_share
FROM per_nation
ORDER BY l_year, supp_nation
"""


# --------------------------------------------------------------------
# q15: top supplier(s) — revenue view + exact-decimal max selection
# (ties kept, like the TPC-H spec's = max subquery).
# --------------------------------------------------------------------
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, "lineitem", sf_dir).where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    supp = load(spark, "supplier", sf_dir)
    per_supp = li.groupBy("l_suppkey").agg(F.sum(_disc_price()).alias("rev_dec"))
    max_rev = per_supp.agg(F.max("rev_dec").alias("mx"))
    return (
        per_supp.join(F.broadcast(max_rev), per_supp.rev_dec == max_rev.mx)
        .join(F.broadcast(supp), per_supp.l_suppkey == supp.s_suppkey)
        .select(
            F.col("s_suppkey"),
            F.col("s_name"),
            F.col("rev_dec").cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


_Q15_SQL = """
WITH per_supp AS (
  SELECT l_suppkey,
         SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(6,4)))) AS rev_dec
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(CAST(rev_dec AS VARCHAR) AS DOUBLE) AS total_revenue
FROM per_supp JOIN supplier ON l_suppkey = s_suppkey
WHERE rev_dec = (SELECT MAX(rev_dec) FROM per_supp)
ORDER BY s_suppkey
"""


# --------------------------------------------------------------------
# SCD2 history build: collapse each user's event stream into validity
# intervals per event_type run (the slowly-changing-dimension type-2
# materialization every warehouse ETL runs). All windows are
# partitioned by user — parallel across keys.
# --------------------------------------------------------------------
def user_history_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    runs = (
        ev.select("user_id", "event_type", "ts", "event_id")
        .withColumn(
            "chg",
            F.when(
                F.lag("event_type").over(w).isNull()
                | (F.lag("event_type").over(w) != F.col("event_type")),
                1,
            ).otherwise(0),
        )
        .withColumn("run_id", F.sum("chg").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    )
    intervals = runs.groupBy("user_id", "run_id", "event_type").agg(
        F.min("ts").alias("vf"), F.count(F.lit(1)).alias("n_events")
    )
    w2 = Window.partitionBy("user_id").orderBy("run_id")
    return (
        intervals.withColumn("vt", F.lead("vf").over(w2))
        .select(
            "user_id",
            F.col("run_id").cast("long").alias("run_id"),
            "event_type",
            F.date_format("vf", "yyyy-MM-dd HH:mm:ss").alias("valid_from"),
            F.date_format("vt", "yyyy-MM-dd HH:mm:ss").alias("valid_to"),
            "n_events",
        )
        .orderBy("user_id", "run_id")
    )


_SCD2_SQL = """
WITH runs AS (
  SELECT user_id, event_type, ts, event_id,
         SUM(CASE WHEN prev_type IS NULL OR prev_type <> event_type THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS run_id
  FROM (
    SELECT user_id, event_type, ts, event_id,
           LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
    FROM events
  )
),
intervals AS (
  SELECT user_id, run_id, event_type, MIN(ts) AS vf, COUNT(*) AS n_events
  FROM runs GROUP BY user_id, run_id, event_type
)
SELECT user_id, CAST(run_id AS BIGINT) AS run_id, event_type,
       strftime(vf, '%Y-%m-%d %H:%M:%S') AS valid_from,
       strftime(LEAD(vf) OVER (PARTITION BY user_id ORDER BY run_id), '%Y-%m-%d %H:%M:%S') AS valid_to,
       n_events
FROM intervals
ORDER BY user_id, run_id
"""


QUERIES["q8_market_share"] = q8_market_share
QUERIES["q15_top_supplier"] = q15_top_supplier
QUERIES["user_history_scd2"] = user_history_scd2
ORACLE["q8_market_share"] = _Q8_SQL
ORACLE["q15_top_supplier"] = _Q15_SQL
ORACLE["user_history_scd2"] = _SCD2_SQL


# --------------------------------------------------------------------
# q22: global sales opportunity — scalar-subquery threshold + anti
# join. Adapted to this schema (no c_phone): prospect customers are
# grouped by nation instead of phone country code, and "no orders" is
# windowed to the last year of data (every customer has SOME order in
# this corpus — the unwindowed anti join is vacuous). The plan shape
# is the canonical one: a scalar aggregate broadcast into the filter,
# and a left-anti join against recent orders.
# --------------------------------------------------------------------
def q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, "customer", sf_dir)
    orders = load(spark, "orders", sf_dir)
    nation = load(spark, "nation", sf_dir)
    avg_bal = (
        cust.where(F.col("c_acctbal") > 0)
        .agg((F.sum(_dec("c_acctbal", _PRICE)).cast("double") / F.count(F.lit(1))).alias("ab"))
    )
    recent = orders.where(F.col("o_orderdate") >= F.lit("2000-07-01").cast("timestamp"))
    prospects = (
        cust.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal").cast("double") > F.col("ab"))
        .join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
    )
    return (
        prospects.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(_dec("c_acctbal", _PRICE)).cast("double").alias("totacctbal"),
        )
        .orderBy("nation")
    )


_Q22_SQL = """
WITH avg_bal AS (
  SELECT (CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) / COUNT(*)) AS ab
  FROM customer WHERE c_acctbal > 0
)
SELECT n_name AS nation, COUNT(*) AS numcust,
       CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS totacctbal
FROM customer, avg_bal, nation
WHERE CAST(c_acctbal AS DOUBLE) > ab
  AND c_nationkey = n_nationkey
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2000-07-01 00:00:00')
GROUP BY n_name ORDER BY nation
"""

QUERIES["q22_sales_opportunity"] = q22_sales_opportunity
ORACLE["q22_sales_opportunity"] = _Q22_SQL


# --------------------------------------------------------------------
# Explicit GROUPING SETS (cube/rollup's general form — lineitem_cube
# and orders_rollup cover those): per (status, priority), per status,
# and grand total in ONE pass over orders (Spark expands the sets in
# a single Expand+HashAggregate — one scan, one shuffle, not three).
# --------------------------------------------------------------------
def orders_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    # GROUPING() markers (not COALESCE) label the rollup rows: a
    # genuine NULL group value stays NULL while subtotal rows read
    # 'ALL' — the two can no longer conflate if the data ever carries
    # NULL keys (tests/test_functions.py proves it on a NULL fixture).
    orders = load(spark, "orders", sf_dir)
    orders.createOrReplaceTempView("orders_gs")
    return spark.sql(
        """
        SELECT CASE WHEN GROUPING(o_orderstatus) = 1 THEN 'ALL'
                    ELSE o_orderstatus END AS status,
               CASE WHEN GROUPING(o_orderpriority) = 1 THEN 'ALL'
                    ELSE o_orderpriority END AS priority,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
        ORDER BY status, priority
        """
    )


_GROUPING_SETS_SQL = """
SELECT CASE WHEN GROUPING(o_orderstatus) = 1 THEN 'ALL'
            ELSE o_orderstatus END AS status,
       CASE WHEN GROUPING(o_orderpriority) = 1 THEN 'ALL'
            ELSE o_orderpriority END AS priority,
       COUNT(*) AS n_orders,
       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS total_price
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
ORDER BY status, priority
"""

QUERIES["orders_grouping_sets"] = orders_grouping_sets
ORACLE["orders_grouping_sets"] = _GROUPING_SETS_SQL
