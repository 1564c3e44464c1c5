"""TPC-H-shaped relational queries q1..q22 — the full decision-support
suite over the driver tables, each with its DuckDB oracle.

Consolidated from queries/analytics{,2,4,5,7}.py in round 6 (module
re-org only — every function and oracle string moved verbatim, no
query renamed). Scale notes live on each query: dims broadcast,
fact-fact joins shuffle on their natural keys, money math in exact
DECIMAL so sums are order-independent (see queries/__init__).
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



def _dec(col: str, t: str = _PRICE) -> F.Column:
    return F.col(col).cast(t)



def _disc_price() -> F.Column:
    return _dec("l_extendedprice") * (F.lit(1).cast(_RATE) - _dec("l_discount", _RATE))



# --------------------------------------------------------------------
# q18: large-volume customers — HAVING-filtered fact rollup joined
# back to its dimensions.
# --------------------------------------------------------------------
_Q18_QTY = 300




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
# customer is the relatively small side at any SF ratio, but it is
# SF-PROPORTIONAL, so no forced broadcast hint (r15, VERDICT r14 item
# 3): at sf0.1 the static planner broadcasts it anyway (scan estimate
# far under the 64 MB threshold — plan unchanged); at 100 TB
# stats/AQE pick the size-correct strategy instead of a driver-killing
# forced broadcast. Same rule applied to every customer/supplier/part
# hint in this module; only genuinely bounded sides (nation, region,
# 1-row scalars) keep explicit hints.
# --------------------------------------------------------------------
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, "customer", sf_dir).where(F.col("c_mktsegment") == "BUILDING")
    orders = load(spark, "orders", sf_dir).where(F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    li = load(spark, "lineitem", sf_dir).where(F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp"))
    revenue = _dec("l_extendedprice", _PRICE) * (F.lit(1).cast(_RATE) - _dec("l_discount", _RATE))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
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
        .join(supp, li.l_suppkey == supp.s_suppkey)
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
# q19-style multi-predicate OR join: disjunctive pushable predicates
# over a broadcast dim join. Catalyst pushes the OR branches into the
# scan; the join itself broadcasts part.
# --------------------------------------------------------------------
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, "lineitem", sf_dir)
    part = load(spark, "part", sf_dir)
    revenue = F.col("l_extendedprice").cast(_PRICE) * (F.lit(1).cast(_RATE) - F.col("l_discount").cast(_RATE))
    cond = (
        ((F.col("p_brand") == "Brand#1") & (F.col("p_size") <= 10) & (F.col("l_quantity") >= 5))
        | ((F.col("p_brand") == "Brand#2") & (F.col("p_size") <= 20) & (F.col("l_quantity") >= 10))
        | ((F.col("p_type") == "PROMO") & (F.col("l_quantity") >= 25))
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .where(cond)
        .agg(
            F.sum(revenue).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )



_Q19_SQL = """
SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(6,4)))) AS VARCHAR) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size <= 10 AND l_quantity >= 5)
   OR (p_brand = 'Brand#2' AND p_size <= 20 AND l_quantity >= 10)
   OR (p_type = 'PROMO' AND l_quantity >= 25)
"""



# --------------------------------------------------------------------
# Correlated-subquery shape (TPC-H q17-like): lineitems below 50% of
# their part's average quantity. Expressed as a windowless self-agg
# join (decorrelated by hand — the plan Spark/Catalyst would also
# rewrite to).
# --------------------------------------------------------------------
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, "lineitem", sf_dir)
    avg_qty = (
        li.groupBy("l_partkey")
        .agg((F.sum(F.col("l_quantity").cast(_PRICE)).cast("double") / F.count(F.lit(1))).alias("avg_qty"))
        .select(F.col("l_partkey").alias("pk"), "avg_qty")
    )
    return (
        li.join(avg_qty, li.l_partkey == F.col("pk"))
        .where(F.col("l_quantity") < F.lit(0.5) * F.col("avg_qty"))
        .agg(
            F.sum(F.col("l_extendedprice").cast(_PRICE)).cast("double").alias("total_price"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )



_Q17_SQL = """
WITH avg_q AS (
  SELECT l_partkey AS pk,
         CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS avg_qty
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS total_price,
       COUNT(*) AS n_items
FROM lineitem JOIN avg_q ON l_partkey = pk
WHERE l_quantity < 0.5 * avg_qty
"""



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
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
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
        .join(cust, orders.o_custkey == cust.c_custkey)
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
    joined = li.join(part, li.l_partkey == part.p_partkey)
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
        .join(cust, orders.o_custkey == cust.c_custkey)
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
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n_cust), F.col("c_nationkey") == F.col("c_nk"))
        .join(supp, li.l_suppkey == supp.s_suppkey)
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
        .join(supp, per_supp.l_suppkey == supp.s_suppkey)
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



def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per mid-size part, the EUROPE supplier(s) with the minimum
    offer price (min lineitem extended price for that part-supplier
    pair); top 100 by supplier balance.

    Plan: one shuffle building offers, broadcast dims, window-min on
    p_partkey == the correlated scalar subquery in the oracle.
    """
    part = load(spark, "part", sf_dir).where("p_size BETWEEN 10 AND 20")
    nation = load(spark, "nation", sf_dir)
    region = load(spark, "region", sf_dir).where("r_name = 'EUROPE'")
    supplier = load(spark, "supplier", sf_dir)
    li = load(spark, "lineitem", sf_dir)

    euro = (
        supplier.join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    # semi-filter the fact BEFORE the pair aggregation: only mid-size
    # parts (~1/5) offered by EUROPE suppliers (~1/5) contribute, so
    # the (partkey, suppkey) groupBy sees ~1/25 of lineitem. Both
    # filter sides are SF-proportional, so no forced broadcast (r15):
    # at sf0.1 the planner broadcasts them anyway (file-size estimates
    # under threshold — semi-joins stay exchange-free); at scale AQE
    # picks the size-correct strategy.
    li_f = li.join(
        part.select("p_partkey"),
        li.l_partkey == F.col("p_partkey"),
        "left_semi",
    ).join(
        euro.select("s_suppkey"),
        F.col("l_suppkey") == F.col("s_suppkey"),
        "left_semi",
    )
    offers = li_f.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice").cast(_PRICE)).alias("offer")
    )
    joined = (
        offers.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(euro, F.col("l_suppkey") == F.col("s_suppkey"))
    )
    w = Window.partitionBy("p_partkey")
    return (
        joined.withColumn("min_offer", F.min("offer").over(w))
        .where(F.col("offer") == F.col("min_offer"))
        .select(
            "s_acctbal",
            "s_name",
            F.col("n_name").alias("nation"),
            "p_partkey",
            "p_type",
            F.col("offer").cast("double").alias("offer_price"),
        )
        .orderBy(F.desc("s_acctbal"), "nation", "s_name", "p_partkey")
        .limit(100)
    )



_Q2_SQL = """
WITH offers AS (
  SELECT l_partkey, l_suppkey,
         MIN(CAST(l_extendedprice AS DECIMAL(12,2))) AS offer
  FROM lineitem GROUP BY l_partkey, l_suppkey
),
euro AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier, nation, region
  WHERE s_nationkey = n_nationkey AND n_regionkey = r_regionkey
    AND r_name = 'EUROPE'
)
SELECT s_acctbal, s_name, n_name AS nation, p_partkey, p_type,
       CAST(CAST(o.offer AS VARCHAR) AS DOUBLE) AS offer_price
FROM part p, offers o, euro e
WHERE p.p_partkey = o.l_partkey AND o.l_suppkey = e.s_suppkey
  AND p_size BETWEEN 10 AND 20
  AND o.offer = (SELECT MIN(o2.offer)
                 FROM offers o2, euro e2
                 WHERE o2.l_partkey = p.p_partkey
                   AND o2.l_suppkey = e2.s_suppkey)
ORDER BY s_acctbal DESC, nation, s_name, p_partkey
LIMIT 100
"""



def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q13 shape: distribution of customers by how many
    non-urgent orders they placed (including zero).

    Plan choice for scale: aggregate orders down to (custkey, cnt)
    FIRST (map-side partial combine, one shuffle on o_custkey), then
    left-join customers to the pre-aggregated counts — the join output
    is one row per customer, so the second aggregation (on c_count,
    cardinality = max orders per customer) is near-free. Joining the
    raw fact table to customers before aggregating would shuffle the
    full join output instead.
    """
    cust = load(spark, "customer", sf_dir).select("c_custkey")
    orders = load(spark, "orders", sf_dir).where("o_orderpriority <> '1-URGENT'")
    per_cust = orders.groupBy("o_custkey").agg(F.count("*").alias("cnt"))
    counts = cust.join(
        per_cust, F.col("c_custkey") == F.col("o_custkey"), "left"
    ).select(F.coalesce(F.col("cnt"), F.lit(0)).cast("bigint").alias("c_count"))
    return (
        counts.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )



_Q13_SQL = """
WITH per_cust AS (
  SELECT o_custkey, COUNT(*) AS cnt
  FROM orders WHERE o_orderpriority <> '1-URGENT'
  GROUP BY o_custkey
),
counts AS (
  SELECT CAST(COALESCE(cnt, 0) AS BIGINT) AS c_count
  FROM customer LEFT JOIN per_cust ON c_custkey = o_custkey
)
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM counts
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""



def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q9 shape: profit by supplier nation and order year for
    'gear' parts. partsupp isn't shipped, so the unit cost is derived
    as 10% of the part's retail price — the join/aggregate shape (fact
    x 3 dims, two-level group) is what matters, not the cost basis.

    All money math in exact decimals (sum order-independent); cast to
    double only at the end. Plan: part and supplier broadcast into the
    lineitem scan, ONE shuffle joining orders on l_orderkey, partial
    agg before the final (nation, year) exchange.
    """
    li = load(spark, "lineitem", sf_dir)
    part = load(spark, "part", sf_dir).where("p_name LIKE '%gear%'")
    supp = load(spark, "supplier", sf_dir)
    nation = load(spark, "nation", sf_dir)
    orders = load(spark, "orders", sf_dir).select("o_orderkey", "o_orderdate")

    amount = _disc_price() - (
        _dec("p_retailprice", _PRICE)
        * F.lit("0.10").cast(_RATE)
        * _dec("l_quantity", _PRICE)
    )
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(F.sum(amount).alias("profit_dec"))
        .select(
            "nation",
            "o_year",
            F.col("profit_dec").cast("double").alias("sum_profit"),
        )
        .orderBy("nation", F.desc("o_year"))
    )



_Q9_SQL = """
SELECT n_name AS nation,
       CAST(YEAR(o_orderdate) AS INT) AS o_year,
       CAST(CAST(SUM(
         CAST(l_extendedprice AS DECIMAL(12,2))
           * (CAST(1 AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4)))
         - CAST(p_retailprice AS DECIMAL(12,2))
           * CAST('0.10' AS DECIMAL(6,4))
           * CAST(l_quantity AS DECIMAL(12,2))
       ) AS VARCHAR) AS DOUBLE) AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
WHERE p_name LIKE '%gear%'
GROUP BY n_name, CAST(YEAR(o_orderdate) AS INT)
ORDER BY nation, o_year DESC
"""



# --------------------------------------------------------------------
# q11: important stock identification. Canonical form sums
# ps_supplycost * ps_availqty over partsupp for one nation and keeps
# parts above a fraction of the national total. Adapted (no partsupp):
# "stock value" of a part = discounted revenue shipped by NATION_7
# suppliers; keep parts above 2x the average per-part value. TPC-H
# scales its fraction by 1/SF for exactly this reason — a fixed share
# of total degenerates to zero rows as the part dimension grows; the
# 2x-average form keeps the same plan shape (grouped agg + 1-row
# global-threshold scalar broadcast, the canonical HAVING >
# (SELECT ...)) with a non-trivial tail at every scale.
# --------------------------------------------------------------------
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, "lineitem", sf_dir)
    supp = load(spark, "supplier", sf_dir)
    nat = load(spark, "nation", sf_dir).where(F.col("n_name") == "NATION_7")
    nat_supp = supp.join(
        F.broadcast(nat), supp.s_nationkey == nat.n_nationkey
    ).select("s_suppkey")
    # nat_supp is supplier-proportional — no forced broadcast (r15,
    # VERDICT r14 item 3): at sf0.1 the static planner still
    # broadcasts it (the post-join estimate stays under threshold);
    # at 100 TB stats/AQE pick the size-correct strategy. A
    # localCheckpoint materialization was measured here and REJECTED
    # (0.91 -> 1.47 s at sf0.1 — the eager barrier costs more than
    # the estimate risk; AQE's runtime conversion covers the case
    # where the static estimate inflates past the threshold).
    fact = li.join(nat_supp, li.l_suppkey == F.col("s_suppkey"))
    per_part = fact.groupBy("l_partkey").agg(
        F.sum(_disc_price()).alias("value_dec")
    )
    total = per_part.agg(
        F.sum("value_dec").alias("total_dec"),
        F.count(F.lit(1)).alias("n_parts"),
    )
    # threshold compare in double-land with IDENTICAL operands on both
    # engines (decimal division would round to engine-specific result
    # scales at the boundary): exact decimal sums -> double, then the
    # same left-associative (2.0 * total) / n each side — bit-identical
    # by IEEE-754
    return (
        per_part.crossJoin(F.broadcast(total))  # 1-row scalar threshold
        .where(
            F.col("value_dec").cast("double")
            > F.lit(2.0) * F.col("total_dec").cast("double") / F.col("n_parts")
        )
        .select(
            F.col("l_partkey").alias("partkey"),
            F.col("value_dec").cast("double").alias("value"),
        )
        .orderBy(F.desc("value"), "partkey")
    )



_Q11_SQL = """
WITH nat_supp AS (
  SELECT s_suppkey FROM supplier JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_7'
), per_part AS (
  SELECT l_partkey AS partkey,
         SUM(CAST(l_extendedprice AS DECIMAL(12,2))
             * (CAST(1 AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4)))) AS value_dec
  FROM lineitem JOIN nat_supp ON l_suppkey = s_suppkey
  GROUP BY l_partkey
)
SELECT partkey, CAST(CAST(value_dec AS VARCHAR) AS DOUBLE) AS value
FROM per_part
WHERE CAST(CAST(value_dec AS VARCHAR) AS DOUBLE)
      > 2.0 * CAST(CAST((SELECT SUM(value_dec) FROM per_part) AS VARCHAR) AS DOUBLE)
            / (SELECT COUNT(*) FROM per_part)
ORDER BY value DESC, partkey
"""



# --------------------------------------------------------------------
# q12: shipping-mode / order-priority matrix. Canonical form buckets
# by l_shipmode and counts urgent vs non-urgent orders. Adapted (no
# l_shipmode): bucket by shipping SPEED — a line is 'SLOW' when it
# shipped more than 30 days after the order date, else 'FAST'. Same
# join (orders x lineitem on orderkey), same CASE-sum pivot.
# --------------------------------------------------------------------
def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, "orders", sf_dir)
    li = load(spark, "lineitem", sf_dir).where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    joined = li.join(orders, li.l_orderkey == orders.o_orderkey)
    speed = F.when(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"),
        F.lit("SLOW"),
    ).otherwise(F.lit("FAST"))
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        joined.select(speed.alias("ship_speed"), high.alias("is_high"))
        .groupBy("ship_speed")
        .agg(
            F.sum(F.when(F.col("is_high"), 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(F.col("is_high"), 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("ship_speed")
    )



_Q12_SQL = """
SELECT CASE WHEN l_shipdate > o_orderdate + INTERVAL 30 DAY
            THEN 'SLOW' ELSE 'FAST' END AS ship_speed,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY 1 ORDER BY ship_speed
"""



# --------------------------------------------------------------------
# q16: parts/supplier relationship counts. Canonical form counts
# distinct partsupp suppliers per (brand, type, size) bucket,
# excluding complaint suppliers. Adapted: the supplier-offers-part
# incidence comes from distinct (l_partkey, l_suppkey) pairs in
# lineitem; "complaint" suppliers are those with negative account
# balance (anti-join on the 1/16-of-suppliers exclusion set).
# --------------------------------------------------------------------
def q16_parts_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, "lineitem", sf_dir)
    part = load(spark, "part", sf_dir).where(
        (F.col("p_brand") != "Brand#2")
        & (~F.col("p_type").startswith("ECONOMY"))
        & (F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22))
    )
    complaints = load(spark, "supplier", sf_dir).where(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    # no (partkey, suppkey) pre-distinct (r14): countDistinct already
    # collapses duplicate suppliers per (brand, type, size) group, so
    # the full-fact distinct exchange bought nothing — and it ran
    # BEFORE the selective part filter. Joining the broadcast filtered
    # part dim first means only matching rows reach the (group,
    # suppkey) partial distinct; 2 exchanges -> 1.
    # no forced broadcast on part/complaints (r15, VERDICT r14 item 3):
    # both are SF-proportional scans whose file-size estimates keep
    # them broadcast at sf0.1 (plan unchanged); at 100 TB stats/AQE
    # decide.
    pairs = li.select("l_partkey", "l_suppkey")
    return (
        pairs.join(part, pairs.l_partkey == part.p_partkey)
        .join(
            complaints,
            pairs.l_suppkey == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )



_Q16_SQL = """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) pairs
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#2'
  AND p_type NOT LIKE 'ECONOMY%'
  AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""



# --------------------------------------------------------------------
# q20: potential part promotion. Canonical form keeps suppliers whose
# availqty exceeds half their shipped quantity of 'forest%' parts.
# Adapted (no partsupp.availqty): a NATION_3 supplier qualifies when,
# for some 'small%'-named part, their 1996 shipped quantity exceeds
# 30% of that part's total 1996 shipped quantity — a dominant-share
# supplier. Shape: one (part,supp) aggregate whose per-part totals
# come from a partkey window over it (r14 — replacing the separate
# per-part aggregate + join), then a semi-join up to the supplier
# dimension — the canonical nested-IN chain.
# --------------------------------------------------------------------
def q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, "lineitem", sf_dir).where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    small_parts = (
        load(spark, "part", sf_dir)
        .where(F.col("p_name").startswith("small"))
        .select("p_partkey")
    )
    fact = li.join(small_parts, li.l_partkey == F.col("p_partkey"))
    per_ps = fact.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(_dec("l_quantity")).alias("supp_qty")
    )
    # part_qty = SUM of the per-(part, supplier) subtotals — decimal
    # addition at fixed scale is exact, so a window over per_ps is
    # VALUE-exact vs the separate per-part aggregate while removing a
    # second execution of the lineitem-scan + part-join subtree (r14,
    # guide §7.2 "duplicated subtrees": `fact` was aggregated twice).
    # Type note (ADVICE r14): the window sum widens to decimal(32,2)
    # (the old sum was decimal(22,2)), so `part_qty * 3` takes Spark's
    # precision-loss adjustment path — exact at any realistic
    # magnitude, but the identity is value-level, not type-level.
    # Non-null assumption: the window keeps NULL l_partkey rows the
    # replaced inner join would drop; l_partkey is never NULL here.
    per_part_w = Window.partitionBy("l_partkey")
    dominant = (
        per_ps.withColumn("part_qty", F.sum("supp_qty").over(per_part_w))
        # decimal-exact share test: supp_qty > 0.3 * part_qty, scaled
        # to integers (x10) so neither engine divides
        .where(F.col("supp_qty") * 10 > F.col("part_qty") * 3)
        .select("l_suppkey")
        .distinct()
    )
    supp = load(spark, "supplier", sf_dir)
    nat = load(spark, "nation", sf_dir).where(F.col("n_name") == "NATION_3")
    return (
        supp.join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        # dominant is supplier-proportional — no forced broadcast
        # (r15); at sf0.1 AQE converts the semi-join to broadcast from
        # the runtime size, at scale it picks the size-correct form
        .join(dominant, supp.s_suppkey == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )



_Q20_SQL = """
WITH fact AS (
  SELECT l_partkey, l_suppkey, CAST(l_quantity AS DECIMAL(12,2)) AS qty
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE 'small%'
    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
), per_ps AS (
  SELECT l_partkey, l_suppkey, SUM(qty) AS supp_qty
  FROM fact GROUP BY l_partkey, l_suppkey
), per_part AS (
  SELECT l_partkey AS pk, SUM(qty) AS part_qty FROM fact GROUP BY l_partkey
)
SELECT s_suppkey, s_name
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_3'
  AND s_suppkey IN (
    SELECT l_suppkey FROM per_ps JOIN per_part ON l_partkey = pk
    WHERE supp_qty * 10 > part_qty * 3
  )
ORDER BY s_suppkey
"""



# --------------------------------------------------------------------
# q21: suppliers who kept orders waiting. Canonical form: for
# finalized multi-supplier orders, count per supplier the orders where
# they were the ONLY late supplier. Adapted lateness (no
# l_receiptdate/l_commitdate): a line is late when it shipped more
# than 90 days after the order date.
#
# The textbook plan is lineitem x lineitem EXISTS + NOT-EXISTS (two
# more fact self-joins). Implemented instead as ONE aggregation per
# orderkey — n_supp = distinct suppliers, n_late_supp = distinct
# suppliers with a late line — then a supplier qualifies on an order
# iff they are late, n_supp > 1, and n_late_supp = 1 (they ARE that
# one). The oracle keeps the canonical EXISTS/NOT-EXISTS form, so the
# hash match is a differential proof of the rewrite. One fact shuffle
# instead of three; the count is per (order, supplier) pair.
# --------------------------------------------------------------------
def q21_late_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, "orders", sf_dir).where(F.col("o_orderstatus") == "F")
    li = load(spark, "lineitem", sf_dir)
    fact = li.join(
        orders.select("o_orderkey", "o_orderdate"),
        li.l_orderkey == F.col("o_orderkey"),
    ).select(
        "l_orderkey",
        "l_suppkey",
        (
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
        ).alias("late"),
    )
    per_pair = fact.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("late").alias("supp_late")
    )
    # per-order stats as a window over per_pair instead of the
    # per_order aggregate + self-join (r14): the self-join re-executed
    # the whole lineitem-join-orders subtree for each side, and both
    # sides re-shuffled on l_orderkey. The join's l_orderkey hash
    # partitioning satisfies the groupBy AND this window, so the
    # rewritten tail runs shuffle-free until the per-supplier count.
    # Same filter semantics: every (order, supplier) row sees its
    # order's full supplier/late counts either way.
    wo = Window.partitionBy("l_orderkey")
    waiting = (
        per_pair.withColumn("n_supp", F.count(F.lit(1)).over(wo))
        .withColumn(
            "n_late_supp",
            F.sum(F.when(F.col("supp_late"), 1).otherwise(0)).over(wo),
        )
        .where(
            F.col("supp_late") & (F.col("n_supp") > 1) & (F.col("n_late_supp") == 1)
        )
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
    supp = load(spark, "supplier", sf_dir)
    nat = load(spark, "nation", sf_dir).where(F.col("n_name") == "NATION_1")
    return (
        waiting.join(supp, waiting.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .select("s_name", "numwait")
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )



_Q21_SQL = """
SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM (SELECT DISTINCT l1.l_orderkey, l1.l_suppkey
      FROM lineitem l1
      JOIN orders ON l1.l_orderkey = o_orderkey
      WHERE o_orderstatus = 'F'
        AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
        AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
        )
        AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          JOIN orders o3 ON l3.l_orderkey = o3.o_orderkey
          WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_shipdate > o3.o_orderdate + INTERVAL 90 DAY
        )
     ) pairs
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_1'
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
"""


QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "q3_shipping_priority": q3_shipping_priority,
    "q5_region_revenue": q5_region_revenue,
    "q19_discounted_revenue": q19_discounted_revenue,
    "q17_small_quantity_revenue": q17_small_quantity_revenue,
    "q4_order_priority": q4_order_priority,
    "q6_forecast_revenue": q6_forecast_revenue,
    "q7_trade_volume": q7_trade_volume,
    "q10_returned_items": q10_returned_items,
    "q14_promo_revenue": q14_promo_revenue,
    "q18_large_volume_customers": q18_large_volume_customers,
    "q8_market_share": q8_market_share,
    "q15_top_supplier": q15_top_supplier,
    "q22_sales_opportunity": q22_sales_opportunity,
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q13_order_count_distribution": q13_order_count_distribution,
    "q9_product_type_profit": q9_product_type_profit,
    "q11_important_stock": q11_important_stock,
    "q12_shipmode_priority": q12_shipmode_priority,
    "q16_parts_supplier_counts": q16_parts_supplier_counts,
    "q20_potential_promotion": q20_potential_promotion,
    "q21_late_suppliers": q21_late_suppliers,
}

ORACLE = {
    "q1_pricing_summary": _Q1_SQL,
    "q3_shipping_priority": _Q3_SQL,
    "q5_region_revenue": _Q5_SQL,
    "q19_discounted_revenue": _Q19_SQL,
    "q17_small_quantity_revenue": _Q17_SQL,
    "q4_order_priority": _Q4_SQL,
    "q6_forecast_revenue": _Q6_SQL,
    "q7_trade_volume": _Q7_SQL,
    "q10_returned_items": _Q10_SQL,
    "q14_promo_revenue": _Q14_SQL,
    "q18_large_volume_customers": _Q18_SQL,
    "q8_market_share": _Q8_SQL,
    "q15_top_supplier": _Q15_SQL,
    "q22_sales_opportunity": _Q22_SQL,
    "q2_min_cost_supplier": _Q2_SQL,
    "q13_order_count_distribution": _Q13_SQL,
    "q9_product_type_profit": _Q9_SQL,
    "q11_important_stock": _Q11_SQL,
    "q12_shipmode_priority": _Q12_SQL,
    "q16_parts_supplier_counts": _Q16_SQL,
    "q20_potential_promotion": _Q20_SQL,
    "q21_late_suppliers": _Q21_SQL,
}
