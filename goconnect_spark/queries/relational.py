"""Relational analytics beyond the TPC-H suite: window ranks, rollup/
cube/grouping-set shapes, semi/anti joins, reconciliation, unpivot,
market-basket lift, RFM segmentation, concentration indices.

Consolidated from queries/analytics{,2,3,4,6,7}.py in round 6 (module
re-org only — code moved verbatim, no query renamed).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from goconnect_spark.tables import load


# Deterministic-hash arithmetic: cast money/rate doubles to exact
# decimals before summing (order-independent), back to double at the
# end. See queries/__init__ docstring.
_PRICE = "decimal(12,2)"



def _dec(col: str, t: str = _PRICE) -> F.Column:
    return F.col(col).cast(t)


_BASKET_MIN_PAIR = 5




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
# Anti / semi joins.
# --------------------------------------------------------------------
def customers_order_presence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI and LEFT ANTI join certificates in ONE query (round-12
    merge of customers_with_open_orders + customers_without_orders,
    preserving both operator certificates plus a union): customers with
    at least one open order, labeled 'open_orders' and carrying their
    market segment, unioned with order-less customers labeled
    'no_orders' and carrying their nation key."""
    cust = load(spark, "customer", sf_dir)
    orders = load(spark, "orders", sf_dir)
    open_orders = orders.where(F.col("o_orderstatus") == "O")
    semi = (
        cust.join(open_orders, cust.c_custkey == open_orders.o_custkey,
                  "left_semi")
        .select(
            "c_custkey",
            F.lit("open_orders").alias("presence"),
            F.col("c_mktsegment").alias("detail"),
        )
    )
    anti = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select(
            "c_custkey",
            F.lit("no_orders").alias("presence"),
            F.col("c_nationkey").cast("string").alias("detail"),
        )
    )
    return semi.unionByName(anti).orderBy("presence", "c_custkey")



_ORDER_PRESENCE_SQL = """
SELECT c_custkey, 'open_orders' AS presence, c_mktsegment AS detail
FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
UNION ALL
SELECT c_custkey, 'no_orders' AS presence, CAST(c_nationkey AS VARCHAR) AS detail
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
ORDER BY presence, c_custkey
"""



# --------------------------------------------------------------------
# Set operations (absent from the reference: a pipeline is one linear
# chain — README.md:6-8 — so there is nothing to union; Spark gives
# them free).
# --------------------------------------------------------------------
def customer_supplier_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, "customer", sf_dir).select(F.col("c_nationkey").alias("nationkey"))
    supp = load(spark, "supplier", sf_dir).select(F.col("s_nationkey").alias("nationkey"))
    both = cust.intersect(supp).withColumn("which", F.lit("both"))
    cust_only = cust.distinct().exceptAll(supp.distinct()).withColumn("which", F.lit("customer_only"))
    return both.unionByName(cust_only).orderBy("which", "nationkey")



_SETOPS_SQL = """
SELECT nationkey, 'both' AS which
FROM (SELECT c_nationkey AS nationkey FROM customer INTERSECT SELECT s_nationkey FROM supplier)
UNION ALL
SELECT nationkey, 'customer_only' AS which
FROM (SELECT DISTINCT c_nationkey AS nationkey FROM customer
      EXCEPT SELECT DISTINCT s_nationkey FROM supplier)
ORDER BY which, nationkey
"""



# --------------------------------------------------------------------
# Exact percentiles (interpolated). Spark's percentile() and DuckDB's
# quantile_cont produce bit-identical doubles on identical inputs
# (verified) — the scalable twin is approx_percentile/t-digest.
# --------------------------------------------------------------------
def quantity_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, "lineitem", sf_dir)
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_quantity, 0.5)").alias("p50_qty"),
            F.expr("percentile(l_quantity, 0.9)").alias("p90_qty"),
            F.expr("percentile(l_extendedprice, 0.25)").alias("p25_price"),
            F.expr("percentile(l_extendedprice, 0.99)").alias("p99_price"),
        )
        .orderBy("l_returnflag")
    )



_PERCENTILES_SQL = """
SELECT l_returnflag,
       quantile_cont(l_quantity, 0.5) AS p50_qty,
       quantile_cont(l_quantity, 0.9) AS p90_qty,
       quantile_cont(l_extendedprice, 0.25) AS p25_price,
       quantile_cont(l_extendedprice, 0.99) AS p99_price
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""



# --------------------------------------------------------------------
# CUBE over two dims (all four grouping sets).
# --------------------------------------------------------------------
def lineitem_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, "lineitem", sf_dir)
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(12,2)")).cast("double").alias("sum_qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("l_returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("l_linestatus"),
            "n",
            "sum_qty",
        )
        .orderBy("l_returnflag", "l_linestatus")
    )



_CUBE_SQL = """
SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,
       COALESCE(l_linestatus, 'ALL') AS l_linestatus,
       COUNT(*) AS n,
       CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY l_returnflag, l_linestatus
"""



# --------------------------------------------------------------------
# Unpivot (wide -> long): per-order melt of status/priority counts.
# Spark stack() == SQL UNION ALL of the measures.
# --------------------------------------------------------------------
def orders_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, "orders", sf_dir)
    wide = orders.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_customers"),
        F.min("o_orderkey").alias("first_key"),
    )
    return (
        wide.select(
            "o_orderstatus",
            F.expr(
                "stack(3, 'n_orders', n_orders, 'n_customers', n_customers, 'first_key', first_key)"
            ).alias("measure", "value"),
        )
        .orderBy("o_orderstatus", "measure")
    )



_UNPIVOT_SQL = """
WITH wide AS (
  SELECT o_orderstatus, COUNT(*) AS n_orders,
         COUNT(DISTINCT o_custkey) AS n_customers,
         MIN(o_orderkey) AS first_key
  FROM orders GROUP BY o_orderstatus
)
SELECT o_orderstatus, measure, value FROM (
  SELECT o_orderstatus, 'n_orders' AS measure, n_orders AS value FROM wide
  UNION ALL
  SELECT o_orderstatus, 'n_customers', n_customers FROM wide
  UNION ALL
  SELECT o_orderstatus, 'first_key', first_key FROM wide
)
ORDER BY o_orderstatus, measure
"""



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



def customer_spend_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full window-ranking family over customer order spend:
    rank, dense_rank, percent_rank and ntile(10) — deterministic total
    order (spend is an exact decimal sum; ties broken by custkey).

    Scale shape: NO unpartitioned data-sized window. Because the order
    (spend_dec DESC, custkey ASC) is total — custkey is unique — every
    member of the family is a closed-form function of the global row
    number rn and the row count n: rank = dense_rank = rn,
    percent_rank = (rn-1)/(n-1), and ntile(k) follows the first-(n%k)-
    tiles-get-ceil(n/k) rule. rn itself comes from the two-phase scan
    (same pattern as packing.py's cumsum): range-partition on the sort
    key, a constant-size window over per-partition counts yields each
    partition's offset, and the data-sized row_number window is
    partitioned by pid. n is a 1-row broadcast. At 100x the customer
    dimension every data-sized step stays parallel.

    percent_rank's double is (rank-1)/(n-1): identical integers
    divided in both engines. Top 100 by the same total order.
    """
    orders = load(spark, "orders", sf_dir)
    spend = orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast(_PRICE)).alias("spend_dec")
    )
    ranged = spend.repartitionByRange(
        F.desc("spend_dec"), F.asc("o_custkey")
    ).withColumn("pid", F.spark_partition_id())
    counts = ranged.groupBy("pid").agg(F.count(F.lit(1)).alias("pcnt"))
    w_off = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "pid", F.coalesce(F.sum("pcnt").over(w_off), F.lit(0)).alias("poff")
    )
    total = counts.agg(F.sum("pcnt").alias("n_total"))
    w_in = Window.partitionBy("pid").orderBy(
        F.desc("spend_dec"), F.asc("o_custkey")
    )
    ranked = (
        ranged.join(F.broadcast(offsets), "pid")
        .select(
            "o_custkey",
            "spend_dec",
            (F.col("poff") + F.row_number().over(w_in)).alias("rn"),
        )
        .crossJoin(F.broadcast(total))  # 1-row scalar: the global count
    )
    # ntile(10): q = n DIV 10, r = n MOD 10; tiles 1..r hold q+1 rows
    # (CASE keeps the q=0 division branch unevaluated under ANSI)
    decile = F.expr(
        """CASE WHEN rn <= (n_total % 10) * (n_total DIV 10 + 1)
                THEN (rn + n_total DIV 10) DIV (n_total DIV 10 + 1)
                ELSE n_total % 10
                     + (rn - (n_total % 10) * (n_total DIV 10 + 1)
                        + n_total DIV 10 - 1) DIV (n_total DIV 10)
           END"""
    )
    return (
        ranked.select(
            F.col("o_custkey").alias("custkey"),
            F.col("spend_dec").cast("double").alias("spend"),
            F.col("rn").cast("bigint").alias("rnk"),
            F.col("rn").cast("bigint").alias("drnk"),
            F.when(F.col("n_total") > 1, (F.col("rn") - 1) / (F.col("n_total") - 1))
            .otherwise(F.lit(0.0))
            .alias("prnk"),
            decile.cast("bigint").alias("decile"),
        )
        .orderBy("rnk", "custkey")
        .limit(100)
    )



_RANKS_SQL = """
WITH spend AS (
  SELECT o_custkey AS custkey,
         SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS spend_dec
  FROM orders GROUP BY o_custkey
)
SELECT custkey,
       CAST(CAST(spend_dec AS VARCHAR) AS DOUBLE) AS spend,
       CAST(RANK() OVER w AS BIGINT) AS rnk,
       CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk,
       PERCENT_RANK() OVER w AS prnk,
       CAST(NTILE(10) OVER w AS BIGINT) AS decile
FROM spend
WINDOW w AS (ORDER BY spend_dec DESC, custkey ASC)
ORDER BY rnk, custkey
LIMIT 100
"""



def daily_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER reconciliation: order activity by calendar day vs
    purchase-event activity by day — days present on either side
    survive, with zero-filled counts (the shape of a cross-system
    consistency report).

    Day keys are integer epoch days (floor(us / 86400e6)) — no
    calendar semantics. Both sides pre-aggregate to one row per day
    BEFORE the full-outer join, so the join is tiny regardless of
    fact volume.
    """
    orders = load(spark, "orders", sf_dir)
    ev = load(spark, "events", sf_dir)
    od = (
        # o_orderdate reads as TIMESTAMP_NTZ; the cast to TIMESTAMP is
        # session-tz-dependent, but tables.load pins the session to UTC
        orders.select(
            (F.unix_micros(F.col("o_orderdate").cast("timestamp")) / F.lit(86_400_000_000))
            .cast("bigint")
            .alias("day")
        )
        .groupBy("day")
        .agg(F.count("*").alias("n_orders"))
    )
    ed = (
        ev.where("event_type = 'purchase'")
        .select((F.unix_micros("ts") / F.lit(86_400_000_000)).cast("bigint").alias("day"))
        .groupBy("day")
        .agg(F.count("*").alias("n_purchase_events"))
    )
    return od.join(ed, "day", "full_outer").select(
        "day",
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        F.coalesce("n_purchase_events", F.lit(0)).alias("n_purchase_events"),
    )



_RECON_SQL = """
WITH od AS (
  SELECT CAST(FLOOR(epoch_us(o_orderdate) / 86400000000) AS BIGINT) AS day,
         CAST(COUNT(*) AS BIGINT) AS n_orders
  FROM orders GROUP BY 1
),
ed AS (
  SELECT CAST(FLOOR(epoch_us(ts) / 86400000000) AS BIGINT) AS day,
         CAST(COUNT(*) AS BIGINT) AS n_purchase_events
  FROM events WHERE event_type = 'purchase' GROUP BY 1
)
SELECT COALESCE(od.day, ed.day) AS day,
       COALESCE(n_orders, 0) AS n_orders,
       COALESCE(n_purchase_events, 0) AS n_purchase_events
FROM od FULL OUTER JOIN ed ON od.day = ed.day
"""


def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per customer the recency (latest order day),
    frequency (order count) and monetary (exact DECIMAL spend)
    metrics, each quartiled with NTILE(4) — the classic marketing
    segmentation, and the quantile-bucketing shape feature stores run
    at scale.

    Determinism: every NTILE ordering carries o_custkey as the final
    tiebreak, making each a total order — NTILE is then a pure
    function of rank and group size (identical definition in both
    engines: equal buckets, remainder to the leading buckets).
    Recency is an integer epoch-day; monetary is DECIMAL-summed
    (order-independent) and cast last.

    Scale: one aggregation over orders keyed by customer; each of the
    three quartile passes is the two-phase range-partition rank
    (operators/ranking.py, the customer_spend_ranks pattern) — NTILE
    is the closed-form function of the global row number, so at a
    100x customer dimension there is no single-task window anywhere:
    three range shuffles of the dim aggregate, all parallel.
    """
    from goconnect_spark.operators.ranking import global_row_number, ntile_from_rn

    orders = load(spark, "orders", sf_dir)
    per_cust = orders.groupBy("o_custkey").agg(
        F.max(
            (F.unix_micros(F.col("o_orderdate").cast("timestamp")) / F.lit(86_400_000_000))
            .cast("bigint")
        ).alias("last_day"),
        F.count(F.lit(1)).cast("long").alias("frequency"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("spend_dec"),
    # materialize the dim aggregate ONCE (r14, guide §1.2): each
    # chained global_row_number pass starts with repartitionByRange,
    # whose range-boundary SAMPLING job re-executes its whole child
    # plan — so the orders scan+aggregation ran again for every pass
    # (and once more for the final orderBy). Checkpointing the
    # customer-grain aggregate (already the reduced dim) caps that
    # at one fact-table pass.
    ).localCheckpoint()
    # INDEPENDENT tile branches joined back on the key (r14, guide
    # §2.6 stragglers/latency): the old chain threaded each pass's
    # output into the next, so the three range sorts ran strictly
    # sequentially (and each pass's sampling job replayed its
    # predecessors); as parallel branches over the checkpointed dim
    # the scheduler overlaps them, measured 2.09 -> 1.25 s warm at
    # sf0.1. Each branch carries only (key, tile), so the joins are
    # dim-grain equi-joins.
    tiled = per_cust
    for tile_col, order in [
        ("r_quartile", [F.desc("last_day"), F.asc("o_custkey")]),
        ("f_quartile", [F.desc("frequency"), F.asc("o_custkey")]),
        ("m_quartile", [F.desc("spend_dec"), F.asc("o_custkey")]),
    ]:
        branch = global_row_number(
            per_cust, order, rn_col="__rn", n_col="__n"
        ).select(
            "o_custkey", ntile_from_rn(4, "__rn", "__n").cast("int").alias(tile_col)
        )
        tiled = tiled.join(branch, "o_custkey")
    return (
        tiled.select(
            "o_custkey",
            "last_day",
            "frequency",
            F.col("spend_dec").cast("string").cast("double").alias("monetary"),
            "r_quartile",
            "f_quartile",
            "m_quartile",
        )
        .withColumn(
            "segment",
            F.concat_ws(
                "-",
                F.col("r_quartile").cast("string"),
                F.col("f_quartile").cast("string"),
                F.col("m_quartile").cast("string"),
            ),
        )
        .orderBy("o_custkey")
    )



_RFM_SQL = """
WITH per_cust AS (
  SELECT o_custkey,
         CAST(MAX(FLOOR(epoch_us(o_orderdate) / 86400000000)) AS BIGINT) AS last_day,
         CAST(COUNT(*) AS BIGINT) AS frequency,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS spend_dec
  FROM orders GROUP BY o_custkey
),
tiled AS (
  SELECT o_custkey, last_day, frequency,
         CAST(CAST(spend_dec AS VARCHAR) AS DOUBLE) AS monetary,
         NTILE(4) OVER (ORDER BY last_day DESC, o_custkey ASC) AS r_quartile,
         NTILE(4) OVER (ORDER BY frequency DESC, o_custkey ASC) AS f_quartile,
         NTILE(4) OVER (ORDER BY spend_dec DESC, o_custkey ASC) AS m_quartile
  FROM per_cust
)
SELECT o_custkey, last_day, frequency, monetary, r_quartile, f_quartile, m_quartile,
       concat_ws('-', CAST(r_quartile AS VARCHAR), CAST(f_quartile AS VARCHAR),
                 CAST(m_quartile AS VARCHAR)) AS segment
FROM tiled ORDER BY o_custkey
"""


def order_fulfillment_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-last-shipment latency percentiles per order priority:
    per order the days from o_orderdate to its LAST lineitem shipment,
    then exact p50/p90/p99 per priority via the nearest-rank rule —
    the fulfillment-SLA report shape.

    All latencies are integer epoch-day differences; the percentile
    pick is rank arithmetic over a total order (latency, orderkey), so
    no interpolation and no floats anywhere until none are needed.
    Scale: the per-order max is one keyed aggregation on the fact
    join key; the percentile windows run per priority over the order
    dimension.
    """
    from pyspark.sql import Window

    orders = load(spark, "orders", sf_dir)
    li = load(spark, "lineitem", sf_dir)
    day = lambda c: (
        F.unix_micros(F.col(c).cast("timestamp")) / F.lit(86_400_000_000)
    ).cast("bigint")
    last_ship = li.groupBy("l_orderkey").agg(
        F.max(day("l_shipdate")).alias("ship_day")
    )
    lat = (
        orders.join(last_ship, orders.o_orderkey == last_ship.l_orderkey)
        .select(
            "o_orderpriority",
            "o_orderkey",
            (F.col("ship_day") - day("o_orderdate")).alias("latency_days"),
        )
    )
    w = Window.partitionBy("o_orderpriority").orderBy("latency_days", "o_orderkey")
    ranked = lat.select(
        "o_orderpriority",
        "latency_days",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(Window.partitionBy("o_orderpriority")).alias("n"),
    )
    # one window pass (r14, guide §1.2/§2.1): the old per-quantile
    # union re-ran the join + both windows once per q (3x the fact
    # aggregation in the plan); a row can be the nearest-rank pick for
    # several qs at tiny n, so filter to the union of the three target
    # ranks first (cheap, predicate on the windowed output), then
    # explode the q list in-row and keep the matching ones — identical
    # (priority, q, latency, n) rows, one plan instead of three.
    qs = F.array(*[F.lit(q) for q in (50, 90, 99)])
    target = lambda q: F.ceil(q / F.lit(100.0) * F.col("n")).cast("int")
    return (
        ranked.where(
            (F.col("rk") == target(F.lit(50)))
            | (F.col("rk") == target(F.lit(90)))
            | (F.col("rk") == target(F.lit(99)))
        )
        .select(
            "o_orderpriority",
            F.explode(qs).alias("__q"),
            F.col("latency_days").alias("latency"),
            "n",
            "rk",
        )
        .where(F.col("rk") == target(F.col("__q")))
        .select(
            "o_orderpriority",
            F.col("__q").cast("int").alias("q"),
            "latency",
            "n",
        )
        .orderBy("o_orderpriority", "q")
    )



_FULFILL_SQL = """
WITH last_ship AS (
  SELECT l_orderkey,
         CAST(MAX(FLOOR(epoch_us(l_shipdate) / 86400000000)) AS BIGINT) AS ship_day
  FROM lineitem GROUP BY l_orderkey
),
lat AS (
  SELECT o_orderpriority, o_orderkey,
         ship_day - CAST(FLOOR(epoch_us(o_orderdate) / 86400000000) AS BIGINT) AS latency_days
  FROM orders JOIN last_ship ON o_orderkey = l_orderkey
),
ranked AS (
  SELECT o_orderpriority, latency_days,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                            ORDER BY latency_days, o_orderkey) AS rk,
         CAST(COUNT(*) OVER (PARTITION BY o_orderpriority) AS BIGINT) AS n
  FROM lat
),
qs AS (SELECT unnest([50, 90, 99]) AS q)
SELECT r.o_orderpriority, CAST(qs.q AS INT) AS q,
       r.latency_days AS latency, r.n
FROM ranked r JOIN qs ON r.rk = CAST(CEIL(qs.q / 100.0 * r.n) AS INT)
ORDER BY r.o_orderpriority, q
"""



def brand_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association between part brands: for brand pairs
    co-occurring in >= 5 orders, the lift
    pair_orders * n_orders / (orders_a * orders_b) — the relational
    twin of word_cooccurrence's PMI-ratio (same all-integer inputs,
    one double division, no logs).

    Scale: the basket self-join is bounded the same way as the word
    pair join — baskets reduce to DISTINCT (order, brand) first (the
    brand dimension is small, so per-order fanout is bounded by
    |brands|), pairs shuffle once on (b1, b2), and the per-brand
    order counts are a broadcast dim. The part lookup is a broadcast
    join on partkey.
    """
    li = load(spark, "lineitem", sf_dir).select("l_orderkey", "l_partkey")
    part = load(spark, "part", sf_dir).select("p_partkey", "p_brand")
    # ONE shuffle does the basket dedup AND collection: groupBy
    # orderkey with collect_set (dedups in the partial aggregate);
    # brand pairs come from an IN-ROW expansion of each sorted basket
    # (explode i, then the tail slice — b1 < b2 by construction), so
    # the order-level self-join and the eager localCheckpoint both
    # disappear. Per-brand counts and the order total re-read the
    # persisted basket table.
    baskets = (
        # part is SF-proportional — no forced broadcast (r15); the
        # scan estimate keeps it broadcast at sf0.1, stats/AQE at scale
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("p_brand")).alias("barr"))
        .persist()
    )
    n_orders_row = baskets.agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
    per_brand = (
        baskets.select(F.explode("barr").alias("p_brand"))
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).cast("long").alias("brand_orders"))
    )
    pairs = (
        baskets.select(F.posexplode("barr").alias("i", "b1"), "barr")
        .select("b1", F.explode(F.expr("slice(barr, i + 2, size(barr))")).alias("b2"))
        .groupBy("b1", "b2")
        .agg(F.count(F.lit(1)).cast("long").alias("pair_orders"))
        .where(F.col("pair_orders") >= _BASKET_MIN_PAIR)
    )
    v1 = per_brand.select(F.col("p_brand").alias("b1"), F.col("brand_orders").alias("o1"))
    v2 = per_brand.select(F.col("p_brand").alias("b2"), F.col("brand_orders").alias("o2"))
    return (
        pairs.join(F.broadcast(v1), "b1")
        .join(F.broadcast(v2), "b2")
        .crossJoin(F.broadcast(n_orders_row))
        .select(
            "b1",
            "b2",
            "pair_orders",
            (
                F.col("pair_orders").cast("double")
                * F.col("n_orders").cast("double")
                / (F.col("o1").cast("double") * F.col("o2").cast("double"))
            ).alias("lift"),
        )
        .orderBy("b1", "b2")
    )



_BASKET_SQL = f"""
WITH ob AS (
  SELECT DISTINCT l_orderkey, p_brand
  FROM lineitem JOIN part ON l_partkey = p_partkey
),
n AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders FROM ob),
per_brand AS (
  SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS brand_orders FROM ob GROUP BY p_brand
),
pairs AS (
  SELECT a.p_brand AS b1, b.p_brand AS b2, CAST(COUNT(*) AS BIGINT) AS pair_orders
  FROM ob a JOIN ob b ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
  GROUP BY 1, 2 HAVING COUNT(*) >= {_BASKET_MIN_PAIR}
)
SELECT b1, b2, pair_orders,
       CAST(pair_orders AS DOUBLE) * CAST(n.n_orders AS DOUBLE)
         / (CAST(v1.brand_orders AS DOUBLE) * CAST(v2.brand_orders AS DOUBLE)) AS lift
FROM pairs
JOIN per_brand v1 ON v1.p_brand = b1
JOIN per_brand v2 ON v2.p_brand = b2
CROSS JOIN n
ORDER BY b1, b2
"""


def supplier_concentration_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supply-base concentration per part type: the Herfindahl index
    of supplier line-share, HHI = sum(c_s^2) / n^2 over integer
    per-supplier line counts — 1/n_suppliers (diversified) up to 1.0
    (single-sourced). Like the Gini diversity, the index is exact
    integers until one final division, so no float accumulation
    crosses an aggregation boundary.

    Scale: one (type, supplier) aggregation of the fact join, then a
    rollup bounded by |types| x |suppliers|.
    """
    li = load(spark, "lineitem", sf_dir).select("l_partkey", "l_suppkey")
    part = load(spark, "part", sf_dir).select("p_partkey", "p_type")
    ts = (
        # part is SF-proportional — no forced broadcast (r15)
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_type", "l_suppkey")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    per_type = ts.groupBy("p_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_suppliers"),
        F.sum("c").cast("long").alias("n_lines"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("sum_c2"),
    )
    nd = F.col("n_lines").cast("double")
    return per_type.select(
        "p_type",
        "n_suppliers",
        "n_lines",
        (F.col("sum_c2").cast("double") / (nd * nd)).alias("hhi"),
    ).orderBy("p_type")



_HHI_SQL = """
WITH ts AS (
  SELECT p_type, l_suppkey, CAST(COUNT(*) AS BIGINT) AS c
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY p_type, l_suppkey
),
per_type AS (
  SELECT p_type,
         CAST(COUNT(*) AS BIGINT) AS n_suppliers,
         CAST(SUM(c) AS BIGINT) AS n_lines,
         CAST(SUM(c * c) AS BIGINT) AS sum_c2
  FROM ts GROUP BY p_type
)
SELECT p_type, n_suppliers, n_lines,
       CAST(sum_c2 AS DOUBLE) / (CAST(n_lines AS DOUBLE) * CAST(n_lines AS DOUBLE)) AS hhi
FROM per_type ORDER BY p_type
"""


def price_size_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand OLS regression of part retail price on part size,
    in AGGREGATION FORM: slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2),
    intercept = (Sy - slope*Sx) / n — the one-pass distributed way to
    fit a line (no gradient loop, no driver-side math).

    Determinism: sizes are integers and prices are cast to
    DECIMAL(18,2) before summing, so every S* is exact and
    order-independent; slope/intercept are single divisions of
    identically-derived doubles. Scale: one keyed aggregation over
    part — regression over 100 TB is exactly this cheap when written
    as moments.
    """
    part = load(spark, "part", sf_dir)
    dec = "decimal(18,2)"
    base = part.select(
        "p_brand",
        F.col("p_size").cast("long").alias("x"),
        F.col("p_retailprice").cast(dec).alias("y"),
    )
    agg = base.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("x").cast(dec) * F.col("y")).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("string").cast("double")
    sxx = F.col("sxx").cast("double")
    sxy = F.col("sxy").cast("string").cast("double")
    # degenerate groups (single part, or every part the same size)
    # have zero x-variance: the line is undefined, so slope/intercept
    # are NULL — an integer-exact guard, and under ANSI mode (Spark 4
    # default) the unguarded division would ERROR, not NULL (caught by
    # the full-catalog randomized differential)
    nonconst = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx") > 0
    slope = F.when(nonconst, (nd * sxy - sx * sy) / (nd * sxx - sx * sx))
    return agg.select(
        "p_brand",
        "n",
        slope.alias("slope"),
        F.when(nonconst, (sy - slope * sx) / nd).alias("intercept"),
    ).orderBy("p_brand")



_REGRESSION_SQL = """
WITH base AS (
  SELECT p_brand, CAST(p_size AS BIGINT) AS x,
         CAST(p_retailprice AS DECIMAL(18,2)) AS y
  FROM part
),
agg AS (
  SELECT p_brand,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx,
         SUM(y) AS sy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         SUM(CAST(x AS DECIMAL(18,2)) * y) AS sxy
  FROM base GROUP BY p_brand
)
SELECT p_brand, n,
       CASE WHEN n * sxx - sx * sx > 0 THEN
         (CAST(n AS DOUBLE) * CAST(CAST(sxy AS VARCHAR) AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(CAST(sy AS VARCHAR) AS DOUBLE))
           / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
       END AS slope,
       CASE WHEN n * sxx - sx * sx > 0 THEN
         (CAST(CAST(sy AS VARCHAR) AS DOUBLE)
            - (CAST(n AS DOUBLE) * CAST(CAST(sxy AS VARCHAR) AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(CAST(sy AS VARCHAR) AS DOUBLE))
              / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
              * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE)
       END AS intercept
FROM agg ORDER BY p_brand
"""


def order_value_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration (Pareto/Lorenz) by order-value decile:
    orders NTILE(10)-bucketed by total price descending, each decile's
    exact DECIMAL revenue and its share of the total — the 80/20
    check behind value-tiering decisions.

    Determinism: the tiling order carries o_orderkey (total order),
    decimal sums are exact, and each share divides identically-derived
    doubles. Scale shape: NO unpartitioned data-sized window — the
    decile of each ORDER row (this is the fact table, the worst place
    for a single-task window) is the closed-form NTILE of the global
    row number from the two-phase range-partition scan
    (operators/ranking.py, the customer_spend_ranks pattern). One
    range shuffle, all data-sized steps parallel; the 1-row total is
    a broadcast scalar.
    """
    from goconnect_spark.operators.ranking import global_row_number, ntile_from_rn

    orders = load(spark, "orders", sf_dir)
    dec = "decimal(18,2)"
    priced = orders.select(
        F.col("o_totalprice").cast(dec).alias("price"), "o_orderkey"
    )
    numbered = global_row_number(priced, [F.desc("price"), F.asc("o_orderkey")])
    tiled = numbered.select(
        "price", ntile_from_rn(10).cast("int").alias("decile")
    )
    per_dec = tiled.groupBy("decile").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("price").alias("rev_dec"),
    )
    # r14 (guide §7.2): total was per_dec.agg(sum(rev_dec)), which
    # re-executed the ENTIRE ranking pipeline (range shuffle + both
    # windows) a second time — 0 ReusedExchange fired on it. The
    # grand total does not need the tiling at all: sum over deciles
    # of exact decimal sums == one exact decimal sum over priced
    # (decimal addition at fixed scale is associative), so compute it
    # from the pre-ranking projection directly. Before plan: 20
    # Exchanges / 4 Windows / 6 scans; after: half the tree gone.
    total = priced.agg(F.sum("price").alias("total_dec"))
    return (
        per_dec.crossJoin(F.broadcast(total))
        .select(
            "decile",
            "n_orders",
            F.col("rev_dec").cast("string").cast("double").alias("revenue"),
            (
                F.col("rev_dec").cast("string").cast("double")
                / F.col("total_dec").cast("string").cast("double")
            ).alias("rev_share"),
        )
        .orderBy("decile")
    )



_PARETO_SQL = """
WITH tiled AS (
  SELECT CAST(o_totalprice AS DECIMAL(18,2)) AS price,
         NTILE(10) OVER (ORDER BY CAST(o_totalprice AS DECIMAL(18,2)) DESC,
                         o_orderkey ASC) AS decile
  FROM orders
),
per_dec AS (
  SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_orders, SUM(price) AS rev_dec
  FROM tiled GROUP BY decile
),
total AS (SELECT SUM(rev_dec) AS total_dec FROM per_dec)
SELECT decile, n_orders,
       CAST(CAST(rev_dec AS VARCHAR) AS DOUBLE) AS revenue,
       CAST(CAST(rev_dec AS VARCHAR) AS DOUBLE)
         / CAST(CAST(total_dec AS VARCHAR) AS DOUBLE) AS rev_share
FROM per_dec CROSS JOIN total ORDER BY decile
"""


QUERIES = {
    "top_customers_per_segment": top_customers_per_segment,
    "orders_rollup": orders_rollup,
    "customers_order_presence": customers_order_presence,
    "customer_supplier_nations": customer_supplier_nations,
    "quantity_percentiles": quantity_percentiles,
    "lineitem_cube": lineitem_cube,
    "orders_unpivot": orders_unpivot,
    "orders_grouping_sets": orders_grouping_sets,
    "customer_spend_ranks": customer_spend_ranks,
    "daily_reconciliation": daily_reconciliation,
    "customer_rfm_segments": customer_rfm_segments,
    "order_fulfillment_latency": order_fulfillment_latency,
    "brand_basket_lift": brand_basket_lift,
    "supplier_concentration_hhi": supplier_concentration_hhi,
    "price_size_regression": price_size_regression,
    "order_value_pareto": order_value_pareto,
}

ORACLE = {
    "top_customers_per_segment": _TOPCUST_SQL,
    "orders_rollup": _ROLLUP_SQL,
    "customers_order_presence": _ORDER_PRESENCE_SQL,
    "customer_supplier_nations": _SETOPS_SQL,
    "quantity_percentiles": _PERCENTILES_SQL,
    "lineitem_cube": _CUBE_SQL,
    "orders_unpivot": _UNPIVOT_SQL,
    "orders_grouping_sets": _GROUPING_SETS_SQL,
    "customer_spend_ranks": _RANKS_SQL,
    "daily_reconciliation": _RECON_SQL,
    "customer_rfm_segments": _RFM_SQL,
    "order_fulfillment_latency": _FULFILL_SQL,
    "brand_basket_lift": _BASKET_SQL,
    "supplier_concentration_hhi": _HHI_SQL,
    "price_size_regression": _REGRESSION_SQL,
    "order_value_pareto": _PARETO_SQL,
}


# --------------------------------------------------------------------
# Skew-mitigated enrichment join under oracle. events is the large
# fact side; at 100 TB a handful of hot users (bots, load tests) can
# put one shuffle partition hours behind the rest — AQE's skew split
# handles moderate cases, but the pathological single-key hotspot is
# what operators/joins.salted_join exists for: the fact side gets a
# deterministic hash(event_id) % 8 salt, the customer dim is exploded
# 8x (still broadcast-sized), and the join key becomes (user_id,
# salt), spreading every hot key over 8 reducers. The DuckDB oracle
# runs the PLAIN join — the salted plan must be value-identical.
# Money sums ride DECIMAL so they are order-independent.
# --------------------------------------------------------------------
def salted_segment_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from goconnect_spark.operators.joins import salted_join

    ev = load(spark, "events", sf_dir).select(
        "event_id", "user_id", "event_type", _dec("value").alias("v")
    )
    cust = load(spark, "customer", sf_dir).select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    joined = salted_join(ev, cust, ["user_id"], n_salts=8, salt_source="event_id")
    return (
        joined.groupBy("c_mktsegment", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum("v").cast("double").alias("sum_value"),
        )
        .orderBy("c_mktsegment", "event_type")
    )


_SALTED_SQL = """
SELECT c.c_mktsegment, e.event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users,
       CAST(CAST(SUM(CAST(e.value AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE)
         AS sum_value
FROM events e
JOIN customer c ON c.c_custkey = e.user_id
GROUP BY 1, 2
ORDER BY c.c_mktsegment, e.event_type
"""


QUERIES["salted_segment_activity"] = salted_segment_activity
ORACLE["salted_segment_activity"] = _SALTED_SQL


# --------------------------------------------------------------------
# Entity-resolution candidate density via the SymSpell fuzzy join:
# customers whose names sit within edit distance 1 of another name —
# the blocked fuzzy self-match every record-linkage pipeline starts
# from. Candidates come from the deletion-neighborhood EQUI-join
# (operators/joins.fuzzy_self_join_lev1: |s|+1 in-row variants, no
# O(n^2) distance matrix), verified with exact levenshtein() — the
# same generate-cheap/verify-exact structure as the dedup families,
# here on the string-identity axis. Output is the per-customer match
# count (candidate density), the number an ER pipeline thresholds on.
# --------------------------------------------------------------------
def customer_name_fuzzy_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from goconnect_spark.operators.joins import fuzzy_self_join_lev1

    cust = load(spark, "customer", sf_dir).select("c_custkey", "c_name")
    pairs = fuzzy_self_join_lev1(cust, "c_custkey", "c_name").select("id_a", "id_b")
    both = pairs.select(F.col("id_a").alias("c_custkey")).unionAll(
        pairs.select(F.col("id_b").alias("c_custkey"))
    )
    return (
        both.groupBy("c_custkey")
        .agg(F.count(F.lit(1)).cast("long").alias("n_matches"))
        .orderBy("c_custkey")
    )


_FUZZY_SQL = """
WITH names AS (SELECT c_custkey, c_name FROM customer),
vars AS (
  SELECT c_custkey, c_name,
         CASE WHEN i = 0 THEN c_name
              ELSE substr(c_name, 1, i - 1) || substr(c_name, i + 1) END AS k
  FROM names, UNNEST(range(0, len(c_name) + 1)) AS u(i)
),
pairs AS (
  SELECT DISTINCT a.c_custkey AS id_a, b.c_custkey AS id_b,
                  a.c_name AS na, b.c_name AS nb
  FROM vars a JOIN vars b ON a.k = b.k AND a.c_custkey < b.c_custkey
),
match AS (SELECT id_a, id_b FROM pairs WHERE levenshtein(na, nb) <= 1),
ends AS (
  SELECT id_a AS c_custkey FROM match
  UNION ALL
  SELECT id_b AS c_custkey FROM match
)
SELECT c_custkey, CAST(COUNT(*) AS BIGINT) AS n_matches
FROM ends GROUP BY c_custkey ORDER BY c_custkey
"""


QUERIES["customer_name_fuzzy_pairs"] = customer_name_fuzzy_pairs
ORACLE["customer_name_fuzzy_pairs"] = _FUZZY_SQL
