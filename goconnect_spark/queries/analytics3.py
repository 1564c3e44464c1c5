"""Third analytics batch: moment statistics, range join, as-of join.

Determinism approach for statistics: never use built-in stddev/corr
(their float accumulation is partial-order-dependent); compute exact
decimal moment sums (Σx, Σx², Σxy — order-independent) and evaluate
the closed-form formulas in double on identical operands.

Scale notes:
- range join: binned to the window size so it's an equi-join on
  (user, bin) — never a nested-loop time-range join;
- as-of join: union the two sides and take a running last_value over
  the event-time order — O(n log n) via one shuffle+sort per user,
  never a per-row subquery.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from goconnect_spark.tables import load

_D = "decimal(18,4)"


# --------------------------------------------------------------------
# Moment statistics per event_type: mean, variance, stddev, and the
# correlation between value and the JSON k field — all from exact
# decimal sums.
# --------------------------------------------------------------------
def events_value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, "events", sf_dir)
    x = F.col("value").cast(_D)
    k = F.get_json_object("props", "$.k").cast("long")
    base = ev.select("event_type", x.alias("x"), k.alias("k")).where(F.col("k").isNotNull())
    sums = base.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum("k").alias("sk"),
        F.sum(F.col("k") * F.col("k")).alias("skk"),
        F.sum(F.col("x") * F.col("k")).cast("double").alias("sxk"),
    )
    n = F.col("n").cast("double")
    mean = F.col("sx") / n
    var = (F.col("sxx") - F.col("sx") * F.col("sx") / n) / (n - 1)
    sk = F.col("sk").cast("double")
    skk = F.col("skk").cast("double")
    cov = (F.col("sxk") - F.col("sx") * sk / n) / (n - 1)
    vark = (skk - sk * sk / n) / (n - 1)
    # degenerate guards (ANSI mode errors on the raw divisions):
    # n=1 has no sample variance; constant x or k has no correlation.
    # The predicates must themselves avoid the (n-1) division (WHEN
    # conditions are evaluated even when false), so they test the
    # variance NUMERATORS — same sign, divisor-free, and single
    # double comparisons over identical operands in both engines.
    var_num = F.col("sxx") - F.col("sx") * F.col("sx") / n
    vark_num = skk - sk * sk / n
    multi = F.col("n") > 1
    has_corr = multi & (var_num * vark_num > 0)
    return sums.select(
        "event_type",
        "n",
        mean.alias("mean_value"),
        F.when(multi, var).alias("var_value"),
        F.when(multi, F.sqrt(var)).alias("stddev_value"),
        F.when(has_corr, cov / F.sqrt(var * vark)).alias("corr_value_k"),
    ).orderBy("event_type")


_STATS_SQL = """
WITH base AS (
  SELECT event_type, CAST(value AS DECIMAL(18,4)) AS x,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
  FROM events
  WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) IS NOT NULL
), sums AS (
  SELECT event_type, COUNT(*) AS n,
         CAST(CAST(SUM(x) AS VARCHAR) AS DOUBLE) AS sx,
         CAST(CAST(SUM(x * x) AS VARCHAR) AS DOUBLE) AS sxx,
         CAST(SUM(k) AS BIGINT) AS sk,
         CAST(SUM(k * k) AS BIGINT) AS skk,
         CAST(CAST(SUM(x * k) AS VARCHAR) AS DOUBLE) AS sxk
  FROM base GROUP BY event_type
)
SELECT event_type, n,
       sx / CAST(n AS DOUBLE) AS mean_value,
       CASE WHEN n > 1 THEN
         (sxx - sx * sx / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1)
       END AS var_value,
       CASE WHEN n > 1 THEN
         SQRT((sxx - sx * sx / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1))
       END AS stddev_value,
       CASE WHEN n > 1 AND
            (sxx - sx * sx / CAST(n AS DOUBLE))
              * (CAST(skk AS DOUBLE) - CAST(sk AS DOUBLE) * CAST(sk AS DOUBLE) / CAST(n AS DOUBLE)) > 0
       THEN
         ((sxk - sx * CAST(sk AS DOUBLE) / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1))
           / SQRT(((sxx - sx * sx / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1))
                  * ((CAST(skk AS DOUBLE) - CAST(sk AS DOUBLE) * CAST(sk AS DOUBLE) / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1)))
       END AS corr_value_k
FROM sums ORDER BY event_type
"""


# --------------------------------------------------------------------
# Range join, binned: for each error event, how many events did the
# same user produce in the preceding 5 minutes? The bin trick turns a
# time-range join into an equi-join on (user_id, bin ∈ {b-1, b}) +
# residual filter — the only formulation that scales (a raw
# ts-BETWEEN join is a nested loop).
# --------------------------------------------------------------------
_WINDOW_US = 300 * 1_000_000


def events_error_context(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, "events", sf_dir).select(
        "event_id", "user_id", "event_type", F.unix_micros("ts").alias("t")
    )
    errors = ev.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"), F.col("user_id").alias("u"), F.col("t").alias("et")
    )
    probes = errors.select(
        "err_id", "u", "et", F.explode(F.array(F.lit(0), F.lit(1))).alias("off")
    ).select("err_id", "u", "et", (F.floor(F.col("et") / _WINDOW_US) - F.col("off")).alias("bin"))
    binned = ev.select("event_id", "user_id", "t", F.floor(F.col("t") / _WINDOW_US).alias("bin"))
    joined = probes.join(
        binned,
        (F.col("u") == F.col("user_id")) & (probes.bin == binned.bin),
    ).where((F.col("t") < F.col("et")) & (F.col("t") >= F.col("et") - _WINDOW_US))
    return (
        joined.groupBy("err_id")
        .agg(F.count(F.lit(1)).alias("n_prior"))
        .orderBy("err_id")
    )


_RANGE_SQL = f"""
WITH ev AS (
  SELECT event_id, user_id, event_type, epoch_us(ts) AS t FROM events
), errors AS (
  SELECT event_id AS err_id, user_id AS u, t AS et FROM ev WHERE event_type = 'error'
)
SELECT e.err_id, COUNT(*) AS n_prior
FROM errors e JOIN ev x
  ON x.user_id = e.u AND x.t < e.et AND x.t >= e.et - {_WINDOW_US}
GROUP BY e.err_id
ORDER BY err_id
"""


# --------------------------------------------------------------------
# As-of join: for each purchase, the user's most recent signup at or
# before it. Union-tag + running last_value over event time — one
# sort per user partition, no per-row lookup.
# --------------------------------------------------------------------
def purchases_asof_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, "events", sf_dir)
    tagged = ev.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.when(F.col("event_type") == "signup", F.col("event_id")).alias("signup_id"),
        F.when(F.col("event_type") == "signup", F.col("ts")).alias("signup_ts"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    enriched = tagged.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.last("signup_id", ignorenulls=True).over(w).alias("asof_signup_id"),
        F.last("signup_ts", ignorenulls=True).over(w).alias("asof_signup_ts"),
    )
    return (
        enriched.where(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            "asof_signup_id",
            (F.unix_micros("ts") - F.unix_micros("asof_signup_ts")).alias("us_since_signup"),
        )
        .orderBy("event_id")
    )


_ASOF_SQL = """
WITH enriched AS (
  SELECT event_id, user_id, ts, event_type,
         LAST_VALUE(CASE WHEN event_type = 'signup' THEN event_id END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_signup_id,
         LAST_VALUE(CASE WHEN event_type = 'signup' THEN ts END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_signup_ts
  FROM events
)
SELECT event_id, user_id, asof_signup_id,
       epoch_us(ts) - epoch_us(asof_signup_ts) AS us_since_signup
FROM enriched WHERE event_type = 'purchase'
ORDER BY event_id
"""


QUERIES = {
    "events_value_stats": events_value_stats,
    "events_error_context": events_error_context,
    "purchases_asof_signup": purchases_asof_signup,
}

ORACLE = {
    "events_value_stats": _STATS_SQL,
    "events_error_context": _RANGE_SQL,
    "purchases_asof_signup": _ASOF_SQL,
}


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


QUERIES.update(
    {
        "quantity_percentiles": quantity_percentiles,
        "lineitem_cube": lineitem_cube,
        "orders_unpivot": orders_unpivot,
    }
)

ORACLE.update(
    {
        "quantity_percentiles": _PERCENTILES_SQL,
        "lineitem_cube": _CUBE_SQL,
        "orders_unpivot": _UNPIVOT_SQL,
    }
)


# --------------------------------------------------------------------
# Time-series gap fill (hypertable-rollup shape): a dense hour spine
# per event_type with zero-filled gaps. The spine is generated with
# sequence()/generate_series — never materialized on the driver — and
# the fill is a broadcast-right left join.
# --------------------------------------------------------------------
def events_hourly_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, "events", sf_dir)
    hourly = ev.groupBy(
        F.date_trunc("hour", "ts").alias("h"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(F.expr("sequence(lo, hi, interval 1 hour)")).alias("h")
    ).crossJoin(ev.select("event_type").distinct())
    return (
        spine.join(hourly, ["h", "event_type"], "left")
        .select(
            F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
            F.coalesce("n", F.lit(0)).alias("n"),
        )
        .orderBy("hour", "event_type")
    )


_GAPFILL_SQL = """
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS h, event_type, COUNT(*) AS n
  FROM events GROUP BY 1, 2
), bounds AS (
  SELECT date_trunc('hour', MIN(ts)) AS lo, date_trunc('hour', MAX(ts)) AS hi FROM events
), spine AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h FROM bounds
), full_spine AS (
  SELECT s.h, t.event_type FROM spine s CROSS JOIN (SELECT DISTINCT event_type FROM events) t
)
SELECT strftime(f.h, '%Y-%m-%d %H:%M:%S') AS hour, f.event_type,
       COALESCE(hh.n, 0) AS n
FROM full_spine f LEFT JOIN hourly hh ON hh.h = f.h AND hh.event_type = f.event_type
ORDER BY hour, f.event_type
"""


QUERIES["events_hourly_gapfill"] = events_hourly_gapfill
ORACLE["events_hourly_gapfill"] = _GAPFILL_SQL
