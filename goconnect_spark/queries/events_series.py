"""Event-stream & time-series analytics over the `events` table:
tumbling windows, sessionization, gap fill, SCD2, funnels, retention,
anomaly scoring, lifecycle segmentation, autocorrelation.

Consolidated from queries/analytics{,2,3,4,5,6,7,8}.py in round 6
(module re-org only — code moved verbatim, no query renamed). The
streaming twins of these computations live in streaming_queries.py.
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



# --------------------------------------------------------------------
# Pivot: daily event counts, one column per event type. Spark pivot
# with explicit values (explicit -> single pass, no values-discovery
# job; mandatory at scale).
# --------------------------------------------------------------------
_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


_D = "decimal(18,4)"



_WINDOW_US = 300 * 1_000_000  # 5 minutes in microseconds



_7D_US = 7 * 86_400 * 1_000_000



_ANOM_HOUR_US = 3_600_000_000

_ANOM_LOOKBACK = 24  # trailing full-day window, in hours

_ANOM_Z = 3.0


_WAU_WINDOW_DAYS = 7


_WEEK_US = 7 * 86_400 * 1_000_000



def _ev(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, "events", sf_dir).select(
        "user_id", "event_type", F.unix_micros("ts").alias("tus")
    )



_STEP_US = 86_400_000_000  # each funnel step must follow within 24h



_GKMV_K = 64


_LIFECYCLE_CHURN_DAYS = 7


_LAGS = (1, 24)



def _lag_sql(k: int) -> str:
    return f"""
  SELECT CAST({k} AS INT) AS lag_hours,
         CAST(COUNT(*) AS BIGINT) AS n_pairs,
         CAST(COUNT(*) * SUM(x * y) - SUM(x) * SUM(y) AS BIGINT) AS cov_num,
         CASE WHEN COUNT(*) * SUM(x * x) - SUM(x) * SUM(x) > 0
               AND COUNT(*) * SUM(y * y) - SUM(y) * SUM(y) > 0
              THEN CAST(COUNT(*) * SUM(x * y) - SUM(x) * SUM(y) AS DOUBLE)
                   / (SQRT(CAST(COUNT(*) * SUM(x * x) - SUM(x) * SUM(x) AS DOUBLE))
                      * SQRT(CAST(COUNT(*) * SUM(y * y) - SUM(y) * SUM(y) AS DOUBLE)))
              ELSE NULL END AS autocorr
  FROM (
    SELECT a.c AS x, b.c AS y
    FROM hourly a JOIN hourly b ON b.hidx = a.hidx + {k}
  )
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
# JSON decode + aggregate: props is a JSON string column; extract k,
# bucket it, aggregate. get_json_object stays JVM-side (Jackson).
# --------------------------------------------------------------------
def events_json_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, "events", sf_dir)
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.select("event_type", k.alias("k"))
        .where(F.col("k").isNotNull())
        .groupBy("event_type", (F.col("k") / 10).cast("int").alias("k_bucket"))
        .agg(F.count(F.lit(1)).alias("n"), F.max("k").alias("max_k"))
        .orderBy("event_type", "k_bucket")
    )



_JSON_SQL = """
SELECT event_type,
       CAST(FLOOR(CAST(json_extract_string(props, '$.k') AS BIGINT) / 10) AS INT) AS k_bucket,
       COUNT(*) AS n,
       MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
FROM events
WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) IS NOT NULL
GROUP BY 1, 2 ORDER BY event_type, k_bucket
"""



def events_daily_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, "events", sf_dir)
    return (
        ev.withColumn("day", F.date_format("ts", "yyyy-MM-dd"))
        .groupBy("day")
        .pivot("event_type", list(_EVENT_TYPES))
        .agg(F.count(F.lit(1)))
        .na.fill(0, list(_EVENT_TYPES))
        .orderBy("day")
    )



_PIVOT_SQL = f"""
SELECT strftime(ts, '%Y-%m-%d') AS day,
       {", ".join(f"COALESCE(COUNT(*) FILTER (WHERE event_type = '{t}'), 0) AS {t}" for t in _EVENT_TYPES)}
FROM events
GROUP BY 1 ORDER BY day
"""



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



# events_distinct_kmv (the standalone KMV distinct-count that lived
# here r1-r12) was folded into sketches.py::events_distinct_hll in
# round 13 — same stream, same 60-bit md5 hash derivation, same
# single-row grain; both sketch certificates survive as columns there.


def value_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles from a fixed-width histogram sketch
    (bin width 1.0 over events.value), with the exact percentiles
    alongside for error inspection.

    The histogram is the mergeable single-pass structure you'd use at
    100 TB: the raw stream collapses to <= ~500 (bin, count) cells via
    map-side partial aggregation — one near-free shuffle, constant
    state per partition — and the estimate is read off the cumulative
    counts. The cumulative window runs over the CONSTANT-SIZE cell
    table (bins of a bounded value domain), not the data, so the
    single-partition window is scale-independent. The p-quantile
    estimate is the lower edge of the first bin whose cumulative count
    reaches ceil(p * total) — pure integer logic after one IEEE
    multiply, identical in both engines.
    """
    ev = load(spark, "events", sf_dir)
    bins = ev.groupBy(
        F.floor(F.col("value")).cast("bigint").alias("bin")
    ).agg(F.count("*").alias("cnt"))
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = bins.withColumn("cum_cnt", F.sum("cnt").over(w))
    total = ev.agg(F.count("*").alias("total"))
    cumt = cum.crossJoin(F.broadcast(total))

    def est(p: float) -> F.Column:
        thr = F.ceil(F.lit(p) * F.col("total"))
        return F.min(F.when(F.col("cum_cnt") >= thr, F.col("bin"))).cast("double")

    ests = cumt.agg(
        F.max("total").alias("total"),
        est(0.5).alias("p50_est"),
        est(0.9).alias("p90_est"),
        est(0.99).alias("p99_est"),
    )
    exact = ev.agg(
        F.expr("percentile(value, 0.5D)").alias("p50_exact"),
        F.expr("percentile(value, 0.9D)").alias("p90_exact"),
        F.expr("percentile(value, 0.99D)").alias("p99_exact"),
    )
    return ests.crossJoin(F.broadcast(exact))



_HISTQ_SQL = """
WITH bins AS (
  SELECT CAST(FLOOR(value) AS BIGINT) AS bin, COUNT(*) AS cnt
  FROM events GROUP BY 1
),
cum AS (SELECT bin, SUM(cnt) OVER (ORDER BY bin) AS cum_cnt FROM bins),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM events)
SELECT total,
  CAST((SELECT MIN(bin) FROM cum WHERE cum_cnt >= CEIL(0.5 * total)) AS DOUBLE) AS p50_est,
  CAST((SELECT MIN(bin) FROM cum WHERE cum_cnt >= CEIL(0.9 * total)) AS DOUBLE) AS p90_est,
  CAST((SELECT MIN(bin) FROM cum WHERE cum_cnt >= CEIL(0.99 * total)) AS DOUBLE) AS p99_est,
  (SELECT quantile_cont(value, 0.5) FROM events) AS p50_exact,
  (SELECT quantile_cont(value, 0.9) FROM events) AS p90_exact,
  (SELECT quantile_cont(value, 0.99) FROM events) AS p99_exact
FROM tot
"""



def events_in_error_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context lookup with NO equi key: for every error event, count
    the events (any user) inside the 5-minute window starting at the
    error — a pure range predicate.

    Written naively (`e.ts BETWEEN w.ts AND w.ts + 5min`) Spark plans
    a BroadcastNestedLoopJoin: all-pairs, dead at 100 TB. The
    interval_join operator rewrites it as a bin equi-join (bin width =
    window length, so each window covers at most 2 bins) — shuffle-
    partitioned by bin, candidates bounded by events-per-5-minutes,
    exact BETWEEN kept as residual. test_plans asserts the NLJ is gone.
    """
    from goconnect_spark.operators.joins import interval_join

    ev = load(spark, "events", sf_dir)
    points = ev.select(
        F.unix_micros("ts").alias("pt"), F.col("user_id"), F.col("event_id")
    )
    windows = (
        ev.where("event_type = 'error'")
        .select(
            F.col("event_id").alias("window_id"),
            F.unix_micros("ts").alias("ws"),
            (F.unix_micros("ts") + F.lit(_WINDOW_US)).alias("we"),
        )
    )
    joined = interval_join(points, windows, "pt", "ws", "we", bin_width=_WINDOW_US)
    return joined.groupBy("window_id").agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )



_ERRWIN_SQL = f"""
WITH pts AS (
  SELECT epoch_us(ts) AS pt, user_id, event_id FROM events
),
win AS (
  SELECT event_id AS window_id, epoch_us(ts) AS ws,
         epoch_us(ts) + {_WINDOW_US} AS we
  FROM events WHERE event_type = 'error'
)
SELECT window_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM win JOIN pts ON pt BETWEEN ws AND we
GROUP BY window_id
"""



def user_rolling_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per purchase event: the user's rolling 7-day purchase count and
    spend — a RANGE-frame window (time-based, not row-based), the
    moving-aggregate shape behind velocity features and rate limits.

    The frame is [t - 7d, t] inclusive over integer microseconds
    (identical range semantics in both engines); spend sums exact
    DECIMAL(12,2), cast to double last. Scale: one shuffle on user_id;
    each user's frame state is bounded by their own 7-day event
    volume, so the window never concentrates global data.
    """
    ev = load(spark, "events", sf_dir).where("event_type = 'purchase'")
    pur = ev.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("tus"),
        F.col("value").cast(_PRICE).alias("v"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("tus")
        .rangeBetween(-_7D_US, Window.currentRow)
    )
    return pur.select(
        "event_id",
        "user_id",
        "tus",
        F.count(F.lit(1)).over(w).alias("n_7d"),
        F.sum("v").over(w).cast("double").alias("spend_7d"),
    )



_ROLLING_SQL = f"""
WITH pur AS (
  SELECT event_id, user_id, epoch_us(ts) AS tus,
         CAST(value AS DECIMAL(12,2)) AS v
  FROM events WHERE event_type = 'purchase'
)
SELECT event_id, user_id, tus,
       CAST(COUNT(*) OVER w AS BIGINT) AS n_7d,
       CAST(CAST(SUM(v) OVER w AS VARCHAR) AS DOUBLE) AS spend_7d
FROM pur
WINDOW w AS (PARTITION BY user_id ORDER BY tus
             RANGE BETWEEN {_7D_US} PRECEDING AND CURRENT ROW)
"""



def events_hourly_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly event-count anomaly flags per event type: each hour is
    z-scored against the trailing 24 fully-observed hours — the
    monitoring query a 100 TB ingest runs on itself.

    Determinism: the windowed mean/variance come from EXACT integer
    sums (counts and squared counts over a row-bounded frame), using
    var = (k*s2 - s1^2) / k^2 so only the final z division touches
    doubles — both engines divide identical integers, so the flag is
    reproducible. Hours are integer epoch-hour indexes, sidestepping
    timestamp rendering differences.

    Scale: one keyed aggregation (hour x type cardinality), then
    windows partitioned by event_type over the tiny hourly series —
    the window never sees raw events.
    """
    ev = load(spark, "events", sf_dir)
    hourly = (
        ev.select(
            "event_type",
            (F.unix_micros("ts") / F.lit(_ANOM_HOUR_US)).cast("bigint").alias("h"),
        )
        .groupBy("event_type", "h")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(-_ANOM_LOOKBACK, -1)
    )
    stats = hourly.select(
        "event_type",
        "h",
        "c",
        F.sum("c").over(w).cast("long").alias("s1"),
        F.sum(F.col("c") * F.col("c")).over(w).cast("long").alias("s2"),
        F.count(F.lit(1)).over(w).cast("long").alias("k"),
    ).where(F.col("k") == _ANOM_LOOKBACK)
    kd = F.col("k").cast("double")
    mean = F.col("s1").cast("double") / kd
    var = (
        F.col("k").cast("double") * F.col("s2").cast("double")
        - F.col("s1").cast("double") * F.col("s1").cast("double")
    ) / (kd * kd)
    z = (F.col("c").cast("double") - mean) / F.sqrt(var)
    return (
        stats.where(var > 0)
        .select(
            "event_type",
            "h",
            "c",
            mean.alias("trailing_mean"),
            z.alias("z"),
            (F.abs(z) > _ANOM_Z).alias("is_anomaly"),
        )
        .orderBy("event_type", "h")
    )



_ANOM_SQL = f"""
WITH hourly AS (
  SELECT event_type,
         CAST(FLOOR(epoch_us(ts) / {_ANOM_HOUR_US}) AS BIGINT) AS h,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
stats AS (
  SELECT event_type, h, c,
         CAST(SUM(c) OVER w AS BIGINT) AS s1,
         CAST(SUM(c * c) OVER w AS BIGINT) AS s2,
         CAST(COUNT(*) OVER w AS BIGINT) AS k
  FROM hourly
  WINDOW w AS (PARTITION BY event_type ORDER BY h
               ROWS BETWEEN {_ANOM_LOOKBACK} PRECEDING AND 1 PRECEDING)
)
SELECT event_type, h, c,
       CAST(s1 AS DOUBLE) / CAST(k AS DOUBLE) AS trailing_mean,
       (CAST(c AS DOUBLE) - CAST(s1 AS DOUBLE) / CAST(k AS DOUBLE))
         / SQRT((CAST(k AS DOUBLE) * CAST(s2 AS DOUBLE)
                 - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                / (CAST(k AS DOUBLE) * CAST(k AS DOUBLE))) AS z,
       ABS((CAST(c AS DOUBLE) - CAST(s1 AS DOUBLE) / CAST(k AS DOUBLE))
         / SQRT((CAST(k AS DOUBLE) * CAST(s2 AS DOUBLE)
                 - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                / (CAST(k AS DOUBLE) * CAST(k AS DOUBLE)))) > {_ANOM_Z} AS is_anomaly
FROM stats
WHERE k = {_ANOM_LOOKBACK}
  AND (CAST(k AS DOUBLE) * CAST(s2 AS DOUBLE)
       - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
      / (CAST(k AS DOUBLE) * CAST(k AS DOUBLE)) > 0
ORDER BY event_type, h
"""


def event_interarrival_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event type the p50/p90 inter-arrival gap in microseconds —
    the traffic-cadence fingerprint (burstiness shows as p90 >> p50).

    Gaps come from one keyed lag over (ts, event_id) — a total order,
    so every gap is well-defined — and the percentiles are the
    nearest-rank picks over integer microsecond differences (no
    interpolation, no floats). Scale: one shuffle on event_type; the
    rank windows run over the per-type gap series.
    """
    from pyspark.sql import Window

    ev = load(spark, "events", sf_dir)
    base = ev.select(
        "event_type", F.unix_micros("ts").alias("t"), "event_id"
    )
    wl = Window.partitionBy("event_type").orderBy("t", "event_id")
    gaps = (
        base.select(
            "event_type",
            "event_id",
            (F.col("t") - F.lag("t").over(wl)).alias("gap_us"),
        )
        .where(F.col("gap_us").isNotNull())
    )
    wr = Window.partitionBy("event_type").orderBy("gap_us", "event_id")
    ranked = gaps.select(
        "event_type",
        "gap_us",
        F.row_number().over(wr).alias("rk"),
        F.count(F.lit(1)).over(Window.partitionBy("event_type")).alias("n"),
    )
    picks = None
    for q in (50, 90):
        hit = ranked.where(
            F.col("rk") == F.ceil(F.lit(q) / F.lit(100.0) * F.col("n")).cast("int")
        ).select(
            "event_type",
            F.lit(q).cast("int").alias("q"),
            F.col("gap_us").alias("gap"),
            F.col("n").cast("long").alias("n_gaps"),
        )
        picks = hit if picks is None else picks.unionAll(hit)
    return picks.orderBy("event_type", "q")



_INTERARRIVAL_SQL = """
WITH base AS (
  SELECT event_type, epoch_us(ts) AS t, event_id FROM events
),
gaps AS (
  SELECT event_type, event_id,
         t - LAG(t) OVER (PARTITION BY event_type ORDER BY t, event_id) AS gap_us
  FROM base
),
ranked AS (
  SELECT event_type, gap_us,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY gap_us, event_id) AS rk,
         CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
  FROM gaps WHERE gap_us IS NOT NULL
),
qs AS (SELECT unnest([50, 90]) AS q)
SELECT r.event_type, CAST(qs.q AS INT) AS q, r.gap_us AS gap, r.n AS n_gaps
FROM ranked r JOIN qs ON r.rk = CAST(CEIL(qs.q / 100.0 * r.n) AS INT)
ORDER BY r.event_type, q
"""


def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event-type
    sequences: for each (from_type, to_type) the transition count and
    row-normalized probability — the sequence model behind
    next-action prediction and anomalous-flow detection.

    Transitions come from one keyed lag over (ts, event_id) per user
    (a total order); counts are integers and each probability divides
    a cell count by its exact row total, so the matrix is
    bit-reproducible. Scale: one shuffle on user_id for the lag, one
    keyed count bounded by |types|^2 cells.
    """
    from pyspark.sql import Window

    ev = load(spark, "events", sf_dir)
    wl = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        ev.select(
            "user_id",
            F.lag("event_type").over(wl).alias("from_type"),
            F.col("event_type").alias("to_type"),
        )
        .where(F.col("from_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    wrow = Window.partitionBy("from_type")
    return (
        trans.select(
            "from_type",
            "to_type",
            "n",
            F.sum("n").over(wrow).cast("long").alias("row_total"),
        )
        .select(
            "from_type",
            "to_type",
            "n",
            (F.col("n").cast("double") / F.col("row_total").cast("double")).alias("p"),
        )
        .orderBy("from_type", "to_type")
    )



_TRANSITION_SQL = """
WITH trans AS (
  SELECT from_type, event_type AS to_type FROM (
    SELECT user_id,
           LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS from_type,
           event_type
    FROM events
  ) WHERE from_type IS NOT NULL
),
cells AS (
  SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
  FROM trans GROUP BY from_type, to_type
)
SELECT from_type, to_type, n,
       CAST(n AS DOUBLE)
         / CAST(SUM(n) OVER (PARTITION BY from_type) AS DOUBLE) AS p
FROM cells ORDER BY from_type, to_type
"""



def weekly_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day distinct active users per day — the WAU series.
    Rolling DISTINCT has no partial-aggregate form, so the classic
    scalable rewrite: events reduce to distinct (user, day) cells
    (one shuffle, the only corpus-sized step), then each cell expands
    to the <= 7 report days it supports and a keyed distinct count
    per day finishes the job. Work is cells x 7, never events x 7,
    and no per-day state holds the full user set.
    """
    ev = load(spark, "events", sf_dir)
    day = (F.unix_micros("ts") / F.lit(86_400_000_000)).cast("bigint")
    cells = ev.select("user_id", day.alias("d")).distinct()
    span = cells.agg(
        F.min("d").alias("d0"), F.max("d").alias("d1")
    )
    expanded = cells.select(
        "user_id",
        F.explode(
            F.sequence(F.col("d"), F.col("d") + F.lit(_WAU_WINDOW_DAYS - 1))
        ).alias("report_day"),
    )
    wau = expanded.groupBy("report_day").agg(
        F.countDistinct("user_id").cast("long").alias("wau")
    )
    # clip to days with a full observable window and within the corpus
    return (
        wau.crossJoin(F.broadcast(span))
        .where(
            (F.col("report_day") >= F.col("d0") + F.lit(_WAU_WINDOW_DAYS - 1))
            & (F.col("report_day") <= F.col("d1"))
        )
        .select("report_day", "wau")
        .orderBy("report_day")
    )



_WAU_SQL = f"""
WITH cells AS (
  SELECT DISTINCT user_id,
         CAST(FLOOR(epoch_us(ts) / 86400000000) AS BIGINT) AS d
  FROM events
),
span AS (SELECT MIN(d) AS d0, MAX(d) AS d1 FROM cells),
expanded AS (
  SELECT user_id, d + i AS report_day
  FROM cells, unnest(generate_series(0, {_WAU_WINDOW_DAYS - 1})) AS t(i)
),
wau AS (
  SELECT report_day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau
  FROM expanded GROUP BY report_day
)
SELECT report_day, wau
FROM wau CROSS JOIN span
WHERE report_day >= d0 + {_WAU_WINDOW_DAYS - 1} AND report_day <= d1
ORDER BY report_day
"""



def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly-ordered conversion funnel with a 24-hour step window:
    users with a view, then a click in (t_view, t_view + 24h], then a
    purchase in (t_click, t_click + 24h].

    Shape: three keyed min-aggregations chained by equi-joins on
    user_id — every stage shuffles on the SAME key, so AQE/Catalyst
    reuse one partitioning end to end; each stage's input shrinks to
    the surviving users. No windows over raw events, no row-order
    dependence (strict tus comparisons only).
    """
    ev = _ev(spark, sf_dir)
    t1 = (
        ev.where("event_type = 'view'")
        .groupBy("user_id")
        .agg(F.min("tus").alias("t1"))
    )
    t2 = (
        ev.where("event_type = 'click'")
        .join(t1, "user_id")
        .where((F.col("tus") > F.col("t1")) & (F.col("tus") <= F.col("t1") + _STEP_US))
        .groupBy("user_id")
        .agg(F.min("tus").alias("t2"))
    )
    t3 = (
        ev.where("event_type = 'purchase'")
        .join(t2, "user_id")
        .where((F.col("tus") > F.col("t2")) & (F.col("tus") <= F.col("t2") + _STEP_US))
        .groupBy("user_id")
        .agg(F.min("tus").alias("t3"))
    )

    def stage(df: DataFrame, no: int, name: str) -> DataFrame:
        return df.agg(
            F.lit(no).alias("stage_no"),
            F.lit(name).alias("stage"),
            F.count("*").alias("n_users"),
        )

    return (
        stage(t1, 1, "view")
        .unionAll(stage(t2, 2, "view>click"))
        .unionAll(stage(t3, 3, "view>click>purchase"))
    )



_FUNNEL_SQL = f"""
WITH ev AS (
  SELECT user_id, event_type, epoch_us(ts) AS tus FROM events
),
t1 AS (
  SELECT user_id, MIN(tus) AS t1 FROM ev
  WHERE event_type = 'view' GROUP BY user_id
),
t2 AS (
  SELECT e.user_id, MIN(tus) AS t2 FROM ev e JOIN t1 USING (user_id)
  WHERE event_type = 'click' AND tus > t1 AND tus <= t1 + {_STEP_US}
  GROUP BY e.user_id
),
t3 AS (
  SELECT e.user_id, MIN(tus) AS t3 FROM ev e JOIN t2 USING (user_id)
  WHERE event_type = 'purchase' AND tus > t2 AND tus <= t2 + {_STEP_US}
  GROUP BY e.user_id
)
SELECT 1 AS stage_no, 'view' AS stage, CAST(COUNT(*) AS BIGINT) AS n_users FROM t1
UNION ALL
SELECT 2, 'view>click', CAST(COUNT(*) AS BIGINT) FROM t2
UNION ALL
SELECT 3, 'view>click>purchase', CAST(COUNT(*) AS BIGINT) FROM t3
"""



def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention triangle: users grouped by first-activity week
    (the cohort), counted as retained in each later week they were
    active.

    Weeks are integer indexes floor(tus / 7d) — pure integer
    bucketing, no calendar/timezone semantics to disagree on. Shape:
    one min-agg on user_id, one join back (same key), one distinct +
    count on (cohort_week, week_offset).
    """
    ev = _ev(spark, sf_dir)
    week = (F.col("tus") / F.lit(_WEEK_US)).cast("bigint")
    first = ev.groupBy("user_id").agg(F.min("tus").alias("first_tus"))
    cohorted = (
        ev.join(first, "user_id")
        .select(
            "user_id",
            (F.col("first_tus") / F.lit(_WEEK_US)).cast("bigint").alias("cohort_week"),
            week.alias("w"),
        )
        .select("user_id", "cohort_week", (F.col("w") - F.col("cohort_week")).alias("week_offset"))
        .distinct()
    )
    return (
        cohorted.groupBy("cohort_week", "week_offset")
        .agg(F.count("*").alias("n_active"))
    )



_RETENTION_SQL = f"""
WITH ev AS (
  SELECT user_id, epoch_us(ts) AS tus FROM events
),
first AS (SELECT user_id, MIN(tus) AS first_tus FROM ev GROUP BY user_id),
cohorted AS (
  SELECT DISTINCT e.user_id,
         CAST(FLOOR(first_tus / {_WEEK_US}) AS BIGINT) AS cohort_week,
         CAST(FLOOR(tus / {_WEEK_US}) AS BIGINT)
           - CAST(FLOOR(first_tus / {_WEEK_US}) AS BIGINT) AS week_offset
  FROM ev e JOIN first USING (user_id)
)
SELECT cohort_week, week_offset, CAST(COUNT(*) AS BIGINT) AS n_active
FROM cohorted GROUP BY cohort_week, week_offset
"""



def events_rollup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous-aggregate cascade: events roll up
    to per-minute cells, minutes to hours, hours to days — each level
    derived from the PREVIOUS level (sum of sums), exactly how a
    streaming rollup maintains multi-resolution aggregates
    incrementally. Returns the day level.

    The oracle aggregates the raw events straight to days, so the
    hash-match proves the cascade is algebraically exact — which it
    is only because spend sums in DECIMAL (float re-aggregation would
    drift). Scale: the first rollup collapses the stream to bounded
    per-minute cells (map-side combine); every later level aggregates
    an already-tiny relation.
    """
    ev = load(spark, "events", sf_dir)
    minute = (
        ev.select(
            (F.unix_micros("ts") / F.lit(60_000_000)).cast("bigint").alias("m"),
            F.col("value").cast(_PRICE).alias("v"),
        )
        .groupBy("m")
        .agg(F.count("*").alias("cnt"), F.sum("v").alias("sv"))
    )
    hour = (
        minute.select((F.col("m") / F.lit(60)).cast("bigint").alias("h"), "cnt", "sv")
        .groupBy("h")
        .agg(F.sum("cnt").alias("cnt"), F.sum("sv").alias("sv"))
    )
    day = (
        hour.select((F.col("h") / F.lit(24)).cast("bigint").alias("day"), "cnt", "sv")
        .groupBy("day")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_events"),
            F.sum("sv").cast("double").alias("total_value"),
        )
    )
    return day



_ROLLUP_SQL = """
SELECT CAST(FLOOR(epoch_us(ts) / 86400000000) AS BIGINT) AS day,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(CAST(SUM(CAST(value AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS total_value
FROM events
GROUP BY 1
"""



def distinct_users_kmv_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group KMV sketch: approximate distinct users per
    event_type from the 64 smallest md5 hashes per group, with exact
    distincts alongside. The per-key variant of the global KMV sketch
    (sketches.py::events_distinct_hll's kmv_* columns) —
    the mergeable sketch you'd keep per partition/key at 100 TB and
    fold, instead of a per-key exact distinct.

    The top-k-smallest per group is a partition-parallel row_number
    window over the deduplicated (type, hash) relation — no global
    sort anywhere.
    """
    ev = load(spark, "events", sf_dir)
    h = ev.selectExpr(
        "event_type",
        "cast(conv(substr(md5(cast(user_id as string)), 1, 15), 16, 10) as bigint) as hv",
    ).distinct()
    w = Window.partitionBy("event_type").orderBy("hv")
    kmin = h.withColumn("rk", F.row_number().over(w)).where(F.col("rk") <= _GKMV_K)
    agg = kmin.groupBy("event_type").agg(
        F.count("*").alias("k"), F.max("hv").alias("kth_min")
    )
    # exact distinct AND total counts alongside (round 12: absorbs the
    # former distinct_users_by_type — the exact per-key distinct was a
    # strict subset of this query's exact_distinct column)
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_distinct"),
        F.count(F.lit(1)).alias("n_events"),
    )
    return (
        agg.join(exact, "event_type")
        .selectExpr(
            "event_type",
            "k",
            "kth_min",
            "cast(k - 1 as double) * 1152921504606846976.0 / cast(kth_min as double) as estimate",
            "exact_distinct",
            "n_events",
        )
        .orderBy("event_type")
    )



_GKMV_SQL = f"""
WITH h AS (
  SELECT DISTINCT event_type,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS hv
  FROM events
),
kmin AS (
  SELECT event_type, hv,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hv) AS rk
  FROM h
),
agg AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS k, MAX(hv) AS kth_min
  FROM kmin WHERE rk <= {_GKMV_K} GROUP BY event_type
),
ex AS (
  SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events GROUP BY event_type
)
SELECT a.event_type, k, kth_min,
       CAST(k - 1 AS DOUBLE) * 1152921504606846976.0 / CAST(kth_min AS DOUBLE) AS estimate,
       exact_distinct, n_events
FROM agg a JOIN ex USING (event_type)
ORDER BY event_type
"""



def event_hour_contingency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square contingency cells for event_type x hour-of-day: per
    cell the observed count, the independence-expected count and the
    (o-e)^2/e contribution — the seasonality/affinity diagnostic
    behind "is traffic shape independent of event type".

    The result is the CELL TABLE, not the summed statistic: a global
    chi-square would sum ~120 doubles in engine-dependent order, while
    per-cell values are each derived from identical integers (marginal
    sums are exact integer window aggregates over the tiny cell
    table), so every row is bit-reproducible. Scale: one keyed
    aggregation over events; the windows run over the
    |types| x 24-row cell table, bounded at any corpus size.
    """
    from pyspark.sql import Window

    ev = load(spark, "events", sf_dir)
    cells = (
        ev.select(
            "event_type",
            ((F.unix_micros("ts") / F.lit(3_600_000_000)).cast("bigint") % 24).alias(
                "hour"
            ),
        )
        .groupBy("event_type", "hour")
        .agg(F.count(F.lit(1)).cast("long").alias("observed"))
    )
    wr = Window.partitionBy("event_type")
    wc = Window.partitionBy("hour")
    wall = Window.partitionBy()
    tot = cells.select(
        "event_type",
        "hour",
        "observed",
        F.sum("observed").over(wr).cast("long").alias("row_total"),
        F.sum("observed").over(wc).cast("long").alias("col_total"),
        F.sum("observed").over(wall).cast("long").alias("n"),
    )
    e = (
        F.col("row_total").cast("double")
        * F.col("col_total").cast("double")
        / F.col("n").cast("double")
    )
    o = F.col("observed").cast("double")
    return tot.select(
        "event_type",
        "hour",
        "observed",
        e.alias("expected"),
        ((o - e) * (o - e) / e).alias("contribution"),
    ).orderBy("event_type", "hour")



_CONTINGENCY_SQL = """
WITH cells AS (
  SELECT event_type,
         CAST(FLOOR(epoch_us(ts) / 3600000000) AS BIGINT) % 24 AS hour,
         CAST(COUNT(*) AS BIGINT) AS observed
  FROM events GROUP BY 1, 2
),
tot AS (
  SELECT event_type, hour, observed,
         CAST(SUM(observed) OVER (PARTITION BY event_type) AS BIGINT) AS row_total,
         CAST(SUM(observed) OVER (PARTITION BY hour) AS BIGINT) AS col_total,
         CAST(SUM(observed) OVER () AS BIGINT) AS n
  FROM cells
)
SELECT event_type, hour, observed,
       CAST(row_total AS DOUBLE) * CAST(col_total AS DOUBLE) / CAST(n AS DOUBLE) AS expected,
       (CAST(observed AS DOUBLE) - CAST(row_total AS DOUBLE) * CAST(col_total AS DOUBLE) / CAST(n AS DOUBLE))
         * (CAST(observed AS DOUBLE) - CAST(row_total AS DOUBLE) * CAST(col_total AS DOUBLE) / CAST(n AS DOUBLE))
         / (CAST(row_total AS DOUBLE) * CAST(col_total AS DOUBLE) / CAST(n AS DOUBLE)) AS contribution
FROM tot ORDER BY event_type, hour
"""



def daily_new_users_cumulative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Growth curve: per HOUR the count of first-ever-seen users and
    the cumulative unique-user total — computed WITHOUT a running
    distinct (which would hold every id in window state): each user
    reduces to a first-seen hour (one keyed min), hours aggregate to
    new-user counts, and the cumulative total is a running sum over
    the tiny hourly series. The state cliff this sidesteps is the
    classic one: cumulative COUNT(DISTINCT) over 100 TB of events.
    (Hour granularity because the synthetic event window spans days,
    not months — the shape is identical at any bucket width.)
    """
    from pyspark.sql import Window

    ev = load(spark, "events", sf_dir)
    first_seen = ev.groupBy("user_id").agg(
        F.min(
            (F.unix_micros("ts") / F.lit(3_600_000_000)).cast("bigint")
        ).alias("hour")
    )
    hourly = first_seen.groupBy("hour").agg(
        F.count(F.lit(1)).cast("long").alias("new_users")
    )
    w = Window.orderBy("hour").rowsBetween(Window.unboundedPreceding, 0)
    return hourly.select(
        "hour",
        "new_users",
        F.sum("new_users").over(w).cast("long").alias("cumulative_users"),
    ).orderBy("hour")



_NEWUSERS_SQL = """
WITH first_seen AS (
  SELECT user_id,
         CAST(MIN(FLOOR(epoch_us(ts) / 3600000000)) AS BIGINT) AS hour
  FROM events GROUP BY user_id
),
hourly AS (
  SELECT hour, CAST(COUNT(*) AS BIGINT) AS new_users FROM first_seen GROUP BY hour
)
SELECT hour, new_users,
       CAST(SUM(new_users) OVER (ORDER BY hour
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cumulative_users
FROM hourly ORDER BY hour
"""



def events_user_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user lifecycle segmentation: first/last activity, active
    hours, event count, and a status — new (first seen within the
    churn horizon of corpus end), active (seen within it), or churned.
    The horizon anchors on MAX(ts) over the corpus (a broadcast
    scalar), so the report is reproducible on a frozen snapshot
    rather than wall-clock-dependent.

    Scale: one keyed aggregation over events plus a 1-row bound —
    the same shape at any corpus size. All comparisons are integer
    epoch-hours.
    """
    ev = load(spark, "events", sf_dir)
    hour = (F.unix_micros("ts") / F.lit(3_600_000_000)).cast("bigint")
    per_user = ev.select("user_id", hour.alias("h")).groupBy("user_id").agg(
        F.min("h").alias("first_hour"),
        F.max("h").alias("last_hour"),
        F.countDistinct("h").cast("long").alias("active_hours"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )
    bound = per_user.agg(F.max("last_hour").alias("end_hour"))
    horizon = _LIFECYCLE_CHURN_DAYS * 24
    status = (
        F.when(F.col("first_hour") > F.col("end_hour") - horizon, F.lit("new"))
        .when(F.col("last_hour") > F.col("end_hour") - horizon, F.lit("active"))
        .otherwise(F.lit("churned"))
    )
    return (
        per_user.crossJoin(F.broadcast(bound))
        .select(
            "user_id",
            "first_hour",
            "last_hour",
            "active_hours",
            "n_events",
            status.alias("status"),
        )
        .orderBy("user_id")
    )



_LIFECYCLE_SQL = f"""
WITH per_user AS (
  SELECT user_id,
         CAST(MIN(FLOOR(epoch_us(ts) / 3600000000)) AS BIGINT) AS first_hour,
         CAST(MAX(FLOOR(epoch_us(ts) / 3600000000)) AS BIGINT) AS last_hour,
         CAST(COUNT(DISTINCT FLOOR(epoch_us(ts) / 3600000000)) AS BIGINT) AS active_hours,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events GROUP BY user_id
),
bound AS (SELECT MAX(last_hour) AS end_hour FROM per_user)
SELECT user_id, first_hour, last_hour, active_hours, n_events,
       CASE WHEN first_hour > end_hour - {_LIFECYCLE_CHURN_DAYS * 24} THEN 'new'
            WHEN last_hour > end_hour - {_LIFECYCLE_CHURN_DAYS * 24} THEN 'active'
            ELSE 'churned' END AS status
FROM per_user CROSS JOIN bound
ORDER BY user_id
"""



def hourly_count_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, "events", sf_dir)
    hourly = ev.groupBy(
        (F.unix_timestamp(F.date_trunc("hour", "ts")) / F.lit(3600))
        .cast("long")
        .alias("hidx")
    ).agg(F.count(F.lit(1)).alias("c"))

    out = None
    for k in _LAGS:
        pairs = (
            hourly.alias("a")
            .join(
                hourly.alias("b"),
                F.col("b.hidx") == F.col("a.hidx") + F.lit(k),
            )
            .select(F.col("a.c").alias("x"), F.col("b.c").alias("y"))
        )
        agg = pairs.agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum("x").cast("long").alias("sx"),
            F.sum("y").cast("long").alias("sy"),
            F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
            F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
            F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        ).select(
            F.lit(k).cast("int").alias("lag_hours"),
            "n_pairs",
            (F.col("n_pairs") * F.col("sxy") - F.col("sx") * F.col("sy"))
            .cast("long")
            .alias("cov_num"),
            F.when(
                (F.col("n_pairs") * F.col("sxx") - F.col("sx") * F.col("sx") > 0)
                & (F.col("n_pairs") * F.col("syy") - F.col("sy") * F.col("sy") > 0),
                (F.col("n_pairs") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
                    "double"
                )
                / (
                    F.sqrt(
                        (
                            F.col("n_pairs") * F.col("sxx")
                            - F.col("sx") * F.col("sx")
                        ).cast("double")
                    )
                    * F.sqrt(
                        (
                            F.col("n_pairs") * F.col("syy")
                            - F.col("sy") * F.col("sy")
                        ).cast("double")
                    )
                ),
            ).alias("autocorr"),
        )
        out = agg if out is None else out.unionByName(agg)
    return out.orderBy("lag_hours")



_AUTOCORR_SQL = f"""
WITH hourly AS (
  SELECT CAST(FLOOR(EPOCH(date_trunc('hour', ts))) AS BIGINT) // 3600 AS hidx,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events
  GROUP BY 1
)
{" UNION ALL ".join(_lag_sql(k) for k in _LAGS)}
ORDER BY lag_hours
"""


QUERIES = {
    "events_hourly": events_hourly,
    "user_sessions": user_sessions,
    "events_json_buckets": events_json_buckets,
    "events_daily_pivot": events_daily_pivot,
    "events_value_stats": events_value_stats,
    "events_error_context": events_error_context,
    "purchases_asof_signup": purchases_asof_signup,
    "events_hourly_gapfill": events_hourly_gapfill,
    "events_latest_per_user": events_latest_per_user,
    "user_history_scd2": user_history_scd2,
    "value_histogram_quantiles": value_histogram_quantiles,
    "events_in_error_windows": events_in_error_windows,
    "user_rolling_7d": user_rolling_7d,
    "events_hourly_anomalies": events_hourly_anomalies,
    "event_interarrival_gaps": event_interarrival_gaps,
    "event_transition_matrix": event_transition_matrix,
    "weekly_active_users": weekly_active_users,
    "funnel_view_click_purchase": funnel_view_click_purchase,
    "retention_cohorts": retention_cohorts,
    "events_rollup_cascade": events_rollup_cascade,
    "distinct_users_kmv_by_type": distinct_users_kmv_by_type,
    "event_hour_contingency": event_hour_contingency,
    "daily_new_users_cumulative": daily_new_users_cumulative,
    "events_user_lifecycle": events_user_lifecycle,
    "hourly_count_autocorr": hourly_count_autocorr,
}

ORACLE = {
    "events_hourly": _EVENTS_HOURLY_SQL,
    "user_sessions": _SESSIONS_SQL,
    "events_json_buckets": _JSON_SQL,
    "events_daily_pivot": _PIVOT_SQL,
    "events_value_stats": _STATS_SQL,
    "events_error_context": _RANGE_SQL,
    "purchases_asof_signup": _ASOF_SQL,
    "events_hourly_gapfill": _GAPFILL_SQL,
    "events_latest_per_user": _LATEST_SQL,
    "user_history_scd2": _SCD2_SQL,
    "value_histogram_quantiles": _HISTQ_SQL,
    "events_in_error_windows": _ERRWIN_SQL,
    "user_rolling_7d": _ROLLING_SQL,
    "events_hourly_anomalies": _ANOM_SQL,
    "event_interarrival_gaps": _INTERARRIVAL_SQL,
    "event_transition_matrix": _TRANSITION_SQL,
    "weekly_active_users": _WAU_SQL,
    "funnel_view_click_purchase": _FUNNEL_SQL,
    "retention_cohorts": _RETENTION_SQL,
    "events_rollup_cascade": _ROLLUP_SQL,
    "distinct_users_kmv_by_type": _GKMV_SQL,
    "event_hour_contingency": _CONTINGENCY_SQL,
    "daily_new_users_cumulative": _NEWUSERS_SQL,
    "events_user_lifecycle": _LIFECYCLE_SQL,
    "hourly_count_autocorr": _AUTOCORR_SQL,
}


# --------------------------------------------------------------------
# Seasonal (hour-of-day) residual anomalies — the PERIODIC-baseline
# twin of events_hourly_anomalies' trailing z-score: traffic has a
# daily rhythm, so each (day, hour) cell is compared against the
# EXACT MEDIAN of the same clock hour across all days (nearest-rank
# over the 24 hour-of-day groups — per-group window, integer rank
# arithmetic, no distributional assumption), and the 20 largest
# absolute residuals surface. Catches "3am looked like 3pm" shapes a
# trailing window normalizes away. Scale: one keyed aggregation to
# the (day x 24) grid; the windows only ever see that grid.
# --------------------------------------------------------------------
def hourly_seasonal_residuals(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, "events", sf_dir)
    grid = ev.groupBy(
        F.to_date("ts").alias("day"),
        F.hour("ts").cast("long").alias("hod"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    w = Window.partitionBy("hod").orderBy("n_events", "day")
    med = (
        grid.select(
            "hod",
            "n_events",
            F.row_number().over(w).cast("long").alias("rk"),
            F.count(F.lit(1)).over(Window.partitionBy("hod")).cast("long").alias("n"),
        )
        .where(F.expr("rk = cast(ceil(n / 2.0) as bigint)"))
        .select("hod", F.col("n_events").alias("hod_median"))
    )
    return (
        grid.join(F.broadcast(med), "hod")
        .select(
            "day",
            "hod",
            "n_events",
            "hod_median",
            (F.col("n_events") - F.col("hod_median")).alias("residual"),
        )
        .orderBy(F.abs("residual").desc(), "day", "hod")
        .limit(20)
    )


_SEASONAL_SQL = """
WITH grid AS (
  SELECT CAST(ts AS DATE) AS day, CAST(hour(ts) AS BIGINT) AS hod,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1, 2
),
med AS (
  SELECT hod, n_events AS hod_median FROM (
    SELECT hod, n_events,
           CAST(ROW_NUMBER() OVER (PARTITION BY hod ORDER BY n_events, day) AS BIGINT) AS rk,
           CAST(COUNT(*) OVER (PARTITION BY hod) AS BIGINT) AS n
    FROM grid
  ) WHERE rk = CAST(CEIL(n / 2.0) AS BIGINT)
)
SELECT g.day, g.hod, g.n_events, m.hod_median,
       g.n_events - m.hod_median AS residual
FROM grid g JOIN med m ON m.hod = g.hod
ORDER BY ABS(g.n_events - m.hod_median) DESC, g.day, g.hod
LIMIT 20
"""


QUERIES["hourly_seasonal_residuals"] = hourly_seasonal_residuals
ORACLE["hourly_seasonal_residuals"] = _SEASONAL_SQL
