"""Round-2 tail relational shapes.

- q2_min_cost_supplier: the TPC-H q2 shape (correlated scalar
  subquery choosing the min-cost supplier per part) adapted to the
  slim schema: the part-supplier cost table is derived from lineitem
  (min extended price per (l_partkey, l_suppkey)) since partsupp
  isn't shipped. Reference parity: goconnect exposes this class of
  query through its keyed-fold + join surface (SURVEY.md §2.3);
  the shape here is the canonical "argmin within group across a
  dimension filter".
- events_distinct_kmv: K-minimum-values cardinality sketch done
  portably (md5 -> 60-bit integer, k smallest, (k-1)/kth_min
  estimator) so the DuckDB oracle hash-matches bit-for-bit — the
  approximate-distinct family demonstrated WITHOUT engine-specific
  HLL internals.

Scale notes (100 TB): q2's offers aggregation shuffles lineitem once
on (l_partkey, l_suppkey); the argmin is a window over p_partkey —
same key, so AQE coalesces into one exchange chain; all dims
broadcast. KMV's distinct() is the only full shuffle; orderBy+limit
compiles to TakeOrderedAndProject (per-partition top-k, merge on the
driver of k values only). At cluster scale you'd fold the per-
partition k-min sets directly (sketch merge) and skip the global
distinct; the estimator semantics verified here are identical.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.window import Window

from goconnect_spark.tables import load

_PRICE = "decimal(12,2)"
_RATE = "decimal(6,4)"


def _dec(col: str, t: str) -> F.Column:
    return F.col(col).cast(t)


def _disc_price() -> F.Column:
    return _dec("l_extendedprice", _PRICE) * (F.lit(1).cast(_RATE) - _dec("l_discount", _RATE))


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
    # filters are broadcast semi-joins — no exchange added.
    li_f = li.join(
        F.broadcast(part.select("p_partkey")),
        li.l_partkey == F.col("p_partkey"),
        "left_semi",
    ).join(
        F.broadcast(euro.select("s_suppkey")),
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


_KMV_K = 128
_TWO_60 = 1152921504606846976  # 2^60, exact as a double


def events_distinct_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV distinct-count sketch over event_id, with the exact count
    alongside for error inspection.

    The hash is the first 15 hex chars of md5 parsed as a 60-bit
    integer — identical in both engines; (k-1)*2^60 is exact as a
    double (7-bit mantissa), so the estimate divides two bit-identical
    doubles.
    """
    ev = load(spark, "events", sf_dir)
    h = ev.selectExpr(
        "cast(conv(substr(md5(cast(event_id as string)), 1, 15), 16, 10) as bigint) as hv"
    ).distinct()
    kmin = h.orderBy("hv").limit(_KMV_K)
    agg = kmin.agg(F.count("*").alias("k"), F.max("hv").alias("kth_min"))
    exact = ev.agg(F.countDistinct("event_id").alias("exact_distinct"))
    return agg.crossJoin(F.broadcast(exact)).selectExpr(
        "k",
        "kth_min",
        f"cast(k - 1 as double) * {_TWO_60}.0 / cast(kth_min as double) as estimate",
        "exact_distinct",
    )


_KMV_SQL = f"""
WITH h AS (
  SELECT DISTINCT ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15))::BIGINT AS hv
  FROM events
),
kmin AS (SELECT hv FROM h ORDER BY hv LIMIT {_KMV_K}),
agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS k, MAX(hv) AS kth_min FROM kmin),
ex AS (SELECT CAST(COUNT(DISTINCT event_id) AS BIGINT) AS exact_distinct FROM events)
SELECT k, kth_min,
       CAST(k - 1 AS DOUBLE) * {_TWO_60}.0 / CAST(kth_min AS DOUBLE) AS estimate,
       exact_distinct
FROM agg, ex
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
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
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


_CMS_D = 4  # hash rows
_CMS_W = 256  # buckets per row


def word_freq_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch frequency estimation over the corpus word
    stream, probed for the top-20 exact heavy hitters (estimate >=
    exact always; collisions show as overshoot).

    Portable construction (same md5-derived hash family in Spark and
    DuckDB): for each token and each row j in 0..3, bucket =
    md5(j ':' token)[:15 hex] as int mod 256; the sketch is the
    (j, bucket) -> count table (<= 1024 cells). The point estimate for
    a key is min over its 4 cells.

    Scale shape: one shuffle total — the token stream collapses to
    the vocab-sized exact-count table (map-side partial agg), and the
    sketch cells are summed from THAT table, so the 4 md5 hashes run
    per distinct word, not per occurrence (cell values are identical:
    a cell holds the sum of counts of the words hashing into it).
    Probes join the tiny cell table via broadcast. In a pure-sketch
    deployment (no exact table, e.g. streaming) the per-occurrence
    build still collapses map-side into <= 1024 cells per partition —
    the CMS property this query demonstrates.
    """
    from goconnect_spark.queries.corpus import doc_token_arrays

    tok = doc_token_arrays(spark, sf_dir).select(
        F.explode("toks").alias("tok")
    )
    js = F.array([F.lit(j) for j in range(_CMS_D)])
    bucket = F.expr(
        f"cast(conv(substr(md5(concat(cast(j as string), ':', tok)), 1, 15), 16, 10) as bigint) % {_CMS_W}"
    )
    exact = tok.groupBy("tok").agg(F.count("*").alias("exact_count"))
    cells = (
        exact.select("tok", "exact_count", F.explode(js).alias("j"))
        .select("j", bucket.alias("b"), "exact_count")
        .groupBy("j", "b")
        .agg(F.sum("exact_count").cast("long").alias("cnt"))
    )
    top = exact.orderBy(F.desc("exact_count"), "tok").limit(20)
    probes = top.select("tok", "exact_count", F.explode(js).alias("j")).withColumn(
        "b", bucket
    )
    return (
        probes.join(F.broadcast(cells), ["j", "b"])
        .groupBy(F.col("tok").alias("word"), "exact_count")
        .agg(F.min("cnt").alias("cms_count"))
    )


_CMS_SQL = f"""
WITH tok AS (
  SELECT unnest(string_split(text, ' ')) AS tok FROM documents
),
cells AS (
  SELECT j,
         ('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || tok), 1, 15))::BIGINT % {_CMS_W} AS b,
         COUNT(*) AS cnt
  FROM tok, unnest([0, 1, 2, 3]) AS t(j)
  GROUP BY 1, 2
),
exact AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS exact_count FROM tok GROUP BY tok
),
top AS (
  SELECT * FROM exact ORDER BY exact_count DESC, tok LIMIT 20
),
probes AS (
  SELECT tok, exact_count, j,
         ('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || tok), 1, 15))::BIGINT % {_CMS_W} AS b
  FROM top, unnest([0, 1, 2, 3]) AS t(j)
)
SELECT p.tok AS word, p.exact_count, CAST(MIN(c.cnt) AS BIGINT) AS cms_count
FROM probes p JOIN cells c ON p.j = c.j AND p.b = c.b
GROUP BY p.tok, p.exact_count
"""


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


_WINDOW_US = 300_000_000  # 5 minutes in microseconds


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


_7D_US = 7 * 86_400 * 1_000_000


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


_ANOM_HOUR_US = 3_600_000_000
_ANOM_LOOKBACK = 24  # trailing full-day window, in hours
_ANOM_Z = 3.0


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

_WAU_WINDOW_DAYS = 7


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

QUERIES = {
    "weekly_active_users": weekly_active_users,
    "event_transition_matrix": event_transition_matrix,
    "event_interarrival_gaps": event_interarrival_gaps,
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "events_distinct_kmv": events_distinct_kmv,
    "q13_order_count_distribution": q13_order_count_distribution,
    "q9_product_type_profit": q9_product_type_profit,
    "events_in_error_windows": events_in_error_windows,
    "word_freq_cms": word_freq_cms,
    "value_histogram_quantiles": value_histogram_quantiles,
    "user_rolling_7d": user_rolling_7d,
    "events_hourly_anomalies": events_hourly_anomalies,
}
ORACLE = {
    "weekly_active_users": _WAU_SQL,
    "event_transition_matrix": _TRANSITION_SQL,
    "event_interarrival_gaps": _INTERARRIVAL_SQL,
    "events_hourly_anomalies": _ANOM_SQL,
    "user_rolling_7d": _ROLLING_SQL,
    "value_histogram_quantiles": _HISTQ_SQL,
    "events_in_error_windows": _ERRWIN_SQL,
    "word_freq_cms": _CMS_SQL,
    "q2_min_cost_supplier": _Q2_SQL,
    "events_distinct_kmv": _KMV_SQL,
    "q13_order_count_distribution": _Q13_SQL,
    "q9_product_type_profit": _Q9_SQL,
}
