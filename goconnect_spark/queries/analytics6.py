"""Product-analytics family (round-2 tail): ordered funnels,
retention cohorts, and graph triangle counting.

Reference parity: goconnect's keyed fold + join surface (SURVEY.md
§2.3/§2.6) expresses these as user-defined pipelines; here they are
declarative DataFrame plans that Catalyst can optimize end to end.

Determinism: every output is integer counts or integer-derived keys —
no float arithmetic at all — so the DuckDB oracles hash-match without
any of the decimal machinery the money queries need. Event ordering
uses strict comparisons on integer microseconds (never row order), so
equal-timestamp ties resolve identically in both engines.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.window import Window

from goconnect_spark.tables import load

_WEEK_US = 7 * 86_400 * 1_000_000
_PRICE = "decimal(12,2)"


def _ev(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, "events", sf_dir).select(
        "user_id", "event_type", F.unix_micros("ts").alias("tus")
    )


_STEP_US = 86_400_000_000  # each funnel step must follow within 24h


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


_TRI_MIN_PAIR = 10  # edge threshold: co-occurrence support


def word_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count over the word co-occurrence graph (edges = word
    pairs sharing >= _TRI_MIN_PAIR documents).

    The count uses the DEGREE-oriented-edge algorithm: every
    undirected edge is oriented from its lower to its higher endpoint
    under the total order (degree, id), wedges are enumerated at each
    source over its out-neighbours, and a wedge (b, c) closes iff the
    oriented edge b→c exists. Each triangle is counted exactly once
    (at its minimum-(degree,id) vertex). Degree orientation bounds
    EVERY out-degree by O(sqrt(|E|)) — the classic heavy-vertex fix —
    so one stop-word surviving the support threshold cannot make the
    wedge join quadratic in its (huge) degree the way raw-id
    orientation can. The triangle count is orientation-invariant, so
    the oracle SQL is the plain three-way join.
    """
    from goconnect_spark.queries.corpus import cooccurrence_edges

    # shared persisted thresholded graph: the edge subtree feeds deg,
    # the two wedge sides AND the closing join — without materializing
    # it the support aggregation re-executes ~5x (measured 8.7 -> 1.3 s
    # at sf0.1); sharing with word_pagerank also halves the family's
    # bench cost (the same move as the dedup shingle-set persist).
    edges = cooccurrence_edges(spark, sf_dir, _TRI_MIN_PAIR)
    # degree of each vertex in the thresholded graph (vertex-dim sized)
    deg = (
        edges.select(F.col("w1").alias("v"))
        .unionAll(edges.select(F.col("w2").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    # attach (deg, id) order keys to both endpoints; struct comparison
    # is lexicographic, giving the total order the orientation needs
    keyed = (
        edges.join(deg.withColumnRenamed("v", "w1").withColumnRenamed("deg", "d1"), "w1")
        .join(deg.withColumnRenamed("v", "w2").withColumnRenamed("deg", "d2"), "w2")
        .select(
            "w1",
            "w2",
            F.struct(F.col("d1").alias("d"), F.col("w1").alias("v")).alias("k1"),
            F.struct(F.col("d2").alias("d"), F.col("w2").alias("v")).alias("k2"),
        )
    )
    oriented = keyed.select(
        F.when(F.col("k1") < F.col("k2"), F.col("w1")).otherwise(F.col("w2")).alias("src"),
        F.when(F.col("k1") < F.col("k2"), F.col("w2")).otherwise(F.col("w1")).alias("dst"),
        F.when(F.col("k1") < F.col("k2"), F.col("k2")).otherwise(F.col("k1")).alias("kdst"),
    )
    o1 = oriented.select("src", F.col("dst").alias("b"), F.col("kdst").alias("kb"))
    o2 = oriented.select("src", F.col("dst").alias("c"), F.col("kdst").alias("kc"))
    wedges = o1.join(o2, "src").where(F.col("kb") < F.col("kc"))
    closing = oriented.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    tris = wedges.join(closing, ["b", "c"])
    return tris.agg(F.count("*").alias("n_triangles"))


_TRIANGLES_SQL = f"""
WITH dw AS (
  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
edges AS (
  SELECT a.tok AS w1, b.tok AS w2
  FROM dw a JOIN dw b ON a.doc_id = b.doc_id AND a.tok < b.tok
  GROUP BY a.tok, b.tok
  HAVING COUNT(*) >= {_TRI_MIN_PAIR}
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
FROM edges e1
JOIN edges e2 ON e1.w2 = e2.w1
JOIN edges e3 ON e3.w1 = e1.w1 AND e3.w2 = e2.w2
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


_GKMV_K = 64


def distinct_users_kmv_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group KMV sketch: approximate distinct users per
    event_type from the 64 smallest md5 hashes per group, with exact
    distincts alongside. The per-key variant of events_distinct_kmv —
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
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_distinct")
    )
    return (
        agg.join(exact, "event_type")
        .selectExpr(
            "event_type",
            "k",
            "kth_min",
            "cast(k - 1 as double) * 1152921504606846976.0 / cast(kth_min as double) as estimate",
            "exact_distinct",
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
  SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct
  FROM events GROUP BY event_type
)
SELECT a.event_type, k, kth_min,
       CAST(k - 1 AS DOUBLE) * 1152921504606846976.0 / CAST(kth_min AS DOUBLE) AS estimate,
       exact_distinct
FROM agg a JOIN ex USING (event_type)
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# PageRank over the word co-occurrence graph — the iterative-algorithm
# shape (power iteration as repeated join+aggregate) that complements
# the connected-components loop in dedup.py. Reference parity: the
# reference engine has no graph operators; this is LLM-pipeline-layer
# corpus diagnostics (influential-vocabulary ranking).

_PR_SCALE = 1_000_000  # fixed-point scale: rank 1.0 == 1e6
_PR_ITERS = 3
_PR_TOPK = 20
_PR_BASE = 15 * _PR_SCALE // 100  # (1-d) * scale, d = 0.85


def word_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 words by PageRank after 3 power iterations over the
    thresholded co-occurrence graph (same edges as
    word_graph_triangles).

    Determinism: the iteration is ENTIRELY integer — ranks are
    fixed-point bigints, each edge contribution is
    (rank*85) div (100*outdeg) (truncating integer division, identical
    to DuckDB's // on non-negative operands), and the per-vertex
    reduce is an integer sum, so the result is bit-reproducible
    across engines, partitionings and retry orders. Float PageRank
    sums are order-dependent; a filtering/weighting decision built on
    one would not be replayable.

    Scale: each iteration is one equi-join of the edge list against
    the vertex-dim rank table (AQE broadcasts the rank side when it
    fits) plus one keyed aggregation — O(|E|) per iteration with
    map-side partial sums, no all-pairs anywhere. localCheckpoint
    between iterations keeps lineage flat (the CC pattern); the
    symmetric thresholded graph has no dangling vertices, so the
    rank mass needs no dangling redistribution term.
    """
    from goconnect_spark.queries.corpus import cooccurrence_edges

    # the persisted thresholded graph is shared with
    # word_graph_triangles; the directed view is a cheap projection
    # union over it, so each iteration's 4 reads hit the cache
    from goconnect_spark.operators.graph import pagerank_fixed_point

    und = cooccurrence_edges(spark, sf_dir, _TRI_MIN_PAIR)
    edges = und.select(
        F.col("w1").alias("src"), F.col("w2").alias("dst")
    ).unionAll(und.select(F.col("w2").alias("src"), F.col("w1").alias("dst")))
    ranks = pagerank_fixed_point(edges, iters=_PR_ITERS, scale=_PR_SCALE)
    return (
        ranks.orderBy(F.desc("rank"), "v")
        .limit(_PR_TOPK)
        .select(F.col("v").alias("word"), F.col("rank").alias("rank_fp"))
    )


def _pagerank_iter_sql(prev: str, out: str) -> str:
    return f"""
{out} AS (
  SELECT e.dst AS v,
         CAST({_PR_BASE} + SUM((r.rank * 85) // (100 * d.outdeg)) AS BIGINT) AS rank
  FROM edges e JOIN deg d ON e.src = d.src JOIN {prev} r ON e.src = r.v
  GROUP BY e.dst
)"""


_PAGERANK_SQL = f"""
WITH dw AS (
  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
und AS (
  SELECT a.tok AS w1, b.tok AS w2
  FROM dw a JOIN dw b ON a.doc_id = b.doc_id AND a.tok < b.tok
  GROUP BY 1, 2 HAVING COUNT(*) >= {_TRI_MIN_PAIR}
),
edges AS (
  SELECT w1 AS src, w2 AS dst FROM und
  UNION ALL
  SELECT w2 AS src, w1 AS dst FROM und
),
deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS outdeg FROM edges GROUP BY src),
r0 AS (SELECT src AS v, CAST({_PR_SCALE} AS BIGINT) AS rank FROM deg),{_pagerank_iter_sql("r0", "r1")},{_pagerank_iter_sql("r1", "r2")},{_pagerank_iter_sql("r2", "r3")}
SELECT v AS word, rank AS rank_fp FROM r3 ORDER BY rank DESC, v LIMIT {_PR_TOPK}
"""


# ---------------------------------------------------------------------------
# Label-propagation communities: the third member of the graph family
# (triangles = local structure, PageRank = centrality, LPA =
# community partition). Deterministic SYNCHRONOUS variant: classic
# async LPA is order-dependent; synchronous rounds with a total
# tie-break make the partition reproducible across engines.

_LPA_ITERS = 4


def word_communities_lpa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community sizes over the thresholded co-occurrence graph after
    4 synchronous label-propagation rounds.

    Each round every vertex adopts the most frequent label among its
    neighbours, ties broken by lexicographically smallest label —
    counts are integers and the tie-break is a total order, so the
    partition is deterministic (no float scores, no arrival order).
    On this synthetic corpus the frequent-word graph is a near-clique
    and LPA correctly converges to a single community; what the
    oracle certifies is the exact per-round propagation (every
    vertex's assignment after 4 synchronized rounds), which is why
    the result is the per-vertex table, not just community sizes.

    Scale: per round one equi-join edge x labels + one keyed count +
    one per-vertex argmax (row_number over a keyed window) —
    O(|E|) work, vertex-dim state, localCheckpoint keeping lineage
    flat (same loop discipline as PageRank/CC).
    """
    from goconnect_spark.queries.corpus import cooccurrence_edges

    und = cooccurrence_edges(spark, sf_dir, _TRI_MIN_PAIR)
    edges = und.select(
        F.col("w1").alias("src"), F.col("w2").alias("dst")
    ).unionAll(und.select(F.col("w2").alias("src"), F.col("w1").alias("dst")))
    labels = edges.select(F.col("src").alias("v")).distinct().select(
        "v", F.col("v").alias("label")
    )
    wv = Window.partitionBy("v").orderBy(F.desc("n"), F.asc("label"))
    for _ in range(_LPA_ITERS):
        nb = edges.join(labels.withColumnRenamed("v", "src"), "src").select(
            F.col("dst").alias("v"), "label"
        )
        labels = (
            nb.groupBy("v", "label")
            .agg(F.count(F.lit(1)).alias("n"))
            .withColumn("rk", F.row_number().over(wv))
            .where(F.col("rk") == 1)
            .select("v", "label")
            .localCheckpoint()
        )
    sizes = labels.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n_members")
    )
    return (
        labels.join(sizes, "label")
        .select(F.col("v").alias("word"), F.col("label").alias("community"), "n_members")
        .orderBy("word")
    )


def _lpa_iter_sql(prev: str, out: str) -> str:
    return f"""
{out} AS (
  SELECT v, label FROM (
    SELECT e.dst AS v, l.label,
           ROW_NUMBER() OVER (PARTITION BY e.dst
                              ORDER BY COUNT(*) DESC, l.label ASC) AS rk
    FROM edges e JOIN {prev} l ON e.src = l.v
    GROUP BY e.dst, l.label
  ) WHERE rk = 1
)"""


_LPA_SQL = f"""
WITH dw AS (
  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
und AS (
  SELECT a.tok AS w1, b.tok AS w2
  FROM dw a JOIN dw b ON a.doc_id = b.doc_id AND a.tok < b.tok
  GROUP BY 1, 2 HAVING COUNT(*) >= {_TRI_MIN_PAIR}
),
edges AS (
  SELECT w1 AS src, w2 AS dst FROM und
  UNION ALL
  SELECT w2 AS src, w1 AS dst FROM und
),
l0 AS (SELECT DISTINCT src AS v, src AS label FROM edges),{_lpa_iter_sql("l0", "l1")},{_lpa_iter_sql("l1", "l2")},{_lpa_iter_sql("l2", "l3")},{_lpa_iter_sql("l3", "l4")}
,
sizes AS (
  SELECT label, CAST(COUNT(*) AS BIGINT) AS n_members FROM l4 GROUP BY label
)
SELECT l.v AS word, l.label AS community, s.n_members
FROM l4 l JOIN sizes s USING (label) ORDER BY l.v
"""


QUERIES = {
    "funnel_view_click_purchase": funnel_view_click_purchase,
    "retention_cohorts": retention_cohorts,
    "word_graph_triangles": word_graph_triangles,
    "word_pagerank": word_pagerank,
    "word_communities_lpa": word_communities_lpa,
    "customer_spend_ranks": customer_spend_ranks,
    "daily_reconciliation": daily_reconciliation,
    "events_rollup_cascade": events_rollup_cascade,
    "distinct_users_kmv_by_type": distinct_users_kmv_by_type,
}
ORACLE = {
    "word_communities_lpa": _LPA_SQL,
    "word_pagerank": _PAGERANK_SQL,
    "customer_spend_ranks": _RANKS_SQL,
    "daily_reconciliation": _RECON_SQL,
    "events_rollup_cascade": _ROLLUP_SQL,
    "distinct_users_kmv_by_type": _GKMV_SQL,
    "funnel_view_click_purchase": _FUNNEL_SQL,
    "retention_cohorts": _RETENTION_SQL,
    "word_graph_triangles": _TRIANGLES_SQL,
}
