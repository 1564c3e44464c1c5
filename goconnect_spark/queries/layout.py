"""Storage-layout analytics: measure what multi-dimensional (Z-order)
clustering buys over a single-column sort.

`zorder_pruning_stats` scores two physical layouts of the events fact
table — Morton-interleaved (user_id x hour) vs plain hour-sorted —
by SIMULATED parquet pruning: both layouts tile the same 256x256
scaled key space into 64 "files" (buckets), each file keeps min/max
footer stats on both dimensions, and a scan reads a file only when
the predicate box intersects the file's [min,max] extents. For three
canonical predicate shapes (a user band, an hour band, and their
conjunction — each a 32-cell band, 1/8 of the domain) the query
reports how many files and rows each layout touches.

The point the numbers make: the hour-sorted layout prunes hour
predicates perfectly and user predicates NOT AT ALL (every file
spans the full user range), while the Z-order layout prunes BOTH
dimensions to ~1/8 of the files and their conjunction to ~1/64 —
bounded-loss pruning on every clustered dimension, which is why
lakehouse OPTIMIZE picks Morton keys for multi-predicate tables.

The Z key itself comes from `operators.storage.zorder_sql` — one
shared `>> << &` SQL string evaluated by BOTH Spark and DuckDB, so
the oracle hash-match doubles as a cross-engine proof that the
interleave is exact. Reference parity: goconnect has no storage
optimizer (its tables are stream-shaped); this family extends the
engine the way its users run it at rest — files on object storage,
scan-time pruning.

Scale (100 TB): the bounds pass is a map-side min/max aggregate
broadcast back as one row (the repo's allowlisted 1-row BNLJ
pattern); scaling + interleave are in-row integer arithmetic inside
whole-stage codegen; per-layout file extents are one
map-side-combining aggregation on a 6-bit bucket key; the pruning
join pairs 2x64 constant-size extent rows with 3 predicate rows.
Nothing is driver-sized, nothing data-sized is non-equi-joined.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from goconnect_spark.operators.storage import zorder_sql
from goconnect_spark.tables import load

QUERIES = {}
ORACLE = {}

_BITS = 8  # 256-cell grid per dimension -> 16-bit Morton key
_GRID_SHIFT = 2 * _BITS - 6  # keep the top 6 interleaved bits: 8x8 buckets

# predicate bands in scaled units: a 32-cell slice of each dimension
# (1/8 of the domain), mid-range so neither layout gets an edge case
_PREDS = [
    ("user_band", 96, 127, 0, 255),
    ("hour_band", 0, 255, 96, 127),
    ("user_and_hour", 96, 127, 96, 127),
]


def _scaled(col: str, mn: str, mx: str) -> str:
    """Scale `col` into [0, 2**_BITS) over the inclusive [mn, mx]
    range — shared Spark/DuckDB dialect. FLOOR over `/` (not integer
    division, which the two engines spell differently) is exact here:
    the numerator is far below 2**53."""
    return (
        f"CAST(FLOOR(((({col}) - ({mn})) * {1 << _BITS})"
        f" / (({mx}) - ({mn}) + 1)) AS BIGINT)"
    )


def zorder_pruning_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, "events", sf_dir)
    base = ev.select(
        F.col("user_id").alias("x"),
        F.expr("unix_micros(ts) DIV 3600000000").alias("y"),
    )
    bounds = base.agg(
        F.min("x").alias("xmin"),
        F.max("x").alias("xmax"),
        F.min("y").alias("ymin"),
        F.max("y").alias("ymax"),
    )
    scaled = base.crossJoin(F.broadcast(bounds)).select(
        F.expr(_scaled("x", "xmin", "xmax")).alias("sx"),
        F.expr(_scaled("y", "ymin", "ymax")).alias("sy"),
    )
    keyed = scaled.select(
        "sx",
        "sy",
        F.expr(zorder_sql(["sx", "sy"], _BITS)).alias("zv"),
    )

    def _extents(df: DataFrame, layout: str, bucket) -> DataFrame:
        return df.groupBy(bucket.alias("bucket")).agg(
            F.count(F.lit(1)).alias("n"),
            F.min("sx").alias("fxmin"),
            F.max("sx").alias("fxmax"),
            F.min("sy").alias("fymin"),
            F.max("sy").alias("fymax"),
        ).select(F.lit(layout).alias("layout"), "*")

    ext = _extents(keyed, "zorder", F.expr(f"zv >> {_GRID_SHIFT}")).unionByName(
        _extents(keyed, "hour_sorted", F.expr("sy >> 2"))
    )
    preds = spark.createDataFrame(
        _PREDS, "pred string, xlo long, xhi long, ylo long, yhi long"
    )
    hit = (
        ext.crossJoin(F.broadcast(preds))
        .where(
            (F.col("fxmax") >= F.col("xlo"))
            & (F.col("fxmin") <= F.col("xhi"))
            & (F.col("fymax") >= F.col("ylo"))
            & (F.col("fymin") <= F.col("yhi"))
        )
        .groupBy("layout", "pred")
        .agg(
            F.count(F.lit(1)).alias("files_scanned"),
            F.sum("n").alias("rows_scanned"),
        )
    )
    return hit.orderBy("layout", "pred")


_Z_EXPR = zorder_sql(["sx", "sy"], _BITS)

_PRED_ROWS = " UNION ALL ".join(
    f"SELECT '{p}' AS pred, CAST({xlo} AS BIGINT) AS xlo,"
    f" CAST({xhi} AS BIGINT) AS xhi, CAST({ylo} AS BIGINT) AS ylo,"
    f" CAST({yhi} AS BIGINT) AS yhi"
    for p, xlo, xhi, ylo, yhi in _PREDS
)

_ZORDER_SQL = f"""
WITH base AS (
  SELECT user_id AS x, epoch_us(ts) // 3600000000 AS y FROM events
),
b AS (
  SELECT MIN(x) AS xmin, MAX(x) AS xmax, MIN(y) AS ymin, MAX(y) AS ymax
  FROM base
),
s AS (
  SELECT {_scaled('x', 'xmin', 'xmax')} AS sx,
         {_scaled('y', 'ymin', 'ymax')} AS sy
  FROM base, b
),
k AS (
  SELECT sx, sy, {_Z_EXPR} AS zv FROM s
),
ext AS (
  SELECT 'zorder' AS layout, zv >> {_GRID_SHIFT} AS bucket,
         CAST(COUNT(*) AS BIGINT) AS n,
         MIN(sx) AS fxmin, MAX(sx) AS fxmax,
         MIN(sy) AS fymin, MAX(sy) AS fymax
  FROM k GROUP BY 2
  UNION ALL
  SELECT 'hour_sorted' AS layout, sy >> 2 AS bucket,
         CAST(COUNT(*) AS BIGINT) AS n,
         MIN(sx) AS fxmin, MAX(sx) AS fxmax,
         MIN(sy) AS fymin, MAX(sy) AS fymax
  FROM k GROUP BY 2
),
preds AS ({_PRED_ROWS})
SELECT layout, pred,
       CAST(COUNT(*) AS BIGINT) AS files_scanned,
       CAST(SUM(n) AS BIGINT) AS rows_scanned
FROM ext, preds
WHERE fxmax >= xlo AND fxmin <= xhi AND fymax >= ylo AND fymin <= yhi
GROUP BY layout, pred
ORDER BY layout, pred
"""

QUERIES["zorder_pruning_stats"] = zorder_pruning_stats
ORACLE["zorder_pruning_stats"] = _ZORDER_SQL


# --------------------------------------------------------------------
# Incremental view maintenance under oracle: the two merge operators
# (operators/storage.py merge_aggregate / merge_join_view) were unit-
# tested only; these queries hash-verify the IVM identities against a
# FULL RECOMPUTE oracle — the property a 100 TB nightly pipeline rests
# on: maintaining the view from deltas equals rebuilding it.
#
# ivm_merge_hourly_counts: events split into a base (event_id % 10 <> 0)
# and a delta batch (% 10 = 0), each aggregated independently to
# (hour, event_type) partials, merged by merge_aggregate — must equal
# the plain GROUP BY over the whole table. The double `value` column
# is floored to integer cents per row BEFORE summation so both the
# merge order and the engine agree exactly (the repo's fixed-point
# determinism rule).
#
# ivm_join_view_delta: orders x lineitem inner-join view with
# append-only deltas on BOTH sides (different split predicates so all
# three delta terms dA⋈B, A⋈dB, dA⋈dB are non-empty). base view rows +
# merge_join_view's delta rows, aggregated per order priority, must
# equal the join of the complete tables.
# --------------------------------------------------------------------
def ivm_merge_hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from goconnect_spark.operators.storage import merge_aggregate

    ev = load(spark, "events", sf_dir).select(
        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("hour"),
        "event_type",
        "event_id",
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    )

    def partial(df):
        return df.groupBy("hour", "event_type").agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("cents").cast("long").alias("cents"),
        )

    base = partial(ev.where(F.col("event_id") % 10 != 0))
    delta = partial(ev.where(F.col("event_id") % 10 == 0))
    merged = merge_aggregate(base, delta, ["hour", "event_type"], ["n", "cents"])
    return merged.select(
        "hour", "event_type", F.col("n").cast("bigint").alias("n"),
        F.col("cents").cast("bigint").alias("cents"),
    ).orderBy("hour", "event_type")


_IVM_AGG_SQL = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS cents
FROM events
GROUP BY 1, 2
ORDER BY hour, event_type
"""

QUERIES["ivm_merge_hourly_counts"] = ivm_merge_hourly_counts
ORACLE["ivm_merge_hourly_counts"] = _IVM_AGG_SQL


def ivm_join_view_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from goconnect_spark.operators.storage import merge_join_view

    orders = load(spark, "orders", sf_dir).select(
        "o_orderkey", "o_orderpriority"
    )
    li = load(spark, "lineitem", sf_dir).select(
        F.col("l_orderkey").alias("o_orderkey"),
        F.col("l_quantity").cast("bigint").alias("qty"),
    )
    base_a = orders.where(F.col("o_orderkey") % 20 != 0)
    delta_a = orders.where(F.col("o_orderkey") % 20 == 0)
    base_b = li.where(F.col("o_orderkey") % 7 != 3)
    delta_b = li.where(F.col("o_orderkey") % 7 == 3)

    view = base_a.join(base_b, "o_orderkey").unionByName(
        merge_join_view(base_a, base_b, delta_a, delta_b, ["o_orderkey"])
    )
    return (
        view.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum("qty").cast("bigint").alias("sum_qty"),
        )
        .orderBy("o_orderpriority")
    )


_IVM_JOIN_SQL = """
SELECT o.o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority
ORDER BY o.o_orderpriority
"""

QUERIES["ivm_join_view_delta"] = ivm_join_view_delta
ORACLE["ivm_join_view_delta"] = _IVM_JOIN_SQL
