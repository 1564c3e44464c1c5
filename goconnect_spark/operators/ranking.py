"""Scale-safe global ranking primitives.

The naive `Window.orderBy(...)` with no PARTITION BY funnels the whole
input through ONE task — the classic single-reducer bottleneck that a
100 TB fact (or even a 100x customer dimension) cannot survive. These
helpers implement the standard two-phase alternative (the pattern
proven by queries/relational.py:customer_spend_ranks and
queries/packing.py's cumsum):

  1. `repartitionByRange` on the sort key — every partition holds a
     contiguous key range, so partition id order IS global sort order;
  2. a CONSTANT-size window over the ~shuffle-partitions-many
     per-partition counts yields each partition's global row offset;
  3. the data-sized `row_number` window is PARTITIONED BY pid — fully
     parallel — and `offset + local row_number` is the exact global
     row number.

With a total order (callers must include a unique tiebreak column),
rank = dense_rank = row_number, percent_rank = (rn-1)/(n-1), and
NTILE(k) is the closed-form `ntile_from_rn` below — so the entire
global-ranking family costs one range shuffle, never one task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def global_row_number(
    df: DataFrame,
    order_cols,
    rn_col: str = "rn",
    n_col: str = "n_total",
    with_total: bool = True,
) -> DataFrame:
    """Add the exact global row number `rn_col` (1-based) of each row
    under the total order `order_cols`, plus the global row count
    `n_col`, without any unpartitioned data-sized window.

    `order_cols` must define a TOTAL order (include a unique tiebreak
    column) — with duplicate sort keys the result is still a valid
    row_number but tie order follows the range partitioning.

    ``with_total=False`` skips the 1-row global-count crossJoin
    (and the `n_col` column) for consumers that only need the row
    number — e.g. dictionary encoding — keeping their plans free of
    even the benign 1-row BroadcastNestedLoopJoin.

    Cost: one range shuffle of `df`; the only unpartitioned window
    runs over the per-partition counts (== shuffle partitions, ~32
    rows); offsets and the 1-row count join back as broadcasts. The
    range exchange is reused across the three consumers (counts,
    offsets, main), so the input is shuffled once.
    """
    order_cols = list(order_cols)
    ranged = df.repartitionByRange(*order_cols).withColumn(
        "__pid", F.spark_partition_id()
    )
    counts = ranged.groupBy("__pid").agg(F.count(F.lit(1)).alias("__pcnt"))
    w_off = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "__pid", F.coalesce(F.sum("__pcnt").over(w_off), F.lit(0)).alias("__poff")
    )
    w_in = Window.partitionBy("__pid").orderBy(*order_cols)
    out = ranged.join(F.broadcast(offsets), "__pid").withColumn(
        rn_col, F.col("__poff") + F.row_number().over(w_in)
    )
    if with_total:
        total = counts.agg(F.sum("__pcnt").alias(n_col))
        out = out.crossJoin(F.broadcast(total))
    return out.drop("__pid", "__poff")


def ntile_from_rn(k: int, rn_col: str = "rn", n_col: str = "n_total"):
    """Closed-form NTILE(k) of global row number `rn_col` over
    `n_col` rows — the exact SQL NTILE definition (equal buckets,
    remainder distributed to the leading buckets): with n = q*k + r,
    tiles 1..r hold q+1 rows, tiles r+1..k hold q rows.

    The CASE keeps the q=0 division branch unevaluated when n < k
    (every row then lands in the first branch: tile = rn).
    """
    k = int(k)
    q = f"({n_col} DIV {k})"
    r = f"({n_col} % {k})"
    return F.expr(
        f"""CASE WHEN {rn_col} <= {r} * ({q} + 1)
                 THEN ({rn_col} + {q}) DIV ({q} + 1)
                 ELSE {r} + ({rn_col} - {r} * ({q} + 1) + {q} - 1) DIV {q}
            END"""
    )
