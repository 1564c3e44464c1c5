"""Mergeable quantile summaries — the distributed-percentile
primitive the sketch family was missing.

An exact percentile needs the whole sorted column in one place; at
100 TB that is the one aggregation you cannot run. Every production
engine instead maintains a bounded WEIGHTED SUMMARY per partition
(GK summaries, t-digest, KLL all share the shape) and merges
summaries associatively. This module implements the deterministic
member of that family — the weighted stride sample:

- build(key, block): sort the block's values, keep every m-th by
  rank where m = ceil(n_block / k); a kept point carries weight m
  (the rank interval it covers, the last point the remainder).
  State per block is <= k points regardless of block size.
- merge(key): union the block summaries, re-sort by value, take the
  running weight sum; the estimate for quantile q is the first point
  whose cumulative weight reaches ceil(q * n). Rank error is bounded
  by the strides: at most sum_b(m_b)/2 ~ n_blocks * max_m / 2,
  i.e. choose k ~ n_block/eps for rank error eps*n_block per block.

Why THIS member: t-digest and KLL are randomized (or
arrival-order-dependent), which breaks cross-engine value gates; the
stride summary is a pure function of the value MULTISET (ties broken
by an explicit id column), so an independent implementation on
another engine must reproduce it bit-for-bit — the property the
catalog certificate exploits. Everything is window + filter +
conditional aggregation: JVM codegen end to end, one shuffle to
(key, block), merge input is k * n_blocks rows per key.

Reference parity: the reference has no aggregation surface at all
(SURVEY §2.8); this extends the Fold family the way a goconnect
user would need for percentile monitoring over an unbounded stream.
"""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def block_summaries(
    df: DataFrame,
    key_cols: Sequence[str],
    value_col: str,
    id_col: str,
    block_col: str,
    k: int,
) -> DataFrame:
    """Per-(key, block) weighted stride summaries: <= k rows per
    block, each (value, weight) with weight = covered rank span.
    NULL and NaN values are excluded up front (both engines sort
    them idiosyncratically; a quantile over them is undefined)."""
    keys = list(key_cols)
    clean = df.where(
        F.col(value_col).isNotNull() & ~F.isnan(F.col(value_col))
    )
    w = Window.partitionBy(*keys, block_col).orderBy(value_col, id_col)
    wb = Window.partitionBy(*keys, block_col)
    ranked = clean.select(
        *keys,
        F.col(block_col).alias("__blk"),
        F.col(value_col).alias("__v"),
        F.row_number().over(w).alias("__rn"),
        F.count(F.lit(1)).over(wb).alias("__cnt"),
    ).withColumn("__m", F.expr(f"(__cnt + {k} - 1) DIV {k}"))
    return ranked.where((F.col("__rn") - 1) % F.col("__m") == 0).select(
        *keys,
        "__blk",
        "__v",
        F.least(F.col("__m"), F.col("__cnt") - F.col("__rn") + 1).alias("__w"),
    )


def merge_quantiles(
    summaries: DataFrame,
    key_cols: Sequence[str],
    quantiles: Sequence[tuple[str, int, int]],
) -> DataFrame:
    """Merge block summaries per key and read off quantile estimates.
    quantiles = (out_name, num, den) fractions, evaluated as the
    first summary point whose running weight reaches
    ceil(n * num / den) — integer targets, no float rank math."""
    keys = list(key_cols)
    wc = Window.partitionBy(*keys).orderBy("__v", "__blk").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = summaries.select(
        *keys, "__v", F.sum("__w").over(wc).alias("__cw")
    )
    wn = Window.partitionBy(*keys)
    cum = cum.withColumn("__n", F.max("__cw").over(wn))
    aggs = [F.max("__n").cast("long").alias("n")]
    for name, num, den in quantiles:
        target = F.expr(f"(__n * {num} + {den} - 1) DIV {den}")
        aggs.append(
            F.min(F.when(F.col("__cw") >= target, F.col("__v"))).alias(name)
        )
    return cum.groupBy(*keys).agg(*aggs)


def stride_quantiles(
    df: DataFrame,
    key_cols: Sequence[str],
    value_col: str,
    id_col: str,
    block_col: str,
    k: int,
    quantiles: Sequence[tuple[str, int, int]],
) -> DataFrame:
    """build + merge in one call (the batch convenience form; a
    streaming deployment keeps block_summaries as its per-shard
    state and runs merge_quantiles on read)."""
    return merge_quantiles(
        block_summaries(df, key_cols, value_col, id_col, block_col, k),
        key_cols,
        quantiles,
    )


def compact_summary(
    summaries: DataFrame,
    key_cols: Sequence[str],
    k: int,
) -> DataFrame:
    """Recompress a weighted summary to <= k+1 points per key — the
    compaction step that turns the stride summary into a STREAMING
    sketch (state stays O(k) as batches keep merging in, the KLL
    compactor's job).

    Deterministic in the summary MULTISET: equal values collapse
    first (all mass at one value is interchangeable for quantiles,
    and collapsing removes the only tie ambiguity), then points are
    re-strided by cumulative weight — a point survives when its
    weight interval (cw-w, cw] crosses a stride boundary j*s,
    s = ceil(W/k), and the LAST point always survives (preserves the
    max and the total mass W). A surviving point's new weight is the
    gap to the previous survivor, so weights still sum to W exactly.

    Each compaction adds at most s-1 rank error; sequential
    per-batch compaction over T batches accumulates ~T*s, so a
    streaming deployment sizes k to its tolerance/batch horizon
    (the production pattern is per-shard build + ONE merge, where
    the error stays a single stride per shard).
    """
    keys = list(key_cols)
    g = summaries.groupBy(*keys, "__v").agg(F.sum("__w").alias("__w"))
    wc = Window.partitionBy(*keys).orderBy("__v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wn = Window.partitionBy(*keys)
    cum = g.select(*keys, "__v", "__w", F.sum("__w").over(wc).alias("__cw"))
    # __tw, not __W: Spark resolves column names case-insensitively
    # by default, so a column named __W would silently REPLACE __w
    cum = cum.withColumn("__tw", F.max("__cw").over(wn)).withColumn(
        "__s", F.expr(f"(__tw + {k} - 1) DIV {k}")
    )
    kept = cum.where(
        (F.expr("__cw DIV __s") > F.expr("(__cw - __w) DIV __s"))
        | (F.col("__cw") == F.col("__tw"))
    )
    wk = Window.partitionBy(*keys).orderBy("__v")
    return kept.select(
        *keys,
        F.lit(0).alias("__blk"),
        "__v",
        (F.col("__cw") - F.coalesce(
            F.lag("__cw").over(wk), F.lit(0)
        )).alias("__w"),
    )
