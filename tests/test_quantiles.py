"""operators/quantiles.py — the guarantees the catalog certificate
can't isolate: the rank-error bound on adversarial/random data, block
invariance (same data, different block layout -> same bound), and
degenerate inputs (constants, ties, tiny groups, NaN/NULL)."""

from __future__ import annotations

import random

import pyspark.sql.functions as F
import pytest

from goconnect_spark.operators.quantiles import (
    block_summaries,
    merge_quantiles,
    stride_quantiles,
)

_QS = [("est_p50", 1, 2), ("est_p90", 9, 10), ("est_p99", 99, 100)]


def _mk(spark, rows):
    return spark.createDataFrame(rows, "key string, id long, v double")


def _rank_of(values, x):
    """1-based rank of estimate x in the sorted multiset (first
    position where it appears — x is always a data value)."""
    s = sorted(values)
    return s.index(x) + 1


def _check_bounds(spark, values, k, n_blocks):
    rows = [("a", i, float(v)) for i, v in enumerate(values)]
    df = _mk(spark, rows).withColumn("blk", F.col("id") % n_blocks)
    out = stride_quantiles(df, ["key"], "v", "id", "blk", k, _QS).collect()[0]
    n = len(values)
    assert out.n == n
    # per-block stride m_b <= ceil(ceil(n/n_blocks)/k) + 1; summed
    # worst-case rank slack is sum(m_b) (one stride per block)
    import math

    max_block = math.ceil(n / n_blocks)
    m = math.ceil(max_block / k)
    slack = n_blocks * m
    for name, num, den in _QS:
        target = math.ceil(n * num / den)
        est = getattr(out, name)
        r = _rank_of(values, est)
        assert target - slack <= r <= target + slack, (
            f"{name}: rank {r} vs target {target} +- {slack}"
        )


def test_rank_error_random(spark):
    rng = random.Random(7)
    values = [rng.uniform(-100, 100) for _ in range(5000)]
    _check_bounds(spark, values, k=32, n_blocks=8)


def test_rank_error_sorted_and_skewed(spark):
    values = sorted(float(i) for i in range(3000))
    _check_bounds(spark, values, k=16, n_blocks=4)
    rng = random.Random(11)
    skew = [rng.expovariate(1.0) ** 3 for _ in range(4000)]
    _check_bounds(spark, skew, k=32, n_blocks=8)


def test_block_layout_changes_only_within_bound(spark):
    rng = random.Random(3)
    values = [rng.gauss(0, 10) for _ in range(2000)]
    for nb in (1, 4, 16):
        _check_bounds(spark, values, k=32, n_blocks=nb)


def test_exact_when_k_covers_block(spark):
    # k >= block size -> stride m=1 -> summary holds everything ->
    # estimates are the exact discrete quantiles
    values = [float(v) for v in range(100)]
    rows = [("a", i, v) for i, v in enumerate(values)]
    df = _mk(spark, rows).withColumn("blk", F.col("id") % 4)
    out = stride_quantiles(df, ["key"], "v", "id", "blk", 1000, _QS).collect()[0]
    assert out.est_p50 == 49.0 and out.est_p90 == 89.0 and out.est_p99 == 98.0


def test_constant_column_and_ties(spark):
    rows = [("a", i, 5.0) for i in range(500)]
    df = _mk(spark, rows).withColumn("blk", F.col("id") % 8)
    out = stride_quantiles(df, ["key"], "v", "id", "blk", 8, _QS).collect()[0]
    assert out.est_p50 == out.est_p90 == out.est_p99 == 5.0
    assert out.n == 500


def test_tiny_groups_and_null_nan_excluded(spark):
    rows = [
        ("a", 0, 1.0), ("a", 1, None), ("a", 2, float("nan")),
        ("b", 0, 9.0),
    ]
    df = _mk(spark, rows).withColumn("blk", F.col("id") % 2)
    out = {r.key: r for r in
           stride_quantiles(df, ["key"], "v", "id", "blk", 4, _QS).collect()}
    assert out["a"].n == 1 and out["a"].est_p99 == 1.0
    assert out["b"].n == 1 and out["b"].est_p50 == 9.0


def test_summary_state_is_bounded(spark):
    rows = [("a", i, float(i % 97)) for i in range(10000)]
    df = _mk(spark, rows).withColumn("blk", F.col("id") % 8)
    s = block_summaries(df, ["key"], "v", "id", "blk", 32)
    per_block = s.groupBy("key", "__blk").count().collect()
    assert all(r["count"] <= 32 for r in per_block)
    # and the merge still answers from that bounded state
    out = merge_quantiles(s, ["key"], _QS).collect()[0]
    assert out.n == 10000


def test_compact_preserves_mass_and_bounds(spark):
    rng = random.Random(5)
    pts = [("a", 0, rng.uniform(0, 1000), rng.randint(1, 5)) for _ in range(500)]
    df = spark.createDataFrame(pts, "key string, __blk int, __v double, __w long")
    from goconnect_spark.operators.quantiles import compact_summary

    out = compact_summary(df, ["key"], 16).collect()
    assert len(out) <= 17
    assert sum(r["__w"] for r in out) == sum(p[3] for p in pts)
    # max value survives (last-point rule)
    assert max(r["__v"] for r in out) == max(p[2] for p in pts)
    # every weight positive
    assert all(r["__w"] >= 1 for r in out)


def test_sequential_compaction_error_accumulates_bounded(spark):
    import math

    rng = random.Random(9)
    values = [rng.uniform(-50, 50) for _ in range(4000)]
    k = 64
    from goconnect_spark.operators.quantiles import (
        block_summaries,
        compact_summary,
        merge_quantiles,
    )

    state = None
    T = 4
    for b in range(T):
        chunk = values[b::T]
        rows = [("a", i, float(v)) for i, v in enumerate(chunk)]
        df = _mk(spark, rows).withColumn("blk", F.col("id") % 8)
        pts = block_summaries(df, ["key"], "v", "id", "blk", k)
        allp = pts if state is None else state.unionByName(pts)
        state = compact_summary(allp, ["key"], k).localCheckpoint()
    out = merge_quantiles(state, ["key"], _QS).collect()[0]
    n = len(values)
    assert out.n == n
    # each of T compactions adds <= one stride s ~ ceil(n/k); builds
    # add <= one block stride each — generous envelope 2*T*ceil(n/k)
    slack = 2 * T * math.ceil(n / k)
    for name, num, den in _QS:
        target = math.ceil(n * num / den)
        r = _rank_of(values, getattr(out, name))
        assert target - slack <= r <= target + slack, (
            f"{name}: rank {r} vs {target} +- {slack}"
        )


def test_compact_collapses_equal_values_first(spark):
    # 10 points of the same value with varying weights must become
    # exactly ONE point carrying the summed weight
    pts = [("a", b, 7.0, w) for b, w in enumerate([1, 2, 3, 4, 5, 1, 2, 3, 4, 5])]
    df = spark.createDataFrame(pts, "key string, __blk int, __v double, __w long")
    from goconnect_spark.operators.quantiles import compact_summary

    out = compact_summary(df, ["key"], 4).collect()
    assert len(out) == 1 and out[0]["__v"] == 7.0 and out[0]["__w"] == 30


def test_compact_is_permutation_invariant(spark):
    # the oracle replay depends on compaction being a pure function
    # of the summary MULTISET — row arrival order must not matter
    rng = random.Random(13)
    pts = [("a", b % 6, round(rng.uniform(0, 100), 2), rng.randint(1, 4))
           for b in range(300)]
    from goconnect_spark.operators.quantiles import compact_summary

    outs = []
    for perm in range(3):
        shuffled = list(pts)
        random.Random(perm).shuffle(shuffled)
        df = spark.createDataFrame(
            shuffled, "key string, __blk int, __v double, __w long"
        ).repartition(4 + perm)
        out = compact_summary(df, ["key"], 12).collect()
        outs.append(sorted((r["__v"], r["__w"]) for r in out))
    assert outs[0] == outs[1] == outs[2]
