"""Salted-join skew mitigation: correctness vs the plain join, and
key-spreading across partitions."""

import pyspark.sql.functions as F

from goconnect_spark.operators.joins import salted_join


def _skewed(spark):
    # one pathological key (90% of rows) + a uniform tail
    hot = spark.range(9000).select(F.lit(1).alias("k"), F.col("id").alias("v"))
    tail = spark.range(1000).select((F.col("id") % 50 + 2).alias("k"), F.col("id").alias("v"))
    return hot.union(tail)


def test_salted_join_matches_plain_join(spark):
    large = _skewed(spark)
    small = spark.range(60).select((F.col("id") + 1).alias("k"), (F.col("id") * 10).alias("w"))
    got = salted_join(large, small, ["k"], n_salts=8, salt_source="v")
    want = large.join(small, "k")
    assert got.count() == want.count()
    gs = got.groupBy("k").agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv"))
    ws = want.groupBy("k").agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv"))
    assert {(r.k, r.n, r.sv) for r in gs.collect()} == {(r.k, r.n, r.sv) for r in ws.collect()}


def test_salt_spreads_hot_key(spark):
    large = _skewed(spark)
    salted = large.withColumn("__salt", F.pmod(F.hash("v"), F.lit(8)))
    spread = (
        salted.where(F.col("k") == 1)
        .groupBy("__salt")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert len(spread) == 8  # the hot key occupies all salt buckets
    counts = [r.n for r in spread]
    assert max(counts) < 9000 * 0.25  # no bucket holds the whole key


def test_salted_outer_join(spark):
    large = _skewed(spark)
    # small side missing some keys -> left join keeps unmatched rows
    small = spark.range(5).select((F.col("id") + 1).alias("k"), F.lit("x").alias("w"))
    got = salted_join(large, small, ["k"], n_salts=4, how="left", salt_source="v")
    want = large.join(small, "k", "left")
    assert got.count() == want.count()
    assert got.where(F.col("w").isNull()).count() == want.where(F.col("w").isNull()).count()


def test_salted_join_rejects_right_and_full(spark):
    """ADVICE r1: right/full outer would duplicate unmatched small-side
    rows n_salts times (small side is exploded per salt) — refuse."""
    import pytest
    from goconnect_spark.operators.joins import salted_join

    large = spark.createDataFrame([(1, "a")], ["k", "v"])
    small = spark.createDataFrame([(1, "x"), (2, "y")], ["k", "w"])
    for how in ("right", "full", "outer", "full_outer", "right_outer"):
        with pytest.raises(ValueError, match="salted_join"):
            salted_join(large, small, ["k"], n_salts=4, how=how)
    # allowed modes still work and don't duplicate
    out = salted_join(large, small, ["k"], n_salts=4, how="left").collect()
    assert len(out) == 1


def test_aqe_splits_skewed_join(spark):
    """The SCALING.md skew story's other half: moderate skew needs no
    salting — AQE detects the oversized partition and splits it
    (OptimizeSkewedJoin), visible as skew=true on the join node."""
    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        import pyspark.sql.functions as F

        # 90% of the fact rows share key 0 -> one hot partition
        big = spark.range(0, 300_000).selectExpr(
            "CASE WHEN id % 10 < 9 THEN CAST(0 AS BIGINT) ELSE id END AS k", "id AS v"
        )
        dim = spark.range(0, 300_000, 500).selectExpr("id AS k", "id * 2 AS w")
        j = big.join(dim.hint("merge"), "k").groupBy().agg(F.count(F.lit(1)).alias("n"))
        j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


# ----------------------------------------------------------------
# interval_join: binned range join
# ----------------------------------------------------------------
from goconnect_spark.operators.joins import interval_join  # noqa: E402


def _points_and_intervals(spark):
    # points at 0..999; intervals of mixed lengths, some overlapping,
    # some empty, ends inclusive, plus boundary-exact cases
    pts = spark.range(1000).select(F.col("id").alias("pt"), (F.col("id") % 7).alias("grp"))
    iv = spark.createDataFrame(
        [
            (1, 0, 9),        # bin-aligned
            (2, 5, 5),        # single point
            (3, 95, 214),     # spans 3+ bins
            (4, 990, 2000),   # runs past the data
            (5, -50, -10),    # entirely before (no matches)
            (6, 100, 99),     # degenerate (start > end -> empty)
        ],
        "iv_id long, s long, e long",
    )
    return pts, iv


def test_interval_join_matches_naive_range_join(spark):
    pts, iv = _points_and_intervals(spark)
    got = interval_join(pts, iv, "pt", "s", "e", bin_width=100)
    want = pts.join(iv, (F.col("pt") >= F.col("s")) & (F.col("pt") <= F.col("e")))
    g = {(r.pt, r.iv_id) for r in got.collect()}
    w = {(r.pt, r.iv_id) for r in want.collect()}
    assert g == w and len(g) > 0
    # duplicate-free by construction: each pair meets in exactly one bin
    assert got.count() == len(g)


def test_interval_join_no_nested_loop_plan(spark):
    pts, iv = _points_and_intervals(spark)
    got = interval_join(pts, iv, "pt", "s", "e", bin_width=100)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_interval_join_extra_on_keys(spark):
    pts, _ = _points_and_intervals(spark)
    iv = spark.createDataFrame(
        [(10, 0, 500, 3), (11, 0, 500, 4)], "iv_id long, s long, e long, grp long"
    )
    got = interval_join(pts, iv, "pt", "s", "e", bin_width=128, extra_on=["grp"])
    want = pts.join(
        iv, (F.col("pt") >= F.col("s")) & (F.col("pt") <= F.col("e")), "inner"
    ).where(pts.grp == iv.grp)
    assert {(r.pt, r.iv_id) for r in got.collect()} == {
        (r.pt, r.iv_id) for r in want.collect()
    }


def test_interval_join_guards_degenerate_intervals(spark):
    import pytest as _pytest

    pts, _ = _points_and_intervals(spark)
    iv = spark.createDataFrame([(1, 0, 10_000_000)], "iv_id long, s long, e long")
    with _pytest.raises(Exception, match="too many bins|ASSERT"):
        interval_join(pts, iv, "pt", "s", "e", bin_width=10, max_bins_per_interval=100).collect()


def test_interval_join_rejects_bad_bin_width(spark):
    import pytest as _pytest

    pts, iv = _points_and_intervals(spark)
    with _pytest.raises(ValueError):
        interval_join(pts, iv, "pt", "s", "e", bin_width=0)


def test_interval_join_property_random_corpora(spark):
    # randomized-but-seeded corpora: binned join must equal the naive
    # range join pair-for-pair across messy layouts (dense overlaps,
    # negative coords, bin-edge-straddling intervals)
    import random

    rng = random.Random(42)
    for trial in range(3):
        pts_rows = [(i, rng.randint(-500, 1500)) for i in range(300)]
        iv_rows = []
        for j in range(80):
            s = rng.randint(-600, 1400)
            iv_rows.append((j, s, s + rng.randint(0, 250)))
        pts = spark.createDataFrame(pts_rows, "pid long, pt long")
        iv = spark.createDataFrame(iv_rows, "iv_id long, s long, e long")
        bw = rng.choice([7, 64, 100, 333])
        got = interval_join(pts, iv, "pt", "s", "e", bin_width=bw)
        want = pts.join(iv, (F.col("pt") >= F.col("s")) & (F.col("pt") <= F.col("e")))
        g = sorted((r.pid, r.iv_id) for r in got.collect())
        w = sorted((r.pid, r.iv_id) for r in want.collect())
        assert g == w, f"trial={trial} bw={bw}"


def test_asof_join_matches_pandas_merge_asof(spark):
    import pandas as pd

    from goconnect_spark.operators.joins import asof_join

    import random
    rng = random.Random(17)
    trades = [
        (f"k{rng.randrange(3)}", rng.randrange(1000), i) for i in range(120)
    ]
    quotes = [
        (f"k{rng.randrange(3)}", rng.randrange(1000), 100 + i) for i in range(40)
    ]
    # unique times per key on the right (documented tie contract)
    seen = set()
    quotes = [q for q in quotes if (q[0], q[1]) not in seen and not seen.add((q[0], q[1]))]

    left = spark.createDataFrame(trades, "key: string, t: long, trade_id: long")
    right = spark.createDataFrame(quotes, "key: string, qt: long, quote_id: long")
    got = {
        (r.key, r.t, r.trade_id): r.quote_id_asof
        for r in asof_join(
            left, right, on=["key"], left_time="t", right_time="qt",
            value_cols=["quote_id"],
        ).collect()
    }

    lpd = pd.DataFrame(trades, columns=["key", "t", "trade_id"]).sort_values("t")
    rpd = pd.DataFrame(quotes, columns=["key", "qt", "quote_id"]).sort_values("qt")
    m = pd.merge_asof(
        lpd, rpd, left_on="t", right_on="qt", by="key",
        direction="backward", allow_exact_matches=True,
    )
    want = {
        (r.key, int(r.t), int(r.trade_id)): (None if pd.isna(r.quote_id) else int(r.quote_id))
        for r in m.itertuples()
    }
    assert got == want
    assert len(got) == len(trades)


def test_asof_join_carries_whole_right_rows(spark):
    # a right row with NULL in ONE of several value_cols must still
    # supply ALL carried values (pandas merge_asof whole-row
    # semantics) — a per-column last(ignorenulls) would fill the NULL
    # column from an OLDER right row, mixing rows
    import pandas as pd

    from goconnect_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [("a", 10, 1), ("a", 20, 2), ("a", 30, 3)],
        "key: string, t: long, trade_id: long",
    )
    right = spark.createDataFrame(
        [("a", 5, "x", 100), ("a", 15, None, 200), ("a", 25, "z", None)],
        "key: string, qt: long, v1: string, v2: long",
    )
    got = {
        r.t: (r.v1_asof, r.v2_asof)
        for r in asof_join(
            left, right, on=["key"], left_time="t", right_time="qt",
            value_cols=["v1", "v2"],
        ).collect()
    }
    assert got == {10: ("x", 100), 20: (None, 200), 30: ("z", None)}

    lpd = left.toPandas().sort_values("t")
    rpd = right.toPandas().sort_values("qt")
    m = pd.merge_asof(
        lpd, rpd, left_on="t", right_on="qt", by="key",
        direction="backward", allow_exact_matches=True,
    )
    want = {
        int(r.t): (
            None if pd.isna(r.v1) else r.v1,
            None if pd.isna(r.v2) else int(r.v2),
        )
        for r in m.itertuples()
    }
    assert got == want


def test_fuzzy_self_join_lev1_exact_neighborhood(spark):
    """Deletion-neighborhood blocking must find EVERY distance<=1 pair
    (insert / delete / substitute / exact dup) and nothing at
    distance 2 — verified against brute-force levenshtein over all
    pairs."""
    from goconnect_spark.operators.joins import fuzzy_self_join_lev1

    rows = [
        (1, "spark"), (2, "spark"),    # exact duplicate
        (3, "sparks"),                 # insertion
        (4, "spak"),                   # deletion
        (5, "snark"),                  # substitution
        (6, "sharks"),                 # distance 2 from spark
        (7, "flink"),                  # unrelated
    ]
    df = spark.createDataFrame(rows, "id long, name string")
    got = {
        (r.id_a, r.id_b)
        for r in fuzzy_self_join_lev1(df, "id", "name").collect()
    }
    import itertools

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    want = {
        (a, b)
        for (a, sa), (b, sb) in itertools.combinations(rows, 2)
        if lev(sa, sb) <= 1
    }
    assert got == want
