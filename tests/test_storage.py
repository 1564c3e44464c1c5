"""Compaction: many small files in, few scanner-sized files out, same
rows; a sorted rewrite leaves per-file disjoint min/max ranges so
selective scans prune files."""

import os

from goconnect_spark.operators.storage import compact_parquet


def _parquet_files(d):
    return [
        os.path.join(r, f)
        for r, _, fs in os.walk(d)
        for f in fs
        if f.endswith(".parquet")
    ]


def test_compact_parquet_reduces_files_preserves_rows(spark, sf_dir, tmp_path):
    src = str(tmp_path / "small")
    out = str(tmp_path / "compact")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    li.repartition(40).write.parquet(src)  # simulate a small-files mess
    assert len(_parquet_files(src)) == 40

    n = compact_parquet(spark, src, out, target_file_bytes=1 << 30)
    assert n == 1  # everything fits one target-sized file
    assert spark.read.parquet(out).count() == li.count()


def test_compact_sorted_rewrite_gives_disjoint_zone_maps(spark, sf_dir, tmp_path):
    src = str(tmp_path / "small2")
    out = str(tmp_path / "sorted")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ev.repartition(20).write.parquet(src)

    compact_parquet(spark, src, out, n_files=4, sort_by=["event_id"])
    files = _parquet_files(out)
    assert len(files) == 4
    # per-file [min, max] of the sort key must not overlap: that is
    # what lets a point/range predicate skip whole files
    ranges = []
    for f in files:
        df = spark.read.parquet(f)
        row = df.selectExpr("min(event_id) lo", "max(event_id) hi").collect()[0]
        ranges.append((row.lo, row.hi))
    ranges.sort()
    for (_, hi1), (lo2, _) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2
    assert spark.read.parquet(out).count() == ev.count()


def test_merge_aggregate_equals_full_recompute(spark, sf_dir):
    import pyspark.sql.functions as F

    from goconnect_spark.operators.storage import merge_aggregate

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    old = li.where("l_orderkey % 5 != 0")
    new = li.where("l_orderkey % 5 = 0")
    grain = ["l_returnflag", "l_linestatus"]
    aggd = lambda df: df.groupBy(*grain).agg(
        F.sum("l_quantity").alias("qty"), F.count(F.lit(1)).cast("long").alias("n")
    )
    merged = {
        (r.l_returnflag, r.l_linestatus): (round(r.qty, 6), r.n)
        for r in merge_aggregate(aggd(old), aggd(new), grain, ["qty", "n"]).collect()
    }
    full = {
        (r.l_returnflag, r.l_linestatus): (round(r.qty, 6), r.n)
        for r in aggd(li).collect()
    }
    assert merged == full


def test_compact_parquet_refuses_in_place(spark, sf_dir, tmp_path):
    # overwrite-into-source would delete the input before the lazy
    # read runs; the guard must reject it (including a relative-path
    # alias of the same dir) and leave the data untouched
    import pytest

    src = str(tmp_path / "inplace")
    spark.read.parquet(f"{sf_dir}/region.parquet").write.parquet(src)
    before = spark.read.parquet(src).count()
    with pytest.raises(ValueError, match="out_dir must differ"):
        compact_parquet(spark, src, src)
    with pytest.raises(ValueError, match="out_dir must differ"):
        compact_parquet(spark, src, src + os.sep + "." + os.sep)
    assert spark.read.parquet(src).count() == before


def test_zorder_layout_prunes_both_dimensions(spark, sf_dir, tmp_path):
    # Write the events table twice — Z-ordered on (user_id, hour) vs
    # range-sorted on hour alone — then simulate parquet min/max file
    # pruning for a 2-D box predicate. The Z layout must touch fewer
    # files for a user-side predicate (the hour sort can never prune
    # it) while preserving every row.
    import pyspark.sql.functions as F

    from goconnect_spark.operators.storage import zorder_layout
    from goconnect_spark.tables import load

    ev = load(spark, "events", sf_dir).select(
        "event_id",
        "user_id",
        F.expr("unix_micros(ts) DIV 3600000000").alias("hour"),
    )
    n_rows = ev.count()
    z_dir, t_dir = str(tmp_path / "z"), str(tmp_path / "t")
    zorder_layout(ev, ["user_id", "hour"], bits=8, n_files=16).write.parquet(z_dir)
    ev.repartitionByRange(16, "hour").sortWithinPartitions("hour").write.parquet(t_dir)

    lo_u, hi_u, lo_h, hi_h = ev.agg(
        F.expr("min(user_id) + (max(user_id) - min(user_id)) * 4 DIV 8"),
        F.expr("min(user_id) + (max(user_id) - min(user_id)) * 5 DIV 8"),
        F.expr("min(hour) + (max(hour) - min(hour)) * 4 DIV 8"),
        F.expr("min(hour) + (max(hour) - min(hour)) * 5 DIV 8"),
    ).first()

    def files_hit(path, ulo, uhi, hlo, hhi):
        ext = (
            spark.read.parquet(path)
            .groupBy(F.input_file_name().alias("f"))
            .agg(
                F.min("user_id").alias("umin"),
                F.max("user_id").alias("umax"),
                F.min("hour").alias("hmin"),
                F.max("hour").alias("hmax"),
            )
            .collect()
        )
        total = len(ext)
        hit = sum(
            1
            for r in ext
            if r.umax >= ulo and r.umin <= uhi and r.hmax >= hlo and r.hmin <= hhi
        )
        return hit, total

    assert spark.read.parquet(z_dir).count() == n_rows

    z_user, z_total = files_hit(z_dir, lo_u, hi_u, float("-inf"), float("inf"))
    t_user, t_total = files_hit(t_dir, lo_u, hi_u, float("-inf"), float("inf"))
    # hour-sorted files each span the full user range: zero pruning
    assert t_user == t_total
    assert z_user < t_user

    # the Z layout also prunes the hour dimension (bounded loss on
    # every clustered dim — the multi-dimensional tradeoff); the
    # conjunction is at most the user-band cost
    z_hour, _ = files_hit(z_dir, float("-inf"), float("inf"), lo_h, hi_h)
    assert z_hour < z_total
    z_both, _ = files_hit(z_dir, lo_u, hi_u, lo_h, hi_h)
    assert z_both <= z_user


def test_zorder_sql_matches_python_interleave(spark):
    # The SQL interleave must equal the reference Python Morton code
    # for every dimension count it claims to support — and wrap (not
    # scramble) out-of-range inputs via the mask.
    import random

    from goconnect_spark.operators.storage import zorder_sql

    def morton(vals, bits, d):
        z = 0
        for j, v in enumerate(vals):
            v &= (1 << bits) - 1
            for i in range(bits):
                z |= ((v >> i) & 1) << (i * d + j)
        return z

    rng = random.Random(42)
    for d, bits in [(2, 8), (3, 5), (2, 16), (4, 4)]:
        rows = [
            tuple(rng.randrange(0, 1 << (bits + 2)) for _ in range(d))
            for _ in range(50)
        ]
        cols = [f"c{j}" for j in range(d)]
        df = spark.createDataFrame(rows, ", ".join(f"{c} long" for c in cols))
        got = [
            r.z
            for r in df.selectExpr(f"{zorder_sql(cols, bits)} AS z").collect()
        ]
        want = [morton(vals, bits, d) for vals in rows]
        assert got == want, (d, bits)


def test_merge_join_view_equals_full_rejoin(spark, sf_dir):
    # the delta identity: old view + merge_join_view(deltas) must equal
    # the join of the updated tables, row-for-row (multiset equality)
    from collections import Counter

    from goconnect_spark.operators.storage import merge_join_view

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    ).withColumnRenamed("l_orderkey", "o_orderkey")
    old_o, new_o = orders.where("o_orderkey % 4 != 0"), orders.where("o_orderkey % 4 = 0")
    old_l, new_l = li.where("l_quantity <= 40"), li.where("l_quantity > 40")

    old_view = old_o.join(old_l, "o_orderkey")
    delta = merge_join_view(old_o, old_l, new_o, new_l, ["o_orderkey"])
    merged = Counter(tuple(r) for r in old_view.unionByName(delta).collect())
    full = Counter(tuple(r) for r in orders.join(li, "o_orderkey").collect())
    assert merged == full
