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
