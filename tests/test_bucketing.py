"""Bucketed co-located joins: pre-shuffled storage makes the fact-fact
join shuffle-free — the SCALING.md strategy for repeated big joins,
proven against the physical plan."""

import pyspark.sql.functions as F
import pytest


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS orders_bucketed")
    (
        li.write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .mode("overwrite")
        .saveAsTable("li_bucketed")
    )
    (
        orders.write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .mode("overwrite")
        .saveAsTable("orders_bucketed")
    )
    yield "li_bucketed", "orders_bucketed"
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS orders_bucketed")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    li_t, o_t = bucketed_tables
    li = spark.table(li_t)
    orders = spark.table(o_t)
    joined = (
        li.join(orders.hint("merge"), li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    joined.collect()
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # the join itself reads both sides bucket-aligned: no Exchange may
    # appear BELOW the SortMergeJoin (the post-agg exchange is fine)
    join_part = plan[plan.index("SortMergeJoin"):]
    assert "Exchange hashpartitioning(l_orderkey" not in join_part
    assert "Exchange hashpartitioning(o_orderkey" not in join_part


def test_bucketed_join_matches_unbucketed(spark, sf_dir, bucketed_tables):
    li_t, o_t = bucketed_tables
    got = {
        r.o_orderstatus: r.n
        for r in spark.table(li_t)
        .join(spark.table(o_t), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    want = {
        r.o_orderstatus: r.n
        for r in li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want


@pytest.fixture(scope="module")
def partitioned_orders(spark, sf_dir, tmp_path_factory):
    """orders written date-partitioned — the other half of the 100 TB
    storage strategy: bucketing co-locates joins, partitioning prunes
    scans. A real warehouse partitions facts by day."""
    out = str(tmp_path_factory.mktemp("part") / "orders_by_month")
    (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .withColumn("o_month", F.date_format("o_orderdate", "yyyy-MM"))
        .write.partitionBy("o_month")
        .mode("overwrite")
        .parquet(out)
    )
    return out


def test_static_partition_pruning(spark, partitioned_orders):
    """A literal predicate on the partition column must reach the scan
    as a PartitionFilter (zero non-matching files read), not a post-
    scan Filter."""
    df = spark.read.parquet(partitioned_orders).where(F.col("o_month") == "1995-03")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "o_month" in plan.split("PartitionFilters:")[1][:200]
    n = df.count()
    assert n > 0


def test_dynamic_partition_pruning(spark, sf_dir, partitioned_orders):
    """A selective dim-side filter prunes fact partitions at RUNTIME:
    Spark plants a dynamicpruning subquery in the fact scan's
    PartitionFilters. At 100 TB this is the difference between
    scanning one month and scanning the whole table when the filter
    arrives through a join instead of a literal."""
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
    facts = spark.read.parquet(partitioned_orders)
    # dim: an INDEPENDENT month-attribute relation (DPP won't plant a
    # pruning subquery for a dim derived from the pruned scan itself),
    # filtered on an attribute that is NOT the join key — so the only
    # way to skip fact partitions is the runtime subquery.
    dim_path = partitioned_orders + "_dim"
    (
        facts.select("o_month").distinct()
        .withColumn("quarter", (F.substring("o_month", 6, 2).cast("int") + 2) / 3)
        .write.mode("overwrite").parquet(dim_path)
    )
    dim = spark.read.parquet(dim_path).where(F.col("quarter") == 1)
    joined = facts.join(dim.hint("broadcast"), "o_month").groupBy(
        "o_orderstatus"
    ).agg(F.count(F.lit(1)).alias("n"))
    joined.collect()
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]
