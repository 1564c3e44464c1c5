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
