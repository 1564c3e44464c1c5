"""Bucketed co-located join: the physical-plan proof that pre-
bucketing both sides of a recurring equi-join removes the Exchange —
the storage lever a 100 TB fact table depends on (shuffle once at
write time, never again at read time)."""

import pytest


@pytest.fixture()
def bucket_db(spark, tmp_path):
    db = "bkt_test"
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db} LOCATION '{tmp_path}/bkt'")
    yield db
    spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")


def test_bucketed_join_has_no_exchange(spark, bucket_db):
    from goconnect_spark.operators.storage import write_bucketed

    a = spark.range(10_000).selectExpr("id AS k", "id * 2 AS va")
    b = spark.range(10_000).selectExpr("id AS k", "id * 3 AS vb")
    write_bucketed(a, f"{bucket_db}.ta", ["k"], 8, sort_cols=["k"])
    write_bucketed(b, f"{bucket_db}.tb", ["k"], 8, sort_cols=["k"])

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table(f"{bucket_db}.ta").join(
            spark.table(f"{bucket_db}.tb"), "k"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # bucket-to-bucket merge: no shuffle on either side
        assert "Exchange" not in plan, plan
        assert joined.count() == 10_000

        # control: the SAME join over unbucketed data DOES shuffle —
        # proves the assertion above is meaningful, not vacuous
        ua = spark.range(10_000).selectExpr("id AS k", "id * 2 AS va")
        ub = spark.range(10_000).selectExpr("id AS k", "id * 3 AS vb")
        uplan = ua.join(ub, "k")._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in uplan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_aggregation_has_no_exchange(spark, bucket_db):
    """Bucketing also pre-partitions groupBy on the bucket keys."""
    from goconnect_spark.operators.storage import write_bucketed

    a = spark.range(10_000).selectExpr("id % 100 AS k", "id AS v")
    write_bucketed(a, f"{bucket_db}.tagg", ["k"], 8)
    agg = spark.table(f"{bucket_db}.tagg").groupBy("k").sum("v")
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert agg.count() == 100
