"""AQE skew-join split: the AUTOMATIC complement to the manual
salted_join (operators/joins.py). A pathological hot key makes one
shuffle partition carry most of a join's rows; adaptive execution
must detect it at runtime and split that partition across tasks —
asserted on the final adaptive plan, with results identical to the
skew-free computation.

This is the knob-level evidence behind the repo's 100 TB skew story:
moderate skew -> AQE handles it with zero code changes (this test);
pathological single-key hotspots beyond AQE's splitting -> salting
(test_joins.py, salted_segment_activity).
"""


def test_aqe_splits_skewed_join_partition(spark):
    old = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.adaptive.skewJoin.enabled",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        # shrink the thresholds so the test corpus counts as skewed
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ

        # 90% of the large side lands on key 0; dim side is uniform
        large = spark.range(200_000).selectExpr(
            "CASE WHEN id % 10 < 9 THEN 0 ELSE id % 1000 END AS k",
            "id AS v",
        )
        dim = spark.range(1_000).selectExpr("id AS k", "id * 7 AS w")
        # no keyed aggregate downstream: a hash-distribution requirement
        # on k would make AQE skip the skew split to preserve it
        joined = large.join(dim, "k").agg(
            {"v": "count", "w": "sum"}
        )
        row = joined.collect()[0]

        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan  # AQE actually split the hot partition

        # correctness unaffected by the split: every surviving row joined
        hot = sum(1 for i in range(200_000) if i % 10 < 9)
        assert row["count(v)"] == 200_000  # all keys 0..999 exist in dim
        assert hot == 180_000
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
