"""Capture the MICRO-BATCH physical plan of streaming_ann_lookup —
the in-stream evidence VERDICT r14 item 5 asked for (the committed
r14 dumps showed only the post-drain result plan, which is identical
before/after the repartition fix).

Replays the certificate's exact stream (same source, same drain) and
writes StreamingQuery.explain()'s last-executed-batch plan to
plans/<tag>/streaming_ann_lookup_microbatch.txt.

Usage: python tools/dump_stream_plan.py <tag>
"""

from __future__ import annotations

import os
import sys
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402


def main():
    tag = sys.argv[1] if len(sys.argv) > 1 else "r15"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag
    )
    os.makedirs(out_dir, exist_ok=True)

    from goconnect_spark.queries.corpus import cached_table
    from goconnect_spark.queries.similarity import _kmeans_member, _norms_cached
    from goconnect_spark.session import get_spark
    from goconnect_spark.sources.core import ParquetSource
    from goconnect_spark.streaming.run import scoped_shuffle_partitions
    from goconnect_spark.tables import load

    spark = get_spark("dump-stream-plan")
    spark.sparkContext.setLogLevel("ERROR")

    # identical construction to queries.streaming_queries.streaming_ann_lookup
    index = cached_table(
        spark, sf_dir, "stream_ann_index",
        lambda: _kmeans_member(load(spark, "embeddings", sf_dir)).join(
            _norms_cached(spark, sf_dir), "vec_id"
        ),
    )
    src = ParquetSource(
        f"{sf_dir}/embeddings.parquet", seq_col="vec_id", streaming=True
    )
    probe_raw = (
        src.read(spark)
        .select("value.*")
        .repartition(spark.sparkContext.defaultParallelism, "vec_id")
    )
    probes = (
        _kmeans_member(probe_raw)
        .select(F.col("vec_id").alias("probe_id"), F.col("qs").alias("pqs"), "cell")
        .withColumn(
            "pnrm",
            F.expr(
                "sqrt(CAST(aggregate(pqs, CAST(0 AS BIGINT),"
                " (acc, v) -> acc + v * v) AS DOUBLE))"
            ),
        )
    )
    pdot = F.expr(
        "aggregate(zip_with(qs, pqs, (x, y) -> x * y),"
        " CAST(0 AS BIGINT), (acc, v) -> acc + v)"
    )
    joined = (
        probes.join(index, "cell")
        .where(F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id",
            (pdot.cast("double") / (F.col("nrm") * F.col("pnrm"))).alias("cosine"),
            "vec_id",
        )
    )
    best = joined.groupBy("probe_id").agg(
        F.max(F.struct(F.col("cosine"), (-F.col("vec_id")).alias("nv"))).alias("b")
    )
    name = f"dump_ann_{uuid.uuid4().hex[:8]}"
    with scoped_shuffle_partitions(spark, 8):
        q = (
            best.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    plan = q._jsq.explainInternal(False)
    path = os.path.join(out_dir, "streaming_ann_lookup_microbatch.txt")
    with open(path, "w") as f:
        f.write(plan)
    print(f"wrote {path} ({len(plan.splitlines())} lines)")
    spark.stop()


if __name__ == "__main__":
    main()
