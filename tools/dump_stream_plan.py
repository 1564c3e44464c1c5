"""Capture the MICRO-BATCH physical plan of streaming_ann_lookup —
the in-stream evidence VERDICT r14 item 5 asked for (the committed
r14 dumps showed only the post-drain result plan, which is identical
before/after the repartition fix).

Drains the certificate's EXACT stream (the same unstarted DataFrame
the query starts, via queries.streaming_queries._ann_lookup_stream)
and writes StreamingQuery.explain()'s last-executed-batch plan to
plans/<tag>/streaming_ann_lookup_microbatch.txt.

Usage: python tools/dump_stream_plan.py <tag>
"""

from __future__ import annotations

import os
import sys
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    tag = sys.argv[1] if len(sys.argv) > 1 else "r15"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag
    )
    os.makedirs(out_dir, exist_ok=True)

    from goconnect_spark.queries.streaming_queries import _ann_lookup_stream
    from goconnect_spark.session import get_spark
    from goconnect_spark.streaming.run import scoped_shuffle_partitions

    spark = get_spark("dump-stream-plan")
    spark.sparkContext.setLogLevel("ERROR")
    best = _ann_lookup_stream(spark, sf_dir)
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
