"""Streaming-drain scaling measurement (round-6 item: prove drain cost
and state-store size track BATCH size / watermark horizon, not corpus).

The five oracle-gated streaming queries drain with corpus-spanning
watermarks (required for exact batch parity — queries/streaming_queries.py). This
tool measures the SAME operators under a realistic 2-hour watermark on
replicated corpora:

- the sf0.1 events table (100k rows / 30 days) is replicated m times,
  replica k time-shifted by k*31 days (natural stream growth: more
  history, same arrival rate) with non-colliding event_ids;
- each replica is written as 4 time-bucketed files and the files'
  mtimes are set in event-time order, so FileStreamSource
  (maxFilesPerTrigger=1) drains 4*m micro-batches whose watermark
  advances monotonically — eviction fires at every batch boundary
  exactly as it would on a live stream;
- per (query, m) we report wall seconds, emitted rows, PEAK state-store
  rows (max numRowsTotal over all progress events) and total evicted
  rows (sum numRowsRemoved).

The 100 TB claim verified here: peak state is FLAT in m (bounded by
batch span x key cardinality) while evicted rows and wall grow with
the corpus — i.e. an unbounded stream can run forever.

Run: python tools/scale_bench_streaming.py [multipliers...]  (default 1 5 10)
Record the table in SCALING.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

BASE = "/root/testdata/sf0.1"
WATERMARK = "2 hours"
BUCKETS_PER_REPLICA = 4


def build_corpus(spark, m: int, out_dir: str) -> None:
    """m replicas x 4 time-bucket files, mtimes in event-time order."""
    from goconnect_spark.tables import load

    ev = load(spark, "events", BASE).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    span_s = (hi - lo).total_seconds()
    bucket_s = span_s / BUCKETS_PER_REPLICA + 1
    paths = []
    for k in range(m):
        rep = ev.select(
            (F.col("event_id") + F.lit(k * 10_000_000)).alias("event_id"),
            (F.col("ts") + F.expr(f"INTERVAL {k * 31} DAYS")).alias("ts"),
            "user_id",
            "event_type",
            "value",
        )
        bucket = F.floor(
            (F.unix_timestamp("ts") - F.lit(int(lo.timestamp()) + k * 31 * 86400))
            / F.lit(bucket_s)
        )
        for b in range(BUCKETS_PER_REPLICA):
            p = f"{out_dir}/r{k:03d}_b{b}"
            rep.where(bucket == b).coalesce(1).write.parquet(p)
            paths.append(p)
    # FileStreamSource orders files by modification time: stamp them in
    # event-time order (1s apart) so the drain replays history forward
    t0 = time.time() - len(paths) * 2
    for i, p in enumerate(paths):
        for f in os.listdir(p):
            if f.endswith(".parquet"):
                os.utime(os.path.join(p, f), (t0 + i, t0 + i))


def read_stream(spark, d: str, options: dict | None = None):
    """`options` mirrors ParquetSource.stream_options (e.g.
    {"cleanSource": "delete"} for the r14 mitigation twin)."""
    reader = (
        spark.readStream.schema(
            "event_id bigint, ts timestamp, user_id bigint, event_type string, value double"
        )
        .option("maxFilesPerTrigger", 1)
    )
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    return reader.parquet(d + "/*")


def drain(spark, stream_df, mode: str, ckpt_root: str) -> dict:
    name = f"sb_{uuid.uuid4().hex[:8]}"
    t = time.time()
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", f"{ckpt_root}/{name}")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    wall = time.time() - t
    peak = 0
    removed = 0
    batches = 0
    for p in q.recentProgress:
        if p["numInputRows"] > 0:
            batches += 1
        for op in p.get("stateOperators") or []:
            peak = max(peak, op.get("numRowsTotal") or 0)
            removed += op.get("numRowsRemoved") or 0
    rows = spark.table(name).count()
    spark.catalog.dropTempView(name)
    return {
        "wall_s": round(wall, 2),
        "rows": rows,
        "peak_state_rows": peak,
        "evicted_rows": removed,
        "batches": batches,
    }


def bench_queries(spark, d: str, ckpt_root: str) -> dict:
    from goconnect_spark.streaming.run import (
        session_counts,
        stream_stream_join,
        streaming_dedup,
        windowed_counts,
    )

    out = {}
    ev = read_stream(spark, d)
    out["windowed_hourly"] = drain(
        spark,
        windowed_counts(ev, "ts", "1 hour", WATERMARK, keys=("event_type",)),
        "append",
        ckpt_root,
    )
    ev = read_stream(spark, d)
    out["session_counts"] = drain(
        spark,
        session_counts(ev, "ts", "30 minutes", WATERMARK, keys=("user_id",)),
        "append",
        ckpt_root,
    )
    ev = read_stream(spark, d)
    out["dedup_keys"] = drain(
        spark,
        streaming_dedup(ev, ["user_id", "event_type"], "ts", WATERMARK).select(
            "user_id", "event_type"
        ),
        "append",
        ckpt_root,
    )
    ev = read_stream(spark, d)
    err = ev.where("event_type = 'error'").select("user_id", "ts")
    ctx = ev.where("event_type IN ('view', 'click')").select("user_id", "ts")
    out["error_context_join"] = drain(
        spark,
        stream_stream_join(
            err, ctx, on="user_id", left_time="ts", right_time="ts",
            tolerance="2 hours", watermark=WATERMARK,
        ).select("user_id"),
        "append",
        ckpt_root,
    )
    ev = read_stream(spark, d)
    out["global_fold"] = drain(
        spark,
        ev.agg(
            F.count(F.lit(1)).alias("n"), F.sum("value").alias("v")
        ),
        "update",
        ckpt_root,
    )
    return out


def main() -> None:
    multipliers = [int(a) for a in sys.argv[1:]] or [1, 5, 10]
    from goconnect_spark.session import get_spark

    spark = get_spark("scale-bench-streaming")
    # recentProgress keeps only the last N progress events (default
    # 100); a drain of 4*m micro-batches past m=25 would silently
    # undercount evicted_rows and could miss the true peak — size the
    # buffer to the largest requested drain
    spark.conf.set(
        "spark.sql.streaming.numRecentProgressUpdates",
        str(max(200, 8 * max(multipliers))),
    )
    for m in multipliers:
        work = tempfile.mkdtemp(prefix=f"sbstream_{m}x_")
        try:
            build_corpus(spark, m, f"{work}/in")
            res = bench_queries(spark, f"{work}/in", f"{work}/ckpt")
            for qname, r in res.items():
                print(json.dumps({"query": qname, "m": m, **r}), flush=True)
        finally:
            shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
