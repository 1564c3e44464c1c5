"""Streaming wall-growth attribution A/B (VERDICT r12 item 2).

The r12 100x streaming decade measured per-batch cost GROWING over a
FileStreamSource drain (~1.55x from early to late batches) on every
query including the 1-state-row global_fold control, and attributed
the term to the source's per-trigger file bookkeeping (each trigger
lists the input dir and consults the seen-files compact log — O(total
files) per batch, O(m^2) per drain). That attribution rested on one
inference. This tool makes it a measurement BY CONSTRUCTION: the same
stateful operators drain the same number of micro-batches from a
`rate-micro-batch` source — deterministic rowsPerBatch rows and an
advanceMillisPerBatch event-time step per batch, with O(1) offset
bookkeeping per trigger, the cost model of a Kafka source — and we
compare WITHIN-RUN per-batch trigger durations: mean of the first
quartile of batches vs the last quartile. Within-run quartile ratios
are immune to the cross-round box-class drift documented in
BASELINE.md.

Expected if the r12 attribution is right:
- file source: q4/q1 per-batch cost ratio well above 1 and growing
  with drain length (the O(files) term);
- rate source: q4/q1 ~ 1.0 at ANY drain length, peak state identical
  to the file twin's watermark-horizon x key-cardinality bound.

Run: python tools/scale_bench_streaming_rate.py [n_batches ...]
     (default 120 400; add --with-file-twin to also drain the m =
      n/4 file corpus for the side-by-side quartile table)
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

WATERMARK = "2 hours"
ROWS_PER_BATCH = 25_000          # ~ one sf0.1 replica time-bucket file
ADVANCE_MS = 30 * 60 * 1000      # event time advances 30 min per batch


def rate_events(spark, n_partitions: int = 8):
    """A synthetic events stream with the SAME shape the file drain
    reads (ts/user_id/event_type/value), from rate-micro-batch: every
    batch is exactly ROWS_PER_BATCH rows and advances event time by
    ADVANCE_MS — so watermarks move and windows close each trigger,
    while source-side bookkeeping is O(1) per trigger by design."""
    return (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", ROWS_PER_BATCH)
        .option("numPartitions", n_partitions)
        .option("advanceMillisPerBatch", ADVANCE_MS)
        .option("startTimestamp", 0)
        .load()
        .select(
            F.col("timestamp").alias("ts"),
            (F.col("value") % 1000).alias("user_id"),
            F.element_at(
                F.array(*[F.lit(t) for t in
                          ("view", "click", "purchase", "error", "signup")]),
                (F.col("value") % 5 + 1).cast("int"),
            ).alias("event_type"),
            (F.col("value") % 100).cast("double").alias("value"),
        )
    )


def drain_n_batches(spark, stream_df, mode: str, ckpt_root: str,
                    n_batches: int) -> dict:
    """Run exactly n_batches triggers, recording EVERY batch's
    triggerExecution duration via a listener (recentProgress truncates;
    the quartile comparison needs the full series)."""
    from pyspark.sql.streaming import StreamingQueryListener

    durations: list[tuple[int, float]] = []
    state = {"peak": 0, "removed": 0}

    class _L(StreamingQueryListener):
        def onQueryStarted(self, e):  # noqa: N802
            pass

        def onQueryProgress(self, e):  # noqa: N802
            p = e.progress
            durations.append(
                (p.batchId, (p.durationMs or {}).get("triggerExecution", 0)))
            for op in p.stateOperators or []:
                state["peak"] = max(state["peak"], op.numRowsTotal or 0)
                state["removed"] += op.numRowsRemoved or 0

        def onQueryIdle(self, e):  # noqa: N802
            pass

        def onQueryTerminated(self, e):  # noqa: N802
            pass

    listener = _L()
    spark.streams.addListener(listener)
    name = f"sbrate_{uuid.uuid4().hex[:8]}"
    t0 = time.time()
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", f"{ckpt_root}/{name}")
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        while True:
            lp = q.lastProgress
            if lp is not None and lp["batchId"] >= n_batches:
                break
            if not q.isActive:
                break
            time.sleep(0.2)
        q.stop()
        q.awaitTermination()
    finally:
        spark.streams.removeListener(listener)
    wall = time.time() - t0
    rows = spark.table(name).count()
    spark.catalog.dropTempView(name)
    # batches with data, in batch order, capped at n_batches (the stop
    # races one or two extra triggers in)
    ds = sorted({b: d for b, d in durations if d}.items())[:n_batches]
    vals = [d / 1000.0 for _, d in ds]
    k = max(1, len(vals) // 4)
    q1 = sum(vals[:k]) / k
    # q2 (second quartile) is the steady-state anchor: q1 carries JIT/
    # codegen warm-up (measured: the first batches run ~1.6x the warm
    # cost), so growth reads off q4/q2
    q2 = sum(vals[k:2 * k]) / k
    q4 = sum(vals[-k:]) / k
    return {
        "wall_s": round(wall, 2),
        "rows": rows,
        "batches": len(vals),
        "peak_state_rows": state["peak"],
        "evicted_rows": state["removed"],
        "per_batch_q1_s": round(q1, 4),
        "per_batch_q2_s": round(q2, 4),
        "per_batch_q4_s": round(q4, 4),
        "q4_over_q2": round(q4 / q2, 2) if q2 else None,
    }


def file_quartiles(spark, n_batches: int, ckpt_root: str, work: str,
                   clean: bool = False) -> dict:
    """The file-source twin: same operator, m = n_batches/4 replica
    corpus (4 files per replica), same listener-based quartile stats.
    With clean=True the source runs cleanSource=delete (the r14
    mitigation, mirroring ParquetSource.stream_options): processed
    files leave the input dir, so the per-trigger listing term that
    produced the 1.98x q4/q2 growth is bounded instead of O(total
    files). Each twin builds its OWN corpus dir because the clean
    twin consumes its input."""
    from tools.scale_bench_streaming import build_corpus, read_stream

    m = max(1, n_batches // 4)
    tag = "in_clean" if clean else "in"
    build_corpus(spark, m, f"{work}/{tag}")
    from goconnect_spark.streaming.run import windowed_counts

    ev = read_stream(spark, f"{work}/{tag}",
                     options={"cleanSource": "delete"} if clean else None)
    return drain_n_batches(
        spark,
        windowed_counts(ev, "ts", "1 hour", WATERMARK, keys=("event_type",)),
        "append",
        ckpt_root,
        n_batches,
    )


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    with_file = "--with-file-twin" in sys.argv
    with_clean = "--with-file-clean-twin" in sys.argv
    batch_counts = [int(a) for a in args] or [120, 400]
    from goconnect_spark.session import get_spark
    from goconnect_spark.streaming.run import windowed_counts

    spark = get_spark("scale-bench-streaming-rate")
    spark.sparkContext.setLogLevel("ERROR")
    for n in batch_counts:
        work = tempfile.mkdtemp(prefix=f"sbrate_{n}b_")
        try:
            if "--skip-rate" not in sys.argv:
                ev = rate_events(spark)
                res = drain_n_batches(
                    spark,
                    windowed_counts(ev, "ts", "1 hour", WATERMARK,
                                    keys=("event_type",)),
                    "append",
                    f"{work}/ckpt",
                    n,
                )
                print(json.dumps(
                    {"query": "windowed_hourly",
                     "source": "rate-micro-batch",
                     "n_batches": n, **res}), flush=True)
            if with_file:
                resf = file_quartiles(spark, n, f"{work}/ckpt_f", work)
                print(json.dumps(
                    {"query": "windowed_hourly", "source": "file",
                     "n_batches": n, **resf}), flush=True)
            if with_clean:
                resc = file_quartiles(spark, n, f"{work}/ckpt_c", work,
                                      clean=True)
                print(json.dumps(
                    {"query": "windowed_hourly",
                     "source": "file+cleanSource=delete",
                     "n_batches": n, **resc}), flush=True)
        finally:
            shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
