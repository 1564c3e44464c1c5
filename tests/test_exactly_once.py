"""Exactly-once delivery through IdempotentForeachBatchSink, and
checkpoint-restart recovery of a streaming query: the two guarantees a
production pipeline leans on when an executor dies mid-drain.

Reference parity: the reference gets at-least-once from its ack
protocol (io/kafka1/sink.go:109-128 commitOffsets after flush); Spark
gets it from the micro-batch commit log, and the ledger sink upgrades
any non-transactional target to exactly-once.
"""

import glob
import os

import pyspark.sql.functions as F

from goconnect_spark.sources.sinks import IdempotentForeachBatchSink


def _append_writer(out_dir):
    """A deliberately NON-idempotent target: blind parquet append."""

    def write(df, batch_id):
        df.write.mode("append").parquet(out_dir)

    return write


def test_duplicate_batch_delivery_is_noop(spark, tmp_path):
    out = str(tmp_path / "out")
    sink = IdempotentForeachBatchSink(_append_writer(out), str(tmp_path / "ledger"))
    df = spark.range(10)

    sink(df, 0)
    sink(df, 0)  # redelivery of the same batch: must not double-write
    sink(df, 1)

    assert spark.read.parquet(out).count() == 20  # 2 distinct batches x 10


def test_missing_marker_triggers_rewrite(spark, tmp_path):
    """Crash WINDOW semantics: a failure between write_fn and the
    marker rename re-runs the batch (at-least-once inside the window;
    write_fn must tolerate its own partial output). Deleting the
    marker simulates exactly that crash."""
    out = str(tmp_path / "out")
    ledger = str(tmp_path / "ledger")
    sink = IdempotentForeachBatchSink(_append_writer(out), ledger)
    df = spark.range(5)

    sink(df, 7)
    os.remove(os.path.join(ledger, "batch-7"))
    sink(df, 7)  # marker gone -> Spark's contract says re-run

    assert spark.read.parquet(out).count() == 10


def test_checkpoint_restart_resumes_without_duplicates_or_loss(spark, tmp_path):
    """Drain files 1-2 with a checkpoint, 'crash' (stop the query),
    drop in file 3, restart from the SAME checkpoint: the restarted
    query must process ONLY the new file, and the target must hold
    every row exactly once."""
    src = tmp_path / "src"
    src.mkdir()
    out = str(tmp_path / "out")
    chk = str(tmp_path / "chk")
    ledger = str(tmp_path / "ledger")

    spark.range(0, 10).coalesce(1).write.parquet(str(src / "f1.parquet"))
    spark.range(10, 20).coalesce(1).write.parquet(str(src / "f2.parquet"))

    schema = "id long"

    def drain():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/*.parquet")
        )
        sink = IdempotentForeachBatchSink(_append_writer(out), ledger)
        q = sink.write_stream(
            stream, checkpoint=chk, trigger={"availableNow": True}
        )
        q.awaitTermination(120)

    drain()
    first_rows = spark.read.parquet(out).count()
    assert first_rows == 20
    n_batches_first = len(glob.glob(os.path.join(ledger, "batch-*")))

    spark.range(20, 30).coalesce(1).write.parquet(str(src / "f3.parquet"))
    drain()  # restart from the same offset log

    got = sorted(r.id for r in spark.read.parquet(out).collect())
    assert got == list(range(30))  # no loss, NO duplicates
    # the restart processed only the new file's batch(es)
    n_batches_second = len(glob.glob(os.path.join(ledger, "batch-*")))
    assert n_batches_second > n_batches_first
