"""Checkpoint recovery: the engine's delivery contract (SURVEY §3.3 —
the reference acks to the source; Spark commits to the checkpoint) is
only real if a stopped query RESUMES without loss or duplication.
Stop a file-streaming job mid-run, restart it on the same checkpoint,
and the exactly-once parquet sink must end with precisely the source
row count."""

import time

import pytest


def test_streaming_restart_resumes_from_checkpoint(spark, sf_dir, tmp_path):
    src_dir, out, chk = str(tmp_path / "src"), str(tmp_path / "out"), str(tmp_path / "chk")
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").repartition(6).write.parquet(src_dir)
    total = spark.read.parquet(src_dir).count()
    schema = spark.read.parquet(src_dir).schema

    def start(trigger_kwargs):
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", chk)
            .trigger(**trigger_kwargs)
            .start()
        )

    # phase 1: run batch-by-batch, stop after >=2 committed batches
    q = start({"processingTime": "0 seconds"})
    deadline = time.time() + 60
    while time.time() < deadline:
        p = q.lastProgress
        if p and p["batchId"] >= 2 and p["numInputRows"] is not None:
            break
        time.sleep(0.2)
    q.stop()
    q.awaitTermination()
    partial = spark.read.parquet(out).count()
    assert 0 < partial < total, f"expected a genuine mid-run stop, got {partial}/{total}"

    # phase 2: same checkpoint, drain the rest
    q2 = start({"availableNow": True})
    q2.awaitTermination()
    final = spark.read.parquet(out).count()
    # exactly-once: everything arrives, nothing is re-emitted
    assert final == total
    # and the content matches, not just the count
    src_keys = spark.read.parquet(src_dir).selectExpr(
        "sum(hash(l_orderkey, l_linenumber)) h", "count(*) c"
    ).collect()[0]
    out_keys = spark.read.parquet(out).selectExpr(
        "sum(hash(l_orderkey, l_linenumber)) h", "count(*) c"
    ).collect()[0]
    assert (src_keys.h, src_keys.c) == (out_keys.h, out_keys.c)
