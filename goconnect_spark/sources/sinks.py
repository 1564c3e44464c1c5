"""Sinks (reference §2.7): console, memory, parquet, kafka.

Reference semantics preserved: a sink flush happens per trigger, and
source progress commits only after flush — in Spark that is the
micro-batch commit log; at-least-once (exactly-once for idempotent
file sinks) comes from checkpointing, replacing the reference's
per-element ack protocol (io/kafka1/sink.go:109-128)."""

from __future__ import annotations

import uuid
from dataclasses import dataclass, field
from typing import Optional

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def _apply_trigger(writer, trigger: Optional[dict]):
    if trigger:
        writer = writer.trigger(**trigger)
    return writer


@dataclass
class ConsoleSink:
    """std.Out parity (reference io/std/out.go:29-60)."""

    num_rows: int = 20
    truncate: bool = False
    output_mode: Optional[str] = None

    def write(self, df: DataFrame):
        df.show(self.num_rows, truncate=self.truncate)
        return df

    def write_stream(self, df: DataFrame, trigger=None):
        mode = self.output_mode or _mode_for(df)
        w = _apply_trigger(df.writeStream.format("console").outputMode(mode), trigger)
        return w.start()


@dataclass
class MemorySink:
    """Named in-memory table — the test sink (query results readable
    via spark.sql('select * from <name>'))."""

    name: str = field(default_factory=lambda: f"mem_{uuid.uuid4().hex[:8]}")
    output_mode: Optional[str] = None

    def write(self, df: DataFrame):
        df.createOrReplaceTempView(self.name)
        return df

    def write_stream(self, df: DataFrame, trigger=None):
        mode = self.output_mode or _mode_for(df)
        w = _apply_trigger(
            df.writeStream.format("memory").queryName(self.name).outputMode(mode), trigger
        )
        return w.start()


@dataclass
class ParquetSink:
    path: str
    checkpoint: Optional[str] = None
    mode: str = "overwrite"
    partition_by: tuple = ()

    def write(self, df: DataFrame):
        w = df.write.mode(self.mode)
        if self.partition_by:
            w = w.partitionBy(*self.partition_by)
        w.parquet(self.path)
        return df

    def write_stream(self, df: DataFrame, trigger=None):
        w = df.writeStream.format("parquet").option("path", self.path)
        w = w.option("checkpointLocation", self.checkpoint or f"{self.path}_chk")
        if self.partition_by:
            w = w.partitionBy(*self.partition_by)
        return _apply_trigger(w, trigger).start()


@dataclass
class KafkaSink:
    """kafka1.Sink parity (reference io/kafka1/sink.go:30-92): value
    (and optional key) binary columns published to a topic; delivery
    guarantees come from checkpointing + idempotent producer."""

    bootstrap_servers: str
    topic: str
    checkpoint: str = "/tmp/goconnect_spark_kafka_chk"

    def _prepare(self, df: DataFrame) -> DataFrame:
        cols = df.columns
        if "value" not in cols:
            raise ValueError("KafkaSink requires a 'value' column")
        out = [F.col("value").cast("binary").alias("value")]
        if "key" in cols:
            out.insert(0, F.col("key").cast("binary").alias("key"))
        return df.select(*out)

    def write(self, df: DataFrame):
        (
            self._prepare(df)
            .write.format("kafka")
            .option("kafka.bootstrap.servers", self.bootstrap_servers)
            .option("topic", self.topic)
            .save()
        )
        return df

    def write_stream(self, df: DataFrame, trigger=None):
        w = (
            self._prepare(df)
            .writeStream.format("kafka")
            .option("kafka.bootstrap.servers", self.bootstrap_servers)
            .option("topic", self.topic)
            .option("checkpointLocation", self.checkpoint)
        )
        return _apply_trigger(w, trigger).start()


@dataclass
class FilePerSourceSink:
    """File-for-a-file subflow sink (reference examples/
    localfs-subflow-localfs): every input file produces exactly one
    output file of the same name under `out_dir`, contents = the
    transformed `value` bytes. The reference runs one subflow per
    file; here rows are repartitioned by file name so each file's
    write happens in one executor task — parallel across files, one
    writer per file, no driver funnel.

    Writes through the local filesystem API: on a multi-node cluster
    point `out_dir` at a shared mount, or subclass `_open` for an
    object-store client."""

    out_dir: str
    name_col: str = "url.name"

    def write(self, df: DataFrame):
        out_dir = self.out_dir
        sel = df.select(F.col(self.name_col).alias("name"), F.col("value"))

        def write_partition(rows):
            import os

            os.makedirs(out_dir, exist_ok=True)
            for r in rows:
                body = r.value.encode() if isinstance(r.value, str) else bytes(r.value)
                with open(os.path.join(out_dir, r.name), "wb") as f:
                    f.write(body)

        sel.repartition(F.col("name")).foreachPartition(write_partition)
        return df


def _mode_for(df: DataFrame) -> str:
    """Best-effort output-mode inference: global/keyed aggregations
    stream in update mode (the reference Fold emits accumulator
    snapshots per trigger — same contract). The plan sniff uses the
    private `_jdf` bridge, which is absent under Spark Connect —
    callers that care should pass `output_mode` explicitly; this
    fallback degrades to 'append' rather than failing."""
    try:
        plan = df._jdf.queryExecution().analyzed().toString()
    except Exception:
        return "append"
    return "update" if "Aggregate" in plan else "append"


@dataclass
class IdempotentForeachBatchSink:
    """Exactly-once delivery to NON-transactional targets (object
    stores, queues, HTTP endpoints) over Structured Streaming's
    at-least-once foreachBatch replay contract.

    Spark guarantees a failed/restarted query redelivers the SAME
    (batch_id, data); turning that into exactly-once is the sink's
    job. The built-in file sink does it with its own commit log
    (ParquetSink above); for everything else the standard pattern is
    a batch-id commit LEDGER, which this wrapper provides around any
    `write_fn(df, batch_id)`:

      - a batch is written only if `batch_id` has no ledger marker;
      - the marker is created by ATOMIC RENAME only after write_fn
        returns — a crash between write and mark re-runs the batch,
        so write_fn must tolerate its own partial output (e.g. write
        to a batch-id-suffixed path, or make the target upsert);
      - redelivered batches (checkpoint restart, speculative rerun)
        become no-ops.

    The ledger is one empty file per batch — O(#batches), pruneable
    from the tail. On a cluster, point `ledger_dir` at shared/object
    storage (the rename-commit idiom is what the HDFS/S3A committers
    use); the reference's per-delivery ack (io/amqp09/, kafka sink
    commitOffsets io/kafka1/sink.go:109-128) is the same protocol at
    element granularity.
    """

    write_fn: object  # Callable[[DataFrame, int], None]
    ledger_dir: str

    def __call__(self, df: DataFrame, batch_id: int) -> None:
        import os

        os.makedirs(self.ledger_dir, exist_ok=True)
        mark = os.path.join(self.ledger_dir, f"batch-{batch_id}")
        if os.path.exists(mark):
            return  # duplicate delivery: already committed
        self.write_fn(df, batch_id)
        tmp = f"{mark}.tmp-{uuid.uuid4().hex}"
        with open(tmp, "w"):
            pass
        os.rename(tmp, mark)  # atomic commit point

    def write_stream(self, df: DataFrame, checkpoint: str, trigger=None,
                     output_mode: str = "append"):
        w = (
            df.writeStream.foreachBatch(self)
            .option("checkpointLocation", checkpoint)
            .outputMode(output_mode)
        )
        return _apply_trigger(w, trigger).start()
