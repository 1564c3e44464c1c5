"""Queue publisher sink — the reference's amqp09.Sink
(reference io/amqp09/sink.go:30-96) as a foreachBatch bridge.

The reference publishes each element's bytes to an exchange with
persistent delivery and acks the element immediately (confirmations
were a TODO at sink.go:93). Here each micro-batch is published inside
foreachBatch, and publishing runs ON THE EXECUTORS via
foreachPartition — each partition opens its own channel, publishes its
rows, and flushes before the partition task completes. Spark's commit
log records the batch only after every partition task (and thus every
flush) has returned, so delivery is at-least-once per batch — strictly
stronger than the reference's ack-before-confirm, with no driver
funnel (a driver-side collect caps throughput at one machine's NIC;
per-partition fan-out scales with the cluster).

Transport is pluggable like queue_source: a real client implements
`publish(exchange, routing_key, body)` + `flush()`. Two test/local
transports ship: `CollectingPublisher` records in-process (driver-side
unit tests of the Publisher protocol), `FilePublisher` appends records
to files under a shared directory — durable across the executor
process boundary, so tests can assert what the executors actually
published.
"""

from __future__ import annotations

import base64
import os
import uuid
from dataclasses import dataclass, field
from typing import Callable, Optional

from pyspark.sql import DataFrame


class Publisher:
    def publish(self, exchange: str, routing_key: str, body: bytes) -> None:  # pragma: no cover
        raise NotImplementedError

    def flush(self) -> None:
        pass


@dataclass
class CollectingPublisher(Publisher):
    """In-process test transport: records (exchange, routing_key, body).
    Only sees publishes from THIS process — use FilePublisher to
    observe executor-side publishing."""

    messages: list = field(default_factory=list)
    flushes: int = 0

    def publish(self, exchange: str, routing_key: str, body: bytes) -> None:
        self.messages.append((exchange, routing_key, bytes(body)))

    def flush(self) -> None:
        self.flushes += 1


@dataclass
class FilePublisher(Publisher):
    """Durable local transport: buffers publishes, and flush() writes
    them as one newline-delimited file (exchange, routing_key, base64
    body, producing pid) under `directory` — nothing is visible until
    flush, mirroring a transactional channel. Works across the
    executor/driver process boundary in local mode."""

    directory: str

    def __post_init__(self):
        self._buffer: list[str] = []

    def publish(self, exchange: str, routing_key: str, body: bytes) -> None:
        rec = "\t".join(
            [exchange, routing_key, base64.b64encode(bytes(body)).decode("ascii"), str(os.getpid())]
        )
        self._buffer.append(rec)

    def flush(self) -> None:
        if not self._buffer:
            return
        os.makedirs(self.directory, exist_ok=True)
        path = os.path.join(self.directory, f"flush-{uuid.uuid4().hex}")
        with open(path, "w") as f:
            f.write("\n".join(self._buffer) + "\n")
        self._buffer = []

    @staticmethod
    def read_all(directory: str) -> list:
        """All flushed records as (exchange, routing_key, body, pid)."""
        out = []
        if not os.path.isdir(directory):
            return out
        for name in sorted(os.listdir(directory)):
            with open(os.path.join(directory, name)) as f:
                for line in f:
                    ex, rk, b64, pid = line.rstrip("\n").split("\t")
                    out.append((ex, rk, base64.b64decode(b64), int(pid)))
        return out


def _partition_publisher(factory: Callable[[], Publisher], exchange: str, routing_key: str):
    """Build the per-partition publish closure (module-level so the
    pickled closure carries only the factory + two strings, not the
    sink or its DataFrame)."""

    def publish_partition(rows) -> None:
        pub = None
        for r in rows:
            if pub is None:  # lazy: empty partitions open no channel
                pub = factory()
            v = r.value
            body = v.encode() if isinstance(v, str) else bytes(v)
            pub.publish(exchange, routing_key, body)
        if pub is not None:
            pub.flush()  # reference Flush: the task (and hence the
            # batch commit) completes only after the flush returns

    return publish_partition


@dataclass
class QueueSink:
    """Publish the `value` column (binary/string) of each micro-batch
    from the executors, one channel per partition."""

    exchange: str
    routing_key: str = ""
    publisher_factory: Optional[Callable[[], Publisher]] = None
    batch_limit: Optional[int] = None

    def _factory(self) -> Callable[[], Publisher]:
        if self.publisher_factory is not None:
            return self.publisher_factory
        try:  # pragma: no cover - no client in container
            import pika  # noqa: F401

            raise NotImplementedError("subclass Publisher to wire a real AMQP channel")
        except ImportError as e:
            raise NotImplementedError(
                "no AMQP client installed; pass publisher_factory"
            ) from e

    def _publish_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        sel = batch_df.select("value")
        if self.batch_limit is not None:
            sel = sel.limit(self.batch_limit)
        sel.foreachPartition(
            _partition_publisher(self._factory(), self.exchange, self.routing_key)
        )

    def write(self, df: DataFrame):
        self._publish_batch(df, -1)
        return df

    def write_stream(self, df: DataFrame, trigger=None):
        w = df.writeStream.foreachBatch(self._publish_batch)
        if trigger:
            w = w.trigger(**trigger)
        return w.start()
