"""Queue publisher sink — the reference's amqp09.Sink
(reference io/amqp09/sink.go:30-96) as a foreachBatch bridge.

The reference publishes each element's bytes to an exchange with
persistent delivery and acks the element immediately (confirmations
were a TODO at sink.go:93). Here each micro-batch is published inside
foreachBatch: Spark's commit log records the batch only after the
publisher returns, so delivery is at-least-once per batch — strictly
stronger than the reference's ack-before-confirm.

Transport is pluggable like queue_source: a real client implements
`publish(exchange, routing_key, body)`; `CollectingPublisher` records
locally for tests.
"""

from __future__ import annotations

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
    """Test transport: records (exchange, routing_key, body)."""

    messages: list = field(default_factory=list)
    flushes: int = 0

    def publish(self, exchange: str, routing_key: str, body: bytes) -> None:
        self.messages.append((exchange, routing_key, bytes(body)))

    def flush(self) -> None:
        self.flushes += 1


@dataclass
class QueueSink:
    """Publish the `value` column (binary/string) of each micro-batch.

    publisher_factory runs on the driver per batch (foreachBatch
    executes there after collecting the batch plan); a production
    deployment would publish per-partition via mapPartitions inside
    the factory for parallel fan-out.
    """

    exchange: str
    routing_key: str = ""
    publisher_factory: Optional[Callable[[], Publisher]] = None
    batch_limit: Optional[int] = None

    def _publisher(self) -> Publisher:
        if self.publisher_factory is not None:
            return self.publisher_factory()
        try:  # pragma: no cover - no client in container
            import pika  # noqa: F401

            raise NotImplementedError("subclass Publisher to wire a real AMQP channel")
        except ImportError as e:
            raise NotImplementedError(
                "no AMQP client installed; pass publisher_factory"
            ) from e

    def _publish_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        pub = self._publisher()
        rows = batch_df.select("value").collect()
        if self.batch_limit is not None:
            rows = rows[: self.batch_limit]
        for r in rows:
            v = r.value
            body = v.encode() if isinstance(v, str) else bytes(v)
            pub.publish(self.exchange, self.routing_key, body)
        pub.flush()  # reference Flush: sink acks only after flush

    def write(self, df: DataFrame):
        self._publish_batch(df, -1)
        return df

    def write_stream(self, df: DataFrame, trigger=None):
        w = df.writeStream.foreachBatch(self._publish_batch)
        if trigger:
            w = w.trigger(**trigger)
        return w.start()
