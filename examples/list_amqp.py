"""Reference example parity: examples/list-amqp — a bounded list
published to an AMQP exchange (reference io/amqp09/sink.go). The
transport here is the file-backed test publisher; swap
`publisher_factory` for a real channel factory in production.
Publishing runs on the executors, one channel per partition.

Run: python examples/list_amqp.py
"""

from __future__ import annotations

import functools
import sys
import tempfile

import pyspark.sql.functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from goconnect_spark.pipeline import Pipeline  # noqa: E402
from goconnect_spark.session import get_spark  # noqa: E402
from goconnect_spark.sources import ListSource  # noqa: E402
from goconnect_spark.sources.queue_sink import FilePublisher, QueueSink  # noqa: E402


def main():
    spark = get_spark("list-amqp")
    spark.sparkContext.setLogLevel("ERROR")

    out_dir = tempfile.mkdtemp(prefix="amqp_out_")
    sink = QueueSink(
        "events-exchange", "events.text",
        publisher_factory=functools.partial(FilePublisher, out_dir),
    )
    (
        Pipeline(spark)
        .root(ListSource([f"message-{i}" for i in range(8)]))
        .map(F.upper)
        .run(sink)
    )
    for ex, rk, body, pid in sorted(FilePublisher.read_all(out_dir), key=lambda t: t[2]):
        print(f"{ex}/{rk} <- {body.decode()} (published by worker pid {pid})")


if __name__ == "__main__":
    main()
