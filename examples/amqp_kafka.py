"""Reference example parity: examples/amqp-kafka — drain an AMQP
queue into a Kafka topic. The queue side is the custom Python
DataSource (goconnect_queue: offset/commit/replay protocol over a
pluggable transport — the deterministic in-memory transport here, a
real AMQP channel in production); the Kafka side stops at the sink's
publish projection (no broker in the sandbox).

Run: python examples/amqp_kafka.py
"""

from __future__ import annotations

import sys

import pyspark.sql.functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from goconnect_spark.session import get_spark  # noqa: E402
from goconnect_spark.sources.queue_source import QueueDataSource  # noqa: E402
from goconnect_spark.sources.sinks import KafkaSink  # noqa: E402


def main():
    spark = get_spark("amqp-kafka")
    spark.sparkContext.setLogLevel("ERROR")
    spark.dataSource.register(QueueDataSource)

    msgs = (
        spark.read.format("goconnect_queue")
        .option("queue", "orders")
        .option("total", "6")
        .load()
    )
    # key = queue offset, value = body — the KVBinary the kafka sink
    # publishes (reference amqp09 source -> kafka1 sink wiring)
    kv = msgs.select(
        F.col("offset").cast("string").alias("key"),
        F.col("body").alias("value"),
    )
    prepared = KafkaSink("broker:9092", "orders-mirror")._prepare(kv)
    for r in prepared.orderBy("key").collect():
        print(bytes(r.key).decode(), "->", bytes(r.value).decode())


if __name__ == "__main__":
    main()
