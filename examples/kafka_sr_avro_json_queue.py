"""Reference example parity: examples/kafka-sr-avro-json-sqs —
consume Confluent-Avro records, decode them against the registry's
writer schema, re-shape to JSON, and publish each record to a message
queue (the reference uses SQS; here the pluggable QueueSink, which is
the amqp09/SQS analog — swap the publisher_factory for a real client).

Run: python examples/kafka_sr_avro_json_queue.py
"""

from __future__ import annotations

import datetime
import functools
import json
import sys
import tempfile

import pyspark.sql.functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from goconnect_spark.functions import avro_py  # noqa: E402
from goconnect_spark.functions.serde import (  # noqa: E402
    InMemorySchemaRegistry,
    sr_strip_header,
)
from goconnect_spark.session import get_spark  # noqa: E402
from goconnect_spark.sources.core import kafka_records_to_elements  # noqa: E402
from goconnect_spark.sources.queue_sink import FilePublisher, QueueSink  # noqa: E402

SCHEMA = {
    "type": "record",
    "name": "Order",
    "fields": [
        {"name": "order_id", "type": "long"},
        {"name": "status", "type": {"type": "enum", "name": "St", "symbols": ["NEW", "SHIPPED"]}},
        {"name": "total", "type": "double"},
    ],
}


def main():
    spark = get_spark("sr-avro-json-queue")
    spark.sparkContext.setLogLevel("ERROR")

    registry = InMemorySchemaRegistry(start_id=5)
    sid = registry.register("orders-value", json.dumps(SCHEMA))

    orders = [
        {"order_id": 1, "status": "NEW", "total": 12.5},
        {"order_id": 2, "status": "SHIPPED", "total": 99.0},
    ]
    ts = datetime.datetime(2026, 1, 1)
    records = spark.createDataFrame(
        [
            (None, bytes([0]) + sid.to_bytes(4, "big") + avro_py.encode(o, SCHEMA), "orders",
             0, i, ts, 0)
            for i, o in enumerate(orders)
        ],
        "key binary, value binary, topic string, partition int, offset long, "
        "timestamp timestamp, timestampType int",
    )

    elements = kafka_records_to_elements(records, include_headers=False)
    decoded = elements.select(
        avro_py.avro_decode_udf(
            json.dumps(SCHEMA), "order_id bigint, status string, total double"
        )(sr_strip_header(F.col("value.value"))).alias("rec")
    )
    jsonified = decoded.select(F.to_json("rec").alias("value"))

    out_dir = tempfile.mkdtemp(prefix="queue_out_")
    sink = QueueSink("orders-exchange", "orders.json",
                     publisher_factory=functools.partial(FilePublisher, out_dir))
    sink.write(jsonified)

    for ex, rk, body, _pid in FilePublisher.read_all(out_dir):
        print(f"{ex}/{rk} <- {body.decode()}")


if __name__ == "__main__":
    main()
