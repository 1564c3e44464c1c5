"""Reference example parity: examples/kafka-sr1-avro-sr2-kafka
(reference main.go:75-83) — consume Confluent-Avro records encoded
against schema registry 1, project them into the subject's target
schema, and republish encoded against schema registry 2.

No broker/registry in the sandbox, so the Kafka edge is a static
DataFrame with Spark's exact Kafka source schema and the registries
are the in-memory stub (the REST client in functions/serde.py is the
drop-in for live registries). Everything between the sockets — wire
header parse, per-id writer-schema decode, GenericProjector schema
evolution, target registration, re-encode under the new id — is the
real production path.

Run: python examples/kafka_sr1_avro_sr2_kafka.py
"""

from __future__ import annotations

import datetime
import json
import sys

import pyspark.sql.functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from goconnect_spark.functions import avro_py  # noqa: E402
from goconnect_spark.functions.serde import (  # noqa: E402
    InMemorySchemaRegistry,
    sr_reencode,
    sr_schema_id,
)
from goconnect_spark.session import get_spark  # noqa: E402
from goconnect_spark.sources.core import kafka_records_to_elements  # noqa: E402
from goconnect_spark.sources.sinks import KafkaSink  # noqa: E402

V1 = {
    "type": "record",
    "name": "User",
    "fields": [
        {"name": "first_name", "type": "bytes"},
        {"name": "last_name", "type": "bytes"},
        {"name": "Phone", "type": ["null", "int"]},
    ],
}
V2 = {
    "type": "record",
    "name": "User",
    "fields": [
        {"name": "FirstName", "type": "string", "aliases": ["first_name"]},
        {"name": "LastName", "type": "string", "aliases": ["last_name"]},
        {"name": "Phone", "type": ["null", "int"], "default": None},
        {"name": "Region", "type": "string", "default": "EU"},
    ],
}


def main():
    spark = get_spark("sr1-avro-sr2")
    spark.sparkContext.setLogLevel("ERROR")

    sr1 = InMemorySchemaRegistry(start_id=100)
    v1_id = sr1.register("users-value", json.dumps(V1))
    sr2 = InMemorySchemaRegistry(start_id=1)

    users = [
        {"first_name": b"Ada", "last_name": b"Lovelace", "Phone": 41},
        {"first_name": b"Alan", "last_name": b"Turing", "Phone": None},
    ]
    ts = datetime.datetime(2026, 1, 1)
    records = spark.createDataFrame(
        [
            (f"u{i}".encode(), bytes([0]) + v1_id.to_bytes(4, "big") + avro_py.encode(u, V1),
             "users", 0, i, ts, 0)
            for i, u in enumerate(users)
        ],
        "key binary, value binary, topic string, partition int, offset long, "
        "timestamp timestamp, timestampType int",
    )

    elements = kafka_records_to_elements(records, include_headers=False)
    inbound = elements.select(
        F.col("value.key").alias("key"), F.col("value.value").alias("value")
    )
    print("inbound schema ids:", [r.sid for r in inbound.select(sr_schema_id(F.col("value")).alias("sid")).distinct().collect()])

    outbound, new_id = sr_reencode(inbound, "value", sr1, sr2, "users-value", json.dumps(V2))
    print("registered under registry 2 as id", new_id)

    prepared = KafkaSink("broker2:9092", "users-mirrored")._prepare(outbound)
    for r in prepared.collect():  # the sink publishes these bytes
        body = bytes(r.value)
        print(bytes(r.key), "->", avro_py.decode(body[5:], V2), f"(wire id {int.from_bytes(body[1:5], 'big')})")


if __name__ == "__main__":
    main()
