"""Kafka contract tests, no broker required (VERDICT r1 item 3).

Spark's Kafka source emits a fixed schema (key, value, topic,
partition, offset, timestamp, timestampType[, headers]); the only
untestable piece in the sandbox is the socket. These tests run the
KVMBinary transform (reference types.go:43-48, io/kafka1/source.go:
107-111) over static DataFrames with that exact schema, headers on
and off, plus the sink-side projection (io/kafka1/sink.go:54-68).
"""

import datetime

import pytest
from pyspark.sql import types as T

from goconnect_spark.sources.core import kafka_records_to_elements
from goconnect_spark.sources.sinks import KafkaSink

KAFKA_SCHEMA = T.StructType(
    [
        T.StructField("key", T.BinaryType()),
        T.StructField("value", T.BinaryType()),
        T.StructField("topic", T.StringType()),
        T.StructField("partition", T.IntegerType()),
        T.StructField("offset", T.LongType()),
        T.StructField("timestamp", T.TimestampType()),
        T.StructField("timestampType", T.IntegerType()),
        T.StructField(
            "headers",
            T.ArrayType(
                T.StructType(
                    [T.StructField("key", T.StringType()), T.StructField("value", T.BinaryType())]
                )
            ),
        ),
    ]
)

TS = datetime.datetime(2026, 1, 2, 3, 4, 5)


def _records(spark, with_headers=True):
    rows = [
        (b"k0", b"v0", "t", 0, 100, TS, 0, [("h1", b"hv1"), ("h2", b"hv2")]),
        (None, b"v1", "t", 1, 101, TS, 0, []),  # null key (kv.NilKey)
        (b"k2", None, "t", 0, 102, TS, 0, None),  # tombstone value
    ]
    df = spark.createDataFrame(rows, KAFKA_SCHEMA)
    return df if with_headers else df.drop("headers")


def test_kafka_elements_with_headers(spark):
    out = kafka_records_to_elements(_records(spark), include_headers=True)
    # element contract: seq/event_time/value struct/partition
    assert [f.name for f in out.schema.fields] == ["seq", "event_time", "value", "partition"]
    vt = out.schema["value"].dataType
    assert [f.name for f in vt.fields] == ["key", "value", "headers"]
    rows = {r.seq: r for r in out.collect()}
    assert sorted(rows) == [100, 101, 102]
    r = rows[100]
    assert bytes(r.value.key) == b"k0" and bytes(r.value.value) == b"v0"
    assert [(h.key, bytes(h.value)) for h in r.value.headers] == [("h1", b"hv1"), ("h2", b"hv2")]
    assert r.event_time == TS and r.partition == 0
    assert rows[101].value.key is None  # null key preserved
    assert rows[102].value.value is None  # tombstone preserved


def test_kafka_elements_without_headers(spark):
    out = kafka_records_to_elements(_records(spark, with_headers=False), include_headers=False)
    vt = out.schema["value"].dataType
    assert [f.name for f in vt.fields] == ["key", "value"]
    assert out.count() == 3


def test_kafka_sink_projection(spark):
    # sink side: key/value cast to binary, extra columns dropped
    # (reference sink.go:54-68 publishes KVBinary key+value only)
    sink = KafkaSink("broker:9092", "out_topic")
    df = spark.createDataFrame(
        [("k", "payload", 7), (None, "p2", 8)], ["key", "value", "junk"]
    )
    prepared = sink._prepare(df)
    assert [f.name for f in prepared.schema.fields] == ["key", "value"]
    assert all(isinstance(f.dataType, T.BinaryType) for f in prepared.schema.fields)
    got = {(bytes(r.key) if r.key is not None else None, bytes(r.value)) for r in prepared.collect()}
    assert got == {(b"k", b"payload"), (None, b"p2")}


def test_kafka_sink_requires_value(spark):
    sink = KafkaSink("broker:9092", "out_topic")
    with pytest.raises(ValueError, match="value"):
        sink._prepare(spark.createDataFrame([(1,)], ["x"]))


def test_kafka_roundtrip_source_shape_to_sink_shape(spark):
    """Full minus-the-socket chain: broker records -> elements ->
    transform -> sink projection keeps key association intact."""
    import pyspark.sql.functions as F

    elements = kafka_records_to_elements(_records(spark), include_headers=True)
    # a typical pipeline: unwrap KVM, transform the payload, re-key
    transformed = elements.select(
        F.col("value.key").alias("key"),
        F.upper(F.decode(F.col("value.value"), "UTF-8")).alias("value"),
    ).where(F.col("value").isNotNull())
    prepared = KafkaSink("b:9092", "t")._prepare(transformed)
    got = {(bytes(r.key) if r.key is not None else None, bytes(r.value)) for r in prepared.collect()}
    assert got == {(b"k0", b"V0"), (None, b"V1")}
