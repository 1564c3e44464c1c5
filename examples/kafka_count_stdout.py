"""Reference example parity: examples/kafka-count-stdout — consume a
Kafka topic and print a running count (the reference's
`.Count().TriggerEvery(d)` fold, def.go:61-65 + 83-87).

Two renditions:
1. the real streaming fold over a rate source (update-mode snapshots
   per trigger — the exact Fold contract) since no broker exists here;
2. the Kafka column mapping applied to a static Kafka-shaped frame,
   counted in batch — everything the broker would feed, minus the
   socket.

Run: python examples/kafka_count_stdout.py
"""

from __future__ import annotations

import datetime
import sys
import time

import pyspark.sql.functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from goconnect_spark.session import get_spark  # noqa: E402
from goconnect_spark.sources.core import kafka_records_to_elements  # noqa: E402
from goconnect_spark.streaming.run import streaming_fold  # noqa: E402


def main():
    spark = get_spark("kafka-count-stdout")
    spark.sparkContext.setLogLevel("ERROR")

    # 1: running count with processing-time trigger (Fold + TriggerEvery)
    stream = spark.readStream.format("rate").option("rowsPerSecond", "500").load()
    q = streaming_fold(
        stream, [F.count(F.lit(1)).alias("count")], "kafka_count",
        trigger={"processingTime": "1 seconds"},
    )
    time.sleep(4)
    q.stop()
    snaps = spark.sql("select * from kafka_count").collect()
    print("running-count snapshots:", [r["count"] for r in snaps])

    # 2: the Kafka mapping itself, batch-counted
    ts = datetime.datetime(2026, 1, 1)
    records = spark.createDataFrame(
        [(None, f"m{i}".encode(), "t", 0, i, ts, 0) for i in range(250)],
        "key binary, value binary, topic string, partition int, offset long, "
        "timestamp timestamp, timestampType int",
    )
    n = kafka_records_to_elements(records, include_headers=False).count()
    print("kafka-shaped batch count:", n)


if __name__ == "__main__":
    main()
