"""Reference example parity: examples/list-kafka — the throttled
replay load-generator (reference examples/list-kafka/main.go:68-80):

    RoundRobin(10,000,000, [xml doc]) . Buffer(5000)
        . Throttle(2, time.Second) . kafka1.Sink{topic}

Two renditions, since no broker exists in this sandbox:

1. the real throttled stream: `.throttle(r)` pushed into the source's
   rowsPerSecond (the Spark analog of the reference's inter-emit
   sleep, util/throttler.go) feeding a replayed document column; a
   short run must emit ~r rows/sec, not the unthrottled firehose.
   Buffer(5000) is micro-batch sizing — in Spark that is the
   trigger interval times the rate, not an operator (SURVEY §2.4).

2. the bounded replay mapped through the KafkaSink record contract
   (value -> binary), written to a memory sink: everything the broker
   would receive, minus the socket. The full 10M-row replay is scaled
   to 10k here; RoundRobinSource is a `spark.range` projection, so
   the replay count is a literal — 10M costs the same plan.

Run: python examples/list_kafka_loadgen.py
"""

from __future__ import annotations

import sys
import time

import pyspark.sql.functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from goconnect_spark.pipeline import Pipeline  # noqa: E402
from goconnect_spark.session import get_spark  # noqa: E402
from goconnect_spark.sources.core import RateSource, RoundRobinSource  # noqa: E402
from goconnect_spark.sources.sinks import MemorySink  # noqa: E402

XML_DOC = (
    '<?xml version="1.0" encoding="UTF-8"?>'
    '<transferTemplate version="4.00" id="baf9df73-45c2-4bb0-a085-292232ab66bc">'
    "<name>BASIC_TEMPLATE</name><priority>0</priority></transferTemplate>"
)


def main():
    spark = get_spark("list-kafka-loadgen")
    spark.sparkContext.setLogLevel("ERROR")

    # 1: throttled streaming replay — 40 rows/sec instead of the
    # reference's 2/sec so a 3-second run shows the bound clearly
    rate = 40
    sink = MemorySink("loadgen")
    p = (
        Pipeline(spark)
        .root(RateSource(rows_per_second=999_999))
        .throttle(rate)
        .map(F.lit(XML_DOC), in_type=None)
        .trigger_every(0.5)
    )
    q = p.run(sink, await_termination=False)
    time.sleep(3.5)
    q.stop()
    n = spark.sql("select count(*) n from loadgen").first().n
    print(f"throttled stream: {n} rows in ~3 s at {rate}/s cap "
          f"(unthrottled would be ~3M)")
    assert n <= rate * 6, "throttle did not bound the source rate"

    # 2: bounded replay through the Kafka record contract
    replay = (
        Pipeline(spark)
        .root(RoundRobinSource(10_000, [XML_DOC]))
        .map(lambda v: F.encode(v, "UTF-8"))
        .dataframe()
        .select(F.col("value"))  # KafkaSink contract: binary value col
    )
    print("kafka-shaped replay rows:", replay.count(),
          "| value type:", dict(replay.dtypes)["value"])


if __name__ == "__main__":
    main()
