"""Reference example parity: examples/kafka-custom-avro-stdout
(reference main.go:70-106) — a user-registered custom coder.

The reference registers a custom Avro decoder for an embedded-schema
wire format (magic byte 1 + version byte + avro body) alongside the
built-in coders. Here the same plug-in surface: a user coder
registered on the CoderRegistry that strips the custom 2-byte header,
chained automatically with the pure-Python Avro decode.

Run: python examples/custom_coder_stdout.py
"""

from __future__ import annotations

import json
import sys

import pyspark.sql.functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from goconnect_spark.functions import avro_py  # noqa: E402
from goconnect_spark.plans.coders import TypeTag, default_registry  # noqa: E402
from goconnect_spark.session import get_spark  # noqa: E402
from goconnect_spark.sources import ListSource  # noqa: E402

SCHEMA = json.dumps(
    {
        "type": "record",
        "name": "Metric",
        "fields": [
            {"name": "name", "type": "string"},
            {"name": "value", "type": "long"},
        ],
    }
)


def main() -> None:
    spark = get_spark("custom-coder")
    spark.sparkContext.setLogLevel("ERROR")

    # wire format: magic 0x01 + version 0x02 + avro body (reference
    # kafka-custom-avro-stdout main.go:74-80)
    payloads = [
        bytearray(b"\x01\x02" + avro_py.encode({"name": f"metric{i}", "value": i * 10}, SCHEMA))
        for i in range(5)
    ]

    registry = default_registry()
    # user plug-in: custom-framed bytes -> raw avro body (the same
    # surface the reference's example registers its decoder on)
    registry.register(
        "binary", "binary",
        lambda c: F.substring(c, 3, 2147483647),
        src_codec="custom-metric", dst_codec="avro-body",
    )

    decode = avro_py.avro_decode_udf(SCHEMA, "name string, value long")
    # declaration-time injection finds the user coder chain
    df, _ = registry.inject(
        ListSource(payloads).read(spark),
        TypeTag("binary", "custom-metric"),
        TypeTag("binary", "avro-body"),
    )
    out = df.withColumn("value", decode(F.col("value"))).withColumn("value", F.to_json("value"))
    rows = [r.value for r in out.orderBy("seq").collect()]
    for r in rows:
        print(r)
    assert rows[2] == '{"name":"metric2","value":20}', rows[2]
    print("custom coder chain: MATCH")
    spark.stop()


if __name__ == "__main__":
    main()
