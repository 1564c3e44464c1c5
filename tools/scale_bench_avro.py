"""Avro decode-path scaling measurement (round 13: the codec family's
scale axis, added alongside its driver certificate).

Synthesizes an Avro-framed corpus by materializing the
avro_decode_fold record builder (parity.py) over an m-times replicated
documents table — with the string field padded to ~200 bytes so the
measurement reflects payload-bearing records, not 30-byte toys — then
times a full decode + aggregate pass with the package's Arrow-batched
pure-Python codec (functions/avro_py.py) under the same reader-schema
projection the certificate uses.

The 100 TB question this answers: the decoder is mapInPandas-shaped
(per-batch Python dispatch), so wall must be LINEAR in rows/bytes with
a flat per-row cost — the property that lets a Kafka->Avro ingestion
stage scale by adding executors. Construction is excluded from the
timed region (corpus written to parquet first).

Run: python tools/scale_bench_avro.py [multipliers...]  (default 1 4 16)
Record the table in SCALING.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

BASE = "/root/testdata/sf0.1"


def build_corpus(spark, m: int, out: str) -> None:
    from goconnect_spark.queries.parity import (
        _avro_varint_hex,
        _avro_zz,
    )
    from goconnect_spark.tables import load

    base = load(spark, "documents", BASE).select("doc_id")
    reps = [
        base.select((F.col("doc_id") + F.lit(k * 1_000_000)).alias("doc_id"))
        for k in range(m)
    ]
    docs = reps[0]
    for r in reps[1:]:
        docs = docs.unionAll(r)
    d = F.col("doc_id")
    a = (d % 1000 - 500).cast("long")
    b = (d % 100000).cast("long")
    # payload-bearing string: ~200 chars, content varies per row
    c = F.rpad(F.concat(F.lit("s"), (d % 100).cast("string")), 200, "x")
    dd = (d % 50 - 25).cast("long")
    d_null = d % 5 == 0
    e_idx = (d % 3).cast("long")
    g0 = (d % 7).cast("long")
    g1 = (d % 11).cast("long")
    body_hex = F.concat(
        _avro_varint_hex(_avro_zz(a)),
        _avro_varint_hex(_avro_zz(b)),
        _avro_varint_hex(F.octet_length(c).cast("long") * 2),
        F.hex(c),
        F.when(d_null, F.lit("00")).otherwise(
            F.concat(F.lit("02"), _avro_varint_hex(_avro_zz(dd)))),
        _avro_varint_hex(e_idx * 2),
        F.lit("04"),
        _avro_varint_hex(g0 * 2),
        _avro_varint_hex(g1 * 2),
        F.lit("00"),
    )
    docs.select("doc_id", F.unhex(body_hex).alias("body")).write.parquet(out)


def main() -> None:
    mults = [int(a) for a in sys.argv[1:]] or [1, 4, 16]
    from goconnect_spark.functions.avro_py import avro_decode_udf
    from goconnect_spark.queries.parity import _AVRO_READER, _AVRO_WRITER
    from goconnect_spark.session import get_spark

    spark = get_spark("avro-scale")
    spark.sparkContext.setLogLevel("ERROR")
    for m in mults:
        work = tempfile.mkdtemp(prefix=f"avroscale_{m}x_")
        try:
            build_corpus(spark, m, f"{work}/corpus")
            df = spark.read.parquet(f"{work}/corpus")
            n = df.count()
            mb = (df.agg(F.sum(F.length("body"))).first()[0] or 0) / 1e6
            dec = avro_decode_udf(
                _AVRO_WRITER,
                "a2 int, b double, c string, d int, e string, "
                "g array<int>, f int",
                _AVRO_READER,
            )
            t0 = time.time()
            out = (
                df.select(dec(F.col("body")).alias("r"))
                .select("r.*")
                .agg(F.count(F.lit(1)), F.sum("a2"), F.sum("b"),
                     F.sum(F.length("c")), F.sum("f"))
                .collect()
            )
            wall = time.time() - t0
            print(json.dumps({
                "m": m, "rows": n, "mb": round(mb, 1),
                "decode_s": round(wall, 2),
                "rows_per_s": int(n / wall),
                "mb_per_s": round(mb / wall, 1),
            }), flush=True)
            assert out[0][0] == n
        finally:
            shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
