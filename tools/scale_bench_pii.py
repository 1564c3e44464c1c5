"""PII scrub scaling measurement (round 14: the scrub family's scale
axis, added alongside its driver certificate).

Synthesizes a payload-bearing corpus (documents text replicated m
times and padded to ~400 chars, PII planted with the certificate's
own column-expression plant) written to parquet first, then times a
full detect + Luhn-validate + redact + aggregate pass with
functions/pii.py.

The 100 TB question this answers: the scrub is pure column
expressions (regexp_extract_all / regexp_replace / higher-order
aggregate inside whole-stage codegen, zero Python boundary, zero
shuffle before the 6-row rollup), so wall must be LINEAR in
rows/bytes with a flat per-row cost — the property that lets a
corpus-scrub stage scale by adding executors. Construction is
excluded from the timed region.

Also times the quantile-summary twin (operators/quantiles.py) over
the same replicated corpus' n_chars column against the exact
sort-based percentile, reporting both walls — the gap is the price
of a full sort the summary avoids.

Run: python tools/scale_bench_pii.py [multipliers...]  (default 1 4 16)
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
    from goconnect_spark.queries.curation import _pii_plant
    from goconnect_spark.tables import load

    base = load(spark, "documents", BASE).select("doc_id", "source", "text")
    reps = [
        base.select(
            (F.col("doc_id") + F.lit(k * 1_000_000)).alias("doc_id"),
            "source",
            "text",
        )
        for k in range(m)
    ]
    docs = reps[0]
    for r in reps[1:]:
        docs = docs.unionAll(r)
    docs.select(
        "doc_id",
        "source",
        F.concat(
            F.rpad(F.col("text"), 400, "y"), _pii_plant(F.col("doc_id"))
        ).alias("pt"),
    ).write.parquet(out)


def main() -> None:
    mults = [int(a) for a in sys.argv[1:]] or [1, 4, 16]
    from goconnect_spark.functions.pii import with_pii_scrub
    from goconnect_spark.operators.quantiles import stride_quantiles
    from goconnect_spark.session import get_spark

    spark = get_spark("pii-scale")
    spark.sparkContext.setLogLevel("ERROR")
    for m in mults:
        work = tempfile.mkdtemp(prefix=f"piiscale_{m}x_")
        try:
            build_corpus(spark, m, f"{work}/corpus")
            df = spark.read.parquet(f"{work}/corpus")
            n = df.count()
            mb = (df.agg(F.sum(F.octet_length("pt"))).first()[0] or 0) / 1e6

            t0 = time.time()
            out = (
                with_pii_scrub(df, "pt", out_col="red")
                .groupBy("source")
                .agg(
                    F.count(F.lit(1)).alias("n_docs"),
                    F.sum("n_emails").alias("e"),
                    F.sum("n_cc_valid").alias("ccv"),
                    F.sum(F.octet_length("red")).alias("bytes_red"),
                )
                .collect()
            )
            scrub_wall = time.time() - t0
            assert sum(r.n_docs for r in out) == n

            qdf = df.select(
                "doc_id", "source",
                F.octet_length("pt").cast("double").alias("v"),
            ).withColumn("blk", F.col("doc_id") % 32)
            t0 = time.time()
            est = stride_quantiles(
                qdf, ["source"], "v", "doc_id", "blk", 64,
                [("p50", 1, 2), ("p99", 99, 100)],
            ).collect()
            sketch_wall = time.time() - t0
            t0 = time.time()
            spark.sql("select 1").collect()  # noop fence
            exact = (
                qdf.groupBy("source")
                .agg(F.expr("percentile(v, 0.5)"), F.expr("percentile(v, 0.99)"))
                .collect()
            )
            exact_wall = time.time() - t0
            assert len(est) == len(exact)

            print(json.dumps({
                "m": m, "rows": n, "mb": round(mb, 1),
                "scrub_s": round(scrub_wall, 2),
                "scrub_rows_per_s": int(n / scrub_wall),
                "scrub_mb_per_s": round(mb / scrub_wall, 1),
                "qsketch_s": round(sketch_wall, 2),
                "qexact_s": round(exact_wall, 2),
            }), flush=True)
        finally:
            shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
