"""Embeddings-family (vector search) scaling measurement — companion
to the dedup/relational/events scale benches.

Replica k of the sf0.1 embeddings table (2,000 x 64-dim) gets offset
vec_ids and its embedding array ROTATED by k+ positions — deterministic,
cheap, and rotation preserves the norm while decorrelating replicas,
so the corpus grows with distinct vectors instead of exact duplicates
(which would only create tie-break noise).

What must hold as the corpus grows m-x with a FIXED probe set:
- brute force / SQ8 coarse / PQ ADC scans are (probes x corpus)
  aggregations — wall grows linearly, never quadratically;
- IVF-routed search (cells partition the corpus) touches ~1/k of the
  rows per probe — its wall should grow with cell size, i.e. linearly
  but k-fold cheaper than the exhaustive scans;
- the encode/index-build side (PQ codes, cell assignment) is one
  linear pass.

Run: python tools/scale_bench_embeddings.py [multipliers...]  (default 1 5 10)
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
_ID_STRIDE = 100_000_000

QUERIES = [
    "cosine_topk",        # exhaustive full-precision baseline
    "ann_sq8_rerank",     # exhaustive int8 coarse scan + re-rank
    "ann_pq_adc_rerank",  # exhaustive 4-int ADC scan + re-rank
    "ann_ivfpq_topk",     # routed: cell-local ADC + re-rank
    "ann_ivf_kmeans_topk",  # routed: cell-local full-precision
]

if os.environ.get("SCALE_QUERIES"):
    QUERIES = [q for q in QUERIES if q in os.environ["SCALE_QUERIES"].split(",")]


def synthesize(spark, m: int, out_dir: str) -> None:
    emb = spark.read.parquet(f"{BASE}/embeddings.parquet")
    reps = spark.range(m).select(F.col("id").cast("int").alias("k"))
    dim = len(emb.select("embedding").head()[0])
    out = (
        emb.crossJoin(reps)
        .select(
            # widen k first: k(int) * 1e8 overflows int32 at m >= 22
            (F.col("vec_id") + F.col("k").cast("long") * _ID_STRIDE).alias("vec_id"),
            F.expr(
                f"concat(slice(embedding, k % {dim} + 1, {dim} - k % {dim}),"
                f" slice(embedding, 1, k % {dim}))"
            ).alias("embedding"),
            "label",
        )
    )
    out.write.mode("overwrite").parquet(f"{out_dir}/embeddings.parquet")


def main():
    mults = [int(a) for a in sys.argv[1:]] or [1, 5, 10]
    from goconnect_spark.queries import all_queries
    from goconnect_spark.session import get_spark

    spark = get_spark("emb-scale")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()

    for m in mults:
        work = tempfile.mkdtemp(prefix=f"emb_scale_m{m}_")
        try:
            synthesize(spark, m, work)
            n_vec = spark.read.parquet(f"{work}/embeddings.parquet").count()
            for name in QUERIES:
                t0 = time.time()
                rows = qs[name](spark, work).count()
                print(
                    json.dumps(
                        {
                            "query": name,
                            "multiplier": m,
                            "vectors": n_vec,
                            "rows": rows,
                            "sec": round(time.time() - t0, 2),
                        }
                    ),
                    flush=True,
                )
            spark.catalog.clearCache()
        finally:
            shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
