"""Quantile-summary crossover measurement (round 14).

SCALING.md's r14 row records the honest small-scale finding: per-GROUP
exact percentiles beat the two-level summary while every group fits an
executor. This axis measures the other side of that cliff — ONE group,
n doubles — where Spark's exact `percentile` is a single-reducer
aggregation (every value ships to one buffer) while the stride summary
(operators/quantiles.py) does one (key, block) shuffle of k-point
summaries and merges <= k * blocks rows.

Input is generated in-plan (spark.range + an integer mix), identical
for both measurements, so the comparison isolates the aggregation
shapes. p50 values are cross-checked to within the summary's
documented rank tolerance.

Run: python tools/scale_bench_quantiles.py [n_millions...]  (default 1 4 16 64)
Record the table in SCALING.md.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

K = 256
BLOCKS = 64


def _one_size(spark, n: int) -> dict:
    from goconnect_spark.operators.quantiles import stride_quantiles

    df = spark.range(n).select(
        F.col("id"),
        F.lit("g").alias("key"),
        ((F.col("id") * 2654435761) % 2147483647).cast("double").alias("v"),
    ).withColumn("blk", F.col("id") % BLOCKS)

    t0 = time.time()
    est = stride_quantiles(
        df, ["key"], "v", "id", "blk", K,
        [("p50", 1, 2), ("p99", 99, 100)],
    ).collect()[0]
    sketch_wall = time.time() - t0
    out = {
        "n": n, "sketch_s": round(sketch_wall, 2),
        "sketch_p50": est.p50,
    }

    # the exact side is the single-reducer shape under test: it can
    # legitimately OOM where the summary sails through — record that
    # outcome instead of dying (the whole point of the axis)
    try:
        t0 = time.time()
        exact = df.groupBy("key").agg(
            F.expr("percentile(v, 0.5)").alias("p50"),
            F.expr("percentile(v, 0.99)").alias("p99"),
        ).collect()[0]
        out["exact_s"] = round(time.time() - t0, 2)
        out["exact_p50"] = round(exact.p50, 1)
        # the mix is near-uniform on [0, 2^31): p50 must sit within
        # the summary's rank tolerance (~BLOCKS strides) of exact
        tol = 2147483647.0 * (BLOCKS * math.ceil(n / BLOCKS / K) + 1) / n * 4
        assert abs(est.p50 - exact.p50) < max(tol, 1e7), (est.p50, exact.p50)
    except AssertionError:
        raise
    except Exception as e:  # noqa: BLE001 - OOM/stage failure IS the datum
        out["exact_s"] = None
        out["exact_error"] = f"{type(e).__name__}: heap exhausted" \
            if "OutOfMemory" in str(e) else type(e).__name__
    return out


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [1, 4, 16, 64]
    from goconnect_spark.session import get_spark

    for mn in sizes:
        # fresh JVM-side session per size: an exact-side OOM must not
        # poison the next measurement
        spark = get_spark(f"quantile-scale-{mn}m")
        spark.sparkContext.setLogLevel("ERROR")
        try:
            print(json.dumps(_one_size(spark, mn * 1_000_000)), flush=True)
        finally:
            spark.stop()


if __name__ == "__main__":
    main()
