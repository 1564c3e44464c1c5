"""One-time product-quantization codebook build (the offline index-
build step for the PQ/ADC search path).

Splits the 64-dim embedding into M=4 16-dim subspaces and trains an
independent MLlib k-means (k=16, seed=42) per subspace, printing the
codebooks as quantized-integer literals (floor(c*1e4) — the fixed
fixed-point scheme every similarity query uses for exact cross-engine
dot products). Pasted into goconnect_spark/queries/pq.py as
_PQ_CODEBOOKS_Q; after freezing, encode + ADC scoring are fully
deterministic and oracle-checkable — only this fit stays outside the
oracle, exactly like the IVF coarse quantizer
(tools/build_ivf_centroids.py).

Run: python tools/build_pq_codebooks.py [sf_dir]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

M = 4       # subspaces
SUB = 16    # dims per subspace
K = 16      # codes per subspace


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    from goconnect_spark.session import get_spark
    from goconnect_spark.tables import load

    spark = get_spark("pq-build")
    spark.sparkContext.setLogLevel("ERROR")
    emb = load(spark, "embeddings", sf_dir)
    print(
        f"# PQ codebooks, trained on {sf_dir} "
        f"(M={M} x {SUB} dims, k={K}, seed=42, maxIter=10), floor(c*1e4)"
    )
    print("_PQ_CODEBOOKS_Q = [")
    for m in range(M):
        sub = emb.select(
            array_to_vector(
                F.slice(F.col("embedding").cast("array<double>"), m * SUB + 1, SUB)
            ).alias("features")
        )
        model = KMeans(k=K, seed=42, maxIter=10).fit(sub)
        print(f"    [  # subspace {m}: dims {m * SUB}..{m * SUB + SUB - 1}")
        for c in model.clusterCenters():
            qs = [math.floor(x * 10000) for x in c]
            print("        [" + ", ".join(str(q) for q in qs) + "],")
        print("    ],")
    print("]")


if __name__ == "__main__":
    main()
