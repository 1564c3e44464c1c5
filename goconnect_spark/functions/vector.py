"""Reusable vector/similarity column builders (public API).

Two families:

- exact float cosine (`cosine_sim`) via zip_with/aggregate — the
  normal single-engine path (sequential fold, stays in codegen);
- quantized integer cosine (`quantize`, used by queries/similarity.py)
  — floor(x*10^4) fixed-point, dot products become exact bigint sums:
  order-independent, reproducible across engines, and the standard
  int8/int16 quantization trade ANN systems make anyway.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold double dot product (deterministic order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine_sim(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def quantize(emb: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id",
             scale: int = 10000, keep_cols: tuple = ()) -> DataFrame:
    """Explode vectors to (id, d, q) fixed-point rows. Dot products
    over q are exact integer sums — the cross-engine-deterministic
    representation used by every similarity query."""
    return emb.select(
        id_col,
        *keep_cols,
        F.posexplode(vec_col).alias("d", "x"),
    ).select(
        id_col,
        *keep_cols,
        "d",
        F.floor(F.col("x").cast("double") * scale).cast("long").alias("q"),
    )


def quantized_norms(quant: DataFrame, id_col: str = "vec_id") -> DataFrame:
    return quant.groupBy(id_col).agg(
        F.sqrt(F.sum(F.col("q") * F.col("q")).cast("double")).alias("nrm")
    )


def brute_force_topk(quant: DataFrame, probe_ids: DataFrame, k: int = 5,
                     id_col: str = "vec_id") -> DataFrame:
    """Top-k neighbors for each probe by quantized cosine; probes are
    broadcast, corpus streams — one shuffle on (probe, vec)."""
    from pyspark.sql import Window

    norms = quantized_norms(quant, id_col)
    probes = quant.join(F.broadcast(probe_ids), id_col).select(
        F.col(id_col).alias("probe_id"), F.col("d").alias("pd"), F.col("q").alias("pq")
    )
    dots = (
        quant.join(F.broadcast(probes), (F.col("d") == F.col("pd")) & (F.col(id_col) != F.col("probe_id")))
        .groupBy("probe_id", id_col)
        .agg(F.sum(F.col("q") * F.col("pq")).alias("dot"))
    )
    cos = (
        dots.join(norms.alias("nv"), id_col)
        .join(
            norms.select(F.col(id_col).alias("probe_id"), F.col("nrm").alias("pnrm")),
            "probe_id",
        )
        .select(
            "probe_id",
            id_col,
            (F.col("dot").cast("double") / (F.col("nrm") * F.col("pnrm"))).alias("cosine"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cosine"), F.asc(id_col))
    return cos.withColumn("rk", F.row_number().over(w)).where(F.col("rk") <= k)
