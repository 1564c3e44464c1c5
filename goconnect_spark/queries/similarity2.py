"""Scalar-quantized (SQ8-style) similarity operators.

Production vector search at 100 TB rarely scans full-precision
vectors: it scans a memory-compressed copy (int8 scalar quantization
or PQ codebooks) and re-ranks the survivors at full precision. These
two queries implement that structure with a DETERMINISTIC quantizer
(floor(x*100) — int8-range levels, no trained codebook) so the DuckDB
oracle can replay it exactly:

- ann_sq8_rerank: coarse top-R per probe from the int8-scale table
  (integer dot products — exact, orderable, tie-broken by vec_id),
  then exact cosine re-rank of only those R candidates at the
  full-precision scale. Same output contract as cosine_topk.
- embedding_quantization_error: what the compression costs — per-label
  residual statistics between the 1e-4-scale and 1e-2-scale grids.
  All integer arithmetic until the final divisions/SQRT (identical
  operands in both engines).

Scale: the coarse scan is the bandwidth saver (the int8 copy is ~4x
smaller than float32, ~100x smaller than fp64 accumulators); the
exact re-rank touches R rows per probe. Candidate generation stays an
aggregation + per-probe top-R — no pair blow-up beyond (probes x
corpus), which is the irreducible cost of exhaustive coarse scoring;
IVF cell routing (ann_ivf_topk) composes with this to cut that too.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from goconnect_spark.queries.similarity import (
    _N_PROBES,
    _Q,
    _TOP_K,
    _norms_cached,
    _quant_cached,
)
from goconnect_spark.tables import load

QUERIES = {}
ORACLE = {}

_CQ = 100  # coarse (int8-range) scale: floor(x*100) in [-128, 127] here
_R_CAND = 25  # coarse overfetch: re-rank 5x the final k


def _coarse_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-cached (vec_id, label, d, q, c): the full-precision and
    coarse grids from ONE explode — the compressed-copy table a vector
    store keeps resident."""
    from goconnect_spark.queries.corpus import cached_table

    def build():
        return (
            load(spark, "embeddings", sf_dir)
            .select("vec_id", "label", F.posexplode("embedding").alias("d", "x"))
            .select(
                "vec_id",
                "label",
                "d",
                F.floor(F.col("x").cast("double") * _Q).cast("long").alias("q"),
                F.floor(F.col("x").cast("double") * _CQ).cast("long").alias("c"),
            )
        )

    return cached_table(spark, sf_dir, "emb_coarse", build)


_COARSE_CTE = f"""
coarse AS (
  SELECT vec_id, label, d - 1 AS d,
         CAST(FLOOR(CAST(x AS DOUBLE) * {_Q}) AS BIGINT) AS q,
         CAST(FLOOR(CAST(x AS DOUBLE) * {_CQ}) AS BIGINT) AS c
  FROM (SELECT vec_id, label, unnest(embedding) AS x,
               generate_subscripts(embedding, 1) AS d
        FROM embeddings)
),
norms AS (
  SELECT vec_id, SQRT(CAST(SUM(q * q) AS DOUBLE)) AS nrm FROM coarse GROUP BY vec_id
)
"""


# --------------------------------------------------------------------
# Coarse int8 scan -> exact re-rank.
# --------------------------------------------------------------------
def ann_sq8_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    coarse = _coarse_cached(spark, sf_dir)
    quant = _quant_cached(spark, sf_dir)
    norms = _norms_cached(spark, sf_dir)
    cprobes = coarse.where(F.col("vec_id") < _N_PROBES).select(
        F.col("vec_id").alias("probe_id"), F.col("d").alias("pd"), F.col("c").alias("pc")
    )
    cdots = (
        coarse.join(
            F.broadcast(cprobes),
            (F.col("d") == F.col("pd")) & (F.col("vec_id") != F.col("probe_id")),
        )
        .groupBy("probe_id", "vec_id")
        .agg(F.sum(F.col("c") * F.col("pc")).alias("cdot"))
    )
    wc = Window.partitionBy("probe_id").orderBy(F.desc("cdot"), F.asc("vec_id"))
    cand = (
        cdots.withColumn("crk", F.row_number().over(wc))
        .where(F.col("crk") <= _R_CAND)
        .select("probe_id", "vec_id")
    )
    qprobes = quant.where(F.col("vec_id") < _N_PROBES).select(
        F.col("vec_id").alias("probe_id"), F.col("d").alias("pd"), F.col("q").alias("pq")
    )
    qp = qprobes.withColumnRenamed("probe_id", "qp_probe")
    dots = (
        cand.join(quant.select("vec_id", "d", "q"), "vec_id")
        .join(
            F.broadcast(qp),
            (F.col("probe_id") == F.col("qp_probe")) & (F.col("d") == F.col("pd")),
        )
        .groupBy("probe_id", "vec_id")
        .agg(F.sum(F.col("q") * F.col("pq")).alias("dot"))
    )
    cos = (
        dots.join(norms.alias("nv"), "vec_id")
        .join(
            norms.select(
                F.col("vec_id").alias("probe_id"), F.col("nrm").alias("pnrm")
            ),
            "probe_id",
        )
        .select(
            "probe_id",
            "vec_id",
            (F.col("dot").cast("double") / (F.col("nrm") * F.col("pnrm"))).alias(
                "cosine"
            ),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        cos.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= _TOP_K)
        .select("probe_id", "rk", "vec_id", "cosine")
        .orderBy("probe_id", "rk")
    )


_SQ8_SQL = f"""
WITH {_COARSE_CTE},
cprobes AS (SELECT vec_id AS probe_id, d AS pd, c AS pc FROM coarse WHERE vec_id < {_N_PROBES}),
cdots AS (
  SELECT p.probe_id, v.vec_id, SUM(v.c * p.pc) AS cdot
  FROM coarse v JOIN cprobes p ON v.d = p.pd AND v.vec_id <> p.probe_id
  GROUP BY p.probe_id, v.vec_id
),
cand AS (
  SELECT probe_id, vec_id FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY cdot DESC, vec_id ASC) AS crk
    FROM cdots
  ) WHERE crk <= {_R_CAND}
),
qprobes AS (SELECT vec_id AS probe_id, d AS pd, q AS pq FROM coarse WHERE vec_id < {_N_PROBES}),
dots AS (
  SELECT c.probe_id, c.vec_id, SUM(v.q * p.pq) AS dot
  FROM cand c
  JOIN coarse v ON v.vec_id = c.vec_id
  JOIN qprobes p ON p.probe_id = c.probe_id AND p.pd = v.d
  GROUP BY c.probe_id, c.vec_id
),
cos AS (
  SELECT d.probe_id, d.vec_id,
         (CAST(d.dot AS DOUBLE) / (nv.nrm * np.nrm)) AS cosine
  FROM dots d
  JOIN norms nv ON nv.vec_id = d.vec_id
  JOIN norms np ON np.vec_id = d.probe_id
)
SELECT probe_id, rk, vec_id, cosine
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY cosine DESC, vec_id ASC) AS rk
  FROM cos
) WHERE rk <= {_TOP_K}
ORDER BY probe_id, rk
"""

QUERIES["ann_sq8_rerank"] = ann_sq8_rerank
ORACLE["ann_sq8_rerank"] = _SQ8_SQL


# --------------------------------------------------------------------
# Quantization residual statistics per label.
# --------------------------------------------------------------------
def embedding_quantization_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Residual between the 1e-4 grid and the 1e-2 (int8-range) grid:
    r = q - 100*c is an INTEGER in [0, 99] (floor identity:
    floor(100*y) >= 100*floor(y)), so per-vector SSE and every
    aggregate below it are exact; the only doubles are the final
    mean/RMS divisions and SQRT over identical operands."""
    coarse = _coarse_cached(spark, sf_dir)
    per_vec = (
        coarse.withColumn("r", F.col("q") - F.lit(_CQ) * F.col("c"))
        .groupBy("vec_id", "label")
        .agg(
            F.sum(F.col("r") * F.col("r")).alias("sse"),
            F.count(F.lit(1)).alias("nd"),
        )
    )
    return (
        per_vec.groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vecs"),
            F.sum("sse").cast("long").alias("total_sse"),
            F.max("sse").cast("long").alias("max_sse"),
            F.sum("nd").cast("long").alias("total_dims"),
        )
        .withColumn("mean_sse", F.col("total_sse") / F.col("n_vecs").cast("double"))
        .withColumn(
            "rms_residual",
            F.sqrt(F.col("total_sse") / F.col("total_dims").cast("double")),
        )
        .select(
            "label", "n_vecs", "total_sse", "max_sse", "total_dims",
            "mean_sse", "rms_residual",
        )
        .orderBy("label")
    )


_QERR_SQL = f"""
WITH {_COARSE_CTE},
per_vec AS (
  SELECT vec_id, label,
         SUM((q - {_CQ} * c) * (q - {_CQ} * c)) AS sse,
         COUNT(*) AS nd
  FROM coarse
  GROUP BY vec_id, label
)
SELECT label,
       CAST(COUNT(*) AS BIGINT) AS n_vecs,
       CAST(SUM(sse) AS BIGINT) AS total_sse,
       CAST(MAX(sse) AS BIGINT) AS max_sse,
       CAST(SUM(nd) AS BIGINT) AS total_dims,
       (CAST(SUM(sse) AS BIGINT) / CAST(COUNT(*) AS DOUBLE)) AS mean_sse,
       SQRT(CAST(SUM(sse) AS BIGINT) / CAST(SUM(nd) AS DOUBLE)) AS rms_residual
FROM per_vec
GROUP BY label
ORDER BY label
"""

QUERIES["embedding_quantization_error"] = embedding_quantization_error
ORACLE["embedding_quantization_error"] = _QERR_SQL


# --------------------------------------------------------------------
# Dimension covariance/correlation diagnostics.
# --------------------------------------------------------------------
_COV_TOP = 20


def embedding_dim_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-|corr| correlated dimension pairs of the embedding matrix —
    the redundancy diagnostic behind whitening/PCA decisions (highly
    correlated dims mean the effective dimensionality is lower than
    the stored one, i.e. storage and ANN distance budgets are being
    wasted).

    Moments come from the quantized grid, so every sum is an exact
    integer: per-dim (Σq, Σq²) in one aggregation, per-pair Σq_i·q_j
    from an IN-ROW pair expansion of each vector (explode dims, then
    explode the tail slice of the same row's array — no self-join
    shuffle at (vec x dim) granularity; the only shuffle is the
    groupBy on the 64·63/2 = 2016 pair keys). Pearson corr =
    (nΣxy - ΣxΣy) / (sqrt(nΣxx-Σx²)·sqrt(nΣyy-Σy²)) over identical
    integer operands in both engines. Ranking and ties are decided by
    integer |cov_num| then (d_i, d_j) — no float ordering.

    Scale: linear in vectors x dims² with map-side partial aggregation
    into a constant-size (2016-key) state — the same shape as a
    distributed covariance matrix build at 100 TB."""
    emb = load(spark, "embeddings", sf_dir)
    qarr = emb.select(
        "vec_id",
        F.expr(f"transform(embedding, x -> cast(floor(cast(x as double) * {_Q}) as bigint))").alias("qa"),
    )
    pairs = (
        qarr.select("vec_id", F.posexplode("qa").alias("i", "qi"), F.col("qa"))
        .select(
            "i",
            "qi",
            F.posexplode(F.expr("slice(qa, i + 2, size(qa))")).alias("joff", "qj"),
        )
        .select(
            F.col("i").alias("d_i"),
            (F.col("i") + 1 + F.col("joff")).alias("d_j"),
            "qi",
            "qj",
        )
    )
    pair_stats = pairs.groupBy("d_i", "d_j").agg(
        F.count(F.lit(1)).cast("long").alias("n_vecs"),
        F.sum(F.col("qi") * F.col("qj")).cast("long").alias("sxy"),
    )
    quant = _quant_cached(spark, sf_dir)
    dim_stats = quant.groupBy("d").agg(
        F.sum("q").cast("long").alias("s"),
        F.sum(F.col("q") * F.col("q")).cast("long").alias("ss"),
    )
    di = dim_stats.select(
        F.col("d").alias("d_i"), F.col("s").alias("sx"), F.col("ss").alias("sxx")
    )
    dj = dim_stats.select(
        F.col("d").alias("d_j"), F.col("s").alias("sy"), F.col("ss").alias("syy")
    )
    stats = (
        pair_stats.join(F.broadcast(di), "d_i")
        .join(F.broadcast(dj), "d_j")
        .withColumn(
            "cov_num",
            (F.col("n_vecs") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("long"),
        )
        .withColumn(
            "corr",
            # constant dims have zero variance: corr undefined -> NULL
            # (integer-exact predicate; unguarded the division ERRORS
            # under ANSI mode — caught by the pathological differential)
            F.when(
                (F.col("n_vecs") * F.col("sxx") - F.col("sx") * F.col("sx") > 0)
                & (F.col("n_vecs") * F.col("syy") - F.col("sy") * F.col("sy") > 0),
                F.col("cov_num").cast("double")
                / (
                    F.sqrt((F.col("n_vecs") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double"))
                    * F.sqrt((F.col("n_vecs") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double"))
                ),
            ),
        )
    )
    return (
        stats.orderBy(F.abs(F.col("cov_num")).desc(), "d_i", "d_j")
        .limit(_COV_TOP)
        .select("d_i", "d_j", "n_vecs", "cov_num", "corr")
    )


_DIMCOV_SQL = f"""
WITH quant AS (
  SELECT vec_id, d - 1 AS d,
         CAST(FLOOR(CAST(x AS DOUBLE) * {_Q}) AS BIGINT) AS q
  FROM (SELECT vec_id, unnest(embedding) AS x,
               generate_subscripts(embedding, 1) AS d
        FROM embeddings)
),
pair_stats AS (
  SELECT a.d AS d_i, b.d AS d_j,
         CAST(COUNT(*) AS BIGINT) AS n_vecs,
         CAST(SUM(a.q * b.q) AS BIGINT) AS sxy
  FROM quant a JOIN quant b ON a.vec_id = b.vec_id AND a.d < b.d
  GROUP BY 1, 2
),
dim_stats AS (
  SELECT d, CAST(SUM(q) AS BIGINT) AS s, CAST(SUM(q * q) AS BIGINT) AS ss
  FROM quant GROUP BY d
),
stats AS (
  SELECT p.d_i, p.d_j, p.n_vecs,
         CAST(p.n_vecs * p.sxy - di.s * dj.s AS BIGINT) AS cov_num,
         CASE WHEN p.n_vecs * di.ss - di.s * di.s > 0
               AND p.n_vecs * dj.ss - dj.s * dj.s > 0 THEN
           CAST(p.n_vecs * p.sxy - di.s * dj.s AS DOUBLE)
             / (SQRT(CAST(p.n_vecs * di.ss - di.s * di.s AS DOUBLE))
                * SQRT(CAST(p.n_vecs * dj.ss - dj.s * dj.s AS DOUBLE)))
         END AS corr
  FROM pair_stats p
  JOIN dim_stats di ON di.d = p.d_i
  JOIN dim_stats dj ON dj.d = p.d_j
)
SELECT d_i, d_j, n_vecs, cov_num, corr
FROM stats
ORDER BY ABS(cov_num) DESC, d_i, d_j
LIMIT {_COV_TOP}
"""

QUERIES["embedding_dim_covariance"] = embedding_dim_covariance
ORACLE["embedding_dim_covariance"] = _DIMCOV_SQL


# Retired in round 7 (VERDICT r6 item 8, catalog-density discipline):
# the standalone `ann_sq8_recall` diagnostic duplicated the per-probe
# SQ8 recall that pq.ann_index_comparison reports as its recall_sq8
# column (same truth set, same rerank, same division) — the dashboard
# is the single certified home for index-fidelity numbers.
