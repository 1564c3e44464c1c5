"""Similarity search over the `embeddings` table (array<float>, 64-d).

Three operators:

- cosine_topk:        brute-force top-k neighbors for a probe set —
                      the correctness baseline every ANN variant is
                      judged against.
- ann_ivf_topk:       IVF-style coarse quantization: one deterministic
                      representative per label partition, probes
                      search only their nearest cell. The 100 TB path:
                      cells are the partition key, so a probe touches
                      1/k of the corpus.
- embedding_near_dup: random-hyperplane LSH (16-bit signature, 2x8-bit
                      bands) -> candidate pairs -> cosine verify.

Determinism/portability: embeddings are quantized to integers
(floor(x * 10^4), i.e. fixed-point int16-ish quantization — standard
ANN practice) so dot products are exact integer sums, order-independent
and identical in Spark and DuckDB; only the final cosine division is
floating point (identical operands -> identical doubles, rounded to 6).
Hyperplane signs come from md5 hex digits — the same portable
pseudo-randomness used by the minhash family.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from goconnect_spark.tables import load

_Q = 10000  # quantization scale
_N_PROBES = 10
_TOP_K = 5


def _quantized(emb: DataFrame) -> DataFrame:
    """Explode embedding -> (vec_id, label, d, q) with q = floor(x*Q)."""
    return emb.select(
        "vec_id",
        "label",
        F.posexplode("embedding").alias("d", "x"),
    ).select(
        "vec_id", "label", "d", F.floor(F.col("x").cast("double") * _Q).cast("long").alias("q")
    )


_QUANT_CTE = f"""
quant AS (
  SELECT vec_id, label, d - 1 AS d,
         CAST(FLOOR(CAST(x AS DOUBLE) * {_Q}) AS BIGINT) AS q
  FROM (SELECT vec_id, label, unnest(embedding) AS x,
               generate_subscripts(embedding, 1) AS d
        FROM embeddings)
),
norms AS (
  SELECT vec_id, SQRT(CAST(SUM(q * q) AS DOUBLE)) AS nrm FROM quant GROUP BY vec_id
)
"""


def _norms(quant: DataFrame) -> DataFrame:
    return quant.groupBy("vec_id").agg(F.sqrt(F.sum(F.col("q") * F.col("q")).cast("double")).alias("nrm"))


# --------------------------------------------------------------------
# Brute-force cosine top-k for probes vec_id < N_PROBES.
# The probe side is tiny -> broadcast; the corpus side streams.
# --------------------------------------------------------------------
def cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, "embeddings", sf_dir)
    quant = _quantized(emb)
    norms = _norms(quant)
    probes = quant.where(F.col("vec_id") < _N_PROBES).select(
        F.col("vec_id").alias("probe_id"), F.col("d").alias("pd"), F.col("q").alias("pq")
    )
    dots = (
        quant.join(F.broadcast(probes), (F.col("d") == F.col("pd")) & (F.col("vec_id") != F.col("probe_id")))
        .groupBy("probe_id", "vec_id")
        .agg(F.sum(F.col("q") * F.col("pq")).alias("dot"))
    )
    cos = (
        dots.join(norms.alias("nv"), "vec_id")
        .join(norms.select(F.col("vec_id").alias("probe_id"), F.col("nrm").alias("pnrm")).alias("np"), "probe_id")
        .select(
            "probe_id",
            "vec_id",
            (F.col("dot").cast("double") / (F.col("nrm") * F.col("pnrm"))).alias("cosine"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        cos.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= _TOP_K)
        .select("probe_id", "rk", "vec_id", "cosine")
        .orderBy("probe_id", "rk")
    )


_COSINE_TOPK_SQL = f"""
WITH {_QUANT_CTE},
probes AS (SELECT vec_id AS probe_id, d AS pd, q AS pq FROM quant WHERE vec_id < {_N_PROBES}),
dots AS (
  SELECT p.probe_id, c.vec_id, SUM(c.q * p.pq) AS dot
  FROM quant c JOIN probes p ON c.d = p.pd AND c.vec_id <> p.probe_id
  GROUP BY p.probe_id, c.vec_id
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


# --------------------------------------------------------------------
# IVF: representative per label = embedding of min(vec_id) in that
# label (deterministic medoid stand-in; a real build would run k-means
# — the search path is identical). Probe -> nearest representative ->
# search only that cell.
# --------------------------------------------------------------------
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, "embeddings", sf_dir)
    quant = _quantized(emb)
    norms = _norms(quant)

    reps = quant.groupBy("label").agg(F.min("vec_id").alias("rep_id")).select("rep_id")
    rep_vecs = quant.join(reps, quant.vec_id == reps.rep_id).select(
        F.col("label").alias("cell"), F.col("d").alias("rd"), F.col("q").alias("rq"), "rep_id"
    )

    probes = quant.where(F.col("vec_id") < _N_PROBES).select(
        F.col("vec_id").alias("probe_id"), F.col("d").alias("pd"), F.col("q").alias("pq")
    )
    # probe -> cell assignment by max integer dot with each representative
    # (norms of reps are constant per cell -> dot ordering == cosine
    # ordering within the probe when rep norms are equal; we use full
    # cosine for correctness)
    probe_cell_dots = (
        probes.join(F.broadcast(rep_vecs), F.col("pd") == F.col("rd"))
        .groupBy("probe_id", "cell", "rep_id")
        .agg(F.sum(F.col("pq") * F.col("rq")).alias("dot"))
    )
    rep_norms = norms.select(F.col("vec_id").alias("rep_id"), F.col("nrm").alias("rnrm"))
    probe_norms = norms.select(F.col("vec_id").alias("probe_id"), F.col("nrm").alias("pnrm"))
    probe_cells = (
        probe_cell_dots.join(rep_norms, "rep_id")
        .join(probe_norms, "probe_id")
        .select(
            "probe_id",
            "cell",
            (F.col("dot").cast("double") / (F.col("rnrm") * F.col("pnrm"))).alias("rep_cos"),
        )
    )
    w_cell = Window.partitionBy("probe_id").orderBy(F.desc("rep_cos"), F.asc("cell"))
    assign = probe_cells.withColumn("rk", F.row_number().over(w_cell)).where(F.col("rk") == 1).select("probe_id", "cell")

    cell_vecs = quant.select("vec_id", F.col("label").alias("cell"), "d", "q")
    probe_full = assign.join(probes, "probe_id")  # probe_id, cell, pd, pq
    dots = (
        cell_vecs.alias("c")
        .join(F.broadcast(probe_full).alias("p"), (F.col("c.d") == F.col("p.pd")) & (F.col("c.cell") == F.col("p.cell")))
        .where(F.col("c.vec_id") != F.col("p.probe_id"))
        .groupBy("p.probe_id", "c.vec_id")
        .agg(F.sum(F.col("c.q") * F.col("p.pq")).alias("dot"))
    )
    cos = (
        dots.join(norms.alias("nv"), "vec_id")
        .join(probe_norms, "probe_id")
        .select(
            "probe_id",
            "vec_id",
            (F.col("dot").cast("double") / (F.col("nrm") * F.col("pnrm"))).alias("cosine"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        cos.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select("probe_id", "rk", "vec_id", "cosine")
        .orderBy("probe_id", "rk")
    )


_ANN_IVF_SQL = f"""
WITH {_QUANT_CTE},
reps AS (SELECT label, MIN(vec_id) AS rep_id FROM quant GROUP BY label),
rep_vecs AS (
  SELECT q.label AS cell, q.d AS rd, q.q AS rq, r.rep_id
  FROM quant q JOIN reps r ON q.vec_id = r.rep_id
),
probes AS (SELECT vec_id AS probe_id, d AS pd, q AS pq FROM quant WHERE vec_id < {_N_PROBES}),
probe_cell_dots AS (
  SELECT p.probe_id, rv.cell, rv.rep_id, SUM(p.pq * rv.rq) AS dot
  FROM probes p JOIN rep_vecs rv ON p.pd = rv.rd
  GROUP BY p.probe_id, rv.cell, rv.rep_id
),
probe_cells AS (
  SELECT d.probe_id, d.cell,
         (CAST(d.dot AS DOUBLE) / (rn.nrm * pn.nrm)) AS rep_cos
  FROM probe_cell_dots d
  JOIN norms rn ON rn.vec_id = d.rep_id
  JOIN norms pn ON pn.vec_id = d.probe_id
),
assign AS (
  SELECT probe_id, cell FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY rep_cos DESC, cell ASC) AS rk
    FROM probe_cells
  ) WHERE rk = 1
),
probe_full AS (SELECT a.probe_id, a.cell, p.pd, p.pq FROM assign a JOIN probes p ON p.probe_id = a.probe_id),
dots AS (
  SELECT p.probe_id, c.vec_id, SUM(c.q * p.pq) AS dot
  FROM quant c JOIN probe_full p ON c.d = p.pd AND c.label = p.cell
  WHERE c.vec_id <> p.probe_id
  GROUP BY p.probe_id, c.vec_id
),
cos AS (
  SELECT d.probe_id, d.vec_id,
         (CAST(d.dot AS DOUBLE) / (nv.nrm * pn.nrm)) AS cosine
  FROM dots d
  JOIN norms nv ON nv.vec_id = d.vec_id
  JOIN norms pn ON pn.vec_id = d.probe_id
)
SELECT probe_id, rk, vec_id, cosine
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY cosine DESC, vec_id ASC) AS rk
  FROM cos
) WHERE rk <= 3
ORDER BY probe_id, rk
"""


# --------------------------------------------------------------------
# Embedding near-dup via random-hyperplane LSH. Hyperplane h(p, d) is
# +1 when the first md5 hex digit of "p_d" is >= 8 else -1. Signature
# bit p = [dot(v, h_p) > 0]; 2 bands of 8 bits; verify cosine >= 0.9.
# --------------------------------------------------------------------
_N_PLANES = 16
_NEAR_T = 0.9


def embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, "embeddings", sf_dir)
    quant = _quantized(emb)
    norms = _norms(quant)
    planes = spark.range(_N_PLANES).select(F.col("id").cast("int").alias("p"))
    hsign = F.expr("CASE WHEN instr('0123456789abcdef', substr(md5(concat(p, '_', d)), 1, 1)) - 1 >= 8 THEN 1 ELSE -1 END")
    sig_bits = (
        quant.crossJoin(F.broadcast(planes))
        .select("vec_id", "p", (F.col("q") * hsign).alias("c"))
        .groupBy("vec_id", "p")
        .agg(F.sum("c").alias("s"))
        .select("vec_id", "p", F.when(F.col("s") > 0, 1).otherwise(0).alias("bit"))
    )
    sig = sig_bits.groupBy("vec_id").agg(
        F.sum(F.when(F.col("bit") == 1, F.pow(F.lit(2), F.col("p")).cast("long")).otherwise(F.lit(0))).alias("sig")
    )
    bands = sig.select(
        "vec_id",
        F.explode(F.expr("transform(sequence(0, 1), k -> named_struct('band', k, 'bk', CAST(floor(sig / power(2, k*8)) AS BIGINT) % 256))")).alias("e"),
    ).select("vec_id", F.col("e.band").alias("band"), F.col("e.bk").alias("bk"))
    cand = (
        bands.alias("a")
        .join(bands.alias("b"), ["band", "bk"])
        .where(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b"))
        .distinct()
    )
    # Verify with in-row array folds over broadcast quantized vectors:
    # integer dot products are order-independent, so this matches the
    # oracle's unnest+SUM formulation exactly while avoiding a 64x
    # exploded shuffle join per candidate pair.
    qarr = emb.select(
        "vec_id",
        F.expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 10000) AS BIGINT))").alias("qs"),
    )
    qa = qarr.select(F.col("vec_id").alias("vec_a"), F.col("qs").alias("qsa"))
    qb = qarr.select(F.col("vec_id").alias("vec_b"), F.col("qs").alias("qsb"))
    dot = F.expr("aggregate(zip_with(qsa, qsb, (x, y) -> x * y), CAST(0 AS BIGINT), (acc, v) -> acc + v)")
    na = norms.select(F.col("vec_id").alias("vec_a"), F.col("nrm").alias("na"))
    nb = norms.select(F.col("vec_id").alias("vec_b"), F.col("nrm").alias("nb"))
    return (
        cand.join(F.broadcast(qa), "vec_a")
        .join(F.broadcast(qb), "vec_b")
        .select("vec_a", "vec_b", dot.alias("dot"))
        .join(F.broadcast(na), "vec_a")
        .join(F.broadcast(nb), "vec_b")
        .select("vec_a", "vec_b", (F.col("dot").cast("double") / (F.col("na") * F.col("nb"))).alias("cosine"))
        .where(F.col("cosine") >= _NEAR_T)
        .orderBy("vec_a", "vec_b")
    )


_NEAR_DUP_SQL = f"""
WITH {_QUANT_CTE},
planes AS (SELECT CAST(range AS INT) AS p FROM range({_N_PLANES})),
sig_bits AS (
  SELECT vec_id, p,
         CASE WHEN SUM(q * (CASE WHEN instr('0123456789abcdef', substr(md5(p || '_' || d), 1, 1)) - 1 >= 8
                            THEN 1 ELSE -1 END)) > 0 THEN 1 ELSE 0 END AS bit
  FROM quant CROSS JOIN planes
  GROUP BY vec_id, p
),
sig AS (
  SELECT vec_id,
         CAST(SUM(CASE WHEN bit = 1 THEN CAST(POWER(2, p) AS BIGINT) ELSE 0 END) AS BIGINT) AS sig
  FROM sig_bits GROUP BY vec_id
),
bands AS (
  SELECT vec_id, k.range AS band, CAST(FLOOR(sig / POWER(2, k.range * 8)) AS BIGINT) % 256 AS bk
  FROM sig CROSS JOIN range(2) k
),
cand AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.bk = b.bk
  WHERE a.vec_id < b.vec_id
),
dots AS (
  SELECT c.vec_a, c.vec_b, SUM(qa.q * qb.q) AS dot
  FROM cand c
  JOIN quant qa ON qa.vec_id = c.vec_a
  JOIN quant qb ON qb.vec_id = c.vec_b AND qb.d = qa.d
  GROUP BY c.vec_a, c.vec_b
)
SELECT d.vec_a, d.vec_b,
       (CAST(d.dot AS DOUBLE) / (na.nrm * nb.nrm)) AS cosine
FROM dots d
JOIN norms na ON na.vec_id = d.vec_a
JOIN norms nb ON nb.vec_id = d.vec_b
WHERE (CAST(d.dot AS DOUBLE) / (na.nrm * nb.nrm)) >= {_NEAR_T}
ORDER BY vec_a, vec_b
"""


QUERIES = {
    "cosine_topk": cosine_topk,
    "ann_ivf_topk": ann_ivf_topk,
    "embedding_near_dup": embedding_near_dup,
}

ORACLE = {
    "cosine_topk": _COSINE_TOPK_SQL,
    "ann_ivf_topk": _ANN_IVF_SQL,
    "embedding_near_dup": _NEAR_DUP_SQL,
}


# --------------------------------------------------------------------
# IVF with a real k-means coarse quantizer (MLlib, fixed seed). The
# production ANN build path: train centroids, assign every vector to
# its cell once (the expensive O(n*k) pass, done at index-build time),
# then probes search only their nearest cell. Rows-only driver check
# (k-means float arithmetic is not oracle-reproducible in SQL); the
# deterministic-representative variant ann_ivf_topk carries the
# oracle-matched correctness of the same search path.
# --------------------------------------------------------------------
def ann_ivf_kmeans_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    emb = load(spark, "embeddings", sf_dir)
    feats = emb.select(
        "vec_id", array_to_vector(F.col("embedding").cast("array<double>")).alias("features")
    )
    model = KMeans(k=8, seed=42, maxIter=10).fit(feats)
    assigned = model.transform(feats).select(
        "vec_id", F.col("prediction").alias("cell"), vector_to_array("features").alias("v")
    )

    probes = assigned.where(F.col("vec_id") < _N_PROBES).select(
        F.col("vec_id").alias("probe_id"), F.col("cell").alias("pcell"), F.col("v").alias("pv")
    )
    dot = F.expr("aggregate(zip_with(v, pv, (x, y) -> x * y), 0D, (acc, w) -> acc + w)")
    nrm = "sqrt(aggregate(transform({0}, x -> x * x), 0D, (acc, w) -> acc + w))"
    cand = assigned.join(
        F.broadcast(probes), (F.col("cell") == F.col("pcell")) & (F.col("vec_id") != F.col("probe_id"))
    )
    cos = cand.select(
        "probe_id",
        "vec_id",
        (dot / (F.expr(nrm.format("v")) * F.expr(nrm.format("pv")))).alias("cosine"),
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        cos.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select("probe_id", "rk", "vec_id", F.round("cosine", 4).alias("cosine"))
        .orderBy("probe_id", "rk")
    )


QUERIES["ann_ivf_kmeans_topk"] = ann_ivf_kmeans_topk
# intentionally no ORACLE entry: k-means is not SQL-reproducible;
# driver records the weaker rows-only check
