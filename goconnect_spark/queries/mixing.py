"""Corpus-mixing & training-schedule analytics — the decisions a
100 TB pretraining pipeline makes BETWEEN curation and the data
loader: which sources overlap enough to de-duplicate jointly, how the
corpus is sharded into a deterministic per-epoch training order, and
whether a cheap projected index preserves neighbor structure.

Three oracle-gated queries:

- source_containment_matrix: DIRECTIONAL shingle containment between
  sources, |A∩B| / |A| per ordered pair — the asymmetric twin of
  curation.source_overlap_jaccard: a small source fully mirrored
  inside a big crawl shows near-1.0 containment while its Jaccard
  stays tiny, so this is the metric that catches subset mirrors
  before mixture weighting double-counts them (same reason
  dedup2.containment_dedup exists beside the Jaccard joins, lifted
  from doc to source grain). Scale: the per-source distinct shingle
  table is one map-side-combining aggregate; pair candidates come
  from an equi-join on the shared shingle (never a doc x doc or
  source x source cross), and the output is bounded by the ordered
  source-pair count.

- epoch_shard_assignment: the deterministic global training shuffle —
  every (epoch, doc) gets a pseudorandom rank from md5(epoch:doc_id),
  rank maps to (shard, position) by mod/div. No RNG: the order is a
  pure function of (seed=epoch, doc_id), so any worker can recompute
  its shard independently and replays are exact — the reproducible-
  training-order contract. Scale: the rank is operators.ranking.
  global_row_number (one range shuffle, no single-task window) per
  epoch; the report aggregates to (epoch, shard) with sum-of-ids as a
  membership witness.

- ann_random_projection_recall: signed random projection (64-d -> 16-d,
  signs from md5 parity — the same portable pseudo-randomness as the
  minhash/hyperplane families) scored by top-5 recall against the
  exact cosine baseline (similarity.cosine_topk). The production
  question it answers: can the first ANN pass run on a 4x narrower
  index. Scale: the sign matrix is a 1024-row broadcast; projection is
  one keyed aggregation over the quantized-embedding table; the
  projected search is the same broadcast-probe shape as cosine_topk.

Reference parity: goconnect has no mixing layer (SURVEY §2.8) — this
family is part of the LLM-pipeline mandate, designed Spark-first.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from goconnect_spark.tables import load

QUERIES = {}
ORACLE = {}

_N_SHARDS = 8
_N_EPOCHS = 2

# even leading hex digit of md5 -> +1, odd -> -1 (portable coin flip)
_EVEN_HEX = ("0", "2", "4", "6", "8", "a", "c", "e")


# --------------------------------------------------------------------
# source_containment_matrix
# --------------------------------------------------------------------
def source_containment_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from goconnect_spark.queries.dedup import _shingles

    docs = load(spark, "documents", sf_dir)
    # ONE aggregation replaces distinct + self-join (r14, guide §2.1
    # "shuffle once, not twice" / §3.5 exploding joins): collect_set
    # dedups (source, shingle) in the partial aggregate AND yields the
    # per-shingle source set in the same shuffle, so the inverted-
    # index self-join on the shingle key — whose output is quadratic
    # in per-shingle source frequency — becomes a bounded in-row pair
    # expansion (|sources| is the small dimension; a hot shingle
    # contributes one |S| array, not |S|^2 join rows).
    per_sh = (
        _shingles(docs)
        .join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("shingle")
        .agg(F.sort_array(F.collect_set("source")).alias("ss"))
        .localCheckpoint()
    )
    sizes = (
        per_sh.select(F.explode("ss").alias("source"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_sh"))
    )
    # unordered shared-shingle counts once; emit both directions after
    pairs = (
        per_sh.select(F.posexplode("ss").alias("i", "src_a"), "ss")
        .select(
            "src_a", F.explode(F.expr("slice(ss, i + 2, size(ss))")).alias("src_b")
        )
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    both = pairs.unionByName(
        pairs.select(
            F.col("src_b").alias("src_a"),
            F.col("src_a").alias("src_b"),
            "n_common",
        )
    )
    # ordered pairs sharing zero shingles are absent by construction
    # (their containment-0 rows carry no signal); the oracle uses the
    # same inner semantics
    return (
        both.join(
            sizes.select(F.col("source").alias("src_a"), F.col("n_sh").alias("n_a")),
            "src_a",
        )
        .select(
            "src_a",
            "src_b",
            "n_a",
            "n_common",
            (F.col("n_common").cast("double") / F.col("n_a").cast("double")).alias(
                "containment"
            ),
        )
        .orderBy("src_a", "src_b")
    )


_CONTAINMENT_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w,
         generate_subscripts(string_split(text, ' '), 1) AS i
  FROM documents
),
shingles AS (
  SELECT DISTINCT a.doc_id, a.w || ' ' || b.w AS shingle
  FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.i = a.i + 1
),
src_sh AS (
  SELECT DISTINCT d.source, s.shingle
  FROM shingles s JOIN documents d USING (doc_id)
),
sizes AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_sh FROM src_sh GROUP BY source),
pairs AS (
  SELECT a.source AS src_a, b.source AS src_b, CAST(COUNT(*) AS BIGINT) AS n_common
  FROM src_sh a JOIN src_sh b ON a.shingle = b.shingle AND a.source <> b.source
  GROUP BY 1, 2
)
SELECT p.src_a, p.src_b, s.n_sh AS n_a, p.n_common,
       CAST(p.n_common AS DOUBLE) / CAST(s.n_sh AS DOUBLE) AS containment
FROM pairs p
JOIN sizes s ON s.source = p.src_a
ORDER BY src_a, src_b
"""

QUERIES["source_containment_matrix"] = source_containment_matrix
ORACLE["source_containment_matrix"] = _CONTAINMENT_SQL


# --------------------------------------------------------------------
# epoch_shard_assignment
# --------------------------------------------------------------------
def epoch_shard_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from goconnect_spark.operators.ranking import global_row_number

    docs = load(spark, "documents", sf_dir).select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tokens")
    )
    per_epoch = []
    for e in range(_N_EPOCHS):
        keyed = docs.withColumn(
            "h",
            F.md5(F.concat(F.lit(f"{e}:"), F.col("doc_id").cast("string"))),
        )
        ranked = global_row_number(
            keyed, ["h", "doc_id"], rn_col="rn", with_total=False
        )
        per_epoch.append(
            ranked.select(
                F.lit(e).alias("epoch"),
                F.expr(f"(rn - 1) % {_N_SHARDS}").alias("shard"),
                "doc_id",
                "n_tokens",
            )
        )
    assigned = per_epoch[0]
    for df in per_epoch[1:]:
        assigned = assigned.union(df)
    return (
        assigned.groupBy("epoch", "shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("tot_tokens"),
            F.sum("doc_id").cast("bigint").alias("sum_doc_ids"),
        )
        .orderBy("epoch", "shard")
    )


_EPOCH_SHARD_SQL = f"""
WITH docs AS (
  SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents
),
assigned AS (
  SELECT e.epoch,
         (ROW_NUMBER() OVER (PARTITION BY e.epoch
                             ORDER BY md5(CAST(e.epoch AS VARCHAR) || ':' || CAST(d.doc_id AS VARCHAR)),
                                      d.doc_id) - 1) % {_N_SHARDS} AS shard,
         d.doc_id, d.n_tokens
  FROM docs d CROSS JOIN (SELECT unnest(range({_N_EPOCHS})) AS epoch) e
)
SELECT CAST(epoch AS INT) AS epoch, CAST(shard AS BIGINT) AS shard,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS tot_tokens,
       CAST(SUM(doc_id) AS BIGINT) AS sum_doc_ids
FROM assigned GROUP BY epoch, shard ORDER BY epoch, shard
"""

QUERIES["epoch_shard_assignment"] = epoch_shard_assignment
ORACLE["epoch_shard_assignment"] = _EPOCH_SHARD_SQL


# --------------------------------------------------------------------
# ann_random_projection_recall
# --------------------------------------------------------------------
_N_PROJ = 16  # projected dimensions (64 -> 16: a 4x narrower index)
_RP_K = 5


def _sign_matrix(spark: SparkSession) -> DataFrame:
    """(d, j, s) for d in 0..63, j in 0.._N_PROJ-1 — s = ±1 from the
    md5 parity of 'd_j'. 64*_N_PROJ rows, broadcast everywhere."""
    even = ", ".join(f"'{h}'" for h in _EVEN_HEX)
    return (
        spark.range(64)
        .select(
            F.col("id").alias("d"),
            F.explode(F.expr(f"sequence(0, {_N_PROJ - 1})")).alias("j"),
        )
        .withColumn(
            "s",
            F.expr(
                "CASE WHEN substring(md5(concat(cast(d as string), '_', "
                f"cast(j as string))), 1, 1) IN ({even}) THEN 1 ELSE -1 END"
            ).cast("long"),
        )
    )


def ann_random_projection_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from goconnect_spark.queries.similarity import (
        _N_PROBES,
        _quant_cached,
        cosine_topk,
    )

    quant = _quant_cached(spark, sf_dir)
    signs = _sign_matrix(spark)
    # projected vectors: exact integer sums (q and s are bigints)
    proj = (
        quant.join(F.broadcast(signs), "d")
        .groupBy("vec_id", "j")
        .agg(F.sum(F.col("q") * F.col("s")).alias("pq"))
    )
    pnorms = proj.groupBy("vec_id").agg(
        F.sqrt(F.sum(F.col("pq") * F.col("pq")).cast("double")).alias("nrm")
    )
    probes = proj.where(F.col("vec_id") < _N_PROBES).select(
        F.col("vec_id").alias("probe_id"), F.col("j").alias("pj"), F.col("pq").alias("ppq")
    )
    dots = (
        proj.join(
            F.broadcast(probes),
            (F.col("j") == F.col("pj")) & (F.col("vec_id") != F.col("probe_id")),
        )
        .groupBy("probe_id", "vec_id")
        .agg(F.sum(F.col("pq") * F.col("ppq")).alias("dot"))
    )
    cos = (
        dots.join(pnorms.alias("nv"), "vec_id")
        .join(
            pnorms.select(
                F.col("vec_id").alias("probe_id"), F.col("nrm").alias("pnrm")
            ).alias("np"),
            "probe_id",
        )
        .select(
            "probe_id",
            "vec_id",
            (F.col("dot").cast("double") / (F.col("nrm") * F.col("pnrm"))).alias("c"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("c"), F.asc("vec_id"))
    proj_topk = (
        cos.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= _RP_K)
        .select("probe_id", "vec_id")
    )
    exact_topk = cosine_topk(spark, sf_dir).select("probe_id", "vec_id")
    hits = (
        proj_topk.join(exact_topk, ["probe_id", "vec_id"], "left_semi")
        .groupBy("probe_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    all_probes = exact_topk.select("probe_id").distinct()
    return (
        all_probes.join(hits, "probe_id", "left")
        .select(
            "probe_id",
            F.coalesce("n_hits", F.lit(0)).cast("bigint").alias("n_hits"),
            (
                F.coalesce("n_hits", F.lit(0)).cast("double") / F.lit(float(_RP_K))
            ).alias("recall"),
        )
        .orderBy("probe_id")
    )


def _rp_oracle_sql() -> str:
    from goconnect_spark.queries.similarity import (
        _COSINE_TOPK_SQL,
        _N_PROBES,
        _QUANT_CTE,
    )

    even = ", ".join(f"'{h}'" for h in _EVEN_HEX)
    return f"""
WITH {_QUANT_CTE},
signs AS (
  SELECT d.d, j.j,
         CASE WHEN substr(md5(CAST(d.d AS VARCHAR) || '_' || CAST(j.j AS VARCHAR)), 1, 1)
              IN ({even}) THEN 1 ELSE -1 END AS s
  FROM (SELECT unnest(range(64)) AS d) d,
       (SELECT unnest(range({_N_PROJ})) AS j) j
),
proj AS (
  SELECT q.vec_id, s.j, SUM(q.q * s.s) AS pq
  FROM quant q JOIN signs s ON s.d = q.d
  GROUP BY q.vec_id, s.j
),
pnorms AS (
  SELECT vec_id, SQRT(CAST(SUM(pq * pq) AS DOUBLE)) AS nrm FROM proj GROUP BY vec_id
),
probes AS (SELECT vec_id AS probe_id, j AS pj, pq AS ppq FROM proj WHERE vec_id < {_N_PROBES}),
dots AS (
  SELECT p.probe_id, c.vec_id, SUM(c.pq * p.ppq) AS dot
  FROM proj c JOIN probes p ON c.j = p.pj AND c.vec_id <> p.probe_id
  GROUP BY p.probe_id, c.vec_id
),
cosp AS (
  SELECT d.probe_id, d.vec_id,
         CAST(d.dot AS DOUBLE) / (nv.nrm * np.nrm) AS c
  FROM dots d
  JOIN pnorms nv ON nv.vec_id = d.vec_id
  JOIN pnorms np ON np.vec_id = d.probe_id
),
proj_topk AS (
  SELECT probe_id, vec_id FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY c DESC, vec_id ASC) AS rk
    FROM cosp
  ) WHERE rk <= {_RP_K}
),
exact_topk AS (
  SELECT probe_id, vec_id FROM ({_COSINE_TOPK_SQL.strip()}) e
),
hits AS (
  SELECT p.probe_id, CAST(COUNT(*) AS BIGINT) AS n_hits
  FROM proj_topk p
  WHERE EXISTS (SELECT 1 FROM exact_topk x
                WHERE x.probe_id = p.probe_id AND x.vec_id = p.vec_id)
  GROUP BY p.probe_id
)
SELECT a.probe_id,
       CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
       CAST(COALESCE(h.n_hits, 0) AS DOUBLE) / {float(_RP_K)} AS recall
FROM (SELECT DISTINCT probe_id FROM exact_topk) a
LEFT JOIN hits h ON h.probe_id = a.probe_id
ORDER BY a.probe_id
"""


QUERIES["ann_random_projection_recall"] = ann_random_projection_recall
ORACLE["ann_random_projection_recall"] = _rp_oracle_sql()


# --------------------------------------------------------------------
# Water-filling token-budget allocation across sources: given a global
# training budget B (60% of corpus tokens here), find the integer cap
# t* such that sum_s min(tokens_s, t*) fills the budget — small
# sources are taken whole, large ones truncated at a common water
# line. This is the standard way a mixture is rebalanced when one
# crawl dominates (the cap is what keeps 90%-web corpora from
# drowning curated sources). Exact integer algorithm: sort sources by
# size ascending (|sources| rows — bounded, this is a dimension-sized
# window, not a data-sized one), prefix-sum C_i, pick the largest i
# with C_i + (n-i)*tokens_i <= B (sources 1..i fully funded), then
# t* = (B - C_i) DIV (n - i). One corpus aggregation feeds it; the
# solve itself touches |sources| rows. All arithmetic is integer, so
# both engines produce identical allocations.
# --------------------------------------------------------------------
_WF_NUM, _WF_DEN = 6, 10  # budget = 60% of corpus tokens


def waterfill_allocation(
    per_src: DataFrame, num: int = _WF_NUM, den: int = _WF_DEN
) -> DataFrame:
    """The reusable solve: (source, tokens) -> (source, tokens,
    budget, cap, allocated) with budget = total * num DIV den. Also
    the operator the pipeline example's budget stage calls on its
    FILTERED corpus — the catalog query below feeds it the raw one."""
    w = Window.orderBy("tokens", "source").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ranked = per_src.select(
        "source",
        "tokens",
        F.row_number()
        .over(Window.orderBy("tokens", "source"))
        .cast("long")
        .alias("i"),
        F.sum("tokens").over(w).cast("long").alias("c"),
    )
    scal = per_src.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("tokens").cast("long").alias("total"),
        F.max("tokens").cast("long").alias("maxtok"),
    ).selectExpr("n", "maxtok", f"total * {num} DIV {den} as budget")
    pick = (
        ranked.crossJoin(scal)
        .where(F.expr("c + (n - i) * tokens <= budget"))
        .agg(F.max(F.struct("i", "c")).alias("p"))
        .selectExpr(
            "coalesce(p.i, cast(0 as bigint)) as istar",
            "coalesce(p.c, cast(0 as bigint)) as cstar",
        )
    )
    return (
        ranked.crossJoin(scal)
        .crossJoin(pick)
        .selectExpr(
            "source",
            "tokens",
            "budget",
            "case when n = istar then maxtok"
            " else (budget - cstar) DIV (n - istar) end as cap",
        )
        .selectExpr("source", "tokens", "budget", "cap",
                    "least(tokens, cap) as allocated")
        .orderBy("source")
    )


def source_budget_waterfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, "documents", sf_dir)
    per_src = docs.groupBy("source").agg(
        F.sum(F.size(F.split("text", " "))).cast("long").alias("tokens")
    )
    return waterfill_allocation(per_src)


_WATERFILL_SQL = f"""
WITH per_src AS (
  SELECT source, CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tokens
  FROM documents GROUP BY source
),
ranked AS (
  SELECT source, tokens,
         CAST(ROW_NUMBER() OVER (ORDER BY tokens, source) AS BIGINT) AS i,
         CAST(SUM(tokens) OVER (ORDER BY tokens, source
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS c
  FROM per_src
),
scal AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(MAX(tokens) AS BIGINT) AS maxtok,
         (CAST(SUM(tokens) AS BIGINT) * {_WF_NUM}) // {_WF_DEN} AS budget
  FROM per_src
),
pick AS (
  SELECT COALESCE(MAX_BY(i, i), 0) AS istar, COALESCE(MAX_BY(c, i), 0) AS cstar
  FROM ranked, scal
  WHERE c + (n - i) * tokens <= budget
)
SELECT r.source, r.tokens, s.budget,
       CASE WHEN s.n = p.istar THEN s.maxtok
            ELSE (s.budget - p.cstar) // (s.n - p.istar) END AS cap,
       LEAST(r.tokens,
             CASE WHEN s.n = p.istar THEN s.maxtok
                  ELSE (s.budget - p.cstar) // (s.n - p.istar) END) AS allocated
FROM ranked r, scal s, pick p
ORDER BY r.source
"""


QUERIES["source_budget_waterfill"] = source_budget_waterfill
ORACLE["source_budget_waterfill"] = _WATERFILL_SQL
