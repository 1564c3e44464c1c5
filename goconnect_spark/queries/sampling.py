"""Corpus sampling / mixture-design / skew-diagnostics operators —
the layer that decides HOW MUCH of each source a training run consumes
and whether the engine's own shuffle keys are safe.

Three oracle-gated queries:

- token_budget_sample: per-source greedy down-sampling under a token
  budget (40% of each source's tokens). Docs are ordered by a
  replayable hash (md5 of doc_id), so the selected set is a pure
  function of the corpus — any worker, any rerun, any engine picks the
  SAME documents. The running token sum uses the grouped two-phase
  cumulative scan (range partition -> per-partition totals ->
  broadcast offsets), so no source ever serializes through a single
  task no matter how large it is.
- source_epoch_plan: temperature-weighted mixture design (alpha=0.5):
  per-source weights proportional to sqrt(tokens), a global token
  budget of 2x the corpus, and the implied per-source epoch counts.
  All arithmetic is integer fixed-point (ppm weights, milli-epochs) so
  the plan is bit-reproducible — a mixture schedule that differs
  between the planner and the reader shifts the training distribution.
- key_skew_profile: heavy-hitter diagnostics over the engine's own
  join/shuffle keys (events.user_id, events.event_type): per-key-column
  top-10 values with ppm share, cardinality, and a x1000 max/mean skew
  factor. This is the operator you run BEFORE choosing salting factors
  or AQE skew thresholds on a new 100 TB dataset.

Reference parity: the reference engine (amient/goconnect) has no
sampling layer — it is transport/aggregation (pipeline.go, fold.go);
these are the LLM-pipeline operators the task brief mandates beyond
the reference surface.

Scale (100 TB story): every shuffle is keyed by `source` or by the
profiled key itself; the only global steps are #sources-sized or
#partitions-sized aggregates carried as broadcast scalars. The greedy
sample never materializes per-doc output — its data-sized intermediate
is the same (source, pid) offset table sequence_packing uses
(packing.py:65), generalized to a group key.

Determinism: token counts, cumulative sums, targets, and shares are
integers end-to-end; the single sqrt is IEEE-correctly-rounded on an
integer operand in both engines and immediately floored.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from goconnect_spark.tables import load

_BUDGET_PCT = 40  # token_budget_sample keeps ~40% of each source's tokens
_EPOCH_BUDGET_X = 2  # source_epoch_plan distributes 2x the corpus tokens
_TOP_K = 10  # key_skew_profile heavy hitters per key column


def _doc_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, source, n_tokens, h) — h is the replayable sample-order
    hash. Token count = split cardinality, same expression as the
    packing/curation family so oracles agree on tokenization."""
    return load(spark, "documents", sf_dir).select(
        "doc_id",
        "source",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
        F.md5(F.col("doc_id").cast("string")).alias("h"),
    )


def token_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy per-source prefix sample under a 40%-of-tokens budget.

    A doc is selected iff the tokens of all hash-earlier docs in its
    source fall short of the budget (cum_before < target), so the
    sample overshoots by at most one document — the standard greedy
    budget rule, replayable because the order key is md5(doc_id).

    Plan shape: the per-source running sum is the grouped two-phase
    scan — range-partition on (source, h, doc_id) so each source spans
    an ordered run of partitions, aggregate per-(source,pid) totals
    (tiny), turn their per-source running sum into broadcast offsets,
    and compute the real cumsum as the PARALLEL within-partition
    window plus the offset. No single-task source-sized window exists
    at any source size; the final rollup is one keyed aggregation to
    #sources rows.
    """
    docs = _doc_tokens(spark, sf_dir)
    ranged = docs.repartitionByRange("source", "h", "doc_id").withColumn(
        "pid", F.spark_partition_id()
    )
    ptot = ranged.groupBy("source", "pid").agg(F.sum("n_tokens").alias("ptot"))
    w_off = (
        Window.partitionBy("source")
        .orderBy("pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = ptot.select(
        "source",
        "pid",
        F.coalesce(F.sum("ptot").over(w_off), F.lit(0)).alias("poff"),
    )
    totals = ptot.groupBy("source").agg(F.sum("ptot").alias("tokens_total"))
    w_in = (
        Window.partitionBy("source", "pid")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = (
        ranged.join(F.broadcast(offsets), ["source", "pid"])
        .join(F.broadcast(totals), "source")
        .select(
            "source",
            "n_tokens",
            "tokens_total",
            (F.col("poff") + F.sum("n_tokens").over(w_in) - F.col("n_tokens")).alias(
                "cum_before"
            ),
            F.expr(f"(tokens_total * {_BUDGET_PCT}) div 100").alias("target_tokens"),
        )
    )
    sel = F.col("cum_before") < F.col("target_tokens")
    return (
        cum.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(sel, 1).otherwise(0)).cast("long").alias("n_selected"),
            F.max("tokens_total").cast("long").alias("tokens_total"),
            F.max("target_tokens").cast("long").alias("target_tokens"),
            F.sum(F.when(sel, F.col("n_tokens")).otherwise(0))
            .cast("long")
            .alias("tokens_selected"),
        )
        .orderBy("source")
    )


_TOKEN_BUDGET_SQL = f"""
WITH t AS (
  SELECT doc_id, source,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         md5(CAST(doc_id AS VARCHAR)) AS h
  FROM documents
), tot AS (
  SELECT source, CAST(SUM(n_tokens) AS BIGINT) AS tokens_total FROM t GROUP BY source
), cum AS (
  SELECT t.source, t.n_tokens, tot.tokens_total,
         CAST(COALESCE(SUM(t.n_tokens) OVER (
           PARTITION BY t.source ORDER BY t.h, t.doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before,
         (tot.tokens_total * {_BUDGET_PCT}) // 100 AS target_tokens
  FROM t JOIN tot ON t.source = tot.source
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN cum_before < target_tokens THEN 1 ELSE 0 END) AS BIGINT) AS n_selected,
       CAST(MAX(tokens_total) AS BIGINT) AS tokens_total,
       CAST(MAX(target_tokens) AS BIGINT) AS target_tokens,
       CAST(SUM(CASE WHEN cum_before < target_tokens THEN n_tokens ELSE 0 END) AS BIGINT) AS tokens_selected
FROM cum GROUP BY source ORDER BY source
"""


def source_epoch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-weighted (alpha=0.5) mixture plan: weight_s ∝
    floor(sqrt(tokens_s)); a 2x-corpus global budget is split by
    weight; epochs_milli = how many times (x1000) each source is
    consumed. Small sources upsample (>2000), large ones downsample —
    the standard root-temperature flattening of a skewed source mix.

    Plan shape: one keyed aggregation to #sources rows; the two corpus
    totals ride a single 1-row broadcast (the scalar-join pattern the
    plan guard whitelists). Integer fixed-point end-to-end.
    """
    per_src = (
        _doc_tokens(spark, sf_dir)
        .groupBy("source")
        .agg(F.sum("n_tokens").alias("tokens"))
        .select(
            "source",
            "tokens",
            F.floor(F.sqrt(F.col("tokens").cast("double"))).cast("long").alias("isqrt"),
        )
    )
    scal = per_src.agg(
        F.sum("tokens").alias("corpus_tokens"), F.sum("isqrt").alias("sum_isqrt")
    )
    return (
        per_src.join(F.broadcast(scal))
        .select(
            "source",
            F.col("tokens").cast("long").alias("tokens"),
            F.expr("(isqrt * 1000000) div sum_isqrt").alias("weight_ppm"),
            F.expr(
                f"(isqrt * ({_EPOCH_BUDGET_X} * corpus_tokens)) div sum_isqrt"
            ).alias("target_tokens"),
            F.expr(
                f"((isqrt * ({_EPOCH_BUDGET_X} * corpus_tokens)) div sum_isqrt"
                " * 1000) div tokens"
            ).alias("epochs_milli"),
        )
        .orderBy("source")
    )


_EPOCH_PLAN_SQL = f"""
WITH per_src AS (
  SELECT source,
         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tokens
  FROM documents GROUP BY source
), w AS (
  SELECT source, tokens,
         CAST(FLOOR(SQRT(CAST(tokens AS DOUBLE))) AS BIGINT) AS isqrt
  FROM per_src
), scal AS (
  SELECT CAST(SUM(tokens) AS BIGINT) AS corpus_tokens,
         CAST(SUM(isqrt) AS BIGINT) AS sum_isqrt
  FROM w
)
SELECT source, tokens,
       (isqrt * 1000000) // sum_isqrt AS weight_ppm,
       (isqrt * ({_EPOCH_BUDGET_X} * corpus_tokens)) // sum_isqrt AS target_tokens,
       ((isqrt * ({_EPOCH_BUDGET_X} * corpus_tokens)) // sum_isqrt * 1000) // tokens AS epochs_milli
FROM w CROSS JOIN scal ORDER BY source
"""


def _profile_one(events: DataFrame, col: str) -> DataFrame:
    counts = events.groupBy(F.col(col).cast("string").alias("key_val")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    stats = counts.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("cnt").alias("total_rows"),
        F.max("cnt").alias("max_cnt"),
    )
    top = counts.orderBy(F.desc("cnt"), "key_val").limit(_TOP_K)
    return top.join(F.broadcast(stats)).select(
        F.lit(col).alias("key_col"),
        "key_val",
        F.col("cnt").cast("long").alias("cnt"),
        F.expr("(cnt * 1000000) div total_rows").alias("share_ppm"),
        F.col("n_keys").cast("long").alias("n_keys"),
        F.col("total_rows").cast("long").alias("total_rows"),
        F.expr("(max_cnt * 1000 * n_keys) div total_rows").alias("skew_x1000"),
    )


def key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter / skew diagnostics for candidate shuffle keys.

    For each profiled column the per-key count is ONE keyed
    aggregation (map-side combining), the top-10 is a distributed
    TakeOrderedAndProject (never a global sort), and the three corpus
    stats ride a 1-row broadcast. skew_x1000 = max_count/mean_count
    x1000 — the number you compare against your AQE skew-join factor.
    """
    events = load(spark, "events", sf_dir)
    return _profile_one(events, "user_id").unionAll(
        _profile_one(events, "event_type")
    )


def _skew_one_sql(col: str) -> str:
    return f"""
SELECT '{col}' AS key_col, key_val, cnt,
       (cnt * 1000000) // total_rows AS share_ppm,
       n_keys, total_rows,
       (max_cnt * 1000 * n_keys) // total_rows AS skew_x1000
FROM (
  SELECT CAST({col} AS VARCHAR) AS key_val, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1
) c CROSS JOIN (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
         CAST(SUM(cnt) AS BIGINT) AS total_rows,
         CAST(MAX(cnt) AS BIGINT) AS max_cnt
  FROM (SELECT COUNT(*) AS cnt FROM events GROUP BY {col})
) s
ORDER BY cnt DESC, key_val LIMIT {_TOP_K}
"""


_KEY_SKEW_SQL = (
    f"SELECT * FROM ({_skew_one_sql('user_id')}) "
    f"UNION ALL SELECT * FROM ({_skew_one_sql('event_type')})"
)


# --------------------------------------------------------------------
# Priority sampling (Duffield–Lund–Thorup): weighted sampling WITHOUT
# replacement with an unbiased per-item weight estimator. Each doc
# gets priority w/u with u uniform in (0,1]; the sample is the top-k
# priorities, and every sampled item's weight estimate is
# max(w, tau) with tau the (k+1)-th priority — sum(est_w) is an
# unbiased estimator of total corpus weight.
#
# Determinism: u is derived from md5(doc_id) truncated to 52 bits, so
# (hv+1) is EXACTLY representable as a double and u = (hv+1)/2^52 is
# an exact binary fraction; priority = w/u divides identical doubles
# in both engines. This is why priority sampling is used here instead
# of A-ES (key = u^(1/w)): pow/ln are not cross-engine
# bit-stable, w/u is. The replayable-hash idea matches
# token_budget_sample above; the estimator is the published one.
#
# Scale (100 TB): top-(k+1) by priority compiles to
# TakeOrderedAndProject — per-partition heaps of k+1 rows, driver
# merge of k+1-sized sets, NO global sort, NO full shuffle. The
# corpus is scanned once; tau and the final filter run on the
# localCheckpointed (k+1)-row sample.
# --------------------------------------------------------------------
_PS_K = 200
_TWO_52 = 1 << 52


def priority_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, "documents", sf_dir)
    pri = docs.selectExpr(
        "doc_id",
        "source",
        "n_chars",
        "cast(n_chars as double) /"
        " ((cast(conv(substr(md5(cast(doc_id as string)), 1, 13), 16, 10) as bigint) + 1)"
        f" / cast({_TWO_52} as double)) as priority",
    )
    topk1 = pri.orderBy(F.desc("priority")).limit(_PS_K + 1).localCheckpoint()
    tau = topk1.agg(F.min("priority").alias("tau"))
    return (
        topk1.crossJoin(F.broadcast(tau))
        .where(F.col("priority") > F.col("tau"))
        .selectExpr(
            "doc_id",
            "source",
            "n_chars as w_chars",
            "priority",
            "greatest(cast(n_chars as double), tau) as est_w",
        )
        .orderBy(F.desc("priority"))
    )


_PRIORITY_SQL = f"""
WITH pri AS (
  SELECT doc_id, source, n_chars,
         CAST(n_chars AS DOUBLE) /
           (((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13))::BIGINT) + 1)
            / CAST({_TWO_52} AS DOUBLE)) AS priority
  FROM documents
),
topk1 AS (SELECT * FROM pri ORDER BY priority DESC LIMIT {_PS_K + 1}),
tau AS (SELECT MIN(priority) AS tau FROM topk1)
SELECT doc_id, source, n_chars AS w_chars, priority,
       GREATEST(CAST(n_chars AS DOUBLE), tau) AS est_w
FROM topk1, tau
WHERE priority > tau
ORDER BY priority DESC
"""




_DSIR_B = 1024  # hashed-bigram feature buckets
_DSIR_SCALE = 1_000_000  # fixed-point scale for the importance ratios
_DSIR_TARGET = "src0"  # the "curated target domain" the raw corpus is scored against
_DSIR_K = 20


def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed-n-gram importance weighting for data selection — the
    DSIR recipe (importance resampling over bag-of-hashed-ngrams
    features): score every raw document by how target-like its hashed
    bigram distribution is, then keep the top of the ranking.

    - features: word bigrams hashed into 1024 buckets (60-bit md5 ->
      mod B, the repo's portable-hash convention);
    - bucket models: Laplace-smoothed counts over the TARGET slice
      (source = src0, the stand-in curated domain) and the RAW corpus;
    - per-bucket importance ratio in fixed point:
      ratio_fp[b] = floor(1e6 * (t[b]+1)*(R+B) / ((r[b]+1)*(T+B))),
      computed in DECIMAL(38)/HUGEINT so the cross products never
      overflow at corpus scale (T, R = total target/raw feature mass);
      the doc-score sum accumulates in DECIMAL(38) too — with a target
      slice at ~1e-6 of corpus mass ratio_fp reaches ~1e12 and a plain
      BIGINT sum could overflow where DuckDB's HUGEINT would not;
    - doc score = sum of c_doc[b] * ratio_fp[b] over its buckets,
      length-normalized by integer division — the rational fixed-point
      variant of DSIR's log-likelihood-ratio sum: per-bucket monotone
      in the same ratio, exact integer arithmetic end-to-end, so both
      engines agree bit-for-bit (ln() is NOT IEEE-reproducible across
      engines, so the log form would break the oracle contract).

    Plan shape at 100 TB: bigrams expand in-row (no self-join); the
    only data-sized shuffles are the (doc,bucket) count and the
    doc-level source join; bucket models are B=1024-row aggregates;
    the ratio table joins back as a broadcast; totals are a 1-row
    broadcast (allowlisted BNLJ). Top-k is TakeOrdered, never a
    global sort."""
    from goconnect_spark.queries.corpus import doc_token_arrays

    B, SCALE = _DSIR_B, _DSIR_SCALE
    toks = doc_token_arrays(spark, sf_dir)
    feats = toks.where(F.size("toks") >= 2).select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(0, size(toks)-2),"
                " i -> concat(toks[i], ' ', toks[i+1]))"
            )
        ).alias("bigram"),
    ).select(
        "doc_id",
        F.expr(
            f"cast(conv(substr(md5(bigram), 1, 15), 16, 10) as bigint) % {B}"
        ).alias("b"),
    )
    # materialize ONCE (r14, guide §3.3): docb feeds three consumers
    # (rawb, tgtb, the doc scorer) and each appearance otherwise
    # re-ran the md5-bigram explode — the query's dominant cost
    # (measured 0.68 s per evaluation x3 at sf0.1). (doc, bucket)
    # grain: |docs| x <=B rows, far smaller than the bigram stream.
    docb = (
        feats.groupBy("doc_id", "b")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint()
    )
    src = load(spark, "documents", sf_dir).select("doc_id", "source")
    rawb = docb.groupBy("b").agg(F.sum("c").alias("r"))
    tgtb = (
        docb.join(src, "doc_id")
        .where(F.col("source") == _DSIR_TARGET)
        .groupBy("b")
        .agg(F.sum("c").alias("t"))
    )
    bucket = rawb.join(tgtb, "b", "left").select(
        "b", "r", F.coalesce("t", F.lit(0)).alias("t")
    )
    totals = bucket.agg(
        F.sum("r").alias("rtot"), F.sum("t").alias("ttot")
    )
    ratio = bucket.crossJoin(F.broadcast(totals)).select(
        "b",
        F.expr(
            f"cast((cast(t + 1 as decimal(38,0)) * (rtot + {B}) * {SCALE})"
            f" div (cast(r + 1 as decimal(38,0)) * (ttot + {B})) as bigint)"
        ).alias("ratio_fp"),
    )
    scored = (
        docb.join(F.broadcast(ratio), "b")
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_feats"),
            F.sum(F.col("c").cast("decimal(38,0)") * F.col("ratio_fp"))
            .cast("long")
            .alias("score_fp"),
        )
        .join(src, "doc_id")
        .select(
            "doc_id",
            "source",
            "n_feats",
            "score_fp",
            F.expr("score_fp div n_feats").alias("avg_fp"),
        )
    )
    return scored.orderBy(F.desc("avg_fp"), "doc_id").limit(_DSIR_K)


_DSIR_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
feats AS (
  SELECT doc_id,
         ('0x' || substr(md5(toks[i] || ' ' || toks[i+1]), 1, 15))::BIGINT
           % {_DSIR_B} AS b
  FROM toks, UNNEST(range(1, len(toks))) AS u(i)
  WHERE len(toks) >= 2
),
docb AS (
  SELECT doc_id, b, CAST(COUNT(*) AS BIGINT) AS c FROM feats GROUP BY 1, 2
),
rawb AS (SELECT b, SUM(c) AS r FROM docb GROUP BY 1),
tgtb AS (
  SELECT db.b, SUM(db.c) AS t
  FROM docb db JOIN documents d USING (doc_id)
  WHERE d.source = '{_DSIR_TARGET}' GROUP BY 1
),
bucket AS (
  SELECT rawb.b, r, COALESCE(t, 0) AS t FROM rawb LEFT JOIN tgtb USING (b)
),
tot AS (SELECT SUM(r) AS rr, SUM(t) AS tt FROM bucket),
ratio AS (
  SELECT b,
         CAST(((t + 1)::HUGEINT * (rr + {_DSIR_B}) * {_DSIR_SCALE})
              // ((r + 1)::HUGEINT * (tt + {_DSIR_B})) AS BIGINT) AS ratio_fp
  FROM bucket, tot
),
scored AS (
  SELECT doc_id,
         CAST(SUM(c) AS BIGINT) AS n_feats,
         CAST(SUM(c * ratio_fp) AS BIGINT) AS score_fp
  FROM docb JOIN ratio USING (b) GROUP BY 1
)
SELECT s.doc_id, d.source, s.n_feats, s.score_fp,
       s.score_fp // s.n_feats AS avg_fp
FROM scored s JOIN documents d ON s.doc_id = d.doc_id
ORDER BY avg_fp DESC, s.doc_id
LIMIT {_DSIR_K}
"""


QUERIES = {
    "token_budget_sample": token_budget_sample,
    "source_epoch_plan": source_epoch_plan,
    "key_skew_profile": key_skew_profile,
    "priority_sample": priority_sample,
    "dsir_importance_weights": dsir_importance_weights,
}

ORACLE = {
    "token_budget_sample": _TOKEN_BUDGET_SQL,
    "source_epoch_plan": _EPOCH_PLAN_SQL,
    "key_skew_profile": _KEY_SKEW_SQL,
    "priority_sample": _PRIORITY_SQL,
    "dsir_importance_weights": _DSIR_SQL,
}
