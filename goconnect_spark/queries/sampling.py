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


QUERIES = {
    "token_budget_sample": token_budget_sample,
    "source_epoch_plan": source_epoch_plan,
    "key_skew_profile": key_skew_profile,
    "priority_sample": priority_sample,
}

ORACLE = {
    "token_budget_sample": _TOKEN_BUDGET_SQL,
    "source_epoch_plan": _EPOCH_PLAN_SQL,
    "key_skew_profile": _KEY_SKEW_SQL,
    "priority_sample": _PRIORITY_SQL,
}
