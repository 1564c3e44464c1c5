"""Data-quality / profiling family (round-2 tail): robust outlier
detection, table profiling, and constraint validation — the checks a
production ingest pipeline runs before trusting a batch.

Reference parity: goconnect pipelines express these as Filter/Fold
user code (SURVEY.md §2.2-2.3); here they are single declarative
plans.

Determinism: medians via percentile()/quantile_cont (bit-identical
across engines); every other output is integer counts, min/max of
stored values, or comparisons of identically-derived doubles.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from goconnect_spark.tables import load

_MAD_K = 3.0  # outlier threshold: |x - median| > K * MAD


def value_outliers_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-type outlier counts on events.value using the
    median absolute deviation: an event is an outlier when
    |value - median| > 3 * MAD. Mean/stddev would need
    order-dependent float sums; median/MAD are percentile-based and
    bit-portable, and are also the estimator you actually want under
    heavy tails.

    Two keyed aggregations over the same key (median, then MAD over
    the deviations) plus one broadcast join back — three scans, all
    partition-parallel on event_type. At 100 TB you'd fold both
    passes over a numeric sketch (the histogram family) instead; the
    exact version here is the oracle-checkable semantics.
    """
    ev = load(spark, "events", sf_dir).select("event_type", "value")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5D)").alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type", "value", "med", F.abs(F.col("value") - F.col("med")).alias("adev")
    )
    mad = dev.groupBy("event_type").agg(
        F.max("med").alias("med"),
        F.expr("percentile(adev, 0.5D)").alias("mad"),
    )
    flagged = dev.drop("med").join(F.broadcast(mad), "event_type")
    return (
        flagged.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.max("med").alias("med"),
            F.max("mad").alias("mad"),
            F.sum(
                F.when(
                    F.abs(F.col("value") - F.col("med")) > F.lit(_MAD_K) * F.col("mad"), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_outliers"),
        )
        .orderBy("event_type")
    )


_MAD_SQL = f"""
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med
  FROM events GROUP BY event_type
),
dev AS (
  SELECT e.event_type, value, med, ABS(value - med) AS adev
  FROM events e JOIN med USING (event_type)
),
mad AS (
  SELECT event_type, MAX(med) AS med, quantile_cont(adev, 0.5) AS mad
  FROM dev GROUP BY event_type
)
SELECT d.event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       MAX(m.med) AS med,
       MAX(m.mad) AS mad,
       CAST(SUM(CASE WHEN ABS(value - m.med) > {_MAD_K} * m.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM dev d JOIN mad m USING (event_type)
GROUP BY d.event_type
ORDER BY d.event_type
"""


def orders_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-profile report for the orders table: per column, the
    null count, distinct count, and min/max rendered as strings — the
    standard pre-ingest profiling sweep, one row per column.

    Plan shape: putting all 5 countDistincts in ONE aggregation makes
    Catalyst plan a 6-way Expand into a 6-grouping-key SortAggregate —
    a 6x row multiplication SORTED, measured 3.8 s at sf0.1. Split
    instead into two expand-free jobs: (1) typed min/max + nothing
    else — a pure partial-agg scan-reduce; (2) a stack-melt to
    (column_name, value-as-string) — the string cast is injective per
    column type, so distinct-on-string == distinct-on-typed — then
    two hash aggregations: per (col, v) counts, then per col
    n_distinct (non-null v's) and n_nulls (the v IS NULL bucket's
    count rides the same table). Both stages are HashAggregates with
    map-side partials; the join of the two 5-row results broadcasts.
    """
    orders = load(spark, "orders", sf_dir)
    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority"]
    mm = orders.agg(
        *[
            f
            for c in cols
            for f in (
                F.min(c).cast("string").alias(f"{c}__min"),
                F.max(c).cast("string").alias(f"{c}__max"),
            )
        ]
    )
    mm_stack = ", ".join(f"'{c}', {c}__min, {c}__max" for c in cols)
    minmax = mm.select(
        F.expr(f"stack({len(cols)}, {mm_stack}) as (column_name, min_str, max_str)")
    )
    melt = ", ".join(f"'{c}', cast({c} as string)" for c in cols)
    per_val = (
        orders.select(F.expr(f"stack({len(cols)}, {melt}) as (column_name, v)"))
        .groupBy("column_name", "v")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    counts = per_val.groupBy("column_name").agg(
        F.sum(F.when(F.col("v").isNull(), F.col("cnt")).otherwise(0))
        .cast("bigint")
        .alias("n_nulls"),
        F.count("v").alias("n_distinct"),  # non-null rows of the distinct table
    )
    return (
        counts.join(F.broadcast(minmax), "column_name")
        .select("column_name", "n_nulls", "n_distinct", "min_str", "max_str")
        .orderBy("column_name")
    )


_PROFILE_SQL = """
SELECT * FROM (
  SELECT 'o_orderkey' AS column_name,
         CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
         CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
         CAST(MIN(o_orderkey) AS VARCHAR) AS min_str,
         CAST(MAX(o_orderkey) AS VARCHAR) AS max_str
  FROM orders
  UNION ALL
  SELECT 'o_custkey',
         CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
         CAST(COUNT(DISTINCT o_custkey) AS BIGINT),
         CAST(MIN(o_custkey) AS VARCHAR), CAST(MAX(o_custkey) AS VARCHAR)
  FROM orders
  UNION ALL
  SELECT 'o_orderstatus',
         CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
         CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT),
         CAST(MIN(o_orderstatus) AS VARCHAR), CAST(MAX(o_orderstatus) AS VARCHAR)
  FROM orders
  UNION ALL
  SELECT 'o_totalprice',
         CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
         CAST(COUNT(DISTINCT o_totalprice) AS BIGINT),
         CAST(MIN(o_totalprice) AS VARCHAR), CAST(MAX(o_totalprice) AS VARCHAR)
  FROM orders
  UNION ALL
  SELECT 'o_orderpriority',
         CAST(SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT),
         CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT),
         CAST(MIN(o_orderpriority) AS VARCHAR), CAST(MAX(o_orderpriority) AS VARCHAR)
  FROM orders
) ORDER BY column_name
"""


def referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint-validation report: FK orphans (lineitem -> orders,
    orders -> customer), primary-key duplicate rows, and null-key
    violations — each check one row, all computed as anti-join /
    keyed counts.

    Anti joins shuffle on the checked key only; the PK-duplicate
    check is a keyed count filtered to >1. Every check is
    independently parallel; a clean batch returns all zeros (the
    synthetic tables are referentially clean — the checks prove the
    machinery, a dirty batch would light them up).
    """
    li = load(spark, "lineitem", sf_dir)
    orders = load(spark, "orders", sf_dir)
    cust = load(spark, "customer", sf_dir)

    li_orphans = li.join(
        orders.select("o_orderkey"), li.l_orderkey == F.col("o_orderkey"), "left_anti"
    ).agg(F.count("*").alias("n"))
    ord_orphans = orders.join(
        cust.select("c_custkey"), orders.o_custkey == F.col("c_custkey"), "left_anti"
    ).agg(F.count("*").alias("n"))
    dup_pk = (
        orders.groupBy("o_orderkey")
        .agg(F.count("*").alias("c"))
        .where("c > 1")
        .agg(F.coalesce(F.sum("c"), F.lit(0)).cast("bigint").alias("n"))
    )
    null_keys = li.where(F.col("l_orderkey").isNull()).agg(F.count("*").alias("n"))

    def tag(df: DataFrame, no: int, name: str) -> DataFrame:
        return df.select(
            F.lit(no).alias("check_no"), F.lit(name).alias("check_name"), F.col("n").alias("n_violations")
        )

    return (
        tag(li_orphans, 1, "lineitem_fk_orders")
        .unionAll(tag(ord_orphans, 2, "orders_fk_customer"))
        .unionAll(tag(dup_pk, 3, "orders_pk_duplicates"))
        .unionAll(tag(null_keys, 4, "lineitem_null_orderkey"))
    )


_RI_SQL = """
SELECT 1 AS check_no, 'lineitem_fk_orders' AS check_name,
       CAST((SELECT COUNT(*) FROM lineitem l
             WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT) AS n_violations
UNION ALL
SELECT 2, 'orders_fk_customer',
       CAST((SELECT COUNT(*) FROM orders o
             WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)) AS BIGINT)
UNION ALL
SELECT 3, 'orders_pk_duplicates',
       CAST((SELECT COALESCE(SUM(c), 0) FROM
             (SELECT o_orderkey, COUNT(*) AS c FROM orders GROUP BY o_orderkey HAVING COUNT(*) > 1)) AS BIGINT)
UNION ALL
SELECT 4, 'lineitem_null_orderkey',
       CAST((SELECT COUNT(*) FROM lineitem WHERE l_orderkey IS NULL) AS BIGINT)
"""


_QUANTS = (50, 90, 99)  # percent points reported per source


def source_length_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-source document-length percentiles (p50/p90/p99 of
    n_chars) via RANK ARITHMETIC, not an approximate sketch: within
    each source, rows sort by (n_chars, doc_id) — a total order, so
    the element at ceil(q/100 * n) is uniquely defined — and one
    window pass plus a filter picks all three points. Integer inputs,
    integer outputs, no interpolation: the same nearest-rank
    definition in both engines.

    Scale: one shuffle keyed by source; the window is per-source.
    This is the exact companion to the sketch-based
    value_histogram_quantiles — use the sketch when a single pass
    over 100 TB must stay constant-memory, use this when per-group
    exactness is the contract (e.g. SLA reporting).
    """
    docs = load(spark, "documents", sf_dir).select("source", "n_chars", "doc_id")
    from pyspark.sql import Window

    w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    ranked = docs.select(
        "source",
        "n_chars",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(Window.partitionBy("source")).alias("n"),
    )
    picks = None
    for q in _QUANTS:
        hit = ranked.where(
            F.col("rk") == F.ceil(F.lit(q) / F.lit(100.0) * F.col("n")).cast("int")
        ).select(
            "source", F.lit(q).cast("int").alias("q"), F.col("n_chars").alias("value"), "n"
        )
        picks = hit if picks is None else picks.unionAll(hit)
    return picks.orderBy("source", "q")


_SRC_QUANT_SQL = f"""
WITH ranked AS (
  SELECT source, n_chars, doc_id,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS rk,
         CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS n
  FROM documents
),
qs AS (SELECT unnest([{", ".join(str(q) for q in _QUANTS)}]) AS q)
SELECT r.source, CAST(qs.q AS INT) AS q, r.n_chars AS value, r.n
FROM ranked r JOIN qs ON r.rk = CAST(CEIL(qs.q / 100.0 * r.n) AS INT)
ORDER BY r.source, q
"""

QUERIES = {
    "source_length_quantiles": source_length_quantiles,
    "value_outliers_mad": value_outliers_mad,
    "orders_profile": orders_profile,
    "referential_integrity": referential_integrity,
}
ORACLE = {
    "source_length_quantiles": _SRC_QUANT_SQL,
    "value_outliers_mad": _MAD_SQL,
    "orders_profile": _PROFILE_SQL,
    "referential_integrity": _RI_SQL,
}


# --------------------------------------------------------------------
# 1-Wasserstein (earth-mover) length drift per source — the
# distribution-shift metric a corpus monitor alarms on when a crawl's
# content changes shape (TV distance, source_divergence_tv, sees
# membership shift; EMD sees the MAGNITUDE of the shift along the
# value axis). Evaluated exactly on a 100-knot corpus-quantile grid:
#   W1(source, corpus) ~= sum_q |F_s(x_q) - F_c(x_q)| * (x_{q+1}-x_q)
# with F as exact integer counts cross-multiplied (n_le_s*NC -
# n_le_c*NS in DECIMAL(38)/HUGEINT — the DSIR overflow discipline),
# one division at the very end on identical operands. The knots come
# from the two-phase global rank (operators/ranking.py — no
# data-sized window); every pairing against the knot table is a
# bounded 100-row broadcast. Scale: two passes over documents (rank
# + count-below-knot), everything else is |sources| x 100.
# --------------------------------------------------------------------
_EMD_KNOTS = 100


def source_length_emd(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from goconnect_spark.operators.ranking import global_row_number

    docs = load(spark, "documents", sf_dir).select("source", "n_chars", "doc_id")
    ranked = global_row_number(docs, ["n_chars", "doc_id"], rn_col="rk")
    qdf = (
        spark.range(1, _EMD_KNOTS + 1)
        .select(F.col("id").cast("long").alias("q"))
        .crossJoin(ranked.agg(F.max("n_total").alias("nc")))
        .select("q", F.expr(f"cast(ceil(q * nc / {_EMD_KNOTS}.0) as bigint) as target_rk"))
    )
    knots = (
        ranked.join(F.broadcast(qdf), F.col("rk") == F.col("target_rk"))
        .select("q", F.col("n_chars").alias("knot"))
    )
    wq = Window.orderBy("q")
    gaps = knots.select(
        "q", "knot",
        F.coalesce(F.lead("knot").over(wq) - F.col("knot"), F.lit(0)).alias("gap"),
    )
    n_le = (
        docs.join(F.broadcast(knots), F.col("n_chars") <= F.col("knot"))
        .groupBy("source", "q")
        .agg(F.count(F.lit(1)).cast("long").alias("le_s"))
    )
    srcs = docs.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("ns"))
    corpus_le = n_le.groupBy("q").agg(F.sum("le_s").alias("le_c"))
    nc = docs.agg(F.count(F.lit(1)).cast("long").alias("nc"))
    dense = (
        srcs.crossJoin(F.broadcast(gaps))
        .join(n_le, ["source", "q"], "left")
        .join(F.broadcast(corpus_le), "q")
        .crossJoin(F.broadcast(nc))
        .select(
            "source", "ns", "nc", "gap",
            F.coalesce("le_s", F.lit(0)).alias("le_s"),
            "le_c",
        )
    )
    diff = F.expr(
        "abs(cast(le_s as decimal(38,0)) * nc - cast(le_c as decimal(38,0)) * ns)"
        " * gap"
    )
    return (
        dense.groupBy("source", "ns", "nc")
        .agg(F.sum(diff).alias("w1_num"))
        .select(
            "source",
            F.col("ns").alias("n_docs"),
            F.expr("cast(w1_num as double) / (cast(ns as double) * cast(nc as double))")
            .alias("emd_chars"),
        )
        .orderBy("source")
    )


_EMD_SQL = f"""
WITH ranked AS (
  SELECT source, n_chars,
         ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) AS rk,
         COUNT(*) OVER () AS nc_all
  FROM documents
),
qs AS (SELECT CAST(r.range + 1 AS BIGINT) AS q FROM range({_EMD_KNOTS}) r),
knots AS (
  SELECT q, n_chars AS knot
  FROM qs JOIN ranked
    ON rk = CAST(CEIL(q * nc_all / {_EMD_KNOTS}.0) AS BIGINT)
),
gaps AS (
  SELECT q, knot,
         COALESCE(LEAD(knot) OVER (ORDER BY q) - knot, 0) AS gap
  FROM knots
),
n_le AS (
  SELECT d.source, k.q, CAST(COUNT(*) AS BIGINT) AS le_s
  FROM documents d JOIN knots k ON d.n_chars <= k.knot
  GROUP BY 1, 2
),
srcs AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS ns FROM documents GROUP BY 1),
corpus_le AS (SELECT q, CAST(SUM(le_s) AS BIGINT) AS le_c FROM n_le GROUP BY 1),
nc AS (SELECT CAST(COUNT(*) AS BIGINT) AS nc FROM documents),
dense AS (
  SELECT s.source, s.ns, nc.nc, g.gap,
         COALESCE(l.le_s, 0) AS le_s, c.le_c
  FROM srcs s
  CROSS JOIN gaps g
  LEFT JOIN n_le l ON l.source = s.source AND l.q = g.q
  JOIN corpus_le c ON c.q = g.q
  CROSS JOIN nc
)
SELECT source, ns AS n_docs,
       CAST(SUM(ABS(le_s::HUGEINT * nc - le_c::HUGEINT * ns) * gap) AS DOUBLE)
         / (CAST(ns AS DOUBLE) * CAST(nc AS DOUBLE)) AS emd_chars
FROM dense
GROUP BY source, ns, nc
ORDER BY source
"""


QUERIES["source_length_emd"] = source_length_emd
ORACLE["source_length_emd"] = _EMD_SQL


# --------------------------------------------------------------------
# Group-wise quantile harmonization — the normalization step before
# blending heterogeneous sources: raw quality scores are not
# comparable across sources (a mid-tier web page outscores a top-tier
# forum post on absolute features), so each source's docs are rank-
# normalized WITHIN the source into deciles; sampling "decile >= d"
# then takes each source's own best rather than letting one source's
# score scale dominate. The score is the integer fixed-point image of
# text_quality_score's rational ((min(nt,200)/200)*(1-sw/nt)*
# (types/nt) cross-multiplied onto ONE integer DIV, ties by doc_id),
# so both engines rank identical integers; the decile is exact rank
# arithmetic, and the per-source window parallelizes across sources.
# Output: decile occupancy + score edges per (source, decile) — the
# table a mixing policy thresholds against.
# --------------------------------------------------------------------
def source_quality_harmonized(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load(spark, "documents", sf_dir)
    toks = docs.select("doc_id", "source", F.explode(F.split("text", " ")).alias("w"))
    sw_set = (
        "the", "a", "of", "and", "to", "in", "is", "it", "on", "for",
    )
    per_doc = toks.groupBy("doc_id", "source").agg(
        F.count(F.lit(1)).alias("nt"),
        F.sum(F.when(F.col("w").isin(*sw_set), 1).otherwise(0)).cast("long").alias("sw"),
        F.countDistinct("w").alias("types"),
    )
    scored = per_doc.select(
        "doc_id",
        "source",
        F.expr(
            "(least(nt, 200) * (nt - sw) * types * 1000000) DIV (nt * nt)"
        ).alias("score_fp"),
    )
    w = Window.partitionBy("source").orderBy("score_fp", "doc_id")
    ranked = scored.select(
        "source",
        "score_fp",
        F.row_number().over(w).cast("long").alias("rk"),
        F.count(F.lit(1)).over(Window.partitionBy("source")).cast("long").alias("n"),
    )
    return (
        ranked.select(
            "source", "score_fp", F.expr("((rk - 1) * 10) DIV n").alias("decile")
        )
        .groupBy("source", "decile")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min("score_fp").alias("score_lo"),
            F.max("score_fp").alias("score_hi"),
        )
        .orderBy("source", "decile")
    )


_HARMONIZED_SQL = """
WITH toks AS (
  SELECT doc_id, source, unnest(string_split(text, ' ')) AS w FROM documents
),
per_doc AS (
  SELECT doc_id, source,
         CAST(COUNT(*) AS BIGINT) AS nt,
         CAST(SUM(CASE WHEN w IN ('the','a','of','and','to','in','is','it','on','for')
                       THEN 1 ELSE 0 END) AS BIGINT) AS sw,
         CAST(COUNT(DISTINCT w) AS BIGINT) AS types
  FROM toks GROUP BY 1, 2
),
scored AS (
  SELECT doc_id, source,
         (LEAST(nt, 200) * (nt - sw) * types * 1000000) // (nt * nt) AS score_fp
  FROM per_doc
),
ranked AS (
  SELECT source, score_fp,
         CAST(ROW_NUMBER() OVER (PARTITION BY source ORDER BY score_fp, doc_id) AS BIGINT) AS rk,
         CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS n
  FROM scored
)
SELECT source, ((rk - 1) * 10) // n AS decile,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       MIN(score_fp) AS score_lo,
       MAX(score_fp) AS score_hi
FROM ranked
GROUP BY source, ((rk - 1) * 10) // n
ORDER BY source, decile
"""


QUERIES["source_quality_harmonized"] = source_quality_harmonized
ORACLE["source_quality_harmonized"] = _HARMONIZED_SQL
