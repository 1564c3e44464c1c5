"""Training-batch preparation operators over `documents`:

- doc_length_buckets:  power-of-two token-length histogram (batch
                       shape planning). Integer CASE ladder — no
                       float log2, which is not bit-portable across
                       libm implementations.
- sequence_packing:    token-chunked pack assignment (docs ordered by
                       doc_id, packs cut every CAP tokens via integer
                       window cumsum) + per-pack fill stats. The
                       deterministic chunking used to budget packed
                       batches; true next-fit needs a stateful scan
                       (streaming twin: applyInPandasWithState).
- stratified_sample:   reproducible per-language split via md5(doc_id)
                       bucketing — the portable "hash-mod" sampling
                       every data pipeline needs for train/val splits
                       (no RNG, stable under reruns and re-partitions).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from goconnect_spark.tables import load

_CAP = 512  # tokens per pack
_BUCKETS = (16, 32, 64, 128, 256, 512, 1024)


def _with_tokens(docs: DataFrame) -> DataFrame:
    return docs.select(
        "doc_id", "lang", F.size(F.split("text", " ")).cast("long").alias("n_tokens")
    )


def _bucket_case_sql(col: str) -> str:
    whens = " ".join(f"WHEN {col} <= {b} THEN {b}" for b in _BUCKETS)
    return f"CASE {whens} ELSE {_BUCKETS[-1] * 2} END"


def doc_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _with_tokens(load(spark, "documents", sf_dir))
    return (
        docs.select(F.expr(_bucket_case_sql("n_tokens")).alias("bucket"), "n_tokens")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
        )
        .orderBy("bucket")
    )


_BUCKETS_SQL = f"""
WITH t AS (
  SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents
)
SELECT {_bucket_case_sql("n_tokens")} AS bucket,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
FROM t GROUP BY 1 ORDER BY bucket
"""


def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _with_tokens(load(spark, "documents", sf_dir))
    # Global cumulative sum WITHOUT the single-partition window cliff:
    # classic two-phase scan. (1) range-partition by doc_id so
    # partition ids follow key order; (2) one tiny aggregate gives
    # per-partition token totals, whose running sum (a window over
    # ~#partitions rows — constant-size, not data-size) is each
    # partition's global offset; (3) the real cumsum is the PARALLEL
    # within-partition window plus the broadcast offset. Identical
    # result to ORDER BY doc_id ROWS UNBOUNDED PRECEDING — the oracle
    # is unchanged — but every data-sized step scales out.
    ranged = docs.repartitionByRange(F.col("doc_id")).withColumn(
        "pid", F.spark_partition_id()
    )
    totals = ranged.groupBy("pid").agg(F.sum("n_tokens").alias("ptot"))
    w_off = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "pid", F.coalesce(F.sum("ptot").over(w_off), F.lit(0)).alias("poff")
    )
    w_in = Window.partitionBy("pid").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    packed = ranged.join(F.broadcast(offsets), "pid").select(
        "doc_id",
        "n_tokens",
        F.floor(
            (F.col("poff") + F.sum("n_tokens").over(w_in) - F.col("n_tokens")) / _CAP
        ).alias("pack_id"),
    )
    return (
        packed.groupBy("pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("pack_tokens"),
            F.min("doc_id").alias("first_doc"),
        )
        .select(
            "pack_id",
            "n_docs",
            "pack_tokens",
            "first_doc",
            (F.col("pack_tokens") / F.lit(float(_CAP))).alias("fill_ratio"),
        )
        .orderBy("pack_id")
    )


_PACKING_SQL = f"""
WITH t AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens FROM documents
), packed AS (
  SELECT doc_id, n_tokens,
         CAST(FLOOR((SUM(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - n_tokens)
              / {_CAP}) AS BIGINT) AS pack_id
  FROM t
)
SELECT pack_id, COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens,
       MIN(doc_id) AS first_doc,
       (CAST(SUM(n_tokens) AS BIGINT) / {float(_CAP)}) AS fill_ratio
FROM packed GROUP BY pack_id ORDER BY pack_id
"""


def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _with_tokens(load(spark, "documents", sf_dir))
    # deterministic 20% sample per stratum: md5 of the doc id, hex
    # prefix mod 5 (no RNG — stable across reruns/partitionings)
    h = F.expr("cast(conv(substr(md5(cast(doc_id as string)), 1, 12), 16, 10) as bigint) % 5")
    tagged = docs.select("lang", "doc_id", (h == 0).alias("sampled"))
    return (
        tagged.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(F.col("sampled").cast("int")).cast("long").alias("n_sampled"),
            F.min(F.when(F.col("sampled"), F.col("doc_id"))).alias("first_sampled_doc"),
        )
        .orderBy("lang")
    )


_SAMPLE_SQL = """
WITH tagged AS (
  SELECT lang, doc_id,
         (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT % 5 = 0) AS sampled
  FROM documents
)
SELECT lang, COUNT(*) AS n_total,
       CAST(SUM(CASE WHEN sampled THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
       MIN(CASE WHEN sampled THEN doc_id END) AS first_sampled_doc
FROM tagged GROUP BY lang ORDER BY lang
"""


QUERIES = {
    "doc_length_buckets": doc_length_buckets,
    "sequence_packing": sequence_packing,
    "stratified_sample": stratified_sample,
}

ORACLE = {
    "doc_length_buckets": _BUCKETS_SQL,
    "sequence_packing": _PACKING_SQL,
    "stratified_sample": _SAMPLE_SQL,
}
