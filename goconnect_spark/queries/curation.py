"""Training-data curation batch (round 4): chunking, chunk-level
dedup, deterministic corpus splits, and TF-IDF keyword extraction —
the remaining ops an LLM-data pipeline runs between "filtered corpus"
and "tokenized shards".

All four are pure JVM column expressions (no Python UDFs), all are
DuckDB-oracle-gated, and all reuse the session-cached token layer
(corpus.py) so the tokenize cost is shared with the sketch family.

Scale notes (100 TB):
- doc_chunking is embarrassingly parallel (per-row transform +
  posexplode; zero shuffles). At 100 TB the output is larger than the
  input (overlap) — the md5 chunk fingerprint column is what a real
  pipeline would persist, bucketed by hash prefix, for downstream
  dedup; the full chunk text never needs to leave the stage.
- chunk_dedup_stats groups by the 128-bit fingerprint — uniform keys,
  no skew, one shuffle; cardinality = chunk count but each row is a
  32-byte hash + counts, and the HAVING count>1 filter collapses it
  to the duplicate tail before the final ORDER BY.
- train_val_test_split is a single map-side hash + one aggregation on
  (source, split) — 60 output rows regardless of corpus size. The
  md5-of-doc_id assignment is the industry-standard replayable split:
  any worker can recompute membership without a lookup table.
- tfidf_top_terms joins token frequencies against the document-
  frequency table; df is vocabulary-sized (Heaps' law: ~1M rows at
  100 TB, broadcastable), and the per-doc top-3 window is partitioned
  by doc_id — never global. Scoring is integer fixed-point
  (tf * 1e6 DIV df), so both engines rank identical integers and the
  float-log idf portability trap (ln() last-ulp divergence) is
  avoided entirely.

Reference parity: the reference has no curation layer; these extend
its Map/FlatMap/Fold surface (pipeline.go:60-118) the way its own
str.Split examples compose word pipelines (examples/, SURVEY §2.2).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from goconnect_spark.queries.corpus import doc_token_arrays, doc_tokens_distinct
from goconnect_spark.tables import load

# chunk geometry: 64-token chunks every 56 tokens (8-token overlap) —
# small enough that sf0.01 docs (~100 tokens) produce 2-3 chunks each
_CHUNK = 64
_STRIDE = 56


def doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping fixed-stride token chunks per document: the shard
    step before tokenizer packing. Output carries the chunk md5
    fingerprint (what a pipeline persists for chunk-level dedup), not
    the chunk text, so the result stays narrow at any scale."""
    toks = doc_token_arrays(spark, sf_dir).where(F.size("toks") >= 1)
    chunks = toks.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, CAST((size(toks)-1) DIV {_STRIDE} AS INT)),"
                f" i -> slice(toks, i*{_STRIDE}+1, {_CHUNK}))"
            )
        ).alias("chunk_idx", "chunk"),
    )
    return chunks.select(
        "doc_id",
        F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
        F.size("chunk").cast("bigint").alias("n_toks"),
        F.md5(F.array_join("chunk", " ")).alias("chunk_hash"),
    ).orderBy("doc_id", "chunk_idx")


_CHUNKING_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
  WHERE len(string_split(text, ' ')) >= 1
)
SELECT doc_id,
       CAST(i AS BIGINT) AS chunk_idx,
       CAST(len(list_slice(t, i*{_STRIDE}+1, i*{_STRIDE}+{_CHUNK})) AS BIGINT) AS n_toks,
       md5(array_to_string(list_slice(t, i*{_STRIDE}+1, i*{_STRIDE}+{_CHUNK}), ' ')) AS chunk_hash
FROM (SELECT doc_id, t,
             unnest(generate_series(0, CAST((len(t)-1) // {_STRIDE} AS BIGINT))) AS i
      FROM toks)
ORDER BY doc_id, chunk_idx
"""


def chunk_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-granularity duplication (the ExactSubstr/Llama-style
    fine-grained pass exact dedup misses): which chunk fingerprints
    recur, how often, and across how many documents. Groups on the
    uniform 128-bit hash — skew-free by construction."""
    chunks = doc_chunking(spark, sf_dir)
    return (
        chunks.groupBy("chunk_hash")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .where(F.col("n_occurrences") > 1)
        .orderBy(F.desc("n_occurrences"), "chunk_hash")
    )


_CHUNK_DEDUP_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
  WHERE len(string_split(text, ' ')) >= 1
), chunks AS (
  SELECT doc_id,
         md5(array_to_string(list_slice(t, i*{_STRIDE}+1, i*{_STRIDE}+{_CHUNK}), ' ')) AS chunk_hash
  FROM (SELECT doc_id, t,
               unnest(generate_series(0, CAST((len(t)-1) // {_STRIDE} AS BIGINT))) AS i
        FROM toks)
)
SELECT chunk_hash,
       COUNT(*) AS n_occurrences,
       COUNT(DISTINCT doc_id) AS n_docs
FROM chunks
GROUP BY chunk_hash
HAVING COUNT(*) > 1
ORDER BY n_occurrences DESC, chunk_hash
"""


def train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-based corpus split (80/10/10): membership is
    a pure function of doc_id (md5 mod 100), so the assignment is
    replayable on any worker with no lookup table — the standard way
    a 100 TB corpus is split without a shuffle. Reports doc and token
    budgets per (source, split)."""
    from goconnect_spark.tables import load

    # single scan, zero joins: the split is a map-side pure function
    # of doc_id, the token count a cheap in-row size(split())
    docs = load(spark, "documents", sf_dir)
    bucket = F.expr(
        "cast(conv(substr(md5(cast(doc_id as string)), 1, 4), 16, 10) as bigint) % 100"
    )
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "valid").otherwise("test")
    )
    return (
        docs.select(
            "source",
            split.alias("split"),
            F.size(F.split("text", " ")).alias("n_toks"),
        )
        .groupBy("source", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_toks").alias("n_tokens"),
        )
        .orderBy("source", "split")
    )


_SPLIT_SQL = """
SELECT source,
       CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 100 < 80 THEN 'train'
            WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 100 < 90 THEN 'valid'
            ELSE 'test' END AS split,
       COUNT(*) AS n_docs,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
FROM documents
GROUP BY 1, 2
ORDER BY source, split
"""


def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 characteristic terms per document by fixed-point TF-IDF:
    score = tf * 1e6 DIV df — monotone in tf/df like tf*log(N/df) for
    ranking-within-doc purposes, but integer-exact in both engines
    (float ln() is a last-ulp portability trap). df comes from the
    shared distinct-incidence table; the top-3 window is per-doc."""
    tf = (
        doc_token_arrays(spark, sf_dir)
        .select("doc_id", F.explode("toks").alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = doc_tokens_distinct(spark, sf_dir).groupBy("tok").agg(
        F.count(F.lit(1)).alias("df")
    )
    scored = tf.join(df, "tok").select(
        "doc_id",
        "tok",
        F.expr("tf * 1000000 DIV df").alias("score"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), "tok")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 3)
        .select("doc_id", F.col("rnk").cast("bigint").alias("rnk"), "tok", "score")
        .orderBy("doc_id", "rnk")
    )


_TFIDF_SQL = """
WITH tf AS (
  SELECT doc_id, tok, COUNT(*) AS tf
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
  GROUP BY doc_id, tok
), df AS (
  SELECT tok, COUNT(DISTINCT doc_id) AS df FROM
  (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
  GROUP BY tok
), scored AS (
  SELECT doc_id, tf.tok AS tok, (tf * 1000000) // df AS score
  FROM tf JOIN df ON tf.tok = df.tok
), ranked AS (
  SELECT doc_id, tok, score,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, tok) AS rnk
  FROM scored
)
SELECT doc_id, CAST(rnk AS BIGINT) AS rnk, tok, score
FROM ranked WHERE rnk <= 3
ORDER BY doc_id, rnk
"""


_NOVELTY_BUCKET = 100  # docs per curve point


def corpus_novelty_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus saturation: in doc_id order, the fraction of each
    100-doc bucket's word-bigram shingles never seen in any earlier
    document — the diminishing-returns curve that tells a crawl when
    more of the same source stops adding new content.

    A running distinct over shingles would hold the full shingle set
    in state; instead each shingle reduces to its FIRST document
    (one keyed min over the shared shingle table — the first-seen
    trick), so novelty per bucket is an integer count and the curve
    is one small ordered aggregation. Ratios divide exact integers.
    """
    from goconnect_spark.queries.corpus import doc_shingle_arrays

    sh = doc_shingle_arrays(spark, sf_dir).select(
        "doc_id", F.explode("shset").alias("shingle")
    )
    first = sh.groupBy("shingle").agg(F.min("doc_id").alias("first_doc"))
    bucket = (F.col("first_doc") / F.lit(_NOVELTY_BUCKET)).cast("bigint")
    novel = first.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).cast("long").alias("novel_shingles")
    )
    # r14 note: deriving total_shingles in-row (sum of size(shset) per
    # bucket, skipping this second explode) was measured and REJECTED
    # at sf0.1 — 0.93 vs 0.68 s min over 3 alternating same-session
    # rounds; the explode+count co-rides the cached array scan while
    # the size() form adds its own aggregation stage.
    total = (
        sh.groupBy((F.col("doc_id") / F.lit(_NOVELTY_BUCKET)).cast("bigint").alias("bucket"))
        .agg(F.count(F.lit(1)).cast("long").alias("total_shingles"))
    )
    return (
        total.join(novel, "bucket", "left")
        .select(
            "bucket",
            "total_shingles",
            F.coalesce("novel_shingles", F.lit(0)).cast("long").alias("novel_shingles"),
            (
                F.coalesce("novel_shingles", F.lit(0)).cast("double")
                / F.col("total_shingles").cast("double")
            ).alias("novelty_rate"),
        )
        .orderBy("bucket")
    )


_NOVELTY_SQL = f"""
WITH words AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
  WHERE len(string_split(text, ' ')) >= 2
),
sh AS (
  SELECT DISTINCT doc_id, g.shingle
  FROM (
    SELECT doc_id,
           unnest(list_transform(generate_series(1, len(w) - 1),
                  i -> w[i] || ' ' || w[i+1])) AS shingle
    FROM words
  ) g
),
first AS (SELECT shingle, MIN(doc_id) AS first_doc FROM sh GROUP BY shingle),
novel AS (
  SELECT CAST(FLOOR(first_doc / {_NOVELTY_BUCKET}) AS BIGINT) AS bucket,
         CAST(COUNT(*) AS BIGINT) AS novel_shingles
  FROM first GROUP BY 1
),
total AS (
  SELECT CAST(FLOOR(doc_id / {_NOVELTY_BUCKET}) AS BIGINT) AS bucket,
         CAST(COUNT(*) AS BIGINT) AS total_shingles
  FROM sh GROUP BY 1
)
SELECT t.bucket, t.total_shingles,
       CAST(COALESCE(n.novel_shingles, 0) AS BIGINT) AS novel_shingles,
       CAST(COALESCE(n.novel_shingles, 0) AS DOUBLE) / CAST(t.total_shingles AS DOUBLE)
         AS novelty_rate
FROM total t LEFT JOIN novel n USING (bucket)
ORDER BY t.bucket
"""

def source_overlap_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source duplication: Jaccard similarity of the word-bigram
    shingle SETS of every source pair — the report that catches two
    crawls scraping the same sites before dedup wastes cluster time
    re-discovering it pair by pair.

    Shape: shingles reduce to their distinct source set via one
    (shingle, source) distinct; pairs are enumerated per shingle
    (bounded by |sources| per shingle, never doc x doc); per-source
    set sizes are a broadcast dim; Jaccard = common / (a + b - common)
    divides exact integers.
    """
    from goconnect_spark.queries.corpus import doc_shingle_arrays

    docs = load(spark, "documents", sf_dir).select("doc_id", "source")
    # ONE aggregation replaces distinct + self-join (r14, guide §2.1 /
    # §3.5): collect_set dedups (source, shingle) in the partial
    # aggregate and yields the per-shingle source set in the same
    # shuffle; the pair enumeration the docstring promises ("bounded
    # by |sources| per shingle, never doc x doc") is then an in-row
    # slice expansion instead of an inverted-index self-join whose
    # output is quadratic in per-shingle source frequency.
    sh = (
        doc_shingle_arrays(spark, sf_dir)
        .select("doc_id", F.explode("shset").alias("shingle"))
        # docs is doc-grain — corpus-scale, so no broadcast hint: its
        # parquet-backed stats let the planner broadcast at toy SF and
        # shuffle at scale (an explicit F.broadcast here was the r11
        # audit's one hard-coded corpus-scale broadcast)
        .join(docs, "doc_id")
        .groupBy("shingle")
        .agg(F.sort_array(F.collect_set("source")).alias("ss"))
        # feeds both the pair expansion and the size dim — materialize
        # the source-incidence reduction once, not 2x
        .localCheckpoint()
    )
    common = (
        sh.select(F.posexplode("ss").alias("i", "s1"), "ss")
        .select("s1", F.explode(F.expr("slice(ss, i + 2, size(ss))")).alias("s2"))
        .groupBy("s1", "s2")
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
    )
    sizes = (
        sh.select(F.explode("ss").alias("source"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    v1 = sizes.select(F.col("source").alias("s1"), F.col("n").alias("n1"))
    v2 = sizes.select(F.col("source").alias("s2"), F.col("n").alias("n2"))
    return (
        common.join(F.broadcast(v1), "s1")
        .join(F.broadcast(v2), "s2")
        .select(
            "s1",
            "s2",
            "n_common",
            (
                F.col("n_common").cast("double")
                / (F.col("n1") + F.col("n2") - F.col("n_common")).cast("double")
            ).alias("jaccard"),
        )
        .orderBy("s1", "s2")
    )


_SRC_OVERLAP_SQL = """
WITH words AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
  WHERE len(string_split(text, ' ')) >= 2
),
shd AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(generate_series(1, len(w) - 1),
                i -> w[i] || ' ' || w[i+1])) AS shingle
  FROM words
),
sh AS (
  SELECT DISTINCT d.source, s.shingle
  FROM shd s JOIN documents d USING (doc_id)
),
common AS (
  SELECT a.source AS s1, b.source AS s2, CAST(COUNT(*) AS BIGINT) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.source < b.source
  GROUP BY 1, 2
),
sizes AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM sh GROUP BY source)
SELECT c.s1, c.s2, c.n_common,
       CAST(c.n_common AS DOUBLE) / CAST(v1.n + v2.n - c.n_common AS DOUBLE) AS jaccard
FROM common c
JOIN sizes v1 ON v1.source = c.s1
JOIN sizes v2 ON v2.source = c.s2
ORDER BY c.s1, c.s2
"""



# --------------------------------------------------------------------
# Snapshot diff: the crawl-over-crawl delta accounting every refreshed
# corpus needs — which documents were added, removed, changed, or
# unchanged between snapshot A and snapshot B, and how much content
# mass moved. Snapshot B is derived deterministically from A inside
# the query (drops doc_id % 7 == 3, revises text for % 11 == 5,
# synthesizes % 13 == 1 under NEGATED ids -(doc_id+1) — collision-free
# against any non-negative id space, unlike a fixed offset that a big
# enough corpus would wrap into), so the oracle sees the identical
# pair of corpora; on a real lake both sides are just two partition
# paths of the same table.
#
# Scale (100 TB): ONE full-outer shuffle join on doc_id (the snapshot
# key both sides are naturally bucketed by), content comparison is an
# in-row md5 equality, and the output is a 4-row status aggregate —
# the whole diff is join + map-side-combining count, no windows, no
# driver state.
# --------------------------------------------------------------------
def corpus_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = load(spark, "documents", sf_dir).select("doc_id", "text")
    b = (
        a.where(F.expr("doc_id % 7 != 3"))
        .select(
            "doc_id",
            F.expr(
                "case when doc_id % 11 = 5 then concat(text, ' rev2')"
                " else text end"
            ).alias("text"),
        )
        .unionByName(
            a.where(F.expr("doc_id % 13 = 1")).select(
                (-(F.col("doc_id") + 1)).alias("doc_id"), "text"
            )
        )
    )
    j = a.select(
        "doc_id", F.md5("text").alias("ha"), F.length("text").alias("ca")
    ).join(
        b.select(
            "doc_id", F.md5("text").alias("hb"), F.length("text").alias("cb")
        ),
        "doc_id",
        "full_outer",
    )
    status = (
        F.when(F.col("ha").isNull(), F.lit("added"))
        .when(F.col("hb").isNull(), F.lit("removed"))
        .when(F.col("ha") != F.col("hb"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        j.select(
            status.alias("status"),
            F.coalesce("ca", F.lit(0)).alias("ca"),
            F.coalesce("cb", F.lit(0)).alias("cb"),
        )
        .groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("ca").cast("bigint").alias("chars_a"),
            F.sum("cb").cast("bigint").alias("chars_b"),
        )
        .orderBy("status")
    )


_SNAPSHOT_DIFF_SQL = f"""
WITH a AS (SELECT doc_id, text FROM documents),
b AS (
  SELECT doc_id,
         CASE WHEN doc_id % 11 = 5 THEN text || ' rev2' ELSE text END AS text
  FROM a WHERE doc_id % 7 != 3
  UNION ALL
  SELECT -(doc_id + 1) AS doc_id, text
  FROM a WHERE doc_id % 13 = 1
),
j AS (
  SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
         md5(a.text) AS ha, md5(b.text) AS hb,
         COALESCE(LENGTH(a.text), 0) AS ca, COALESCE(LENGTH(b.text), 0) AS cb
  FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id
)
SELECT CASE WHEN ha IS NULL THEN 'added'
            WHEN hb IS NULL THEN 'removed'
            WHEN ha != hb THEN 'changed'
            ELSE 'unchanged' END AS status,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(ca) AS BIGINT) AS chars_a,
       CAST(SUM(cb) AS BIGINT) AS chars_b
FROM j
GROUP BY 1
ORDER BY status
"""


QUERIES = {
    "source_overlap_jaccard": source_overlap_jaccard,
    "corpus_novelty_curve": corpus_novelty_curve,
    "doc_chunking": doc_chunking,
    "chunk_dedup_stats": chunk_dedup_stats,
    "train_val_test_split": train_val_test_split,
    "tfidf_top_terms": tfidf_top_terms,
    "corpus_snapshot_diff": corpus_snapshot_diff,
}

ORACLE = {
    "source_overlap_jaccard": _SRC_OVERLAP_SQL,
    "corpus_novelty_curve": _NOVELTY_SQL,
    "doc_chunking": _CHUNKING_SQL,
    "chunk_dedup_stats": _CHUNK_DEDUP_SQL,
    "train_val_test_split": _SPLIT_SQL,
    "tfidf_top_terms": _TFIDF_SQL,
    "corpus_snapshot_diff": _SNAPSHOT_DIFF_SQL,
}


# --------------------------------------------------------------------
# Pipeline provenance: WHY was each document dropped — the "where did
# my data go" audit every curation pipeline owes its users. Each doc
# gets the FIRST matching drop reason in pipeline order:
#   1. exact_dup      non-minimal member of an exact content-hash group
#   2. near_dup       connected-component non-keeper (minhash clusters)
#   3. low_quality    < 20 tokens OR integer type-token ratio < 5%
#   4. lang_filtered  lang not in the target set
#   5. kept
# Attribution evaluates every rule on the FULL corpus (the cluster and
# hash tables the other dedup queries already materialize), then takes
# the first hit — so the report composes from the session-cached
# tables instead of re-running the cascade per stage. Scale: three
# doc-keyed left joins onto broadcast-out drop sets + one token-stats
# aggregation; output is |sources| x |reasons|.
# --------------------------------------------------------------------
_DROP_TARGET_LANGS = ("en", "de", "fr")


def corpus_drop_reasons(spark: SparkSession, sf_dir: str) -> DataFrame:
    from goconnect_spark.queries.dedup import dedup_connected_components

    docs = load(spark, "documents", sf_dir)
    norm = F.lower(F.regexp_replace(F.trim("text"), " +", " "))
    hashed = docs.select("doc_id", F.md5(norm).alias("h"))
    exact_losers = (
        hashed.join(
            hashed.groupBy("h").agg(F.min("doc_id").alias("keeper")), "h"
        )
        .where(F.col("doc_id") != F.col("keeper"))
        .select("doc_id", F.lit(1).alias("is_exact_dup"))
    )
    near_losers = (
        dedup_connected_components(spark, sf_dir)
        .where(F.col("doc_id") != F.col("keeper_doc_id"))
        .select("doc_id", F.lit(1).alias("is_near_dup"))
    )
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("w")).where(
        F.col("w") != ""
    )
    stats = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.countDistinct("w").alias("n_types"),
    )
    lowq = stats.where(
        (F.col("n_tokens") < 20)
        | (F.expr("(n_types * 100) div n_tokens") < 5)
    ).select("doc_id", F.lit(1).alias("is_lowq"))
    langs = ", ".join(f"'{l}'" for l in _DROP_TARGET_LANGS)
    reason = (
        F.when(F.col("is_exact_dup").isNotNull(), "exact_dup")
        .when(F.col("is_near_dup").isNotNull(), "near_dup")
        .when(F.col("is_lowq").isNotNull(), "low_quality")
        .when(~F.expr(f"lang IN ({langs})"), "lang_filtered")
        .otherwise("kept")
    )
    return (
        docs.select("doc_id", "source", "lang")
        .join(exact_losers, "doc_id", "left")
        .join(near_losers, "doc_id", "left")
        .join(lowq, "doc_id", "left")
        .select("source", reason.alias("reason"))
        .groupBy("source", "reason")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("source", "reason")
    )


def _drop_reasons_sql() -> str:
    from goconnect_spark.queries.dedup import _cc_oracle_sql

    langs = ", ".join(f"'{l}'" for l in _DROP_TARGET_LANGS)
    return f"""
WITH hashed AS (
  SELECT doc_id, md5(lower(regexp_replace(trim(text), ' +', ' ', 'g'))) AS h
  FROM documents
),
exact_losers AS (
  SELECT doc_id FROM hashed h
  JOIN (SELECT h, MIN(doc_id) AS keeper FROM hashed GROUP BY h) g USING (h)
  WHERE doc_id <> keeper
),
cc AS ({_cc_oracle_sql()}),
near_losers AS (SELECT doc_id FROM cc WHERE doc_id <> keeper_doc_id),
toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
),
stats AS (
  SELECT doc_id, COUNT(*) AS n_tokens, COUNT(DISTINCT w) AS n_types
  FROM toks WHERE w <> '' GROUP BY doc_id
),
lowq AS (
  SELECT doc_id FROM stats
  WHERE n_tokens < 20 OR (n_types * 100) // n_tokens < 5
),
attributed AS (
  SELECT d.source,
         CASE WHEN e.doc_id IS NOT NULL THEN 'exact_dup'
              WHEN n.doc_id IS NOT NULL THEN 'near_dup'
              WHEN q.doc_id IS NOT NULL THEN 'low_quality'
              WHEN d.lang NOT IN ({langs}) THEN 'lang_filtered'
              ELSE 'kept' END AS reason
  FROM documents d
  LEFT JOIN exact_losers e ON e.doc_id = d.doc_id
  LEFT JOIN near_losers n ON n.doc_id = d.doc_id
  LEFT JOIN lowq q ON q.doc_id = d.doc_id
)
SELECT source, reason, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM attributed GROUP BY source, reason ORDER BY source, reason
"""


QUERIES["corpus_drop_reasons"] = corpus_drop_reasons
ORACLE["corpus_drop_reasons"] = _drop_reasons_sql()


# --------------------------------------------------------------------
# BM25 ranked retrieval (Robertson/Spärck Jones, the Okapi weighting
# every search stack ships) in integer fixed point. Query terms are
# data-derived so the ranking is meaningful on ANY corpus: the 3
# highest-df tokens appearing in at most half the documents — the
# mid-frequency band real search terms live in. k1=1.2, b=0.75 are
# carried as exact rationals: with L = total tokens and N = docs,
#   tf + k1*(1-b + b*dl/avgdl)  ==  (10*L*tf + 3*L + 9*dl*N) / (10*L)
# so the per-term quotient is integer DIV over identical operands in
# both engines; idf uses the log-free monotone surrogate
# (N-df)*1e4 DIV df (float ln() is a last-ulp portability trap —
# same policy as tfidf_top_terms above). 100 TB shape: tf and dl are
# one shared tokenize pass (session-cached corpus layer), df is
# vocabulary-sized (broadcastable), the N/L scalars ride a 1-row
# broadcast, and the final top-20 is TakeOrdered — no global sort,
# no window, no Python.
# --------------------------------------------------------------------
_BM25_NTERMS = 3
_BM25_TOPK = 20


def bm25_keyword_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = doc_token_arrays(spark, sf_dir)
    dl = toks.select("doc_id", F.size("toks").cast("long").alias("dl"))
    scal = dl.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("dl").cast("long").alias("l"),
    )
    tf = (
        toks.select("doc_id", F.explode("toks").alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    dfreq = (
        doc_tokens_distinct(spark, sf_dir)
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("df"))
    )
    terms = (
        dfreq.crossJoin(scal.select("n"))
        .where(F.col("df") * 2 <= F.col("n"))
        .orderBy(F.desc("df"), "tok")
        .limit(_BM25_NTERMS)
        .select("tok", "df")
    )
    scored = (
        tf.join(F.broadcast(terms), "tok")
        .join(dl, "doc_id")
        .crossJoin(scal)
        .select(
            "doc_id",
            (
                F.expr("((n - df) * 10000) DIV df")
                * F.expr(
                    "(tf * 22 * l * 1000000)"
                    " DIV (10 * l * tf + 3 * l + 9 * dl * n)"
                )
            ).alias("s"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(F.sum("s").cast("long").alias("bm25_fp"))
        .orderBy(F.desc("bm25_fp"), "doc_id")
        .limit(_BM25_TOPK)
    )


_BM25_SQL = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
), dl AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
  FROM documents
), scal AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(dl) AS BIGINT) AS l FROM dl
), tf AS (
  SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2
), dfreq AS (
  SELECT tok, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df FROM tok GROUP BY 1
), terms AS (
  SELECT tok, df FROM dfreq, scal WHERE df * 2 <= scal.n
  ORDER BY df DESC, tok LIMIT {_BM25_NTERMS}
), scored AS (
  SELECT tf.doc_id,
         (((scal.n - terms.df) * 10000) // terms.df)
         * ((tf.tf * 22 * scal.l * 1000000)
            // (10 * scal.l * tf.tf + 3 * scal.l + 9 * dl.dl * scal.n)) AS s
  FROM tf
  JOIN terms ON tf.tok = terms.tok
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN scal
)
SELECT doc_id, CAST(SUM(s) AS BIGINT) AS bm25_fp
FROM scored GROUP BY doc_id
ORDER BY bm25_fp DESC, doc_id LIMIT {_BM25_TOPK}
"""


QUERIES["bm25_keyword_topk"] = bm25_keyword_topk
ORACLE["bm25_keyword_topk"] = _BM25_SQL


# --------------------------------------------------------------------
# PII scrub certificate (round 14): regex-family PII detection +
# redaction with a Luhn validity gate (functions/pii.py), the scrub
# pass an LLM corpus runs before anything else. Planted-truth done
# the avro/media way, with a twist: the oracle is not a closed form
# but a SECOND INDEPENDENT DETECTOR — both engines plant the same
# deterministic PII (emails on doc_id%3=0, phones on %4=1, IPv4 on
# %5=2, 16-digit cards on %6 in (0,3) whose Luhn check digit is
# deliberately corrupted on odd doc_ids, German IBANs on %7=5 whose
# MOD-97-10 check pair is likewise corrupted on odd doc_ids), then
# each runs its OWN regex engine (Java regex vs RE2) and its own
# checksum arithmetic (Luhn + the ISO 7064 power-table remainder as
# codegen'd higher-order aggregates vs list comprehensions), and the
# md5 witness over the redacted text pins byte-identical output.
# A wrong pattern, a broken Luhn, a placeholder collision, or a
# redaction that eats a neighboring character all break the hash.
# Scale: one map stage, no shuffle before the 6-row source rollup.
# --------------------------------------------------------------------
def _pii_plant(doc_id):
    """Planted PII suffix as a column expression (deterministic in
    doc_id; mirrored verbatim by the oracle's SQL plant)."""

    def s(c):
        return c.cast("string")

    email = F.when(
        doc_id % 3 == 0,
        F.concat(
            F.lit(" contact user"), s(doc_id),
            F.lit("@example"), s(doc_id % 7), F.lit(".com"),
        ),
    ).otherwise(F.lit(""))
    phone = F.when(
        doc_id % 4 == 1,
        F.concat(
            F.lit(" call "), s(doc_id % 700 + 200), F.lit("-"),
            F.lpad(s(doc_id % 1000), 3, "0"), F.lit("-"),
            F.lpad(s(doc_id % 10000), 4, "0"),
        ),
    ).otherwise(F.lit(""))
    ip = F.when(
        doc_id % 5 == 2,
        F.concat(
            F.lit(" from 10."), s(doc_id % 256),
            F.lit("."), s((doc_id * 7) % 256),
            F.lit("."), s((doc_id * 13) % 256),
        ),
    ).otherwise(F.lit(""))
    payload = F.concat(F.lit("4"), F.lpad(s(doc_id % 100000000), 14, "0"))

    def digit(i):
        return F.substring(payload, i, F.lit(1)).cast("int")

    lsum = F.aggregate(
        F.sequence(F.lit(1), F.lit(15)), F.lit(0),
        lambda acc, i: acc + F.when(
            i % 2 == 1,
            F.when(digit(i) * 2 > 9, digit(i) * 2 - 9).otherwise(digit(i) * 2),
        ).otherwise(digit(i)),
    )
    check = (F.lit(10) - lsum % 10) % 10
    check = F.when(doc_id % 2 == 1, (check + 5) % 10).otherwise(check)
    cc = F.when(
        (doc_id % 6 == 0) | (doc_id % 6 == 3),
        F.concat(F.lit(" card "), payload, check.cast("string")),
    ).otherwise(F.lit(""))

    # German IBAN with a MOD-97-10 check pair computed by the plant
    # itself (98 - mod97(bban || '1314' || '00')); odd doc_ids get
    # check+1 (wrapping 98 -> 2), the one guaranteed-invalid neighbor
    from goconnect_spark.functions.pii import mod97_24

    bban = F.lpad(s(doc_id), 18, "0")
    ib_check = F.lit(98) - mod97_24(F.concat(bban, F.lit("131400")))
    ib_check = F.when(
        doc_id % 2 == 1,
        F.when(ib_check < 98, ib_check + 1).otherwise(F.lit(2)),
    ).otherwise(ib_check)
    iban = F.when(
        doc_id % 7 == 5,
        F.concat(
            F.lit(" iban DE"), F.lpad(ib_check.cast("string"), 2, "0"), bban
        ),
    ).otherwise(F.lit(""))
    return F.concat(email, phone, ip, cc, iban)


def pii_redaction_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from goconnect_spark.functions.pii import with_pii_scrub
    from goconnect_spark.tables import load

    docs = load(spark, "documents", sf_dir).select("doc_id", "source", "text")
    planted = docs.withColumn(
        "pt", F.concat(F.col("text"), _pii_plant(F.col("doc_id")))
    ).drop("text")
    scrub = with_pii_scrub(planted, "pt", out_col="red")
    wit = F.conv(F.substring(F.md5(F.col("red")), 1, 10), 16, 10).cast("bigint")
    return (
        scrub.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_emails").cast("long").alias("n_emails"),
            F.sum("n_phones").cast("long").alias("n_phones"),
            F.sum("n_ipv4").cast("long").alias("n_ipv4"),
            F.sum("n_cc_candidates").cast("long").alias("n_cc_candidates"),
            F.sum("n_cc_valid").cast("long").alias("n_cc_valid"),
            F.sum("n_ibans").cast("long").alias("n_ibans"),
            F.sum("n_iban_valid").cast("long").alias("n_iban_valid"),
            F.sum(wit).cast("long").alias("redact_witness"),
        )
        .orderBy("source")
    )


def _pii_sql() -> str:
    from goconnect_spark.functions.pii import (
        CC_RE,
        EMAIL_RE,
        IBAN_RE,
        IPV4_RE,
        PHONE_RE,
        POW97,
    )

    dig = "CAST(substr(payload, CAST(i AS INT), 1) AS INT)"
    luhn15 = f"""list_sum([CASE WHEN i % 2 = 1 THEN
            CASE WHEN 2*{dig} > 9 THEN 2*{dig} - 9 ELSE 2*{dig} END
          ELSE {dig} END for i in range(1, 16)])"""
    digc = "CAST(substr(c, CAST(i AS INT), 1) AS INT)"
    luhn16 = f"""list_sum([CASE WHEN i % 2 = 1 THEN
            CASE WHEN 2*{digc} > 9 THEN 2*{digc} - 9 ELSE 2*{digc} END
          ELSE {digc} END for i in range(1, 17)])"""
    pw = "[" + ", ".join(str(p) for p in POW97) + "]"
    # MOD-97-10 over a 24-digit expression `{r}` via the same
    # precomputed power table the Spark side embeds
    mod97 = (
        "list_sum([CAST(substr({r}, CAST(i AS INT), 1) AS INT)"
        f" * ({pw})[CAST(25 - i AS INT)] for i in range(1, 25)]) % 97"
    )
    iban_rearr = "substr(c, 5, 18) || '1314' || substr(c, 3, 2)"
    return f"""
WITH base AS (
  SELECT doc_id, source, text,
         '4' || lpad(CAST(doc_id % 100000000 AS VARCHAR), 14, '0') AS payload,
         lpad(CAST(doc_id AS VARCHAR), 18, '0') AS bban
  FROM documents
), luhn AS (
  SELECT *, {luhn15} AS lsum,
         98 - ({mod97.format(r="bban || '131400'")}) AS ibc0
  FROM base
), ibch AS (
  SELECT *, CASE WHEN doc_id % 2 = 1
                 THEN CASE WHEN ibc0 < 98 THEN ibc0 + 1 ELSE 2 END
                 ELSE ibc0 END AS ibc
  FROM luhn
), planted AS (
  SELECT doc_id, source,
    text
    || CASE WHEN doc_id % 3 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR)
         || '@example' || CAST(doc_id % 7 AS VARCHAR) || '.com' ELSE '' END
    || CASE WHEN doc_id % 4 = 1 THEN ' call ' || CAST(200 + doc_id % 700 AS VARCHAR)
         || '-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
         || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END
    || CASE WHEN doc_id % 5 = 2 THEN ' from 10.' || CAST(doc_id % 256 AS VARCHAR)
         || '.' || CAST((doc_id * 7) % 256 AS VARCHAR)
         || '.' || CAST((doc_id * 13) % 256 AS VARCHAR) ELSE '' END
    || CASE WHEN doc_id % 6 IN (0, 3) THEN ' card ' || payload ||
         CAST(CASE WHEN doc_id % 2 = 1 THEN ((10 - lsum % 10) % 10 + 5) % 10
              ELSE (10 - lsum % 10) % 10 END AS VARCHAR)
       ELSE '' END
    || CASE WHEN doc_id % 7 = 5 THEN ' iban DE'
         || lpad(CAST(ibc AS VARCHAR), 2, '0') || bban ELSE '' END AS pt
  FROM ibch
), det AS (
  SELECT doc_id, source,
    len(regexp_extract_all(pt, '{EMAIL_RE}')) AS n_emails,
    len(regexp_extract_all(pt, '{PHONE_RE}')) AS n_phones,
    len(regexp_extract_all(pt, '{IPV4_RE}')) AS n_ipv4,
    len(regexp_extract_all(pt, '{CC_RE}')) AS n_cc_candidates,
    len(list_filter(regexp_extract_all(pt, '{CC_RE}'),
        c -> {luhn16} % 10 = 0)) AS n_cc_valid,
    len(regexp_extract_all(pt, '{IBAN_RE}')) AS n_ibans,
    len(list_filter(regexp_extract_all(pt, '{IBAN_RE}'),
        c -> ({mod97.format(r=iban_rearr)}) = 1)) AS n_iban_valid,
    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      regexp_replace(pt,
      '{EMAIL_RE}', '[EMAIL]', 'g'),
      '{PHONE_RE}', '[PHONE]', 'g'),
      '{IPV4_RE}', '[IP]', 'g'),
      '{IBAN_RE}', '[IBAN]', 'g'),
      '{CC_RE}', '[CC]', 'g') AS red
  FROM planted
)
SELECT source,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(n_emails) AS BIGINT) AS n_emails,
  CAST(SUM(n_phones) AS BIGINT) AS n_phones,
  CAST(SUM(n_ipv4) AS BIGINT) AS n_ipv4,
  CAST(SUM(n_cc_candidates) AS BIGINT) AS n_cc_candidates,
  CAST(SUM(n_cc_valid) AS BIGINT) AS n_cc_valid,
  CAST(SUM(n_ibans) AS BIGINT) AS n_ibans,
  CAST(SUM(n_iban_valid) AS BIGINT) AS n_iban_valid,
  CAST(SUM(('0x' || substr(md5(red), 1, 10))::BIGINT) AS BIGINT) AS redact_witness
FROM det GROUP BY source ORDER BY source
"""


QUERIES["pii_redaction_stats"] = pii_redaction_stats
ORACLE["pii_redaction_stats"] = _pii_sql()
