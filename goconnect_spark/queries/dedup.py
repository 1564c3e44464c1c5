"""Deduplication operators for LLM training-data pipelines.

Four families over `documents` (+ one over `embeddings`):

- exact:        hash-groupBy on normalized text
- minhash_lsh:  word-bigram shingles -> 12 minhashes -> 4 bands of 3
                -> band-bucket join -> exact-Jaccard verify
- ngram_jaccard: shared-shingle candidate join -> exact Jaccard
- simhash:      32-bit simhash, 4x8-bit band join, Hamming<=3 verify

Portability/determinism choices (so the DuckDB oracle hash-matches):
- the minhash function is the *lexicographic min of md5 hex strings*
  (uniform order, identical in Spark and DuckDB);
- simhash uses only integer arithmetic (hex-digit -> bits via
  instr('0123456789abcdef', c));
- Jaccard/cosine divisions are double-div of identical integers,
  rounded to 6.

Scale (100 TB story): every family avoids the O(n^2) cross join — the
candidate set comes from an equi-join on a bucket key (band hash /
shared shingle), which Spark executes as a shuffle hash join on the
bucket key. Verification touches only candidate pairs. Skewed buckets
(stop-shingles) are the known hazard: ngram_jaccard drops shingles
with document frequency > _MAX_DF, and AQE skew-join splitting covers
the rest.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from goconnect_spark.tables import load

_N_HASHES = 12
_BAND_SIZE = 3  # -> 4 bands
_JACCARD_T = 0.5
_MAX_DF = 50  # drop shingles appearing in more docs than this (stop-shingles)


def _shingles(docs: DataFrame) -> DataFrame:
    """Distinct word-bigram shingles per doc (docs with >=2 words)."""
    words = docs.select("doc_id", F.split("text", " ").alias("w")).where(F.size("w") >= 2)
    return words.select(
        "doc_id",
        F.explode(F.expr("transform(sequence(0, size(w)-2), i -> concat(w[i], ' ', w[i+1]))")).alias("shingle"),
    ).distinct()


_SHINGLES_CTE = """
toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w,
         generate_subscripts(string_split(text, ' '), 1) AS i
  FROM documents
),
shingles AS (
  SELECT DISTINCT a.doc_id, a.w || ' ' || b.w AS shingle
  FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.i = a.i + 1
)
"""


# --------------------------------------------------------------------
# Exact dedup: md5 over normalized text; groups + keeper per group.
# At 100 TB this is one shuffle on a 16-byte key.
# --------------------------------------------------------------------
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, "documents", sf_dir)
    norm = F.lower(F.regexp_replace(F.trim("text"), " +", " "))
    return (
        docs.select("doc_id", F.md5(norm).alias("content_hash"))
        .groupBy("content_hash")
        .agg(F.min("doc_id").alias("keeper_doc_id"), F.count(F.lit(1)).alias("group_size"))
        .orderBy("keeper_doc_id")
    )


_EXACT_SQL = """
SELECT md5(lower(regexp_replace(trim(text), ' +', ' ', 'g'))) AS content_hash,
       MIN(doc_id) AS keeper_doc_id, COUNT(*) AS group_size
FROM documents
GROUP BY 1 ORDER BY keeper_doc_id
"""


# --------------------------------------------------------------------
# MinHash + LSH banding.
# --------------------------------------------------------------------
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, "documents", sf_dir)
    sh = _shingles(docs)

    seeds = spark.range(_N_HASHES).select(F.col("id").cast("int").alias("seed"))
    sig = (
        sh.crossJoin(F.broadcast(seeds))
        .groupBy("doc_id", "seed")
        .agg(F.min(F.md5(F.concat_ws("|", F.col("seed"), F.col("shingle")))).alias("mh"))
    )
    bands = (
        sig.withColumn("band", (F.col("seed") / _BAND_SIZE).cast("int"))
        .groupBy("doc_id", "band")
        .agg(
            F.md5(
                F.array_join(F.expr("transform(array_sort(collect_list(struct(seed, mh))), x -> x.mh)"), "|")
            ).alias("band_key")
        )
    )
    cand = (
        bands.alias("a")
        .join(bands.alias("b"), ["band", "band_key"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )

    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    inter = (
        cand.join(sh.alias("sa"), F.col("doc_a") == F.col("sa.doc_id"))
        .join(sh.alias("sb"), (F.col("doc_b") == F.col("sb.doc_id")) & (F.col("sa.shingle") == F.col("sb.shingle")))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(sizes.alias("na"), F.col("doc_a") == F.col("na.doc_id"))
        .join(sizes.alias("nb"), F.col("doc_b") == F.col("nb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("inter") / (F.col("na.n") + F.col("nb.n") - F.col("inter")).cast("double")).alias("jaccard"),
        )
        .where(F.col("jaccard") >= _JACCARD_T)
        .orderBy("doc_a", "doc_b")
    )


_MINHASH_SQL = f"""
WITH {_SHINGLES_CTE},
seeds AS (SELECT CAST(range AS INT) AS seed FROM range({_N_HASHES})),
sig AS (
  SELECT s.doc_id, sd.seed, MIN(md5(sd.seed || '|' || s.shingle)) AS mh
  FROM shingles s CROSS JOIN seeds sd
  GROUP BY s.doc_id, sd.seed
),
bands AS (
  SELECT doc_id, CAST(seed / {_BAND_SIZE} AS INT) AS band,
         md5(string_agg(mh, '|' ORDER BY seed)) AS band_key
  FROM sig GROUP BY doc_id, CAST(seed / {_BAND_SIZE} AS INT)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
  WHERE a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM shingles GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, COUNT(*) AS inter
  FROM cand c
  JOIN shingles sa ON sa.doc_id = c.doc_a
  JOIN shingles sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
  GROUP BY c.doc_a, c.doc_b
)
SELECT i.doc_a, i.doc_b,
       (i.inter / CAST(na.n + nb.n - i.inter AS DOUBLE)) AS jaccard
FROM inter i
JOIN sizes na ON na.doc_id = i.doc_a
JOIN sizes nb ON nb.doc_id = i.doc_b
WHERE (i.inter / CAST(na.n + nb.n - i.inter AS DOUBLE)) >= {_JACCARD_T}
ORDER BY doc_a, doc_b
"""


# --------------------------------------------------------------------
# n-gram Jaccard via shared-shingle candidates (no minhash): exact
# result for pairs sharing at least one non-stop shingle.
# --------------------------------------------------------------------
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, "documents", sf_dir)
    sh = _shingles(docs)
    df = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    rare = sh.join(df.where(F.col("df") <= _MAX_DF), "shingle")
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    inter = (
        rare.alias("a")
        .join(rare.alias("b"), "shingle")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(sizes.alias("na"), F.col("doc_a") == F.col("na.doc_id"))
        .join(sizes.alias("nb"), F.col("doc_b") == F.col("nb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            (F.col("inter") / (F.col("na.n") + F.col("nb.n") - F.col("inter")).cast("double")).alias(
                "jaccard"
            ),
        )
        .where(F.col("jaccard") >= 0.8)
        .orderBy("doc_a", "doc_b")
    )


_NGRAM_SQL = f"""
WITH {_SHINGLES_CTE},
df AS (SELECT shingle, COUNT(*) AS df FROM shingles GROUP BY shingle),
rare AS (SELECT s.* FROM shingles s JOIN df ON df.shingle = s.shingle AND df.df <= {_MAX_DF}),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM shingles GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
  FROM rare a JOIN rare b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT i.doc_a, i.doc_b,
       (i.inter / CAST(na.n + nb.n - i.inter AS DOUBLE)) AS jaccard
FROM inter i
JOIN sizes na ON na.doc_id = i.doc_a
JOIN sizes nb ON nb.doc_id = i.doc_b
WHERE (i.inter / CAST(na.n + nb.n - i.inter AS DOUBLE)) >= 0.8
ORDER BY doc_a, doc_b
"""


# --------------------------------------------------------------------
# SimHash (32-bit, integer-only), banded candidate join, Hamming<=3.
# --------------------------------------------------------------------
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, "documents", sf_dir)
    toks = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
        .where(F.col("w") != "")
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("f"))
        .withColumn("h8", F.substring(F.md5("w"), 1, 8))
    )
    bits = spark.range(32).select(F.col("id").cast("int").alias("b"))
    # hex digit containing bit b is char (b div 4)+1; bit within digit is b%4
    hexval = F.expr("instr('0123456789abcdef', substr(h8, CAST(b/4 AS INT)+1, 1)) - 1")
    bit = F.floor(hexval / F.pow(F.lit(2), F.col("b") % 4)).cast("int") % 2
    contrib = (
        toks.crossJoin(F.broadcast(bits))
        .select("doc_id", "b", (F.col("f") * (bit * 2 - 1)).alias("c"))
        .groupBy("doc_id", "b")
        .agg(F.sum("c").alias("s"))
    )
    sim = contrib.groupBy("doc_id").agg(
        F.sum(F.when(F.col("s") > 0, F.pow(F.lit(2), F.col("b")).cast("long")).otherwise(F.lit(0))).alias("simhash")
    )
    bands = sim.select(
        "doc_id",
        "simhash",
        F.explode(F.expr("transform(sequence(0, 3), k -> named_struct('band', k, 'bk', CAST(floor(simhash / power(2, k*8)) AS BIGINT) % 256))")).alias("e"),
    ).select("doc_id", "simhash", F.col("e.band").alias("band"), F.col("e.bk").alias("bk"))
    cand = (
        bands.alias("a")
        .join(bands.alias("b"), ["band", "bk"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sa"),
            F.col("b.simhash").alias("sb"),
        )
        .distinct()
    )
    hamming = F.expr(
        "aggregate(sequence(0, 31), 0, (acc, k) -> acc + CAST(CAST(floor(sa / power(2, k)) AS BIGINT) % 2 != CAST(floor(sb / power(2, k)) AS BIGINT) % 2 AS INT))"
    )
    return (
        cand.select("doc_a", "doc_b", hamming.alias("hamming"))
        .where(F.col("hamming") <= 3)
        .orderBy("doc_a", "doc_b")
    )


_SIMHASH_SQL = """
WITH toks AS (
  SELECT doc_id, w, COUNT(*) AS f, substr(md5(w), 1, 8) AS h8
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
  WHERE w <> '' GROUP BY doc_id, w
),
bits AS (SELECT CAST(range AS INT) AS b FROM range(32)),
contrib AS (
  SELECT doc_id, b,
         SUM(f * (((CAST(FLOOR((instr('0123456789abcdef', substr(h8, CAST(FLOOR(b/4) AS INT)+1, 1)) - 1)
                    / POWER(2, b % 4)) AS INT) % 2) * 2) - 1)) AS s
  FROM toks CROSS JOIN bits
  GROUP BY doc_id, b
),
sim AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN s > 0 THEN CAST(POWER(2, b) AS BIGINT) ELSE 0 END) AS BIGINT) AS simhash
  FROM contrib GROUP BY doc_id
),
bands AS (
  SELECT doc_id, simhash, k.range AS band,
         CAST(FLOOR(simhash / POWER(2, k.range * 8)) AS BIGINT) % 256 AS bk
  FROM sim CROSS JOIN range(4) k
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                  a.simhash AS sa, b.simhash AS sb
  FROM bands a JOIN bands b ON a.band = b.band AND a.bk = b.bk
  WHERE a.doc_id < b.doc_id
),
ham AS (
  SELECT doc_a, doc_b,
         CAST(SUM(CASE WHEN CAST(FLOOR(sa / POWER(2, k.range) ) AS BIGINT) % 2
                        <> CAST(FLOOR(sb / POWER(2, k.range)) AS BIGINT) % 2
                   THEN 1 ELSE 0 END) AS INT) AS hamming
  FROM cand CROSS JOIN range(32) k
  GROUP BY doc_a, doc_b, sa, sb
)
SELECT doc_a, doc_b, hamming FROM ham WHERE hamming <= 3 ORDER BY doc_a, doc_b
"""


QUERIES = {
    "dedup_exact": dedup_exact,
    "dedup_minhash_lsh": dedup_minhash_lsh,
    "dedup_ngram_jaccard": dedup_ngram_jaccard,
    "dedup_simhash": dedup_simhash,
}

ORACLE = {
    "dedup_exact": _EXACT_SQL,
    "dedup_minhash_lsh": _MINHASH_SQL,
    "dedup_ngram_jaccard": _NGRAM_SQL,
    "dedup_simhash": _SIMHASH_SQL,
}
