"""Deduplication operators for LLM training-data pipelines.

Four families over `documents` (+ one over `embeddings`):

- exact:        hash-groupBy on normalized text
- minhash_lsh:  word-bigram shingles -> 12 minhashes -> 4 bands of 3
                -> band-bucket join -> exact-Jaccard verify
- ngram_jaccard: dictionary-encoded count-filtered candidate join
                -> exact Jaccard (PPJoin generalized to K witnesses)
- simhash:      48-bit simhash (one wide aggregation), 4x12-bit band
                join, Hamming<=3 verify via bit_count(xor)

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
(stop-shingles) are the known hazard: ngram_jaccard bounds the
candidate join by prefix filtering on the globally-rarest shingles
(exact recall at its threshold), and AQE skew-join splitting covers
the rest.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from goconnect_spark.tables import load

_N_HASHES = 12
_BAND_SIZE = 3  # -> 4 bands
_JACCARD_T = 0.5


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
def _minhash_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-cached (doc_id, band, band_key) LSH bucket table — the
    'signature store' of a production dedup service: the full-corpus
    self-dedup AND the incremental new-batch probe both read it, and
    at 100 TB it is exactly the table a pipeline persists (bucketed by
    band_key) so each ingest batch probes existing signatures instead
    of resharding the corpus.

    ONE md5 per distinct shingle; the 12 hash families come from
    Kirsch-Mitzenmacher double hashing g_s = (h1 + s*h2) mod 2^48
    (h1/h2 = independent 48-bit md5 halves, h2 forced odd) — all
    values < 2^53 so the arithmetic is exact in both engines. All 12
    mins ride ONE aggregation; band keys are md5 over each band's 3
    signature columns, exploded in-row.
    """
    from goconnect_spark.queries.corpus import cached_table

    return cached_table(
        spark,
        sf_dir,
        "minhash_bands",
        lambda: bands_from_sigs(_minhash_sigs(spark, sf_dir)),
    )


def _minhash_sigs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-cached raw signature table (doc_id, n, mh0..mh11) — the
    layer UNDER the band table: the calibration query (dedup2) reads
    per-hash signature agreement, the band table derives from it
    in-row, and both share the one heavy aggregation."""
    from goconnect_spark.queries.corpus import cached_table, doc_shingle_arrays

    return cached_table(
        spark,
        sf_dir,
        "minhash_sigs",
        lambda: minhash_sigs_for(doc_shingle_arrays(spark, sf_dir)),
    )


def minhash_sigs_for(arrays: DataFrame) -> DataFrame:
    """(doc_id, n, mh0..mh11) from any (doc_id, shset, n) shingle
    table: ONE md5 per distinct shingle, 12 Kirsch-Mitzenmacher
    families, all mins in a single aggregation."""
    sh = arrays.select("doc_id", "n", F.explode("shset").alias("shingle"))
    hashed = sh.selectExpr(
        "doc_id",
        "n",
        "cast(conv(substr(md5(shingle), 1, 12), 16, 10) as bigint) as h1",
        "cast(conv(substr(md5(shingle), 13, 12), 16, 10) as bigint) * 2 + 1 as h2",
    )
    return hashed.groupBy("doc_id", "n").agg(
        *[
            F.expr(f"min((h1 + {s} * h2) % 281474976710656)").alias(f"mh{s}")
            for s in range(_N_HASHES)
        ],
    )


def bands_from_sigs(sig: DataFrame) -> DataFrame:
    """(doc_id, band, band_key) from a signature table — band keys are
    md5 over each band's 3 signature columns, exploded in-row."""
    n_bands = _N_HASHES // _BAND_SIZE
    band_structs = ", ".join(
        "named_struct('band', {k}, 'band_key', md5(concat_ws('|', {cols})))".format(
            k=k,
            cols=", ".join(
                f"mh{s}" for s in range(k * _BAND_SIZE, (k + 1) * _BAND_SIZE)
            ),
        )
        for k in range(n_bands)
    )
    return sig.select(
        "doc_id", F.explode(F.expr(f"array({band_structs})")).alias("e")
    ).select(
        "doc_id", F.col("e.band").alias("band"), F.col("e.band_key").alias("band_key")
    )


def minhash_bands_for(arrays: DataFrame) -> DataFrame:
    """(doc_id, band, band_key) from any (doc_id, shset, n) shingle
    table — the pure transformation behind `_minhash_bands`, reusable
    on a streaming micro-batch (examples/streaming_incremental_dedup)
    or an ad-hoc corpus."""
    return bands_from_sigs(minhash_sigs_for(arrays))


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    # All the heavy lifting lives in the two session-cached shared
    # tables: doc_shingle_arrays (one shuffle builds the distinct
    # shingle sets — MIN over the multiset equals MIN over the set,
    # so signatures lose nothing) and _minhash_bands (12 minhashes in
    # ONE aggregation, band keys in-row). Candidates come from the
    # (band, key) equi-join; the Jaccard verify runs in-row over the
    # candidate docs' shingle arrays only.
    from goconnect_spark.queries.corpus import doc_shingle_arrays

    arrays = doc_shingle_arrays(spark, sf_dir)
    bands = _minhash_bands(spark, sf_dir)
    cand = (
        bands.alias("a")
        .join(bands.alias("b"), ["band", "band_key"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )

    # Verify in-row against the shared shingle-set arrays: candidate
    # pairs are band-collision-bounded (small), so both joins against
    # the arrays table broadcast the candidate side (AQE) and the
    # intersection is size(array_intersect) inside the row — no
    # shingle-level re-explode, no (pair x shingle) exchange.
    pa = arrays.select(
        F.col("doc_id").alias("doc_a"), F.col("shset").alias("sa"), F.col("n").alias("na")
    )
    pb = arrays.select(
        F.col("doc_id").alias("doc_b"), F.col("shset").alias("sb"), F.col("n").alias("nb")
    )
    return (
        cand.join(pa, "doc_a")
        .join(pb, "doc_b")
        .withColumn("inter", F.expr("CAST(size(array_intersect(sa, sb)) AS BIGINT)"))
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")).cast("double")
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= _JACCARD_T)
        .orderBy("doc_a", "doc_b")
    )


def _minhash_sig_sql() -> str:
    return ",\n         ".join(
        f"MIN((h1 + {s} * h2) % 281474976710656) AS mh{s}" for s in range(_N_HASHES)
    )


def _minhash_bands_sql() -> str:
    n_bands = _N_HASHES // _BAND_SIZE
    return "\n  UNION ALL\n".join(
        "  SELECT doc_id, {k} AS band, md5({cols}) AS band_key FROM sig".format(
            k=k,
            cols=" || '|' || ".join(f"mh{s}" for s in range(k * _BAND_SIZE, (k + 1) * _BAND_SIZE)),
        )
        for k in range(n_bands)
    )


_MINHASH_SQL = f"""
WITH {_SHINGLES_CTE},
hashed AS (
  SELECT doc_id, shingle,
         ('0x' || substr(md5(shingle), 1, 12))::BIGINT AS h1,
         ('0x' || substr(md5(shingle), 13, 12))::BIGINT * 2 + 1 AS h2
  FROM shingles
),
sig AS (
  SELECT doc_id,
         COUNT(*) AS n_unused,
         {_minhash_sig_sql()}
  FROM hashed
  GROUP BY doc_id
),
bands AS (
{_minhash_bands_sql()}
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
_NGRAM_T = 0.8
# extra ranked entries kept in the shared prefix table beyond the
# minimal lossless bound — containment's count filter demands
# min(1+extra, ceil(t*n)) matches among the extended prefix
_PREFIX_EXTRA = 7


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact all-pairs Jaccard >= t via the PPJoin filter stack
    (Xiao et al. 2008) generalized to the COUNT filter over an
    extended prefix, on a dictionary-encoded corpus:

    - dictionary encoding: every shingle maps to a dense integer id
      ordered by global rarity (df asc, shingle asc) — the shared
      `doc_shingle_ids` table (corpus.py). Prefixes become in-row
      `slice`s of the sorted id array and the candidate join shuffles
      8-byte ints, not strings.
    - count filter (prefix filter at K=1): a pair with J >= t needs
      overlap o >= ceil(t/(1+t)*(n_a+n_b)), so at most n_a - o of A's
      shingles are absent from B. Among A's first
      L = n_a - ceil(t*n_a) + K ranked shingles, at least
      R = o_req - ceil(t*n_a) + min(K, ceil(t*n_a)) must appear in B
      (pigeonhole, recall-lossless for every K; min() is the
      tiny-doc clamp where the slice covers the whole set). K = 8
      here: on corpora where every pair shares SOME rare shingle (the
      K=1 worst case — measured 1.35M verify pairs for 256 true pairs
      at sf0.1), demanding 8+ witnessed matches collapses candidates
      to ~the true pair set (268 for 256).
    - length filter: J >= t forces 4*n_a <= 5*n_b and 4*n_b <= 5*n_a
      (exact integers, t = 4/5).

    The candidate join runs A's extended prefix against B's FULL id
    incidence — the pigeonhole counts matches in B regardless of
    whether they fall in B's prefix, so joining prefix-to-full keeps
    the bound lossless while the a.doc_id < b.doc_id orientation
    halves the work. Verification is an in-row array_intersect over
    the int arrays (bijective encoding — set sizes and overlaps are
    exactly those of the string sets, so the result equals the DuckDB
    oracle, which verifies on raw strings). The whole stack derives
    from ONE materialized table (shared with containment_dedup): the
    100 TB pipeline shape — tokenize + dictionary-encode once,
    bucket by id, every self-join consumer reads it."""
    from goconnect_spark.queries.corpus import doc_shingle_ids

    return ngram_jaccard_pairs(
        load(spark, "documents", sf_dir),
        ids=doc_shingle_ids(spark, sf_dir),
    )


def ngram_jaccard_pairs(
    docs: DataFrame, ids: DataFrame = None
) -> DataFrame:
    """The PPJoin pipeline over any (doc_id, text) DataFrame — factored
    out so tests can compare against brute force on randomized
    corpora (losslessness of the filters is a theorem; the test
    checks the implementation honors it). `ids` lets the sf-level
    query inject the session-cached dictionary-encoded shingle table
    (corpus.doc_shingle_ids); absent, it is built (and persisted)
    from `docs` directly."""
    if ids is None:
        from goconnect_spark.queries.corpus import shingle_arrays_for, shingle_ids_for

        toks = docs.select("doc_id", F.split("text", " ").alias("toks"))
        ids = shingle_ids_for(shingle_arrays_for(toks)).persist()
    K = 1 + _PREFIX_EXTRA
    # Candidate-join shape (r15, measured at sf1 where this family is
    # the catalog's top cost — guide §2.3/§2.5):
    # 1. LENGTH-BUCKETED join key: J >= 4/5 forces 4*n_a <= 5*n_b and
    #    4*n_b <= 5*n_a (lengths within +-25%), so folding
    #    floor(n/W) into the join key prunes length-incompatible
    #    postings BEFORE a candidate row exists. Measured at sf1: the
    #    sid-only join enumerated 1.27B rows of which only 428M
    #    survived the post-join length filter — a 3x cut moved from
    #    filter to join key. The exact predicates stay as residual
    #    filters (buckets are a superset), so the candidate set is
    #    bit-identical.
    # 2. PARTITION-LOCAL PAIR AGGREGATE (the big one): the planner
    #    broadcasts the full-incidence side, so every (A, B, sid)
    #    coincidence row of a given A is produced inside A's map task.
    #    Hash-repartitioning the prefix side by doc_id makes that
    #    explicit to the planner: HashPartitioning([doc_id]) satisfies
    #    the ClusteredDistribution([doc_a, doc_b]) the pair aggregate
    #    requires (subset rule), so the count-filter aggregate runs as
    #    ONE partition-local HashAggregate — the candidate-pair
    #    exchange (at sf1: ~215M distinct pairs, tens of GB of shuffle
    #    that drove the aggregate into sort-based spill fallback)
    #    disappears from the plan outright (guide §2.4 "remove
    #    shuffles"). The repartition moves only the prefix rows
    #    (corpus-linear) to save shuffling the pair rows
    #    (corpus-quadratic) — the right trade at every scale, so it is
    #    unconditional, never width-reducing, and 8x parallelism wide
    #    to bound each task's aggregate state.
    _W = 8
    pref = ids.select(
        "doc_id",
        "n",
        F.explode(
            F.expr(f"slice(sids, 1, cast(n - (4*n + 4) DIV 5 + {K} as int))")
        ).alias("sid"),
    ).select(
        "doc_id",
        "n",
        "sid",
        F.explode(
            F.expr(
                f"sequence(((4*n + 4) DIV 5) DIV {_W}, ((5*n) DIV 4) DIV {_W})"
            )
        ).alias("bkt"),
    )
    # BOTH sides are hash-repartitioned by their own doc column: a
    # pair's coincidence rows share doc_a AND doc_b, so whichever side
    # the planner broadcasts, the surviving stream side's partitioning
    # satisfies the aggregate's clustering and the elision holds. The
    # broadcast side's repartition is a wasted linear exchange —
    # corpus-LINEAR rows spent to save the corpus-QUADRATIC pair
    # shuffle.
    sc = ids.sparkSession.sparkContext
    width = max(sc.defaultParallelism * 8, pref.rdd.getNumPartitions())
    pref = pref.repartition(width, "doc_id")
    full = (
        ids.select("doc_id", "n", F.explode("sids").alias("sid"))
        .withColumn("bkt", F.expr(f"n DIV {_W}"))
        .repartition(width, "doc_id")
    )
    # R = o_req - ceil(t*n_a) + min(K, ceil(t*n_a)), o_req = ceil(4(na+nb)/9)
    required = F.expr(
        f"(4*(a.n + b.n) + 8) DIV 9 - (4*a.n + 4) DIV 5"
        f" + least({K}, (4*a.n + 4) DIV 5)"
    )
    cand = (
        pref.alias("a")
        .join(full.alias("b"), ["sid", "bkt"])
        .where(
            (F.col("a.doc_id") < F.col("b.doc_id"))
            & (4 * F.col("a.n") <= 5 * F.col("b.n"))
            & (4 * F.col("b.n") <= 5 * F.col("a.n"))
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(F.count(F.lit(1)).alias("pmatch"), F.min(required).alias("req"))
        .where(F.col("pmatch") >= F.col("req"))
        .select("doc_a", "doc_b")
    )
    # verify: in-row intersection of the two docs' sorted id arrays
    return (
        cand.join(ids.alias("na"), F.col("doc_a") == F.col("na.doc_id"))
        .join(ids.alias("nb"), F.col("doc_b") == F.col("nb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("na.sids", "nb.sids")).alias("inter"),
            F.col("na.n").alias("n_a"),
            F.col("nb.n").alias("n_b"),
        )
        .select(
            "doc_a",
            "doc_b",
            (F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter")).cast("double")).alias(
                "jaccard"
            ),
        )
        .where(F.col("jaccard") >= _NGRAM_T)
        .orderBy("doc_a", "doc_b")
    )


_NGRAM_SQL = f"""
WITH {_SHINGLES_CTE},
dfreq AS (SELECT shingle, COUNT(*) AS df FROM shingles GROUP BY shingle),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM shingles GROUP BY doc_id),
ranked AS (
  SELECT s.doc_id, s.shingle,
         ROW_NUMBER() OVER (PARTITION BY s.doc_id ORDER BY d.df ASC, s.shingle ASC) AS rn
  FROM shingles s JOIN dfreq d ON d.shingle = s.shingle
),
prefix AS (
  SELECT r.doc_id, r.shingle, z.n
  FROM ranked r JOIN sizes z ON z.doc_id = r.doc_id
  WHERE r.rn <= z.n - (4 * z.n + 4) // 5 + 1
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM prefix a JOIN prefix b ON a.shingle = b.shingle
  WHERE a.doc_id < b.doc_id
    AND a.n * {_NGRAM_T} <= b.n AND b.n * {_NGRAM_T} <= a.n
),
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
WHERE (i.inter / CAST(na.n + nb.n - i.inter AS DOUBLE)) >= {_NGRAM_T}
ORDER BY doc_a, doc_b
"""


# --------------------------------------------------------------------
# SimHash (32-bit, integer-only), banded candidate join, Hamming<=3.
# --------------------------------------------------------------------
# 48-bit simhash, computed as ONE wide aggregation (48 sum columns)
# instead of a doc×bit explode — at 100 TB that's the difference
# between shuffling 48x the token table and shuffling it once.
# Bit b of md5(token): hex digit b//4, within-digit bit b%4. All
# divisors are powers of two, so FLOOR(x / 2^j) is exact in both
# engines. Hamming distance = bit_count(xor) (both engines native).
_SIMHASH_BITS = 48
_SIMHASH_HAM_T = 3
_SIMHASH_BAND_BITS = 12  # 4 bands of 12 bits


def _sign_sql(b: int) -> str:
    """+1/-1 from bit b of the token's md5 prefix (column `h`)."""
    c, j = b // 4, b % 4
    return (
        f"(((CAST(FLOOR((instr('0123456789abcdef', substr(h, {c + 1}, 1)) - 1)"
        f" / {2 ** j}) AS INT) % 2) * 2) - 1)"
    )


def _simhash_agg_sql() -> str:
    """SUM-per-bit then recombine: CASE WHEN SUM(f*sign_b)>0 THEN 2^b."""
    terms = [
        f"(CASE WHEN SUM(f * {_sign_sql(b)}) > 0 THEN CAST({2 ** b} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
        for b in range(_SIMHASH_BITS)
    ]
    return " + ".join(terms)


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from goconnect_spark.queries.corpus import cached_table, doc_token_arrays

    def build_sim() -> DataFrame:
        toks = (
            doc_token_arrays(spark, sf_dir)
            .select("doc_id", F.explode("toks").alias("w"))
            .where(F.col("w") != "")
            .groupBy("doc_id", "w")
            .agg(F.count(F.lit(1)).alias("f"))
            .withColumn("h", F.substring(F.md5("w"), 1, _SIMHASH_BITS // 4))
        )
        return toks.groupBy("doc_id").agg(F.expr(_simhash_agg_sql()).alias("simhash"))

    # The signature table is doc-count-sized (16 bytes/doc) and feeds
    # BOTH sides of the band self-join; without materialization Spark
    # recomputes the tokenize+aggregate subtree twice (self-joins do
    # not share uncached subtrees). At 100 TB this is the first-class
    # "signatures" dataset a dedup pipeline writes once and reuses.
    sim = cached_table(spark, sf_dir, "simhash", build_sim)
    n_bands = _SIMHASH_BITS // _SIMHASH_BAND_BITS
    modulus = 2 ** _SIMHASH_BAND_BITS
    band_structs = ", ".join(
        f"named_struct('band', {k}, 'bk', CAST(floor(simhash / {modulus ** k}) AS BIGINT) % {modulus})"
        for k in range(n_bands)
    )
    bands = sim.select(
        "doc_id", "simhash", F.explode(F.expr(f"array({band_structs})")).alias("e")
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
    return (
        cand.select("doc_a", "doc_b", F.expr("CAST(bit_count(sa ^ sb) AS INT)").alias("hamming"))
        .where(F.col("hamming") <= _SIMHASH_HAM_T)
        .orderBy("doc_a", "doc_b")
    )


def _simhash_oracle_sql() -> str:
    n_bands = _SIMHASH_BITS // _SIMHASH_BAND_BITS
    modulus = 2 ** _SIMHASH_BAND_BITS
    band_rows = "\n  UNION ALL\n".join(
        f"  SELECT doc_id, simhash, {k} AS band,"
        f" CAST(FLOOR(simhash / {modulus ** k}) AS BIGINT) % {modulus} AS bk FROM sim"
        for k in range(n_bands)
    )
    return f"""
WITH toks AS (
  SELECT doc_id, w, COUNT(*) AS f, substr(md5(w), 1, {_SIMHASH_BITS // 4}) AS h
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
  WHERE w <> '' GROUP BY doc_id, w
),
sim AS (
  SELECT doc_id, {_simhash_agg_sql()} AS simhash
  FROM toks GROUP BY doc_id
),
bands AS (
{band_rows}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                  a.simhash AS sa, b.simhash AS sb
  FROM bands a JOIN bands b ON a.band = b.band AND a.bk = b.bk
  WHERE a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, CAST(bit_count(xor(sa, sb)) AS INT) AS hamming
FROM cand WHERE CAST(bit_count(xor(sa, sb)) AS INT) <= {_SIMHASH_HAM_T}
ORDER BY doc_a, doc_b
"""


_SIMHASH_SQL = _simhash_oracle_sql()


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


# --------------------------------------------------------------------
# Duplicate-cluster resolution: connected components over the
# minhash near-dup pair graph -> one keeper (min doc_id) per
# transitive duplicate cluster. Pair detection alone under-deletes
# (A~B, B~C but A!~C); the component is the dedup unit.
#
# Spark side: iterative min-label propagation (the standard
# large-graph CC loop — each iteration is one join+agg, converges in
# O(component diameter) rounds; driver checks convergence). Oracle:
# recursive CTE reachability. Both compute the same deterministic
# fixpoint: min doc_id reachable.
# --------------------------------------------------------------------
def dedup_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cached per (session, sf_dir): three catalog queries consume the
    cluster map (standalone, dedup_filtered_corpus,
    curated_corpus_stats), and the iterative build runs eager jobs —
    re-deriving it per consumer tripled the most expensive build in
    the catalog. Same materialize-once principle as corpus.py."""
    from goconnect_spark.queries.corpus import cached_table

    return cached_table(
        spark, sf_dir, "cc", lambda: _cc_build(spark, sf_dir)
    ).orderBy("doc_id")


def _cc_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
    # materialize the edge list once — every CC iteration joins it,
    # and without this each round would re-run the whole minhash
    # candidate pipeline
    edges = (
        pairs.union(pairs.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b")))
        .withColumnsRenamed({"doc_a": "src", "doc_b": "dst"})
        .localCheckpoint()
    )

    # min-label propagation over the symmetric edge list is the shared
    # operator (singleton docs are omitted there — they can't change
    # label, and this query only reports clusters of size > 1 anyway)
    from goconnect_spark.operators.graph import connected_components

    labels = connected_components(edges)

    sizes = labels.groupBy("label").agg(F.count(F.lit(1)).alias("component_size"))
    return (
        labels.join(sizes, "label")
        .select(
            F.col("v").alias("doc_id"),
            F.col("label").alias("keeper_doc_id"),
            "component_size",
        )
        .where(F.col("component_size") > 1)  # only true duplicate clusters
    )


def _cc_oracle_sql() -> str:
    inner = _MINHASH_SQL.strip()
    return f"""
WITH RECURSIVE pairs AS (
  SELECT doc_a, doc_b FROM ({inner}) q
),
edges AS (
  SELECT doc_a AS s, doc_b AS d FROM pairs
  UNION ALL
  SELECT doc_b, doc_a FROM pairs
),
reach(v, r) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.d, r.r FROM reach r JOIN edges e ON e.s = r.v
),
comp AS (SELECT v AS doc_id, MIN(r) AS keeper_doc_id FROM reach GROUP BY v),
sizes AS (SELECT keeper_doc_id, COUNT(*) AS component_size FROM comp GROUP BY keeper_doc_id)
SELECT c.doc_id, c.keeper_doc_id, s.component_size
FROM comp c JOIN sizes s ON s.keeper_doc_id = c.keeper_doc_id
WHERE s.component_size > 1
ORDER BY c.doc_id
"""


QUERIES["dedup_connected_components"] = dedup_connected_components
ORACLE["dedup_connected_components"] = _cc_oracle_sql()


# --------------------------------------------------------------------
# The end product of the dedup family: the corpus-filter decision.
# Pair detection (minhash) -> transitive clusters (CC) -> keep the
# cluster keeper + all singletons; report the keep/drop budget per
# language (what a pipeline operator reviews before committing the
# filtered corpus).
# --------------------------------------------------------------------
def dedup_filtered_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, "documents", sf_dir).select("doc_id", "lang")
    cc = dedup_connected_components(spark, sf_dir)
    dropped = cc.where(F.col("doc_id") != F.col("keeper_doc_id")).select(
        "doc_id", F.lit(1).alias("dropped")
    )
    return (
        docs.join(dropped, "doc_id", "left")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("dropped").isNull(), 1).otherwise(0)).cast("long").alias("n_kept"),
            F.sum(F.coalesce("dropped", F.lit(0))).cast("long").alias("n_dropped"),
        )
        .orderBy("lang")
    )


def _filtered_corpus_sql() -> str:
    return f"""
WITH cc AS ({_cc_oracle_sql()}),
dropped AS (SELECT doc_id FROM cc WHERE doc_id <> keeper_doc_id)
SELECT d.lang,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN dr.doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN dr.doc_id IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS n_dropped
FROM documents d LEFT JOIN dropped dr ON dr.doc_id = d.doc_id
GROUP BY d.lang ORDER BY d.lang
"""


QUERIES["dedup_filtered_corpus"] = dedup_filtered_corpus
ORACLE["dedup_filtered_corpus"] = _filtered_corpus_sql()


# --------------------------------------------------------------------
# Quality-aware keeper election: real pipelines keep the BEST document
# of each near-dup cluster (longest / highest type-token ratio), not
# the smallest id. Quality here is the fixed-point type-token ratio
# (distinct tokens * 1e6 DIV tokens) with token count then doc_id as
# tie-breaks — exact integer arithmetic, identical in both engines.
#
# Scale: the election is ONE aggregation per cluster via max(struct)
# — the associative arg-max that combines map-side, no per-cluster
# window. The oracle's ROW_NUMBER window is oracle-only (DuckDB
# recomputes clusters from scratch anyway).
# --------------------------------------------------------------------
def dedup_quality_keepers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from goconnect_spark.queries.corpus import doc_token_arrays

    cc = dedup_connected_components(spark, sf_dir)
    q = doc_token_arrays(spark, sf_dir).select(
        "doc_id",
        F.size("toks").cast("long").alias("n_tokens"),
        F.expr(
            "cast(size(array_distinct(toks)) as bigint) * 1000000"
            " DIV size(toks)"
        ).alias("ttr_fp"),
    )
    best = F.max(
        F.struct("ttr_fp", "n_tokens", (-F.col("doc_id")).alias("negid"))
    ).alias("b")
    return (
        cc.join(q, "doc_id")
        .groupBy(F.col("keeper_doc_id").alias("cluster_id"))
        .agg(
            F.count(F.lit(1)).alias("component_size"),
            best,
        )
        .select(
            "cluster_id",
            "component_size",
            (-F.col("b.negid")).cast("long").alias("quality_keeper"),
            F.col("b.ttr_fp").alias("keeper_ttr_fp"),
            F.col("b.n_tokens").alias("keeper_n_tokens"),
        )
        .orderBy("cluster_id")
    )


def _quality_keepers_sql() -> str:
    return f"""
WITH cc AS ({_cc_oracle_sql()}),
q AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         CAST(len(list_distinct(string_split(text, ' '))) * 1000000
              // len(string_split(text, ' ')) AS BIGINT) AS ttr_fp
  FROM documents
),
ranked AS (
  SELECT cc.keeper_doc_id AS cluster_id, cc.doc_id, q.ttr_fp, q.n_tokens,
         ROW_NUMBER() OVER (
           PARTITION BY cc.keeper_doc_id
           ORDER BY q.ttr_fp DESC, q.n_tokens DESC, cc.doc_id ASC
         ) AS rn,
         COUNT(*) OVER (PARTITION BY cc.keeper_doc_id) AS component_size
  FROM cc JOIN q ON q.doc_id = cc.doc_id
)
SELECT cluster_id, CAST(component_size AS BIGINT) AS component_size,
       doc_id AS quality_keeper, ttr_fp AS keeper_ttr_fp,
       n_tokens AS keeper_n_tokens
FROM ranked WHERE rn = 1
ORDER BY cluster_id
"""


QUERIES["dedup_quality_keepers"] = dedup_quality_keepers
ORACLE["dedup_quality_keepers"] = _quality_keepers_sql()


# --------------------------------------------------------------------
# Incremental ingest dedup: probe a NEW batch against the EXISTING
# corpus — the shape every production pipeline actually runs (nobody
# re-dedups 100 TB per ingest). The newest 5% of the doc_id space
# stands in for the arriving batch; the persisted band table
# (_minhash_bands — the signature store) is probed by an equi-join on
# (band, band_key), so cost scales with the BATCH, not the corpus.
# --------------------------------------------------------------------
def dedup_incremental_new_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per new-batch doc: how many existing docs it duplicates
    (Jaccard >= t via minhash-LSH candidates + exact verify) and the
    first (lowest-id) duplicate — the keep/drop decision an ingest
    worker emits.

    Scale: old-side band rows come from the persisted signature
    store; the probe join touches only band keys present in the NEW
    batch, verification touches only candidate pairs, and the final
    left join is batch-sized. The 1-row id-threshold scalar is a
    broadcast. New docs too short to shingle (< 2 words) can collide
    with nothing and surface as non-duplicates, matching the oracle
    which recomputes everything from raw text.
    """
    from goconnect_spark.queries.corpus import doc_shingle_arrays

    docs = load(spark, "documents", sf_dir)
    cut = docs.agg(F.expr("(MAX(doc_id) * 19) DIV 20").alias("cut"))
    bands = _minhash_bands(spark, sf_dir).crossJoin(F.broadcast(cut))
    new_b = bands.where(F.col("doc_id") >= F.col("cut")).drop("cut")
    old_b = bands.where(F.col("doc_id") < F.col("cut")).drop("cut")
    cand = (
        new_b.alias("nw")
        .join(old_b.alias("od"), ["band", "band_key"])
        .select(
            F.col("nw.doc_id").alias("new_id"), F.col("od.doc_id").alias("old_id")
        )
        .distinct()
    )
    arrays = doc_shingle_arrays(spark, sf_dir)
    na = arrays.select(
        F.col("doc_id").alias("new_id"), F.col("shset").alias("sa"), F.col("n").alias("na")
    )
    ob = arrays.select(
        F.col("doc_id").alias("old_id"), F.col("shset").alias("sb"), F.col("n").alias("nb")
    )
    dups = (
        cand.join(na, "new_id")
        .join(ob, "old_id")
        .withColumn("inter", F.expr("CAST(size(array_intersect(sa, sb)) AS BIGINT)"))
        .where(
            F.col("inter")
            / (F.col("na") + F.col("nb") - F.col("inter")).cast("double")
            >= _JACCARD_T
        )
        .groupBy("new_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_dup_matches"),
            F.min("old_id").alias("first_dup_doc_id"),
        )
    )
    return (
        docs.crossJoin(F.broadcast(cut))
        .where(F.col("doc_id") >= F.col("cut"))
        .select("doc_id", "source")
        .join(dups, F.col("doc_id") == F.col("new_id"), "left")
        .select(
            "doc_id",
            "source",
            F.coalesce("n_dup_matches", F.lit(0)).cast("long").alias("n_dup_matches"),
            "first_dup_doc_id",
            F.col("new_id").isNotNull().cast("int").alias("is_dup"),
        )
        .orderBy("doc_id")
    )


def _incremental_sql() -> str:
    inner = _MINHASH_SQL.strip()
    # reuse the full minhash CTE stack (shingles/hashed/sig/bands) by
    # slicing the shared prefix off _MINHASH_SQL up to the bands CTE
    prefix_end = inner.index("cand AS (")
    cte_prefix = inner[:prefix_end].rstrip().rstrip(",")
    return f"""
{cte_prefix},
thr AS (SELECT (MAX(doc_id) * 19) // 20 AS cut FROM documents),
cand AS (
  SELECT DISTINCT nw.doc_id AS new_id, od.doc_id AS old_id
  FROM bands nw
  JOIN bands od ON nw.band = od.band AND nw.band_key = od.band_key
  CROSS JOIN thr
  WHERE nw.doc_id >= thr.cut AND od.doc_id < thr.cut
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM shingles GROUP BY doc_id),
inter AS (
  SELECT c.new_id, c.old_id, COUNT(*) AS inter
  FROM cand c
  JOIN shingles sa ON sa.doc_id = c.new_id
  JOIN shingles sb ON sb.doc_id = c.old_id AND sb.shingle = sa.shingle
  GROUP BY c.new_id, c.old_id
),
dups AS (
  SELECT i.new_id,
         CAST(COUNT(*) AS BIGINT) AS n_dup_matches,
         MIN(i.old_id) AS first_dup_doc_id
  FROM inter i
  JOIN sizes na ON na.doc_id = i.new_id
  JOIN sizes nb ON nb.doc_id = i.old_id
  WHERE i.inter / CAST(na.n + nb.n - i.inter AS DOUBLE) >= {_JACCARD_T}
  GROUP BY i.new_id
)
SELECT d.doc_id, d.source,
       CAST(COALESCE(u.n_dup_matches, 0) AS BIGINT) AS n_dup_matches,
       u.first_dup_doc_id,
       CAST(CASE WHEN u.new_id IS NULL THEN 0 ELSE 1 END AS INT) AS is_dup
FROM documents d CROSS JOIN thr
LEFT JOIN dups u ON u.new_id = d.doc_id
WHERE d.doc_id >= thr.cut
ORDER BY d.doc_id
"""


QUERIES["dedup_incremental_new_batch"] = dedup_incremental_new_batch
ORACLE["dedup_incremental_new_batch"] = _incremental_sql()


# --------------------------------------------------------------------
# Duplicate-cluster size histogram: the corpus-health summary a
# pipeline reviews before committing a dedup pass (a heavy tail of
# giant clusters usually means boilerplate, not true duplication).
# --------------------------------------------------------------------
def dedup_cluster_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of duplicate-cluster sizes from the cached
    connected-components map: clusters per size and docs absorbed per
    size. Cluster-count-sized input (one row per cluster after the
    distinct), so every step is trivially parallel."""
    cc = dedup_connected_components(spark, sf_dir)
    clusters = cc.select("keeper_doc_id", "component_size").distinct()
    return (
        clusters.groupBy("component_size")
        .agg(F.count(F.lit(1)).cast("long").alias("n_clusters"))
        .select(
            "component_size",
            "n_clusters",
            (F.col("component_size") * F.col("n_clusters"))
            .cast("long")
            .alias("n_docs"),
        )
        .orderBy("component_size")
    )


def _cluster_histogram_sql() -> str:
    return f"""
WITH cc AS ({_cc_oracle_sql()}),
clusters AS (SELECT DISTINCT keeper_doc_id, component_size FROM cc)
SELECT component_size,
       CAST(COUNT(*) AS BIGINT) AS n_clusters,
       CAST(component_size * COUNT(*) AS BIGINT) AS n_docs
FROM clusters GROUP BY component_size ORDER BY component_size
"""


QUERIES["dedup_cluster_size_histogram"] = dedup_cluster_size_histogram
ORACLE["dedup_cluster_size_histogram"] = _cluster_histogram_sql()


# --------------------------------------------------------------------
# Method-comparison eval: how much do the two near-dup detectors
# agree? The calibration readout a pipeline owner checks before
# picking thresholds (minhash catches set-overlap dups, simhash
# catches low-Hamming weighted-profile dups; divergence is signal,
# not error).
# --------------------------------------------------------------------
def dedup_method_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row: pair counts from minhash-LSH and simhash, their
    intersection, and the Jaccard of the two PAIR SETS. Union-tag +
    one groupBy on the pair key (pair-set-sized input, no scalar
    cross joins); the ratio divides identical integers in both
    engines."""
    mh = dedup_minhash_lsh(spark, sf_dir).select(
        "doc_a", "doc_b", F.lit(1).alias("in_mh"), F.lit(0).alias("in_sh")
    )
    sh = dedup_simhash(spark, sf_dir).select(
        "doc_a", "doc_b", F.lit(0).alias("in_mh"), F.lit(1).alias("in_sh")
    )
    per_pair = (
        mh.unionByName(sh)
        .groupBy("doc_a", "doc_b")
        .agg(F.max("in_mh").alias("mh"), F.max("in_sh").alias("sh"))
    )
    return per_pair.agg(
        F.sum("mh").cast("long").alias("n_minhash"),
        F.sum("sh").cast("long").alias("n_simhash"),
        F.sum(F.col("mh") * F.col("sh")).cast("long").alias("n_both"),
        (
            F.sum(F.col("mh") * F.col("sh"))
            / (
                F.sum("mh") + F.sum("sh") - F.sum(F.col("mh") * F.col("sh"))
            ).cast("double")
        ).alias("pairset_jaccard"),
    )


def _agreement_sql() -> str:
    return f"""
WITH mh AS (SELECT doc_a, doc_b FROM ({_MINHASH_SQL.strip()}) m),
sh AS (SELECT doc_a, doc_b FROM ({_SIMHASH_SQL.strip()}) s),
tagged AS (
  SELECT doc_a, doc_b, 1 AS in_mh, 0 AS in_sh FROM mh
  UNION ALL
  SELECT doc_a, doc_b, 0 AS in_mh, 1 AS in_sh FROM sh
),
per_pair AS (
  SELECT doc_a, doc_b, MAX(in_mh) AS mh, MAX(in_sh) AS sh
  FROM tagged GROUP BY doc_a, doc_b
)
SELECT CAST(SUM(mh) AS BIGINT) AS n_minhash,
       CAST(SUM(sh) AS BIGINT) AS n_simhash,
       CAST(SUM(mh * sh) AS BIGINT) AS n_both,
       SUM(mh * sh) / CAST(SUM(mh) + SUM(sh) - SUM(mh * sh) AS DOUBLE)
         AS pairset_jaccard
FROM per_pair
"""


QUERIES["dedup_method_agreement"] = dedup_method_agreement
ORACLE["dedup_method_agreement"] = _agreement_sql()


# --------------------------------------------------------------------
# Cross-source duplication matrix: near-dup PAIR counts per source
# pair — which crawl sources copy from each other (mirror detection),
# vs within-source duplication (template detection). The pair-level
# complement of curation.source_overlap_jaccard's shingle-level view.
# --------------------------------------------------------------------
def source_dedup_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minhash near-dup pairs joined to the doc->source dim on both
    ends, aggregated per unordered source pair (sorted so (a,b) and
    (b,a) merge). Pair-set-sized input after the dedup family's
    cached tables; two dim joins + one aggregation."""
    docs = load(spark, "documents", sf_dir).select("doc_id", "source")
    pairs = dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
    sa = docs.select(F.col("doc_id").alias("doc_a"), F.col("source").alias("src_a"))
    sb = docs.select(F.col("doc_id").alias("doc_b"), F.col("source").alias("src_b"))
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            F.least("src_a", "src_b").alias("source_1"),
            F.greatest("src_a", "src_b").alias("source_2"),
        )
        .groupBy("source_1", "source_2")
        .agg(F.count(F.lit(1)).cast("long").alias("n_dup_pairs"))
        .orderBy("source_1", "source_2")
    )


def _source_matrix_sql() -> str:
    return f"""
WITH pairs AS (SELECT doc_a, doc_b FROM ({_MINHASH_SQL.strip()}) m)
SELECT LEAST(da.source, db.source) AS source_1,
       GREATEST(da.source, db.source) AS source_2,
       CAST(COUNT(*) AS BIGINT) AS n_dup_pairs
FROM pairs p
JOIN documents da ON da.doc_id = p.doc_a
JOIN documents db ON db.doc_id = p.doc_b
GROUP BY 1, 2
ORDER BY source_1, source_2
"""


QUERIES["source_dedup_matrix"] = source_dedup_matrix
ORACLE["source_dedup_matrix"] = _source_matrix_sql()
