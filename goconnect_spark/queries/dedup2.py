"""Second dedup family: asymmetric containment join + minhash
estimator calibration.

- containment_dedup: directional near-dup detection — doc A is
  (near-)contained in doc B when |shingles(A) ∩ shingles(B)| >= t*|A|.
  This catches the quote/excerpt/boilerplate-inclusion shape that the
  symmetric Jaccard join misses (a 50-shingle doc embedded inside a
  500-shingle doc has Jaccard ~0.1 but containment 1.0). Same prefix-
  filter machinery as PPJoin, but one-sided: the CONTAINED side keeps
  only its rarity-ranked prefix, the CONTAINER side is the full
  inverted index.
- minhash_jaccard_calibration: per-pair signature agreement (est =
  matches/12) vs exact Jaccard on the LSH candidate set, bucketed by
  absolute error — the quality dashboard a production dedup service
  runs to validate its sketch parameters before trusting them at
  100 TB. Reads the SAME session-cached signature/band/shingle tables
  as dedup_minhash_lsh, so the marginal cost is candidate-bounded.

Determinism: thresholds compare INTEGERS (inter >= ceil-div overlap),
never floats; every division is double-div of identical integer
operands in both engines; bucket = floor(|est-true|*12) over those
identical doubles.

Scale (100 TB): candidates come from equi-joins (prefix-shingle or
band-key); verification is in-row array_intersect over candidate
pairs only. The containment container-side index is the classic
skew hazard — bounded here because the probe side only carries each
doc's RAREST n - ceil(t*n) + K dictionary ids (df asc), so hot
shingles never enter the join key stream from the probe side; AQE
skew-split covers the residue.
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf resolves string hints here
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from goconnect_spark.queries.dedup import (
    _N_HASHES,
    _NGRAM_T,
    _PREFIX_EXTRA,
    _SHINGLES_CTE,
    _minhash_bands,
    _minhash_bands_sql,
    _minhash_sig_sql,
    _minhash_sigs,
)
from goconnect_spark.tables import load

QUERIES = {}
ORACLE = {}

_CONTAIN_T = _NGRAM_T  # 0.8 — shares the dictionary-encoded id table's slice


# --------------------------------------------------------------------
# Asymmetric containment join: A contained in B at t=0.8.
# --------------------------------------------------------------------
def containment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directional containment pairs (doc_a contained in doc_b).

    Overlap requirement O = ceil(t*n_a) = (4*n_a+4) DIV 5; the prefix
    filter is lossless by pigeonhole: if none of A's first
    n_a - O + 1 ranked shingles appear in B, the overlap is < O.
    Runs entirely on the shared dictionary-encoded id table
    (corpus.doc_shingle_ids — same table the symmetric Jaccard join
    reads): sid order is the rarity rank, so the contained side's
    extended prefix is an in-row slice of its id array, and the
    container side joins its FULL id incidence (inverted index); the
    length filter n_b >= O prunes containers too small to satisfy
    the overlap."""
    from goconnect_spark.queries.corpus import doc_shingle_ids

    return containment_pairs(ids=doc_shingle_ids(spark, sf_dir))


def containment_pairs(ids: DataFrame) -> DataFrame:
    """The containment pipeline over a dictionary-encoded
    (doc_id, n, sids) table — factored out so tests can compare
    against brute force on randomized corpora (the one-sided filter
    stack's losslessness is the property under test; the brute-force
    test drives it through containment_dedup on a written corpus).

    Candidate generation uses the COUNT filter (the multi-prefix
    generalization of the prefix filter): a qualifying pair has
    |A∩B| >= O = ceil(t*n_a), so at most n_a - O of A's shingles are
    absent from B — among A's first n_a - O + K ranked shingles, at
    least min(K, O) must be in B (pigeonhole, lossless for every K).
    K=1 is the classic prefix filter; K = 1 + _PREFIX_EXTRA here.
    On corpora where every pair shares SOME rare shingle (the
    worst case for K=1 — measured 6.7M candidates for 512 true pairs
    at sf0.1), demanding min(8, O) shared prefix entries collapses
    the candidate set by ~2 orders of magnitude for +33% join input,
    and the in-row int-array verify then touches only plausible
    pairs. The bijective dictionary preserves set sizes and overlaps
    exactly, so results equal the string-side DuckDB oracle."""
    K = 1 + _PREFIX_EXTRA
    # Candidate-join shape (r15, measured at sf1 where this query was
    # the catalog's single largest cost — 200 s, 87.9x its sf0.1 wall;
    # guide §2.3/§2.5):
    # 1. nb-THRESHOLD BUCKETS: the pair needs nb >= ceil(0.8*n_a), so
    #    floor(nb/W) joins against the contained side's exploded
    #    bucket range [ceil(0.8*n)/W .. max(n)/W] — at sf1 this moves
    #    0.7B of the 2.54B enumerated rows (the post-join nb-filter
    #    kill) into join-key pruning. The exact predicate stays as a
    #    residual filter, so the candidate set is bit-identical. The
    #    range's upper end is the corpus max(n) — a 1-row aggregate
    #    over the session-cached ids table, collected once per query
    #    build (same pattern as word_cooccurrence's n_docs scalar).
    # 2. hash(doc_id) REPARTITION of the prefix side: establishes the
    #    partitioning that lets the pair aggregate below run
    #    partition-local with no exchange (see the aggregate comment).
    #    Moves corpus-LINEAR prefix rows to avoid shuffling
    #    corpus-QUADRATIC pair rows — the right trade at every scale,
    #    so it is unconditional, never width-reducing, and 8x
    #    parallelism wide to bound per-task aggregate state.
    _W = 8
    maxb = ids.agg(F.max("n")).collect()[0][0]
    maxb = int(maxb or 0) // _W
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
            F.expr(f"sequence(least(((4*n + 4) DIV 5) DIV {_W}, {maxb}), {maxb})")
        ).alias("bkt"),
    )
    # BOTH sides are hash-repartitioned by their own doc column: a
    # pair's coincidence rows share doc_a AND doc_b, so whichever side
    # the planner broadcasts, the surviving stream side's partitioning
    # satisfies the aggregate's clustering and the elision holds (the
    # broadcast side's repartition is a wasted linear exchange —
    # corpus-LINEAR rows spent to save the corpus-QUADRATIC pair
    # shuffle).
    sc = ids.sparkSession.sparkContext
    width = max(sc.defaultParallelism * 8, pref.rdd.getNumPartitions())
    pref = pref.repartition(width, "doc_id")
    full = (
        ids.select(
            F.col("doc_id").alias("doc_b"),
            F.col("n").alias("nb"),
            F.explode("sids").alias("sid"),
        )
        .withColumn("bkt", F.expr(f"nb DIV {_W}"))
        .repartition(width, "doc_b")
    )
    # PARTITION-LOCAL candidate aggregate (r15, replacing the r14
    # packed-bigint key whose win was the narrower EXCHANGE): the
    # full-incidence side is broadcast, so every (A, B, sid)
    # coincidence of a given A is produced inside A's map task, and
    # the prefix side's hash(doc_id) repartition above makes that
    # visible to the planner — HashPartitioning([doc_id]) satisfies
    # the pair aggregate's ClusteredDistribution([doc_a, doc_b])
    # (subset rule), so the count filter runs as ONE partition-local
    # HashAggregate and the candidate-pair exchange (sf1: ~1.0B
    # distinct pairs, ~20 GB of shuffle that drove the aggregate into
    # sort-spill fallback and crashed the r15 sf1 bench's spill
    # reader) disappears from the plan outright (guide §2.4). The key
    # must stay the two-column (doc_a, doc_b) — a packed bigint is a
    # different expression and would force the exchange back in.
    cand = (
        pref.alias("a")
        .join(full, ["sid", "bkt"])
        .where(
            (F.col("a.doc_id") != F.col("doc_b"))
            & (F.col("nb") >= F.expr("(4 * a.n + 4) DIV 5"))
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("doc_b").alias("doc_b"),
        )
        .agg(
            F.count(F.lit(1)).alias("pmatch"),
            F.max(F.col("a.n")).alias("an"),
        )
        .where(
            F.col("pmatch")
            >= F.least(F.lit(K).cast("long"), F.expr("(4 * an + 4) DIV 5"))
        )
        .select("doc_a", "doc_b")
    )
    return (
        cand.join(
            ids.select(
                F.col("doc_id").alias("doc_a"),
                F.col("sids").alias("sa"),
                F.col("n").alias("n_a"),
            ),
            "doc_a",
        )
        .join(
            ids.select(
                F.col("doc_id").alias("doc_b"),
                F.col("sids").alias("sb"),
                F.col("n").alias("n_b"),
            ),
            "doc_b",
        )
        .withColumn("inter", F.expr("CAST(size(array_intersect(sa, sb)) AS BIGINT)"))
        .where(F.col("inter") >= F.expr("(4 * n_a + 4) DIV 5"))
        .select(
            "doc_a",
            "doc_b",
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            (F.col("inter") / F.col("n_a").cast("double")).alias("containment"),
        )
        .orderBy("doc_a", "doc_b")
    )


_CONTAIN_SQL = f"""
WITH {_SHINGLES_CTE},
sizes AS (SELECT doc_id, COUNT(*) AS n FROM shingles GROUP BY doc_id),
dfreq AS (SELECT shingle, COUNT(*) AS df FROM shingles GROUP BY shingle),
ranked AS (
  SELECT s.doc_id, s.shingle,
         ROW_NUMBER() OVER (PARTITION BY s.doc_id ORDER BY d.df ASC, s.shingle ASC) AS rn
  FROM shingles s JOIN dfreq d ON d.shingle = s.shingle
),
prefix AS (
  SELECT r.doc_id, r.shingle, z.n
  FROM ranked r JOIN sizes z ON z.doc_id = r.doc_id
  WHERE r.rn <= z.n - (4 * z.n + 4) // 5 + 1 + {_PREFIX_EXTRA}
),
cand AS (
  SELECT a.doc_id AS doc_a, s.doc_id AS doc_b
  FROM prefix a
  JOIN shingles s ON s.shingle = a.shingle AND s.doc_id <> a.doc_id
  JOIN sizes zb ON zb.doc_id = s.doc_id
  WHERE zb.n >= (4 * a.n + 4) // 5
  GROUP BY 1, 2
  HAVING COUNT(*) >= LEAST({1 + _PREFIX_EXTRA}, MIN((4 * a.n + 4) // 5))
),
inter AS (
  SELECT c.doc_a, c.doc_b, COUNT(*) AS inter
  FROM cand c
  JOIN shingles sa ON sa.doc_id = c.doc_a
  JOIN shingles sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
  GROUP BY c.doc_a, c.doc_b
)
SELECT i.doc_a, i.doc_b,
       CAST(na.n AS BIGINT) AS n_a,
       CAST(nb.n AS BIGINT) AS n_b,
       (i.inter / CAST(na.n AS DOUBLE)) AS containment
FROM inter i
JOIN sizes na ON na.doc_id = i.doc_a
JOIN sizes nb ON nb.doc_id = i.doc_b
WHERE i.inter >= (4 * na.n + 4) // 5
ORDER BY doc_a, doc_b
"""

QUERIES["containment_dedup"] = containment_dedup
ORACLE["containment_dedup"] = _CONTAIN_SQL


# --------------------------------------------------------------------
# MinHash estimator calibration on the LSH candidate set.
# --------------------------------------------------------------------
def minhash_jaccard_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """|est - true| error profile of the 12-hash minhash estimator.

    est = (# agreeing signature slots)/12, true = exact Jaccard from
    the shared shingle arrays; pairs are the LSH band-collision
    candidates (the set the dedup service actually decides on). Rows
    are error buckets floor(|est-true|*12) with integer evidence
    columns (pair/slot/intersection sums) plus the two pooled ratios
    — everything either integer-exact or a single division of
    identical operands, so the DuckDB hash matches bit-for-bit."""
    from goconnect_spark.queries.corpus import doc_shingle_arrays

    arrays = doc_shingle_arrays(spark, sf_dir)
    sigs = _minhash_sigs(spark, sf_dir)
    bands = _minhash_bands(spark, sf_dir)
    cand = (
        bands.alias("x")
        .join(bands.alias("y"), ["band", "band_key"])
        .where(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
        .distinct()
    )
    matches = " + ".join(
        f"cast(sa.mh{s} = sb.mh{s} as int)" for s in range(_N_HASHES)
    )
    per_pair = (
        cand.join(sigs.alias("sa"), F.col("doc_a") == F.col("sa.doc_id"))
        .join(sigs.alias("sb"), F.col("doc_b") == F.col("sb.doc_id"))
        .select("doc_a", "doc_b", F.expr(f"cast({matches} as bigint)").alias("matches"))
        .join(
            arrays.select(
                F.col("doc_id").alias("doc_a"),
                F.col("shset").alias("sha"),
                F.col("n").alias("n_a"),
            ),
            "doc_a",
        )
        .join(
            arrays.select(
                F.col("doc_id").alias("doc_b"),
                F.col("shset").alias("shb"),
                F.col("n").alias("n_b"),
            ),
            "doc_b",
        )
        .withColumn("inter", F.expr("CAST(size(array_intersect(sha, shb)) AS BIGINT)"))
        .withColumn("uni", (F.col("n_a") + F.col("n_b") - F.col("inter")).cast("long"))
        .withColumn("est", F.col("matches") / F.lit(12).cast("double"))
        .withColumn("true_j", F.col("inter") / F.col("uni").cast("double"))
    )
    return (
        per_pair.withColumn(
            "err_bucket",
            F.floor(F.abs(F.col("est") - F.col("true_j")) * 12).cast("int"),
        )
        .groupBy("err_bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum("matches").cast("long").alias("sum_matches"),
            F.sum("inter").cast("long").alias("sum_inter"),
            F.sum("uni").cast("long").alias("sum_union"),
        )
        .withColumn(
            "mean_est",
            F.col("sum_matches") / (F.lit(12) * F.col("n_pairs")).cast("double"),
        )
        .withColumn(
            "pooled_true", F.col("sum_inter") / F.col("sum_union").cast("double")
        )
        .select(
            "err_bucket",
            "n_pairs",
            "sum_matches",
            "sum_inter",
            "sum_union",
            "mean_est",
            "pooled_true",
        )
        .orderBy("err_bucket")
    )


_CALIB_SQL = f"""
WITH {_SHINGLES_CTE},
hashed AS (
  SELECT doc_id, shingle,
         ('0x' || substr(md5(shingle), 1, 12))::BIGINT AS h1,
         ('0x' || substr(md5(shingle), 13, 12))::BIGINT * 2 + 1 AS h2
  FROM shingles
),
sig AS (
  SELECT doc_id,
         COUNT(*) AS n,
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
inter AS (
  SELECT c.doc_a, c.doc_b, COUNT(*) AS inter
  FROM cand c
  JOIN shingles sa ON sa.doc_id = c.doc_a
  JOIN shingles sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
  GROUP BY c.doc_a, c.doc_b
),
per_pair AS (
  SELECT i.doc_a, i.doc_b,
         CAST({" + ".join(f"CAST(sa.mh{s} = sb.mh{s} AS INT)" for s in range(_N_HASHES))} AS BIGINT) AS matches,
         CAST(i.inter AS BIGINT) AS inter,
         CAST(sa.n + sb.n - i.inter AS BIGINT) AS uni
  FROM inter i
  JOIN sig sa ON sa.doc_id = i.doc_a
  JOIN sig sb ON sb.doc_id = i.doc_b
),
bucketed AS (
  SELECT CAST(FLOOR(ABS(matches / CAST(12 AS DOUBLE) - inter / CAST(uni AS DOUBLE)) * 12) AS INT) AS err_bucket,
         matches, inter, uni
  FROM per_pair
)
SELECT err_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(matches) AS BIGINT) AS sum_matches,
       CAST(SUM(inter) AS BIGINT) AS sum_inter,
       CAST(SUM(uni) AS BIGINT) AS sum_union,
       (CAST(SUM(matches) AS BIGINT) / CAST(12 * COUNT(*) AS DOUBLE)) AS mean_est,
       (CAST(SUM(inter) AS BIGINT) / CAST(SUM(uni) AS DOUBLE)) AS pooled_true
FROM bucketed
GROUP BY err_bucket
ORDER BY err_bucket
"""

QUERIES["minhash_jaccard_calibration"] = minhash_jaccard_calibration
ORACLE["minhash_jaccard_calibration"] = _CALIB_SQL


# --------------------------------------------------------------------
# Winnowing-fingerprint collision pairs (MOSS-style, Schleimer et al.)
# — the 5th dedup family: CHARACTER-level near-dup detection that
# catches heavy local overlap (shared passages) the word-bigram
# families dilute.
# --------------------------------------------------------------------
_FP_K, _FP_W = 8, 4  # same k-gram/window as text.doc_fingerprint
_FP_MAX_DF = 20  # stop-fingerprint prune: df-capped inverted index
_FP_TOP = 50  # report the top colliding pairs (MOSS-style ranking)


def fingerprint_collision_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top doc pairs ranked by shared winnowing fingerprints (the
    MOSS report: rank by absolute match count, expose the
    share-of-smaller-doc ratio alongside).
    The fingerprint table is the SAME in-row winnowing
    pipeline as text.doc_fingerprint (k=8 char shingles -> md5 ->
    w=4 window-min -> distinct), session-cached; candidates come from
    the fingerprint inverted index with stop-fingerprints pruned
    (df > {cap} — ubiquitous k-grams pair everything with everything
    and carry no discriminative signal; MOSS does the same). The
    prune makes this a detector, not an exact join — the exact
    contracts live in ngram_jaccard/containment; this one exists
    because char-level fingerprints survive word-boundary edits and
    the df cap bounds the inverted-index fanout at any corpus size
    (each retained fingerprint contributes <= cap² pairs).

    sim = shared / min(n_a, n_b) — one double division of exact
    integers; ordering and thresholds never touch floats beyond it.

    The per-doc winnowing pass is the catalog's one deliberate Arrow
    pandas_udf (VERDICT r6 item 3): ~len(text) md5 + window-min steps
    per doc ran as INTERPRETED higher-order-function lambdas (HOFs
    never enter whole-stage codegen) and priced the family at
    ~1.3 ms/doc — linear but the family's cost ceiling at 100 TB. The
    Arrow batch path hashes each distinct 8-gram once per batch
    (C-speed hashlib) and is an order of magnitude cheaper; the
    fingerprints are byte-identical (same code-point substrings, same
    UTF-8 md5, same lexicographic window minima), so the DuckDB
    oracle is unchanged.
    """
    from goconnect_spark.queries.corpus import cached_table

    def build_fps():
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("array<string>")
        def winnow(texts: pd.Series) -> pd.Series:
            import hashlib

            # distinct 8-gram -> md5 hex, shared across the Arrow batch;
            # size-capped so a batch of long high-entropy docs cannot
            # grow task memory unboundedly (2M entries ~ a couple hundred
            # MB worst case; a reset only costs re-hashing, not accuracy)
            cache: dict = {}
            _CACHE_CAP = 2_000_000

            def doc_fps(s):
                # pandas delivers null text as None OR float NaN
                # depending on the Arrow batch's dtype; both map to ""
                # explicitly (ADVICE r7 — `s or ""` would TypeError on
                # NaN at len()). The testdata corpus has no null text;
                # this pins the behavior for one that does.
                if not isinstance(s, str):
                    s = ""
                m = max(len(s) - (_FP_K - 1), 1)
                hs = []
                for i in range(m):
                    g = s[i : i + _FP_K]
                    h = cache.get(g)
                    if h is None:
                        h = hashlib.md5(g.encode("utf-8")).hexdigest()
                        if len(cache) >= _CACHE_CAP:
                            cache.clear()
                        cache[g] = h
                    hs.append(h)
                # forward w-window minima (the oracle's ROWS BETWEEN
                # CURRENT ROW AND w-1 FOLLOWING), then distinct
                return sorted({min(hs[i : i + _FP_W]) for i in range(m)})

            return texts.map(doc_fps)

        docs = load(spark, "documents", sf_dir)
        return docs.select("doc_id", winnow("text").alias("fps")).withColumn(
            "nf", F.size("fps").cast("long")
        )

    fps = cached_table(spark, sf_dir, "winnow_fps", build_fps)
    exploded = fps.select("doc_id", F.explode("fps").alias("fp"))
    keep = (
        exploded.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("df"))
        .where((F.col("df") >= 2) & (F.col("df") <= _FP_MAX_DF))
        .select("fp")
    )
    # EVERY join side below is corpus-scale (retained-fp set, the fp
    # incidence self-join, the per-doc fingerprint counts) — none may be
    # broadcast at scale. That is now guaranteed by ACCURATE stats, not
    # hints: cached_table materializes eagerly, so the planner sees the
    # fingerprint table's real cached bytes and picks broadcast only
    # where the deployment's sizes genuinely allow it. (The r11 100x
    # point caught the unmaterialized-cache failure mode here: optimistic
    # size guesses flipped all four joins to BroadcastHashJoin and a
    # 1.8 GB broadcast build blew spark.driver.maxResultSize.)
    pruned = exploded.join(keep, "fp")
    pairs = (
        pruned.alias("a")
        .join(pruned.alias("b"), "fp")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("shared_fps"))
    )
    return (
        pairs.join(
            fps.select(F.col("doc_id").alias("doc_a"), F.col("nf").alias("n_a")),
            "doc_a",
        )
        .join(
            fps.select(F.col("doc_id").alias("doc_b"), F.col("nf").alias("n_b")),
            "doc_b",
        )
        .withColumn(
            "sim",
            F.col("shared_fps") / F.least("n_a", "n_b").cast("double"),
        )
        .select("doc_a", "doc_b", "shared_fps", "n_a", "n_b", "sim")
        .orderBy(F.desc("shared_fps"), "doc_a", "doc_b")
        .limit(_FP_TOP)
    )


_FP_COLLISION_SQL = f"""
WITH hashes AS (
  SELECT doc_id, i, md5(substr(text, i, {_FP_K})) AS h
  FROM documents, unnest(generate_series(1, GREATEST(LENGTH(text)-{_FP_K - 1}, 1))) AS t(i)
),
wins AS (
  SELECT doc_id,
         MIN(h) OVER (PARTITION BY doc_id ORDER BY i ROWS BETWEEN CURRENT ROW AND {_FP_W - 1} FOLLOWING) AS wmin
  FROM hashes
),
fps AS (SELECT DISTINCT doc_id, wmin AS fp FROM wins),
sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS nf FROM fps GROUP BY doc_id),
keep AS (
  SELECT fp FROM fps GROUP BY fp HAVING COUNT(*) >= 2 AND COUNT(*) <= {_FP_MAX_DF}
),
pruned AS (SELECT f.doc_id, f.fp FROM fps f JOIN keep k ON k.fp = f.fp),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(COUNT(*) AS BIGINT) AS shared_fps
  FROM pruned a JOIN pruned b ON a.fp = b.fp AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT p.doc_a, p.doc_b, p.shared_fps, za.nf AS n_a, zb.nf AS n_b,
       (p.shared_fps / CAST(LEAST(za.nf, zb.nf) AS DOUBLE)) AS sim
FROM pairs p
JOIN sizes za ON za.doc_id = p.doc_a
JOIN sizes zb ON zb.doc_id = p.doc_b
ORDER BY shared_fps DESC, doc_a, doc_b
LIMIT {_FP_TOP}
"""

QUERIES["fingerprint_collision_dedup"] = fingerprint_collision_dedup
ORACLE["fingerprint_collision_dedup"] = _FP_COLLISION_SQL
