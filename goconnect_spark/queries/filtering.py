"""Training-corpus filtering operators: rule-based quality gates,
cross-document duplicated-span coverage, statistical LM scoring, and
embedding-space outlier pruning — the decision layer a 100 TB
pretraining pipeline runs between raw crawl and tokenizer.

Four oracle-gated queries over `documents` / `embeddings`:

- gopher_quality_rules: the published Gopher-style per-document rule
  battery (word-count bounds, mean word length, stopword presence,
  most-common-word dominance) evaluated with exact integer/ratio
  arithmetic -> keep flag per doc.
- duplicated_ngram_coverage: the ExactSubstr approximation — hash
  every 8-token gram, find grams occurring more than once in the
  corpus, and report the fraction of each document's tokens covered
  by some duplicated gram (span union via position explode).
- doc_lm_score: corpus-trained bigram LM scored per document in
  FIXED-POINT (floor(1e6 * p) integer sums), so the score is exactly
  reproducible across engines and cluster runs — float log-prob sums
  are order-dependent; fixed-point is how you make a filtering
  decision replayable.
- embedding_outliers: distance-to-centroid pruning computed entirely
  in scaled integers (sum-of-squares of n*q_d - S_d), thresholded at
  the exact 95th percentile.

Scale (100 TB story): every operator is one or two shuffles on a
natural key. The gram inverted index (duplicated_ngram_coverage) is
the biggest intermediate — O(total tokens) rows keyed by a 16-byte
hash, the same shape as the minhash shingle table (dedup.py); its
count-filter is a map-side-combining aggregation and the occurrence
lookup is an equi-join on the hash, never a cross join. The LM join
hits a vocab^2-bounded bigram-count table on (w1,w2). The embedding
centroid is a 64-value broadcast scalar row.

Determinism: only integer sums cross aggregation boundaries
(per-module contract in queries/__init__); doubles appear solely as
divisions/multiplications of identical operands in both engines.
DuckDB's HUGEINT sums are cast back to BIGINT; CAST(x AS INT)
round-vs-truncate is avoided via explicit FLOOR (memory cookbook).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from goconnect_spark.tables import load

_STOPWORDS = ("the", "a", "of", "and", "to", "in")

# Gopher-style thresholds (Rae et al. 2021, Table A1-flavored, adapted
# to the synthetic corpus' ~20-90-word docs so both outcomes occur)
_MIN_WORDS, _MAX_WORDS = 30, 10_000
_MIN_MWL, _MAX_MWL = 3.0, 10.0
_MIN_STOPWORDS = 2
_MAX_TOP_WORD_FRAC = 0.1

_GRAM_N = 8  # duplicated-span gram width, in tokens
_LM_SCALE = 1_000_000  # fixed-point scale for bigram probabilities


def gopher_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document rule battery -> keep flag.

    Reference parity: the reference has no quality filter (it is a
    transport/aggregation engine); this is the LLM-pipeline layer the
    task mandates. All four rules are exact: counts are integers and
    the two ratios are IEEE divisions of identical integers in both
    engines, so the keep decision is bit-reproducible.

    Plan shape: one explode + one groupBy(doc_id) — the token shuffle
    is keyed by doc_id so every rule aggregates map-side first; the
    most-common-word count rides the same aggregation via a count map
    (no second shuffle).
    """
    docs = load(spark, "documents", sf_dir)
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    # per (doc, word) counts, then per-doc rollup: two keyed shuffles,
    # both with partial aggregation; max-count needs the word level
    per_word = toks.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("c"))
    sw = F.when(F.col("w").isin(*_STOPWORDS), F.col("c")).otherwise(F.lit(0))
    per_doc = per_word.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_words"),
        F.sum(F.length("w") * F.col("c")).cast("long").alias("n_chars"),
        F.sum(sw).cast("long").alias("n_stopwords"),
        F.max("c").cast("long").alias("top_word_count"),
    )
    n_words_d = F.col("n_words").cast("double")
    mwl = F.col("n_chars") / n_words_d
    top_frac = F.col("top_word_count") / n_words_d
    keep = (
        F.col("n_words").between(_MIN_WORDS, _MAX_WORDS)
        & (mwl >= _MIN_MWL)
        & (mwl <= _MAX_MWL)
        & (F.col("n_stopwords") >= _MIN_STOPWORDS)
        & (top_frac <= _MAX_TOP_WORD_FRAC)
    )
    return (
        per_doc.select(
            "doc_id",
            "n_words",
            mwl.alias("mean_word_len"),
            "n_stopwords",
            top_frac.alias("top_word_frac"),
            keep.alias("keep"),
        )
        .orderBy("doc_id")
    )


_GOPHER_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
),
per_word AS (
  SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY doc_id, w
),
per_doc AS (
  SELECT doc_id,
         CAST(SUM(c) AS BIGINT) AS n_words,
         CAST(SUM(len(w) * c) AS BIGINT) AS n_chars,
         CAST(SUM(CASE WHEN w IN {_STOPWORDS!r} THEN c ELSE 0 END) AS BIGINT) AS n_stopwords,
         CAST(MAX(c) AS BIGINT) AS top_word_count
  FROM per_word GROUP BY doc_id
)
SELECT doc_id, n_words,
       CAST(n_chars AS DOUBLE) / CAST(n_words AS DOUBLE) AS mean_word_len,
       n_stopwords,
       CAST(top_word_count AS DOUBLE) / CAST(n_words AS DOUBLE) AS top_word_frac,
       (n_words BETWEEN {_MIN_WORDS} AND {_MAX_WORDS}
        AND CAST(n_chars AS DOUBLE) / CAST(n_words AS DOUBLE) >= {_MIN_MWL}
        AND CAST(n_chars AS DOUBLE) / CAST(n_words AS DOUBLE) <= {_MAX_MWL}
        AND n_stopwords >= {_MIN_STOPWORDS}
        AND CAST(top_word_count AS DOUBLE) / CAST(n_words AS DOUBLE) <= {_MAX_TOP_WORD_FRAC}
       ) AS keep
FROM per_doc ORDER BY doc_id
"""


def duplicated_ngram_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fraction of each document's tokens covered by an 8-token gram
    that occurs >= 2 times anywhere in the corpus — the scalable
    approximation of exact-substring dedup (suffix-array method of
    the published train-data dedup work): a duplicated substring of
    length >= 8 tokens is exactly a run of duplicated 8-grams, so
    span coverage by duplicated grams equals coverage by duplicated
    substrings down to the gram width.

    Plan shape (the 100 TB inverted-index pattern): grams are emitted
    in-row (transform over the token array — no self-join), keyed by
    md5; one map-side-combining count on the hash finds duplicated
    grams; occurrences semi-join that set on the hash (shuffle
    equi-join, AQE-splittable if a gram is corpus-hot); the position
    union is a distinct on (doc_id, pos) — keyed by doc. Nothing is
    quadratic.
    """
    from goconnect_spark.queries.corpus import doc_token_arrays

    toks = doc_token_arrays(spark, sf_dir)
    grams = toks.where(F.size("toks") >= _GRAM_N).select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(1, size(toks) - {_GRAM_N - 1}),"
                f" i -> struct(i as pos, md5(concat_ws(' ', slice(toks, i, {_GRAM_N}))) as gh))"
            )
        ).alias("g"),
    ).select("doc_id", "g.pos", "g.gh")
    dup = grams.groupBy("gh").agg(F.count(F.lit(1)).alias("n")).where(F.col("n") >= 2)
    occ = grams.join(dup.select("gh"), "gh", "left_semi")
    covered = (
        occ.select("doc_id", F.explode(F.sequence("pos", F.col("pos") + _GRAM_N - 1)).alias("p"))
        .distinct()
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("covered_tokens"))
    )
    per_doc = toks.select("doc_id", F.size("toks").cast("long").alias("n_tokens"))
    return (
        per_doc.join(covered, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("covered_tokens", F.lit(0)).cast("long").alias("covered_tokens"),
            (
                F.coalesce("covered_tokens", F.lit(0)).cast("double")
                / F.col("n_tokens").cast("double")
            ).alias("dup_frac"),
        )
        .orderBy("doc_id")
    )


_DUP_NGRAM_SQL = f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
grams AS (
  SELECT doc_id, i AS pos,
         md5(array_to_string(toks[i:i+{_GRAM_N - 1}], ' ')) AS gh
  FROM t, UNNEST(range(1, len(toks) - {_GRAM_N - 2})) AS u(i)
  WHERE len(toks) >= {_GRAM_N}
),
dup AS (
  SELECT gh FROM grams GROUP BY gh HAVING COUNT(*) >= 2
),
occ AS (
  SELECT g.doc_id, g.pos FROM grams g JOIN dup USING (gh)
),
covered AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS covered_tokens FROM (
    SELECT DISTINCT doc_id, pos + o AS p
    FROM occ, UNNEST(range(0, {_GRAM_N})) AS v(o)
  ) GROUP BY doc_id
)
SELECT t.doc_id, CAST(len(t.toks) AS BIGINT) AS n_tokens,
       COALESCE(c.covered_tokens, 0) AS covered_tokens,
       CAST(COALESCE(c.covered_tokens, 0) AS DOUBLE) / CAST(len(t.toks) AS DOUBLE) AS dup_frac
FROM t LEFT JOIN covered c USING (doc_id)
ORDER BY doc_id
"""


def doc_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document mean bigram probability under the corpus-trained
    bigram LM, in fixed point: each bigram occurrence contributes
    floor(1e6 * c12/c1); the document score is the integer sum divided
    by its bigram count. A low score marks incoherent/outlier text —
    the cheap statistical stand-in for perplexity filtering.

    Fixed point is deliberate: log-prob float sums differ across
    summation orders (engines, partitionings, reruns), which makes a
    float threshold non-reproducible at the margin. Integer sums are
    exact in any order — the filtering decision replays identically
    on a laptop and a 1000-executor cluster.

    Plan shape: bigrams come from the in-row token-array zip (no
    self-join); c12/c1 are two map-side-combining aggregations; the
    probability lookup joins the bigram table on (w1, w2) — the
    count table is vocab^2-bounded, far smaller than the corpus. The
    scored table is session-cached (corpus.cached_table): the decile
    report (lm_score_deciles) consumes the same scores, the canonical
    two-consumer shared intermediate.
    """
    return _lm_scored(spark, sf_dir).orderBy("doc_id")


def _lm_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-cached (doc_id, n_bigrams, lm_score) — the corpus LM
    scoring pass shared by doc_lm_score and lm_score_deciles."""
    from goconnect_spark.queries.corpus import cached_table, doc_token_arrays

    def build():
        toks = doc_token_arrays(spark, sf_dir)
        bg = toks.where(F.size("toks") >= 2).select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(slice(toks, 1, size(toks) - 1),"
                    " (w, i) -> struct(w as w1, element_at(toks, i + 2) as w2))"
                )
            ).alias("g"),
        ).select("doc_id", "g.w1", "g.w2")
        c12 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
        # c1 = SUM of c12 over w1 (exact integer identity: every
        # bigram head occurrence lands in exactly one (w1, w2) cell),
        # so the head counts come from RE-AGGREGATING the vocab-sized
        # c12 table (groupBy w1 + join back) instead of a second
        # explode + aggregation of the full bigram stream (r14, guide
        # §7.2).
        c1 = c12.groupBy("w1").agg(F.sum("c12").alias("c1"))
        probs = c12.join(c1, "w1").select(
            "w1",
            "w2",
            F.floor(
                F.lit(float(_LM_SCALE)) * (F.col("c12").cast("double") / F.col("c1").cast("double"))
            ).cast("long").alias("p_fp"),
        )
        return (
            bg.join(probs, ["w1", "w2"])
            .groupBy("doc_id")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_bigrams"),
                F.sum("p_fp").cast("long").alias("sum_p_fp"),
            )
            .select(
                "doc_id",
                "n_bigrams",
                (F.col("sum_p_fp").cast("double") / F.col("n_bigrams").cast("double")).alias("lm_score"),
            )
        )

    return cached_table(spark, sf_dir, "lm_scores", build)


_LM_SCORE_SQL = f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
bg AS (
  SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
  FROM t, UNNEST(range(1, len(toks))) AS u(i)
  WHERE len(toks) >= 2
),
c12 AS (
  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12 FROM bg GROUP BY w1, w2
),
c1 AS (
  SELECT w1, CAST(COUNT(*) AS BIGINT) AS c1 FROM bg GROUP BY w1
),
probs AS (
  SELECT w1, w2,
         CAST(FLOOR({_LM_SCALE}.0 * (CAST(c12 AS DOUBLE) / CAST(c1 AS DOUBLE))) AS BIGINT) AS p_fp
  FROM c12 JOIN c1 USING (w1)
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       CAST(CAST(SUM(p_fp) AS BIGINT) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS lm_score
FROM bg JOIN probs USING (w1, w2)
GROUP BY doc_id ORDER BY doc_id
"""


def embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space outlier pruning: scaled squared distance to the
    corpus centroid, flagged above the exact 95th percentile.

    All-integer distance: with q_d = floor(1e4 * x_d) and S_d the
    corpus sum of q_d over n vectors, dist2 = sum_d (n*q_d - S_d)^2 is
    n^2 times the true squared distance to the centroid — monotone in
    it, and exact (no float sum crosses an aggregation). Fits BIGINT
    through ~100k vectors at 64 dims; beyond that, switch the square
    accumulation to DECIMAL(38,0) (documented cliff, same pattern as
    the quantized dot products in similarity.py).

    Plan shape: one per-dimension aggregation produces a 64-row
    centroid table that collapses to a single broadcast row; the
    distance is an in-row fold over the quantized array (fixed dim
    order — no shuffle); the percentile is one scalar aggregate,
    broadcast back. Nothing is ever joined on a data-sized key.
    """
    emb = load(spark, "embeddings", sf_dir)
    q = emb.select(
        "vec_id",
        F.expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 10000) AS BIGINT))").alias("qs"),
    )
    n_dims = F.size("qs")
    sums = q.select(F.posexplode("qs").alias("d", "qv")).groupBy("d").agg(
        F.sum("qv").cast("long").alias("s")
    )
    cent = sums.groupBy().agg(
        F.map_from_arrays(F.collect_list("d"), F.collect_list("s")).alias("smap"),
        F.count(F.lit(1)).alias("ndims"),
    )
    n = q.count()  # scalar dim seed, one cheap job (bounded collect)
    dist = (
        q.crossJoin(F.broadcast(cent))
        .select(
            "vec_id",
            F.expr(
                f"aggregate(sequence(0, size(qs) - 1), CAST(0 AS BIGINT),"
                f" (acc, d) -> acc + (CAST({n} AS BIGINT) * element_at(qs, d + 1) - element_at(smap, d))"
                f"             * (CAST({n} AS BIGINT) * element_at(qs, d + 1) - element_at(smap, d)))"
            ).alias("dist2"),
        )
    )
    thresh = dist.agg(F.percentile("dist2", 0.95).alias("t"))
    return (
        dist.crossJoin(F.broadcast(thresh))
        .select(
            "vec_id",
            "dist2",
            (F.col("dist2").cast("double") > F.col("t")).alias("is_outlier"),
        )
        .orderBy("vec_id")
    )


_EMB_OUTLIER_SQL = """
WITH q AS (
  SELECT vec_id, d - 1 AS d,
         CAST(FLOOR(CAST(x AS DOUBLE) * 10000) AS BIGINT) AS qv
  FROM (SELECT vec_id, unnest(embedding) AS x,
               generate_subscripts(embedding, 1) AS d
        FROM embeddings)
),
cent AS (
  SELECT d, CAST(SUM(qv) AS BIGINT) AS s FROM q GROUP BY d
),
n AS (SELECT CAST(COUNT(DISTINCT vec_id) AS BIGINT) AS n FROM q),
dist AS (
  SELECT q.vec_id,
         CAST(SUM((n.n * q.qv - cent.s) * (n.n * q.qv - cent.s)) AS BIGINT) AS dist2
  FROM q JOIN cent USING (d) CROSS JOIN n
  GROUP BY q.vec_id
),
thresh AS (SELECT quantile_cont(CAST(dist2 AS DOUBLE), 0.95) AS t FROM dist)
SELECT vec_id, dist2, CAST(dist2 AS DOUBLE) > thresh.t AS is_outlier
FROM dist CROSS JOIN thresh
ORDER BY vec_id
"""


_CONTAM_T = 2  # duplicated eval trigrams that mark a train doc contaminated


def curated_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation budget: the full decision stack a corpus
    pipeline runs before committing training data — eval holdout,
    Gopher quality rules, near-dup clustering, benchmark
    decontamination — composed from the SAME operators the catalog
    verifies individually, rolled up per source.

    Decision precedence (counts are disjoint, sum to n_docs):
    eval-holdout > quality-fail > dup-drop > contamination > curated.

    Composition is free at the plan level: each ingredient query ends
    in an orderBy, and Catalyst's EliminateSorts removes every inner
    sort under the joins/aggregation (verified: no Sort survives in
    the optimized plan except the final source ordering), so reusing
    the public operators costs nothing over hand-fusing them. The
    joins are doc-keyed equi-joins; the rollup is one keyed shuffle.
    """
    from goconnect_spark.queries.dedup import dedup_connected_components
    from goconnect_spark.queries.text2 import _EVAL_MOD, benchmark_contamination

    docs = load(spark, "documents", sf_dir).select("doc_id", "source")
    gq = gopher_quality_rules(spark, sf_dir).select("doc_id", "keep")
    cc = dedup_connected_components(spark, sf_dir)
    dup = cc.where(F.col("doc_id") != F.col("keeper_doc_id")).select(
        "doc_id", F.lit(True).alias("is_dup")
    )
    contam = benchmark_contamination(spark, sf_dir).where(
        F.col("n_matched") >= _CONTAM_T
    ).select("doc_id", F.lit(True).alias("is_contam"))

    flagged = (
        docs.join(gq, "doc_id", "left")
        .join(dup, "doc_id", "left")
        .join(contam, "doc_id", "left")
        .select(
            "source",
            (F.col("doc_id") % _EVAL_MOD == 0).alias("is_eval"),
            F.coalesce("keep", F.lit(False)).alias("quality_ok"),
            F.coalesce("is_dup", F.lit(False)).alias("is_dup"),
            F.coalesce("is_contam", F.lit(False)).alias("is_contam"),
        )
    )
    one = F.lit(1)
    zero = F.lit(0)
    eval_c = F.when(F.col("is_eval"), one).otherwise(zero)
    qual_c = F.when(~F.col("is_eval") & ~F.col("quality_ok"), one).otherwise(zero)
    dup_c = F.when(~F.col("is_eval") & F.col("quality_ok") & F.col("is_dup"), one).otherwise(zero)
    cont_c = F.when(
        ~F.col("is_eval") & F.col("quality_ok") & ~F.col("is_dup") & F.col("is_contam"), one
    ).otherwise(zero)
    cur_c = F.when(
        ~F.col("is_eval") & F.col("quality_ok") & ~F.col("is_dup") & ~F.col("is_contam"), one
    ).otherwise(zero)
    return (
        flagged.groupBy("source")
        .agg(
            F.count(one).alias("n_docs"),
            F.sum(eval_c).cast("long").alias("n_eval_holdout"),
            F.sum(qual_c).cast("long").alias("n_quality_drop"),
            F.sum(dup_c).cast("long").alias("n_dup_drop"),
            F.sum(cont_c).cast("long").alias("n_contam_drop"),
            F.sum(cur_c).cast("long").alias("n_curated"),
        )
        .orderBy("source")
    )


def _curated_sql() -> str:
    from goconnect_spark.queries.dedup import _cc_oracle_sql
    from goconnect_spark.queries.text2 import _CONTAMINATION_SQL, _EVAL_MOD

    return f"""
WITH gq AS ({_GOPHER_SQL}),
cc AS ({_cc_oracle_sql()}),
ct AS ({_CONTAMINATION_SQL}),
flagged AS (
  SELECT d.source,
         d.doc_id % {_EVAL_MOD} = 0 AS is_eval,
         COALESCE(gq.keep, FALSE) AS quality_ok,
         COALESCE(cc.doc_id <> cc.keeper_doc_id, FALSE) AS is_dup,
         COALESCE(ct.n_matched >= {_CONTAM_T}, FALSE) AS is_contam
  FROM documents d
  LEFT JOIN gq ON gq.doc_id = d.doc_id
  LEFT JOIN cc ON cc.doc_id = d.doc_id
  LEFT JOIN ct ON ct.doc_id = d.doc_id
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN is_eval THEN 1 ELSE 0 END) AS BIGINT) AS n_eval_holdout,
       CAST(SUM(CASE WHEN NOT is_eval AND NOT quality_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_quality_drop,
       CAST(SUM(CASE WHEN NOT is_eval AND quality_ok AND is_dup THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_drop,
       CAST(SUM(CASE WHEN NOT is_eval AND quality_ok AND NOT is_dup AND is_contam THEN 1 ELSE 0 END) AS BIGINT) AS n_contam_drop,
       CAST(SUM(CASE WHEN NOT is_eval AND quality_ok AND NOT is_dup AND NOT is_contam THEN 1 ELSE 0 END) AS BIGINT) AS n_curated
FROM flagged GROUP BY source ORDER BY source
"""


QUERIES = {
    "gopher_quality_rules": gopher_quality_rules,
    "duplicated_ngram_coverage": duplicated_ngram_coverage,
    "doc_lm_score": doc_lm_score,
    "embedding_outliers": embedding_outliers,
    "curated_corpus_stats": curated_corpus_stats,
}

ORACLE = {
    "gopher_quality_rules": _GOPHER_SQL,
    "duplicated_ngram_coverage": _DUP_NGRAM_SQL,
    "doc_lm_score": _LM_SCORE_SQL,
    "embedding_outliers": _EMB_OUTLIER_SQL,
}
ORACLE["curated_corpus_stats"] = _curated_sql()


# --------------------------------------------------------------------
# Boilerplate detection: per source, the shingles present in the
# largest share of that source's documents. A shingle in >x% of a
# crawl source is template chrome (headers, footers, cookie banners),
# not content — the signal behind boilerplate-stripping rules.
# --------------------------------------------------------------------
def boilerplate_top_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 most document-frequent shingles per source with their
    doc-share. Reads the shared per-doc shingle-set table (one
    incidence explode, distinct by construction), joins the doc->
    source dim once, aggregates on (source, shingle), and ranks with
    a per-source window — every data-sized step is keyed. The share
    denominator is the source's shingled-doc count (docs with >= 2
    words), identical in the oracle."""
    from goconnect_spark.queries.corpus import doc_shingle_arrays

    docs = load(spark, "documents", sf_dir).select("doc_id", "source")
    arrays = doc_shingle_arrays(spark, sf_dir)
    incidence = (
        arrays.select("doc_id", F.explode("shset").alias("shingle"))
        .join(docs, "doc_id")
    )
    n_docs = (
        arrays.select("doc_id")
        .join(docs, "doc_id")
        .groupBy("source")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )
    per = incidence.groupBy("source", "shingle").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs_with")
    )
    w = Window.partitionBy("source").orderBy(
        F.desc("n_docs_with"), F.asc("shingle")
    )
    return (
        per.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 3)
        .join(F.broadcast(n_docs), "source")
        .select(
            "source",
            F.col("rnk").cast("int").alias("rnk"),
            "shingle",
            "n_docs_with",
            (F.col("n_docs_with") / F.col("n_docs").cast("double")).alias(
                "doc_share"
            ),
        )
        .orderBy("source", "rnk")
    )


def _boilerplate_sql() -> str:
    from goconnect_spark.queries.dedup import _SHINGLES_CTE

    return f"""
WITH {_SHINGLES_CTE.strip()},
incidence AS (
  SELECT s.doc_id, s.shingle, d.source
  FROM shingles s JOIN documents d ON d.doc_id = s.doc_id
),
n_docs AS (
  SELECT d.source, COUNT(DISTINCT s.doc_id) AS n_docs
  FROM (SELECT DISTINCT doc_id FROM shingles) s
  JOIN documents d ON d.doc_id = s.doc_id
  GROUP BY d.source
),
per AS (
  SELECT source, shingle, CAST(COUNT(*) AS BIGINT) AS n_docs_with
  FROM incidence GROUP BY source, shingle
),
ranked AS (
  SELECT source, shingle, n_docs_with,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY n_docs_with DESC, shingle ASC) AS rnk
  FROM per
)
SELECT r.source, CAST(r.rnk AS INT) AS rnk, r.shingle, r.n_docs_with,
       r.n_docs_with / CAST(n.n_docs AS DOUBLE) AS doc_share
FROM ranked r JOIN n_docs n ON n.source = r.source
WHERE r.rnk <= 3
ORDER BY r.source, r.rnk
"""


QUERIES["boilerplate_top_shingles"] = boilerplate_top_shingles
ORACLE["boilerplate_top_shingles"] = _boilerplate_sql()


# --------------------------------------------------------------------
# Perplexity-style corpus bucketing: decile report over the LM score
# — the table a pipeline owner reads to pick the drop threshold
# ("cut the bottom two deciles"). Runs the two-phase global ranking
# (operators/ranking.py), so bucketing the WHOLE corpus by model
# score — the classic quality-filter sweep — has no single-task
# window even at full fact scale.
# --------------------------------------------------------------------
def lm_score_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Docs ranked by ascending LM score (worst first), NTILE(10) via
    the closed-form two-phase rank; per decile: doc count, total
    bigram mass, and the score range. Scores are ratios of identical
    integers in both engines, so the sort order and min/max are
    bit-identical; sums are integer-only (no float accumulation)."""
    from goconnect_spark.operators.ranking import global_row_number, ntile_from_rn

    scored = _lm_scored(spark, sf_dir)
    numbered = global_row_number(scored, [F.asc("lm_score"), F.asc("doc_id")])
    tiled = numbered.select(
        "lm_score", "n_bigrams", ntile_from_rn(10).cast("int").alias("decile")
    )
    return (
        tiled.groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_bigrams").cast("long").alias("total_bigrams"),
            F.min("lm_score").alias("lo_score"),
            F.max("lm_score").alias("hi_score"),
        )
        .orderBy("decile")
    )


def _lm_deciles_sql() -> str:
    return f"""
WITH scored AS ({_LM_SCORE_SQL.strip()}),
tiled AS (
  SELECT lm_score, n_bigrams,
         NTILE(10) OVER (ORDER BY lm_score ASC, doc_id ASC) AS decile
  FROM scored
)
SELECT CAST(decile AS INT) AS decile,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_bigrams) AS BIGINT) AS total_bigrams,
       MIN(lm_score) AS lo_score,
       MAX(lm_score) AS hi_score
FROM tiled GROUP BY decile ORDER BY decile
"""


QUERIES["lm_score_deciles"] = lm_score_deciles
ORACLE["lm_score_deciles"] = _lm_deciles_sql()
