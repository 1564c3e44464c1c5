"""Query catalog: each module exposes ``QUERIES`` (name -> fn(spark, sf_dir)
-> DataFrame) and ``ORACLE`` (name -> equivalent DuckDB SQL).

Determinism contract for the oracle hash-compare:
- money/rate doubles are cast to DECIMAL before arithmetic so sums are
  exact and order-independent, then cast to DOUBLE at the end (DuckDB
  via CAST(CAST(x AS VARCHAR) AS DOUBLE) — its direct decimal->double
  cast is off by 1 ulp);
- float divisions are never rounded: both engines divide IDENTICAL
  operands (exact integer/decimal-derived doubles), so the quotients
  are bit-identical by IEEE-754;
- every computed column is aliased identically in Spark and SQL;
- hashes (md5 hex, lowercase) are used as the portable hash function —
  identical strings in Spark and DuckDB.
"""

from goconnect_spark.queries import (
    analytics,
    analytics2,
    analytics3,
    analytics4,
    analytics5,
    analytics6,
    dedup,
    filtering,
    packing,
    parity,
    quality,
    similarity,
    text,
    text2,
)

ALL_MODULES = (parity, analytics, analytics2, analytics3, analytics4, analytics5, analytics6, dedup, filtering, similarity, text, text2, packing, quality)

# Driver-verification priority: the per-round correctness harness runs the
# catalog in registration order and may cap the run (round 2 covered only the
# first ~50 of 85).  Queries that have never received a green DRIVER row come
# first so the cumulative artifact converges on full-catalog coverage:
#   tier 1 — absent from CORRECTNESS_r01.json ∪ CORRECTNESS_r02.json, plus
#            ann_ivf_kmeans_topk whose only driver row was err=no_oracle;
#   tier 2 — present in r01 only (green there, but re-verify cheaply);
#   tier 3 — green in r02 (freshest coverage, lowest urgency).
_DRIVER_PRIORITY = (
    # tier 0: new in round 4 — never seen by the driver
    "gopher_quality_rules",
    "duplicated_ngram_coverage",
    "doc_lm_score",
    "embedding_outliers",
    "curated_corpus_stats",
    # tier 1: never driver-green
    "user_rolling_7d",
    "funnel_view_click_purchase",
    "retention_cohorts",
    "word_graph_triangles",
    "customer_spend_ranks",
    "daily_reconciliation",
    "events_rollup_cascade",
    "distinct_users_kmv_by_type",
    "dedup_filtered_corpus",
    "benchmark_contamination",
    "doc_repetition_ratio",
    "vocab_oov_rate",
    "word_cooccurrence",
    "bigram_cond_prob",
    "source_mix_weights",
    "value_outliers_mad",
    "orders_profile",
    "referential_integrity",
    "ann_ivf_kmeans_topk",
    # tier 2: green in r01 but not r02
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_connected_components",
    "cosine_topk",
    "ann_ivf_topk",
    "embedding_near_dup",
    "text_token_stats",
    "text_quality_score",
    "text_lang_id",
    "doc_fingerprint",
    "text_token_bpeish",
    "doc_length_buckets",
    "sequence_packing",
    "stratified_sample",
)


def all_queries():
    out = {}
    for m in ALL_MODULES:
        overlap = out.keys() & m.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        out.update(m.QUERIES)
    ordered = {}
    for name in _DRIVER_PRIORITY:
        if name in out:
            ordered[name] = out.pop(name)
    ordered.update(out)
    return ordered


def all_oracles():
    out = {}
    for m in ALL_MODULES:
        out.update(m.ORACLE)
    return out
