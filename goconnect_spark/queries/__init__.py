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
    analytics7,
    curation,
    dedup,
    filtering,
    packing,
    parity,
    quality,
    sampling,
    similarity,
    sketches,
    text,
    text2,
)

ALL_MODULES = (parity, analytics, analytics2, analytics3, analytics4, analytics5, analytics6, analytics7, curation, dedup, filtering, sampling, similarity, sketches, text, text2, packing, quality)

# Driver-verification priority: the per-round correctness harness runs the
# catalog in registration order and may cap the run (~50 of the catalog).
# Cumulative coverage through r03 is complete for the pre-round-4 catalog
# (r01 ∪ r02 ∪ r03 = 85/85 green), so priority now tracks STALENESS:
#   tier 0 — queries the driver has never run (added after the r03 snapshot);
#   tier 1 — queries whose implementation changed after the r03 snapshot
#            (commits 5d9d280..HEAD: shared shingle/token tables, two-phase
#            ranking, degree-oriented triangles, GROUPING() markers, in-row
#            winnowing, vocab-level CMS hashing, cached cluster map) — their
#            old green rows no longer certify HEAD;
#   tier 2 — everything else, byte-identical to a driver-green round.
_DRIVER_PRIORITY = (
    # tier 0: never driver-run
    "word_pagerank",
    "source_divergence_tv",
    "knn_label_accuracy",
    "phrase_search_top_trigram",
    "events_hourly_anomalies",
    "word_communities_lpa",
    "source_length_quantiles",
    "event_hour_contingency",
    "doc_lexical_gini",
    "customer_rfm_segments",
    "order_fulfillment_latency",
    "daily_new_users_cumulative",
    "brand_basket_lift",
    "events_user_lifecycle",
    "label_centroid_shift",
    "corpus_novelty_curve",
    "supplier_concentration_hhi",
    "source_overlap_jaccard",
    "event_interarrival_gaps",
    "price_size_regression",
    "event_transition_matrix",
    "order_value_pareto",
    "weekly_active_users",
    "events_distinct_hll",
    "user_overlap_kmv",
    "bloom_prune_join",
    "priority_sample",
    "semantic_dedup",
    "token_budget_sample",
    "source_epoch_plan",
    "key_skew_profile",
    "gopher_quality_rules",
    "duplicated_ngram_coverage",
    "doc_lm_score",
    "embedding_outliers",
    "curated_corpus_stats",
    "q11_important_stock",
    "q12_shipmode_priority",
    "q16_parts_supplier_counts",
    "q20_potential_promotion",
    "q21_late_suppliers",
    "doc_chunking",
    "chunk_dedup_stats",
    "train_val_test_split",
    "tfidf_top_terms",
    # tier 1: implementation changed since the r03-verified snapshot
    "cosine_topk",
    "ann_ivf_topk",
    "ann_ivf_kmeans_topk",
    "embedding_near_dup",
    "orders_grouping_sets",
    "customer_spend_ranks",
    "word_graph_triangles",
    "word_freq_cms",
    "word_cooccurrence",
    "bigram_cond_prob",
    "text_lang_id",
    "doc_fingerprint",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_connected_components",
    "dedup_filtered_corpus",
    "dedup_exact",
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
