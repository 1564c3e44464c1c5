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
    curation,
    dedup,
    dedup2,
    filtering,
    events_series,
    graph_queries,
    layout,
    mixing,
    packing,
    pq,
    relational,
    streaming_queries,
    tpch,
    parity,
    quality,
    sampling,
    similarity,
    similarity2,
    sketches,
    text,
    text2,
)

ALL_MODULES = (parity, tpch, relational, events_series, streaming_queries, graph_queries, curation, dedup, dedup2, filtering, layout, mixing, sampling, similarity, similarity2, pq, sketches, text, text2, packing, quality)

# Driver-verification priority: the per-round correctness harness runs the
# catalog in registration order and may cap the run (~50 of the catalog).
# Cumulative coverage through r04 is 128/130 (the 2 reds were oracle-side
# HUGEINT casts, fixed in round 5), so priority tracks STALENESS at HEAD:
#   tier 0 — added or rewritten in round 5 (sessions 1-3: oracle CAST
#            fixes, two-phase NTILE rewrites, dictionary-encoded dedup,
#            zorder/DSIR/snapshot-diff/quality-keepers/streaming-window
#            additions) — never certified at HEAD;
#   tier 1 — implementation changed in round 4 but driver-certified only
#            through r03 (shared shingle/token tables, two-phase ranking,
#            in-row winnowing, vocab-level CMS hashing, cached cluster map)
#            — their old green rows no longer certify HEAD;
#   tier 2 — everything else, byte-identical to a driver-green round
#            (r04 certified the 45 round-4 additions; r01∪r02∪r03 the rest).
_DRIVER_PRIORITY = (
    # Rebuilt for round 6. The driver certifies ~50 queries per round in
    # this order, so priority = staleness at HEAD:
    #   tier 0 — new in r6 or consuming code changed at HEAD since their
    #            last green row (the CC rewrite; the r5 doc_lm_score
    #            refactor VERDICT r5 flagged);
    #   then every other query ordered by the ROUND OF ITS NEWEST GREEN
    #   DRIVER ROW, oldest first — certificate-age rotation, so no
    #   certificate ages more than ~2 rounds before re-verification.
    # --- tier 0: r6-new / changed at HEAD ---
    "source_containment_matrix",
    "corpus_drop_reasons",
    "bpe_merge_table",
    "streaming_ann_lookup",
    "bm25_keyword_topk",
    "salted_segment_activity",
    "hll_sliding_7d_users",
    "source_budget_waterfill",
    "streaming_ivm_hourly_counts",
    "ann_pq_adc_rerank",
    "ann_pq_recall",
    "ann_ivfpq_topk",
    "source_length_emd",
    "customer_name_fuzzy_pairs",
    "source_quality_harmonized",
    "hourly_seasonal_residuals",
    "streaming_handoff_counts",
    "hll_sliding_calibration",
    "events_distinct_hll",
    "ann_index_comparison",
    "ivm_merge_hourly_counts",
    "ivm_join_view_delta",
    "epoch_shard_assignment",
    "ann_random_projection_recall",
    # --- last green: r5 ---
    "dedup_connected_components",
    "dedup_filtered_corpus",
    # --- last green: r4 ---
    "curated_corpus_stats",
    # --- last green: r5 ---
    "dedup_quality_keepers",
    "dedup_cluster_size_histogram",
    # --- last green: r4 ---
    "doc_lm_score",
    # --- last green: r2 ---
    "distinct_users_by_type",
    "customers_without_orders",
    "customers_with_open_orders",
    "events_json_buckets",
    "events_daily_pivot",
    "customer_supplier_nations",
    "q19_discounted_revenue",
    "q17_small_quantity_revenue",
    "events_error_context",
    "purchases_asof_signup",
    "quantity_percentiles",
    "lineitem_cube",
    "orders_unpivot",
    "events_hourly_gapfill",
    "q4_order_priority",
    "q6_forecast_revenue",
    "q7_trade_volume",
    "q10_returned_items",
    "q14_promo_revenue",
    "q18_large_volume_customers",
    "events_latest_per_user",
    "q8_market_share",
    "q15_top_supplier",
    "user_history_scd2",
    "q22_sales_opportunity",
    "q2_min_cost_supplier",
    "events_distinct_kmv",
    "q13_order_count_distribution",
    "q9_product_type_profit",
    "events_in_error_windows",
    "value_histogram_quantiles",
    # --- last green: r3 ---
    "map_filter",
    "flatmap_word_counts",
    "fold_global",
    "limit_events",
    "ordered_merge",
    "kv_roundtrip",
    "xml_extract_fold",
    "roundrobin_replay",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "top_customers_per_segment",
    "events_hourly",
    "user_sessions",
    "orders_rollup",
    "user_rolling_7d",
    "funnel_view_click_purchase",
    "retention_cohorts",
    "daily_reconciliation",
    "events_rollup_cascade",
    "distinct_users_kmv_by_type",
    "text_token_stats",
    "text_quality_score",
    "text_token_bpeish",
    "benchmark_contamination",
    "doc_repetition_ratio",
    "vocab_oov_rate",
    "source_mix_weights",
    "doc_length_buckets",
    "sequence_packing",
    "stratified_sample",
    "value_outliers_mad",
    "orders_profile",
    "referential_integrity",
    # --- last green: r4 ---
    "ann_ivf_topk",
    "ann_ivf_kmeans_topk",
    "embedding_near_dup",
    "semantic_dedup",
    "orders_grouping_sets",
    "chunk_dedup_stats",
    "doc_chunking",
    "tfidf_top_terms",
    "gopher_quality_rules",
    "duplicated_ngram_coverage",
    "embedding_outliers",
    "token_budget_sample",
    "source_epoch_plan",
    "key_skew_profile",
    "priority_sample",
    "user_overlap_kmv",
    "bloom_prune_join",
    "q11_important_stock",
    "q16_parts_supplier_counts",
    "q20_potential_promotion",
    "q21_late_suppliers",
    "label_centroid_shift",
    "source_divergence_tv",
    "knn_label_accuracy",
    "phrase_search_top_trigram",
    "events_hourly_anomalies",
    "source_length_quantiles",
    "event_hour_contingency",
    "doc_lexical_gini",
    "order_fulfillment_latency",
    "weekly_active_users",
    "event_transition_matrix",
    "event_interarrival_gaps",
    "supplier_concentration_hhi",
    "events_user_lifecycle",
    "daily_new_users_cumulative",
    "source_overlap_jaccard",
    "corpus_novelty_curve",
    # --- last green: r5 ---
    "zorder_pruning_stats",
    "dsir_importance_weights",
    "corpus_snapshot_diff",
    "streaming_windowed_hourly",
    "streaming_session_counts",
    "streaming_dedup_keys",
    "streaming_error_context_join",
    "ann_mrr",
    "streaming_enrich_cohort",
    "containment_dedup",
    "minhash_jaccard_calibration",
    "hourly_count_autocorr",
    "embedding_dim_covariance",
    "fingerprint_collision_dedup",
    "ann_sq8_recall",
    "lang_id_confusion",
    "brand_basket_lift",
    "word_pagerank",
    "word_communities_lpa",
    "price_size_regression",
    "streaming_fold_count",
    "events_value_stats",
    "ann_sq8_rerank",
    "embedding_quantization_error",
    "dedup_incremental_new_batch",
    "ann_recall_at_k",
    "dedup_method_agreement",
    "boilerplate_top_shingles",
    "lm_score_deciles",
    "source_dedup_matrix",
    "q12_shipmode_priority",
    "train_val_test_split",
    "order_value_pareto",
    "customer_rfm_segments",
    "customer_spend_ranks",
    "word_graph_triangles",
    "word_freq_cms",
    "word_cooccurrence",
    "bigram_cond_prob",
    "text_lang_id",
    "doc_fingerprint",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "cosine_topk",
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
