"""Randomized oracle differential: the driver's hash-compare gate, but
on corpora it has NEVER seen. The fixed sf dirs can mask data-shape-
dependent divergence (the HUGEINT-cast and prefix-boundary bugs both
hid behind 'consistently wrong on the shipped corpus'); here each run
writes freshly generated documents tables — planted near-dups,
contained slices, mixed languages/sources, degenerate one-word and
empty-ish docs — and every documents-only catalog query must STILL
hash-match its DuckDB oracle exactly."""

import hashlib
import random

import duckdb
import pytest

from tools.verify_local import _hash_rows, _norm  # reuse the driver mirror

# documents-only catalog queries (no orders/events/embeddings input):
# the families whose semantics depend most on corpus shape
DOC_QUERIES = [
    "bm25_keyword_topk",
    "source_budget_waterfill",
    "source_length_emd",
    "source_quality_harmonized",
    "source_containment_matrix",
    "corpus_drop_reasons",
    "epoch_shard_assignment",
    "dsir_importance_weights",
    "corpus_snapshot_diff",
    "dedup_quality_keepers",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "containment_dedup",
    "minhash_jaccard_calibration",
    "fingerprint_collision_dedup",
    "dedup_connected_components",
    "text_quality_score",
    "text_lang_id",
    "lang_id_confusion",
    "doc_fingerprint",
    "doc_lexical_gini",
    "word_cooccurrence",
    "bigram_cond_prob",
    "tfidf_top_terms",
    "doc_chunking",
    "boilerplate_top_shingles",
    "bpe_tokenize_corpus",
    "bpe_doc_tokens",
    "bpe_vocab_deep_tokens",
    "text_token_stats",
    # media routing certificates: blobs derive from doc_id, so the
    # planted-truth match must hold on ANY documents table
    "media_classify_counts",
    "media_jpeg_dims_profile",
    "media_animation_metadata",
    "media_mp4_sample_ranges",
    # Avro wire-format certificate: bodies derive from doc_id only
    "avro_decode_fold",
]

LANGS = ["en", "de", "fr", "es", "zh"]


def _random_corpus(seed: int, n: int = 60):
    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(40)]
    # non-BMP hazard class (the ADVICE-r6 surrogate-split bug class):
    # emoji / astral CJK / combining marks exercise every substr /
    # length / split / md5 path under multi-code-unit characters —
    # Spark counts UTF-16 pairs as ONE code point and DuckDB counts
    # UTF-8 bytes as ONE code point, so any code-unit-based operator
    # in a query/oracle pair hash-mismatches here
    vocab += ["😀w", "𠀋", "naïve", "𝄞clef", "ü😀ü"]
    docs = []
    for i in range(n):
        ln = rng.choice([1, 2, 5, rng.randint(8, 60), rng.randint(8, 60)])
        text = " ".join(rng.choice(vocab) for _ in range(ln))
        docs.append((i, text, rng.choice(LANGS), f"src{rng.randrange(6)}"))
    # planted near-dups (mutate), exact dups, and contained slices
    for k in range(8):
        base = docs[rng.randrange(n)]
        words = base[1].split(" ")
        kind = rng.random()
        if kind < 0.33 and len(words) > 4:
            words = list(words)
            words[rng.randrange(len(words))] = rng.choice(vocab)
            text = " ".join(words)
        elif kind < 0.66:
            text = base[1]
        else:
            lo = rng.randrange(max(1, len(words) - 4))
            text = " ".join(words[lo : lo + rng.randint(3, 15)])
        docs.append((1000 + k, text, rng.choice(LANGS), f"src{rng.randrange(6)}"))
    return [(i, t, lang, src, len(t)) for (i, t, lang, src) in docs]


EMB_QUERIES = [
    "ann_pq_adc_rerank",
    "ann_ivfpq_topk",
    "ann_index_comparison",
    "streaming_ann_lookup",
    "ann_random_projection_recall",
    "cosine_topk",
    "ann_sq8_rerank",
    "embedding_quantization_error",
    "embedding_dim_covariance",
    "embedding_near_dup",
    "semantic_dedup",
    "ann_retrieval_quality",
]


@pytest.mark.parametrize("seed", [5, 23])
def test_embeddings_queries_hash_match_on_random_vectors(spark, tmp_path, seed):
    """Random 64-dim embeddings with planted hazards: exact duplicate
    vectors (cosine ties), near-duplicates, and scaled copies. Every
    embeddings-family query must hash-match its oracle."""
    import numpy as np

    import goconnect_spark.queries as Q

    qs, oracles = {}, {}
    for mod in Q.ALL_MODULES:
        qs.update(mod.QUERIES)
        oracles.update(mod.ORACLE)

    rng = np.random.RandomState(seed)
    n, dim = 50, 64
    m = (rng.rand(n, dim).astype(np.float32) - 0.5).astype(np.float32)
    m[7] = m[3]  # exact duplicate -> cosine tie with deterministic break
    m[11] = (m[4] * 0.5).astype(np.float32)  # scaled copy -> cosine 1 tie
    m[13] = (m[6] + 0.001 * rng.rand(dim).astype(np.float32)).astype(np.float32)
    rows = [(i, [float(v) for v in m[i]], int(i % 10)) for i in range(n)]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{tmp_path}/embeddings.parquet/*.parquet'"
    )

    failures = []
    for name in EMB_QUERIES:
        sdf = qs[name](spark, str(tmp_path))
        scols, srows = sdf.columns, [tuple(r) for r in sdf.collect()]
        res = con.execute(oracles[name])
        dcols, drows = [d[0] for d in res.description], res.fetchall()
        if len(srows) != len(drows) or sorted(scols) != sorted(dcols):
            failures.append((name, f"shape spark={len(srows)} duck={len(drows)}"))
            continue
        if _hash_rows(scols, srows) != _hash_rows(dcols, drows):
            order_s = sorted(range(len(scols)), key=lambda i: scols[i])
            order_d = sorted(range(len(dcols)), key=lambda i: dcols[i])
            ls = sorted("|".join(_norm(r[i]) for i in order_s) for r in srows)
            ld = sorted("|".join(_norm(r[i]) for i in order_d) for r in drows)
            diff = next((a, b) for a, b in zip(ls, ld) if a != b)
            failures.append((name, f"hash mismatch, first diff: {diff}"))
    assert not failures, failures


RELATIONAL_QUERIES = [
    "salted_segment_activity",
    "customer_name_fuzzy_pairs",
    "ivm_join_view_delta",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q4_order_priority",
    "q5_region_revenue",
    "q6_forecast_revenue",
    "q13_order_count_distribution",
    "q14_promo_revenue",
    "q18_large_volume_customers",
    "q19_discounted_revenue",
    "customers_order_presence",
    "top_customers_per_segment",
    "orders_rollup",
    "order_value_pareto",
    "brand_basket_lift",
    "supplier_concentration_hhi",
]


def _write_star(spark, tmp_path, seed: int):
    """Random star schema matching the driver tables' exact columns,
    with referential degenerates: customers with no orders, orders
    with no lineitems, single-line orders, quantity extremes, ties in
    price/date."""
    import datetime

    rng = random.Random(seed)
    region = [(i, n) for i, n in enumerate(["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"])]
    nation = [(i, f"NATION{i}", i % 5) for i in range(15)]
    segs = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
    customer = [
        (i, f"Customer#{i}", rng.randrange(15), round(rng.uniform(-500, 5000), 2), rng.choice(segs))
        for i in range(40)
    ]
    supplier = [(i, f"Supplier#{i}", rng.randrange(15), round(rng.uniform(-500, 5000), 2)) for i in range(8)]
    types = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
    part = [
        (i, f"part {i}", f"Brand#{rng.randrange(1, 20)}", rng.choice(types),
         rng.randrange(1, 50), round(rng.uniform(100, 2000), 2))
        for i in range(30)
    ]
    statuses = ["F", "O", "P"]
    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    base = datetime.datetime(1995, 1, 1)
    orders, lineitem = [], []
    for ok in range(120):
        ck = rng.randrange(36)  # custkeys 36-39 never order
        od = base + datetime.timedelta(days=rng.randrange(0, 2000))
        orders.append((ok, ck, rng.choice(statuses), round(rng.uniform(100, 40000), 2), od, rng.choice(prios)))
        n_lines = rng.choice([0, 1, 1, rng.randrange(2, 8)])  # some empty orders
        for ln in range(1, n_lines + 1):
            qty = float(rng.choice([1, 1, rng.randrange(1, 51), 50]))
            lineitem.append(
                (ok, rng.randrange(30), rng.randrange(8), ln, qty,
                 round(rng.uniform(100, 5000), 2), round(rng.randrange(0, 11) / 100.0, 2),
                 round(rng.randrange(0, 9) / 100.0, 2), rng.choice(["A", "N", "R"]),
                 rng.choice(["F", "O"]), od + datetime.timedelta(days=rng.randrange(1, 120)))
            )
    # events with a PLANTED HOT KEY (user 1 takes ~35% of all events):
    # exercises the salted-join path on exactly the skew it exists for
    events = []
    for eid in range(300):
        uid = 1 if rng.random() < 0.35 else rng.randrange(40)
        ts = base + datetime.timedelta(minutes=rng.randrange(0, 60 * 24 * 30))
        events.append(
            (eid, ts, uid, rng.choice(["view", "click", "purchase", "error"]),
             round(rng.uniform(-50, 500), 2), f'{{"k": {rng.randrange(100)}}}')
        )
    specs = {
        "region": (region, "r_regionkey int, r_name string"),
        "events": (events, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"),
        "nation": (nation, "n_nationkey int, n_name string, n_regionkey int"),
        "customer": (customer, "c_custkey long, c_name string, c_nationkey int, c_acctbal double, c_mktsegment string"),
        "supplier": (supplier, "s_suppkey long, s_name string, s_nationkey int, s_acctbal double"),
        "part": (part, "p_partkey long, p_name string, p_brand string, p_type string, p_size int, p_retailprice double"),
        "orders": (orders, "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double, o_orderdate timestamp, o_orderpriority string"),
        "lineitem": (lineitem, "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, l_quantity double, l_extendedprice double, l_discount double, l_tax double, l_returnflag string, l_linestatus string, l_shipdate timestamp"),
    }
    con = duckdb.connect()
    for t, (rows, schema) in specs.items():
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("overwrite").parquet(
            f"{tmp_path}/{t}.parquet"
        )
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{tmp_path}/{t}.parquet/*.parquet'")
    return con


@pytest.mark.parametrize("seed", [2, 44])
def test_relational_queries_hash_match_on_random_star(spark, tmp_path, seed):
    import goconnect_spark.queries as Q

    qs, oracles = {}, {}
    for mod in Q.ALL_MODULES:
        qs.update(mod.QUERIES)
        oracles.update(mod.ORACLE)
    con = _write_star(spark, tmp_path, seed)

    failures = []
    for name in RELATIONAL_QUERIES:
        try:
            sdf = qs[name](spark, str(tmp_path))
            scols, srows = sdf.columns, [tuple(r) for r in sdf.collect()]
            res = con.execute(oracles[name])
            dcols, drows = [d[0] for d in res.description], res.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"error: {e}"))
            continue
        if len(srows) != len(drows) or sorted(scols) != sorted(dcols):
            failures.append((name, f"shape spark={len(srows)} duck={len(drows)}"))
            continue
        if _hash_rows(scols, srows) != _hash_rows(dcols, drows):
            order_s = sorted(range(len(scols)), key=lambda i: scols[i])
            order_d = sorted(range(len(dcols)), key=lambda i: dcols[i])
            ls = sorted("|".join(_norm(r[i]) for i in order_s) for r in srows)
            ld = sorted("|".join(_norm(r[i]) for i in order_d) for r in drows)
            diff = next((a, b) for a, b in zip(ls, ld) if a != b)
            failures.append((name, f"hash mismatch, first diff: {diff}"))
    assert not failures, failures


EVENT_QUERIES = [
    "hll_sliding_calibration",
    "streaming_ivm_hourly_counts",
    "streaming_handoff_counts",
    "hourly_seasonal_residuals",
    "ivm_merge_hourly_counts",
    "events_hourly",
    "user_sessions",
    "events_latest_per_user",
    "funnel_view_click_purchase",
    "event_transition_matrix",
    "event_interarrival_gaps",
    "weekly_active_users",
    "events_user_lifecycle",
    "hourly_count_autocorr",
    "daily_new_users_cumulative",
    "retention_cohorts",
    "user_rolling_7d",
    "events_json_buckets",
    "events_value_stats",
    "distinct_users_kmv_by_type",
    "events_distinct_hll",
    "zorder_pruning_stats",
    "streaming_windowed_hourly",
    "streaming_session_counts",
    "streaming_dedup_keys",
    "streaming_error_context_join",
    "streaming_enrich_cohort",
]


@pytest.mark.parametrize("seed", [9, 31])
def test_events_queries_hash_match_on_random_stream(spark, tmp_path, seed):
    """Random event streams with planted hazards: same-timestamp
    bursts (window tie-breaks), a single-user block, sparse hours,
    negative values. Every events-family query must hash-match its
    oracle on streams the shipped sf dirs never exercised."""
    import datetime

    import goconnect_spark.queries as Q

    qs, oracles = {}, {}
    for mod in Q.ALL_MODULES:
        qs.update(mod.QUERIES)
        oracles.update(mod.ORACLE)

    rng = random.Random(seed)
    types = ["view", "click", "purchase", "signup", "error"]
    base = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for day in range(30):
        if day % 7 == 3:
            continue  # dead days
        n_ev = rng.randint(5, 60)
        for _ in range(n_ev):
            ts = base + datetime.timedelta(
                days=day, hours=rng.randrange(24), minutes=rng.randrange(60),
                seconds=rng.randrange(60), microseconds=rng.randrange(10**6),
            )
            # same-timestamp burst: a few events share ts exactly
            burst = 3 if rng.random() < 0.05 else 1
            for _ in range(burst):
                rows.append(
                    (eid, ts, rng.randrange(1, 12) if rng.random() < 0.9 else 1,
                     rng.choice(types),
                     round(rng.uniform(-50, 500), 2), f'{{"k": {rng.randrange(100)}}}')
                )
                eid += 1
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{tmp_path}/events.parquet/*.parquet'"
    )

    failures = []
    for name in EVENT_QUERIES:
        try:
            sdf = qs[name](spark, str(tmp_path))
            scols, srows = sdf.columns, [tuple(r) for r in sdf.collect()]
            res = con.execute(oracles[name])
            dcols, drows = [d[0] for d in res.description], res.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"error: {e}"))
            continue
        if len(srows) != len(drows) or sorted(scols) != sorted(dcols):
            failures.append((name, f"shape spark={len(srows)} duck={len(drows)}"))
            continue
        if _hash_rows(scols, srows) != _hash_rows(dcols, drows):
            order_s = sorted(range(len(scols)), key=lambda i: scols[i])
            order_d = sorted(range(len(dcols)), key=lambda i: dcols[i])
            ls = sorted("|".join(_norm(r[i]) for i in order_s) for r in srows)
            ld = sorted("|".join(_norm(r[i]) for i in order_d) for r in drows)
            diff = next((a, b) for a, b in zip(ls, ld) if a != b)
            failures.append((name, f"hash mismatch, first diff: {diff}"))
    assert not failures, failures


@pytest.mark.parametrize("seed", [11, 77])
def test_documents_queries_hash_match_on_random_corpus(spark, tmp_path, seed):
    import goconnect_spark.queries as Q

    qs, oracles = {}, {}
    for mod in Q.ALL_MODULES:
        qs.update(mod.QUERIES)
        oracles.update(mod.ORACLE)

    docs = _random_corpus(seed)
    df = spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{tmp_path}/documents.parquet/*.parquet'"
    )

    failures = []
    for name in DOC_QUERIES:
        sdf = qs[name](spark, str(tmp_path))
        scols, srows = sdf.columns, [tuple(r) for r in sdf.collect()]
        res = con.execute(oracles[name])
        dcols, drows = [d[0] for d in res.description], res.fetchall()
        if len(srows) != len(drows) or sorted(scols) != sorted(dcols):
            failures.append((name, f"shape spark={len(srows)} duck={len(drows)}"))
            continue
        if _hash_rows(scols, srows) != _hash_rows(dcols, drows):
            order_s = sorted(range(len(scols)), key=lambda i: scols[i])
            order_d = sorted(range(len(dcols)), key=lambda i: dcols[i])
            ls = sorted("|".join(_norm(r[i]) for i in order_s) for r in srows)
            ld = sorted("|".join(_norm(r[i]) for i in order_d) for r in drows)
            diff = next((a, b) for a, b in zip(ls, ld) if a != b)
            failures.append((name, f"hash mismatch, first diff: {diff}"))
    assert not failures, failures
