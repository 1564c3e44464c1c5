"""Partition-count invariance: the catalog's determinism claims (exact
decimal/integer aggregation, total-ordered ranks, md5-based
pseudo-randomness) all reduce to one testable property — the RESULT
HASH must not depend on how the data is physically partitioned.
A query whose value changes between 3 and 32 shuffle partitions is
order-dependent somewhere (float sum, untied rank, first/any_value),
exactly the class of bug that surfaces only on a real cluster where
partitioning differs run to run.

Representative sample across families: fixed-point graph iteration,
two-phase global ranking, dedup candidate joins, ANN integer dots,
streaming-twin batch aggregates, TPC-H decimal money math.
"""

import hashlib

import pytest

SAMPLE = [
    "q1_pricing_summary",          # decimal money sums
    "customer_spend_ranks",        # two-phase global ranking
    "order_value_pareto",          # range-partition rank + cumsum
    "dedup_minhash_lsh",           # md5 minhash bands -> pair join
    "dedup_connected_components",  # iterative star contraction
    "word_pagerank",               # fixed-point power iteration
    "cosine_topk",                 # integer-quantized dots + tie-break
    "epoch_shard_assignment",      # hash-ordered global shuffle
    "sequence_packing",            # two-phase cumsum packer
    "ivm_merge_hourly_counts",     # monoid merge of partials
    "bm25_keyword_topk",           # fixed-point DIV scoring + TakeOrdered
    "salted_segment_activity",     # salt explode must not change the join result
    "hll_sliding_calibration",     # register max-merge across windows (carries the former hll_sliding_7d_users, r13 fold)
    "ann_ivfpq_topk",              # codebook argmax encode + ADC + re-rank
    "bpe_tokenize_corpus",         # frozen-table replace chain + token count
    "bpe_doc_tokens",              # collect_list reassembly: array_sort on (pos, toks) must kill arrival order
]


def _norm(v):
    import datetime
    import math

    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(round(v, 9))
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, datetime.datetime):
        return v.isoformat(sep=" ")
    return str(v)


def _result_hash(df):
    cols = df.columns
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "|".join(_norm(r[i]) for i in order) for r in df.collect()
    )
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


@pytest.mark.parametrize("name", SAMPLE)
def test_result_invariant_under_shuffle_partition_count(spark, sf_dir, name):
    from goconnect_spark.queries import all_queries
    from goconnect_spark.queries.corpus import _CACHE

    fn = all_queries()[name]
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    hashes = {}
    try:
        for n in ("32", "3"):
            spark.conf.set("spark.sql.shuffle.partitions", n)
            # drop session-cached shared tables so each run really
            # re-executes under the new partitioning
            for key, df in list(_CACHE.items()):
                df.unpersist()
                del _CACHE[key]
            hashes[n] = _result_hash(fn(spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        for key, df in list(_CACHE.items()):
            df.unpersist()
            del _CACHE[key]
    assert hashes["32"] == hashes["3"], (
        f"{name} result depends on shuffle partition count"
    )


# A second invariance axis: the PHYSICAL strategy (adaptive execution,
# broadcast-vs-shuffle join selection) must never change results. With
# autoBroadcastJoinThreshold=-1 every broadcast join in the plan audit
# becomes a shuffle join; with AQE off no runtime re-planning happens —
# same hashes either way, or a join is semantically coupled to its
# physical strategy somewhere.
CONFIG_SAMPLE = [
    "q5_region_revenue",        # 6-way star join (broadcast dims)
    "q21_late_suppliers",       # multi-semi/anti join
    "purchases_asof_signup",    # as-of join composition
    "dedup_filtered_corpus",    # minhash join -> CC -> agg cascade
    "ivm_join_view_delta",      # three delta joins + union
]


@pytest.mark.parametrize("name", CONFIG_SAMPLE)
def test_result_invariant_under_join_strategy_and_aqe(spark, sf_dir, name):
    from goconnect_spark.queries import all_queries
    from goconnect_spark.queries.corpus import _CACHE

    fn = all_queries()[name]
    prev_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    hashes = {}
    try:
        for label, bc, aqe in (
            ("default", prev_bc, "true"),
            ("no-broadcast-no-aqe", "-1", "false"),
        ):
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bc)
            spark.conf.set("spark.sql.adaptive.enabled", aqe)
            for key, df in list(_CACHE.items()):
                df.unpersist()
                del _CACHE[key]
            hashes[label] = _result_hash(fn(spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bc)
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)
        for key, df in list(_CACHE.items()):
            df.unpersist()
            del _CACHE[key]
    assert hashes["default"] == hashes["no-broadcast-no-aqe"], (
        f"{name} result depends on join strategy / AQE"
    )
