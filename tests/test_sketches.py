"""Sketch-family semantics: HLL accuracy, KMV set-operation sanity,
Bloom pruning exactness, priority-sample unbiasedness, SemDeDup
consistency. The bit-for-bit engine parity of each query is covered
by the DuckDB oracle gate (tools/verify_local.py); these tests check
the STATISTICAL contracts the oracle compare cannot see.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

SF01 = "/root/testdata/sf0.01"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_hll_estimate_within_error_bound(spark):
    from goconnect_spark.queries.sketches import events_distinct_hll

    row = events_distinct_hll(spark, SF01).collect()[0]
    rel_err = abs(row.hll_estimate - row.exact_distinct) / row.exact_distinct
    # m=1024 -> sigma ~ 1.04/sqrt(1024) = 3.25%; 3 sigma
    assert rel_err < 0.10, (row.hll_estimate, row.exact_distinct)
    assert row.zero_registers == 0  # 10k distinct >> 1024 registers
    assert row.m == 1024
    # the folded-in KMV estimate (r13): k=128 -> sigma ~ 1/sqrt(127) =
    # 8.9%; 3 sigma
    kmv_err = abs(row.kmv_estimate - row.exact_distinct) / row.exact_distinct
    assert kmv_err < 0.27, (row.kmv_estimate, row.exact_distinct)
    assert row.kmv_k == 128 and row.kmv_kth_min > 0


def test_hll_no_distinct_no_expand(spark):
    """The register build must be max-per-bucket (map-side partial),
    never a distinct of the raw hash set — that is HLL's entire
    advantage over KMV at scale."""
    from goconnect_spark.queries.sketches import events_distinct_hll

    plan = _plan(events_distinct_hll(spark, SF01))
    assert "Expand" not in plan
    # the only aggregate keyed on data-sized values besides the bucket
    # max is the ONE distinct the folded-in KMV branch (r13) is defined
    # by; a distinct sneaking into the HLL register build would show up
    # as a SECOND hashpartitioning(hv..) exchange
    assert plan.count("hashpartitioning(hv") == 1, plan


def test_overlap_kmv_estimates_track_exact(spark):
    from goconnect_spark.queries.sketches import user_overlap_kmv

    rows = user_overlap_kmv(spark, SF01).collect()
    assert len(rows) == 10  # C(5,2) event-type pairs
    for r in rows:
        assert 0.0 <= r.exact_jaccard <= 1.0
        # k=32 -> stderr of c/k ~ sqrt(J(1-J)/32) <= 0.09; 3-sigma-ish
        assert abs(r.jaccard_est - r.exact_jaccard) <= 0.35, r
        assert r.union_est == pytest.approx(r.exact_union, rel=0.5)
        assert r.kmv_overlap <= 32


def test_bloom_prune_matches_plain_join(spark):
    """The bloom is a SUPERSET filter: the exact join behind it must
    produce exactly the plain-join matches, and the diagnostics must
    reconcile."""
    from goconnect_spark.queries.sketches import bloom_prune_join
    from goconnect_spark.tables import load

    row = bloom_prune_join(spark, SF01).collect()[0]
    orders = load(spark, "orders", SF01)
    li = load(spark, "lineitem", SF01)
    keys = orders.where(
        "o_orderpriority = '1-URGENT' AND o_orderdate >= timestamp'2001-01-01'"
    ).select("o_orderkey")
    plain = li.join(keys, li.l_orderkey == keys.o_orderkey).count()
    assert row.true_matches == plain
    assert row.bloom_candidates == row.true_matches + row.false_positives
    assert row.false_positives >= 0
    # at sf0.01 (n~260 keys, m=8192) the filter must actually prune:
    # candidates are a small fraction of the 60k-row fact
    assert row.bloom_candidates < 0.1 * li.count()


def test_bloom_scans_lineitem_once(spark):
    """One pass over the fact: candidate test, match mark and all
    diagnostics in a single scan — no second scan for the counts."""
    from goconnect_spark.queries.sketches import bloom_prune_join

    plan = _plan(bloom_prune_join(spark, SF01))
    assert plan.count("lineitem.parquet") == 1
    assert "SortMergeJoin" not in plan


def test_priority_sample_unbiased_total(spark):
    """sum(max(w, tau)) over the sample estimates total corpus weight
    (Duffield-Lund-Thorup); with k=200 of 500 docs the estimate is
    tight."""
    from goconnect_spark.queries.sampling import priority_sample
    from goconnect_spark.tables import load

    rows = priority_sample(spark, SF01).collect()
    assert len(rows) == 200
    pris = [r.priority for r in rows]
    assert pris == sorted(pris, reverse=True)
    est_total = sum(r.est_w for r in rows)
    true_total = (
        load(spark, "documents", SF01).agg(F.sum("n_chars")).collect()[0][0]
    )
    assert est_total == pytest.approx(true_total, rel=0.15)
    # every sampled weight estimate is >= the raw weight
    assert all(r.est_w >= r.w_chars for r in rows)


def test_semantic_dedup_partitions_account_for_corpus(spark):
    from goconnect_spark.queries.similarity import semantic_dedup
    from goconnect_spark.tables import load

    rows = semantic_dedup(spark, SF01).collect()
    n = load(spark, "embeddings", SF01).count()
    assert sum(r.n_vectors for r in rows) == n
    assert all(r.n_kept + r.n_dropped == r.n_vectors for r in rows)
    assert all(r.n_dropped <= r.n_dup_pairs for r in rows)
    # tau=0.3125 on this corpus is non-vacuous (measured ~370 pairs)
    assert sum(r.n_dup_pairs for r in rows) > 0


def test_semantic_dedup_greedy_drop_rule_brute_force(spark):
    """The drop set must equal the brute-force rule: drop x iff some
    kept-or-dropped y < x in the same cell has cosine >= tau.
    (Greedy keep-first == 'exists any lower-id neighbor' because
    similarity to ANY lower id drops x, kept or not.)"""
    import math
    from collections import defaultdict

    from goconnect_spark.queries.similarity import _kmeans_member, semantic_dedup
    from goconnect_spark.tables import load

    emb = load(spark, "embeddings", SF01)
    mem = {
        r.vec_id: (r.cell, r.qs)
        for r in _kmeans_member(emb).select("vec_id", "cell", "qs").collect()
    }
    by_cell = defaultdict(list)
    for vid, (cell, qs) in sorted(mem.items()):
        by_cell[cell].append((vid, qs))
    expected = defaultdict(int)
    for cell, items in by_cell.items():
        dropped = set()
        for i in range(len(items)):
            vi, qi = items[i]
            ni = math.sqrt(sum(q * q for q in qi))
            for j in range(i):
                vj, qj = items[j]
                dot = sum(a * b for a, b in zip(qi, qj))
                if dot / (ni * math.sqrt(sum(q * q for q in qj))) >= 0.3125:
                    dropped.add(vi)
                    break
        expected[cell] = len(dropped)
    got = {r.cell: r.n_dropped for r in semantic_dedup(spark, SF01).collect()}
    assert {c: n for c, n in expected.items()} == {
        c: n for c, n in got.items() if n or c in expected
    }


def _write_bloom_fixture(spark, tmp_path, urgent_keys, li_keys):
    """Minimal orders/lineitem pair for the bloom degenerate tests:
    only the columns bloom_prune_join touches."""
    import datetime

    d_new = datetime.datetime(2001, 6, 1)
    d_old = datetime.datetime(1999, 6, 1)
    orders = [(int(k), "1-URGENT", d_new) for k in urgent_keys]
    # padding rows that never qualify (old date)
    orders += [(10_000 + i, "5-LOW", d_old) for i in range(5)]
    spark.createDataFrame(
        orders, "o_orderkey long, o_orderpriority string, o_orderdate timestamp"
    ).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
    li = [(int(k), 1000.0, 0.05) for k in li_keys]
    spark.createDataFrame(
        li, "l_orderkey long, l_extendedprice double, l_discount double"
    ).write.mode("overwrite").parquet(f"{tmp_path}/lineitem.parquet")


def test_bloom_empty_candidate_guard(spark, tmp_path):
    """VERDICT r14 item 7: keys exist but NO lineitem row passes the
    bloom (possible only when no key order has lineitems) — n_keys
    must still count the keys, not degrade to 0 off the empty
    candidate set."""
    from goconnect_spark.queries.sketches import bloom_prune_join

    # lineitem keys 100..109 are disjoint from the single urgent key 1
    # and (deterministically, fixed md5) none false-positives against
    # its 4 bloom bits
    _write_bloom_fixture(spark, tmp_path, urgent_keys=[1],
                         li_keys=range(100, 110))
    row = bloom_prune_join(spark, str(tmp_path)).collect()[0]
    assert row.n_keys == 1
    assert row.bloom_candidates == 0
    assert row.true_matches == 0 and row.false_positives == 0


def test_bloom_empty_keys_guard(spark, tmp_path):
    """No urgent-2001 orders at all: the all-zero bloom rejects every
    row and every count reads 0 (the oracle's COUNT over the empty key
    set)."""
    from goconnect_spark.queries.sketches import bloom_prune_join

    _write_bloom_fixture(spark, tmp_path, urgent_keys=[],
                         li_keys=range(100, 110))
    row = bloom_prune_join(spark, str(tmp_path)).collect()[0]
    assert row.n_keys == 0
    assert row.bloom_candidates == 0
    assert row.true_matches == 0 and row.false_positives == 0
