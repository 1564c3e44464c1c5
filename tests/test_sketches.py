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
