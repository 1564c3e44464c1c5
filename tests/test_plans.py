"""Physical-plan regression guards: the scale properties SCALING.md
claims must stay visible in the executed plans."""

import pytest


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def qs():
    from goconnect_spark.queries import all_queries

    return all_queries()


def test_q1_pushdown_and_pruning(spark, sf_dir, qs):
    plan = _plan(qs["q1_pricing_summary"](spark, sf_dir))
    scan = [ln for ln in plan.split("\n") if "FileScan" in ln][0]
    # filter pushed into the parquet scan
    assert "l_shipdate" in scan and "PushedFilters: [" in plan
    # column pruning: untouched columns never leave the scan
    assert "l_orderkey" not in scan and "l_partkey" not in scan
    # partial aggregation (map-side combine) before the exchange
    assert "partial_sum" in plan


def test_q5_broadcasts_dims(spark, sf_dir, qs):
    plan = _plan(qs["q5_region_revenue"](spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 3  # supplier/nation/region
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_dedup_queries_have_no_cross_join(spark, sf_dir, qs):
    # embedding_near_dup keeps ONE BroadcastNestedLoopJoin by design:
    # the 16-row hyperplane dim crossed against the quantized corpus
    # (a broadcast of a constant-size local relation — not a pair
    # blow-up). No unbounded cartesian anywhere.
    for name in ["dedup_minhash_lsh", "dedup_simhash", "dedup_ngram_jaccard", "embedding_near_dup"]:
        plan = _plan(qs[name](spark, sf_dir))
        assert "CartesianProduct" not in plan, name
        if name != "embedding_near_dup":
            assert "BroadcastNestedLoopJoin" not in plan, name


def test_no_python_udfs_in_relational_queries(spark, sf_dir, qs):
    # everything stays in JVM codegen — no BatchEvalPython/ArrowEvalPython
    for name in ["q1_pricing_summary", "q3_shipping_priority", "events_hourly",
                 "dedup_minhash_lsh", "cosine_topk", "text_lang_id"]:
        plan = _plan(qs[name](spark, sf_dir))
        assert "EvalPython" not in plan, name


def test_whole_stage_codegen_present(spark, sf_dir, qs):
    # AQE finalizes codegen wrapping at execution time — run, then
    # inspect the final plan
    df = qs["q1_pricing_summary"](spark, sf_dir)
    df.collect()
    plan = _plan(df)
    assert "WholeStageCodegen" in plan or "*(1)" in plan
