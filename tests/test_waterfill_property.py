"""Property test for source_budget_waterfill: the shipped corpora have
near-uniform sources, which never stresses the water-line solve. Here
random and adversarial token profiles (one dominant crawl, many
singleton sources, equal ties) must satisfy the defining properties of
water-filling, checked against first principles rather than a second
engine:

  feasibility   sum_s min(tokens_s, cap) <= budget
  maximality    raising the cap by 1 would overshoot the budget
                (whenever any source is actually truncated)
  greedy shape  allocated_s == min(tokens_s, cap); small sources whole
"""

import random

import pytest

from goconnect_spark.queries.mixing import _WF_DEN, _WF_NUM, source_budget_waterfill


def _profiles():
    rng = random.Random(17)
    yield [3, 3, 3, 3]                     # equal ties
    yield [1] * 12 + [10_000]              # one dominant crawl
    yield [1]                              # single source
    yield [5, 9]                           # tiny two-source
    for _ in range(3):
        yield [rng.randint(1, 500) for _ in range(rng.randint(2, 15))]


@pytest.mark.parametrize("tokens", list(_profiles()), ids=lambda t: f"n{len(t)}")
def test_waterfill_properties_on_adversarial_profiles(spark, tmp_path, tokens):
    rows = [
        (i, " ".join(["w"] * t), "en", f"s{i:03d}", t)
        for i, t in enumerate(tokens)
    ]
    d = tmp_path / f"wf_{len(tokens)}_{sum(tokens)}"
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{d}/documents.parquet")

    out = {r.source: r for r in source_budget_waterfill(spark, str(d)).collect()}
    assert len(out) == len(tokens)

    total = sum(tokens)
    budget = total * _WF_NUM // _WF_DEN
    cap = next(iter(out.values())).cap
    for i, t in enumerate(tokens):
        r = out[f"s{i:03d}"]
        assert r.tokens == t
        assert r.budget == budget
        assert r.cap == cap  # one common water line
        assert r.allocated == min(t, cap)

    filled = sum(min(t, cap) for t in tokens)
    assert filled <= budget  # feasibility
    if any(t > cap for t in tokens):  # someone truncated -> cap is maximal
        assert sum(min(t, cap + 1) for t in tokens) > budget
    else:  # nobody truncated: the whole corpus fit the budget
        assert filled == total
