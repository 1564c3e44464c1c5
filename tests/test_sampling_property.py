"""Property test for the grouped two-phase cumulative scan inside
token_budget_sample: on randomized corpora, the distributed
range-partition + offset formulation must select EXACTLY the set a
sequential greedy pass selects (the md5-ordered prefix until each
source's budget is consumed). This is the same
distributed-vs-sequential equivalence contract as the PPJoin
brute-force test (test_ppjoin_property.py) — the filters there, the
partition arithmetic here."""

import hashlib
import random

import pytest


def _brute_force(rows, budget_pct=40):
    """rows: (doc_id, source, n_tokens). Sequential greedy reference."""
    by_src = {}
    for doc_id, src, n in rows:
        by_src.setdefault(src, []).append((doc_id, n))
    out = {}
    for src, docs in by_src.items():
        total = sum(n for _, n in docs)
        target = (total * budget_pct) // 100
        used = 0
        n_sel = 0
        tok_sel = 0
        for doc_id, n in sorted(
            docs, key=lambda d: (hashlib.md5(str(d[0]).encode()).hexdigest(), d[0])
        ):
            if used < target:
                n_sel += 1
                tok_sel += n
            used += n
        out[src] = (len(docs), n_sel, total, target, tok_sel)
    return out


@pytest.mark.parametrize("seed", [7, 41])
def test_token_budget_sample_matches_sequential_greedy(spark, tmp_path, seed):
    from goconnect_spark.queries.sampling import token_budget_sample

    rng = random.Random(seed)
    rows = []
    for doc_id in range(400):
        src = f"s{rng.randrange(5)}"
        n = rng.randrange(1, 120)
        rows.append((doc_id, src, n))
    # materialize as a documents table whose text has exactly n tokens
    df = spark.createDataFrame(
        [(d, s, " ".join(["w"] * n)) for d, s, n in rows],
        ["doc_id", "source", "text"],
    )
    d = str(tmp_path / "sf")
    df.write.mode("overwrite").parquet(d + "/documents.parquet")

    got = {
        r.source: (r.n_docs, r.n_selected, r.tokens_total, r.target_tokens, r.tokens_selected)
        for r in token_budget_sample(spark, d).collect()
    }
    assert got == _brute_force(rows)
