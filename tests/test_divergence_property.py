"""Property test for source_divergence_tv: on randomized corpora the
distributed no-grid formulation (present-word integer cross products
plus the algebraically recovered absent-word mass) must equal a
sequential reference that materializes the full source x vocab grid
and sums |p - q| directly. Matching through the same double
arithmetic keeps the equality exact, not approximate."""

import random

import pytest

from goconnect_spark.queries.text2 import source_divergence_tv

_VOCAB = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]


def _brute_force(docs):
    """docs: (doc_id, source, text). Full-grid TV per source, computed
    with the same float expression shape as the query's final select:
    0.5 * (A/(n_s*n) + (n - B)/n)."""
    src_counts, corpus_counts = {}, {}
    for _, src, text in docs:
        for w in text.split(" "):
            src_counts.setdefault(src, {})
            src_counts[src][w] = src_counts[src].get(w, 0) + 1
            corpus_counts[w] = corpus_counts.get(w, 0) + 1
    n = sum(corpus_counts.values())
    out = {}
    for src, counts in src_counts.items():
        n_s = sum(counts.values())
        a = sum(
            abs(c_sw * n - corpus_counts[w] * n_s) for w, c_sw in counts.items()
        )
        b = sum(corpus_counts[w] for w in counts)
        tv = 0.5 * (float(a) / (float(n_s) * float(n)) + float(n - b) / float(n))
        out[src] = (n_s, len(counts), tv)
    return out


@pytest.mark.parametrize("seed", [5, 23])
def test_tv_divergence_matches_full_grid_reference(spark, tmp_path, seed):
    rng = random.Random(seed)
    docs = []
    for i in range(60):
        src = f"s{rng.randrange(4)}"
        # skewed per-source vocabularies so the distances are nonzero
        hi = rng.randrange(len(_VOCAB))
        words = [
            _VOCAB[hi] if rng.random() < 0.4 else rng.choice(_VOCAB)
            for _ in range(rng.randrange(3, 12))
        ]
        docs.append((i, src, " ".join(words)))
    sf_dir = str(tmp_path / f"tv{seed}")
    spark.createDataFrame(
        [(d, s, t, None, len(t)) for d, s, t in docs],
        "doc_id: long, source: string, text: string, lang: string, n_chars: long",
    ).write.parquet(f"{sf_dir}/documents.parquet")

    got = {
        r.source: (r.n_tokens, r.n_vocab_present, r.tv_dist)
        for r in source_divergence_tv(spark, sf_dir).collect()
    }
    want = _brute_force(docs)
    assert set(got) == set(want)
    for src in want:
        assert got[src] == want[src], (src, got[src], want[src])
        assert 0.0 <= got[src][2] <= 1.0
