"""PPJoin losslessness: the prefix + length + positional filters must
never drop a true pair. Randomized corpora are built to contain real
near-duplicates (mutated copies), and the full pipeline's output is
compared pair-for-pair against a brute-force all-pairs Jaccard
computed in plain Python."""

import random

import pytest

from goconnect_spark.queries.dedup import _NGRAM_T, ngram_jaccard_pairs

VOCAB = [f"w{i}" for i in range(30)]


def _corpus(seed: int, n_base: int = 30, n_dups: int = 10):
    rng = random.Random(seed)
    docs = []
    for i in range(n_base):
        docs.append((i, " ".join(rng.choice(VOCAB) for _ in range(rng.randint(8, 40)))))
    # planted near-dups: copy a base doc and mutate 0-2 words
    for k in range(n_dups):
        base_id, text = docs[rng.randrange(n_base)]
        words = text.split(" ")
        for _ in range(rng.randint(0, 2)):
            words[rng.randrange(len(words))] = rng.choice(VOCAB)
        docs.append((1000 + k, " ".join(words)))
    return docs


def _brute_force(docs):
    def shingles(text):
        w = text.split(" ")
        return {f"{a} {b}" for a, b in zip(w, w[1:])}

    sets = {i: shingles(t) for i, t in docs if len(t.split(" ")) >= 2}
    out = {}
    ids = sorted(sets)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            if union and inter / union >= _NGRAM_T:
                out[(a, b)] = inter / union
    return out


@pytest.mark.parametrize("seed", [7, 42, 1234])
def test_ppjoin_matches_bruteforce(spark, seed):
    docs = _corpus(seed)
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {(r.doc_a, r.doc_b): r.jaccard for r in ngram_jaccard_pairs(df).collect()}
    want = _brute_force(docs)
    assert set(got) == set(want), (
        f"seed {seed}: missing={set(want) - set(got)} extra={set(got) - set(want)}"
    )
    for pair, j in want.items():
        assert abs(got[pair] - j) < 1e-9, (pair, got[pair], j)
    # the corpora genuinely contain near-dups — the test isn't vacuous
    assert len(want) >= 3, f"seed {seed} produced only {len(want)} true pairs"
