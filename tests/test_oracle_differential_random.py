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
]

LANGS = ["en", "de", "fr", "es", "zh"]


def _random_corpus(seed: int, n: int = 60):
    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(40)]
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
