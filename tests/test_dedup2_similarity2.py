"""Property tests for the round-5 additions: asymmetric containment
join, minhash calibration, SQ8 coarse-scan re-rank, and quantization
residuals — each compared against an independent pure-Python
recompute on randomized synthetic corpora written as tmp sf dirs."""

import hashlib
import math
import random

import numpy as np
import pytest

from goconnect_spark.queries.dedup import _N_HASHES, _NGRAM_T

VOCAB = [f"w{i}" for i in range(30)]


def _shingles(text):
    w = text.split(" ")
    return {f"{a} {b}" for a, b in zip(w, w[1:])}


def _corpus_with_containments(seed: int, n_base: int = 25, n_contained: int = 8):
    """Base docs plus planted CONTAINED docs: contiguous slices of a
    base doc (slice shingles are a subset of the base's), sometimes
    with one mutated word so containment is high but < 1."""
    rng = random.Random(seed)
    docs = []
    for i in range(n_base):
        docs.append((i, " ".join(rng.choice(VOCAB) for _ in range(rng.randint(10, 40)))))
    for k in range(n_contained):
        _, text = docs[rng.randrange(n_base)]
        words = text.split(" ")
        lo = rng.randrange(max(1, len(words) - 8))
        hi = min(len(words), lo + rng.randint(6, 20))
        sl = words[lo:hi]
        if rng.random() < 0.4 and len(sl) > 4:
            sl[rng.randrange(len(sl))] = rng.choice(VOCAB)
        docs.append((1000 + k, " ".join(sl)))
    return docs


def _write_docs(spark, tmp_path, docs):
    df = spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    return str(tmp_path)


@pytest.mark.parametrize("seed", [3, 99])
def test_containment_matches_bruteforce(spark, tmp_path, seed):
    from goconnect_spark.queries.dedup2 import containment_dedup

    docs = _corpus_with_containments(seed)
    sf = _write_docs(spark, tmp_path, docs)
    got = {
        (r.doc_a, r.doc_b): (r.n_a, r.n_b, r.containment)
        for r in containment_dedup(spark, sf).collect()
    }
    sets = {i: _shingles(t) for i, t in docs if len(t.split(" ")) >= 2}
    want = {}
    for a in sets:
        for b in sets:
            if a == b:
                continue
            inter = len(sets[a] & sets[b])
            na = len(sets[a])
            if inter >= -(-4 * na // 5):  # ceil(0.8 * na)
                want[(a, b)] = (na, len(sets[b]), inter / na)
    assert set(got) == set(want), (
        f"seed {seed}: missing={set(want) - set(got)} extra={set(got) - set(want)}"
    )
    for pair, (na, nb, c) in want.items():
        gna, gnb, gc = got[pair]
        assert (gna, gnb) == (na, nb) and abs(gc - c) < 1e-12, (pair, got[pair], want[pair])
    # non-vacuous: the planted slices really produce directional pairs
    assert any(a >= 1000 or b >= 1000 for a, b in want)
    # and at least one is asymmetric (contained but not containing)
    assert any((b, a) not in want for a, b in want)


def _minhash_sig(shset):
    mins = [None] * _N_HASHES
    for sh in shset:
        hx = hashlib.md5(sh.encode()).hexdigest()
        h1 = int(hx[:12], 16)
        h2 = int(hx[12:24], 16) * 2 + 1
        for s in range(_N_HASHES):
            v = (h1 + s * h2) % 281474976710656
            if mins[s] is None or v < mins[s]:
                mins[s] = v
    return mins


def test_minhash_calibration_matches_python(spark, tmp_path):
    from goconnect_spark.queries.dedup import ngram_jaccard_pairs  # noqa: F401
    from goconnect_spark.queries.dedup2 import minhash_jaccard_calibration

    docs = _corpus_with_containments(17, n_base=20, n_contained=10)
    sf = _write_docs(spark, tmp_path, docs)
    got = {r.err_bucket: r for r in minhash_jaccard_calibration(spark, sf).collect()}

    sets = {i: _shingles(t) for i, t in docs if len(t.split(" ")) >= 2}
    sigs = {i: _minhash_sig(s) for i, s in sets.items()}
    # candidate pairs: any band (4 bands of 3) fully agreeing
    buckets = {}
    ids = sorted(sets)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            sa, sb = sigs[a], sigs[b]
            if not any(
                all(sa[k * 3 + j] == sb[k * 3 + j] for j in range(3)) for k in range(4)
            ):
                continue
            matches = sum(1 for s in range(_N_HASHES) if sa[s] == sb[s])
            inter = len(sets[a] & sets[b])
            uni = len(sets[a] | sets[b])
            est, true_j = matches / 12.0, inter / uni
            bk = math.floor(abs(est - true_j) * 12)
            n, m, i_, u = buckets.get(bk, (0, 0, 0, 0))
            buckets[bk] = (n + 1, m + matches, i_ + inter, u + uni)
    assert set(got) == set(buckets)
    for bk, (n, m, i_, u) in buckets.items():
        r = got[bk]
        assert (r.n_pairs, r.sum_matches, r.sum_inter, r.sum_union) == (n, m, i_, u), bk
        assert abs(r.mean_est - m / (12.0 * n)) < 1e-12
        assert abs(r.pooled_true - i_ / u) < 1e-12
    assert sum(n for n, *_ in buckets.values()) >= 5  # non-vacuous candidate set


def _write_embeddings(spark, tmp_path, seed: int, n: int = 80, dim: int = 8):
    rng = np.random.RandomState(seed)
    vecs = (rng.rand(n, dim).astype(np.float32) - 0.5).tolist()
    df = spark.createDataFrame(
        [(i, [float(v) for v in vecs[i]], i % 4) for i in range(n)],
        "vec_id long, embedding array<float>, label int",
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")
    return str(tmp_path), [np.asarray(v, dtype=np.float32) for v in vecs]


def test_ann_sq8_rerank_matches_python_two_stage(spark, tmp_path):
    """The SQ8 search is a deterministic algorithm (coarse int top-25
    by floor(x*100) dots, exact re-rank by floor(x*1e4) cosine):
    replicate both stages in Python and demand identical output."""
    from goconnect_spark.queries.similarity2 import _R_CAND, ann_sq8_rerank

    sf, vecs = _write_embeddings(spark, tmp_path, 5)
    got = [(r.probe_id, r.rk, r.vec_id, r.cosine) for r in ann_sq8_rerank(spark, sf).collect()]

    q = [[math.floor(float(np.float64(x)) * 10000) for x in v] for v in vecs]
    c = [[math.floor(float(np.float64(x)) * 100) for x in v] for v in vecs]
    nrm = [math.sqrt(float(sum(a * a for a in qv))) for qv in q]
    want = []
    for p in range(10):
        cdots = sorted(
            ((sum(a * b for a, b in zip(c[v], c[p])), v) for v in range(len(vecs)) if v != p),
            key=lambda t: (-t[0], t[1]),
        )[:_R_CAND]
        cos = sorted(
            (
                (float(sum(a * b for a, b in zip(q[v], q[p]))) / (nrm[v] * nrm[p]), v)
                for _, v in cdots
            ),
            key=lambda t: (-t[0], t[1]),
        )[:5]
        for rk, (cv, v) in enumerate(cos, 1):
            want.append((p, rk, v, cv))
    assert [(a, b, d) for a, b, d, _ in got] == [(a, b, d) for a, b, d, _ in want]
    for g, w in zip(got, want):
        assert abs(g[3] - w[3]) < 1e-12, (g, w)


def test_prefix_bound_integer_formula_property():
    """The integer prefix bound n - ceil(t*n) + 1 (ranked_prefix_for)
    must equal the exact rational formula for EVERY n, and the old
    float formula floor((1-t)*n)+1 must never EXCEED it (it
    under-counts at t*n integral — the round-5 recall bug). Pure
    math, no Spark: hypothesis sweeps n."""
    from fractions import Fraction

    from hypothesis import given
    from hypothesis import strategies as st

    t = Fraction(4, 5)

    @given(st.integers(min_value=1, max_value=10**9))
    def check(n):
        exact = n - (-(-t.numerator * n // t.denominator)) + 1
        integer_impl = n - (t.numerator * n + t.denominator - 1) // t.denominator + 1
        float_impl = int((1.0 - 0.8) * n) + 1
        assert integer_impl == exact
        assert float_impl <= exact  # old formula is the lossy one
        if n % 5 == 0:
            assert float_impl == exact - 1  # and exactly here it loses

    check()


def test_fingerprint_collision_finds_planted_passage(spark, tmp_path):
    """Two docs sharing a long verbatim passage (with different
    surrounding text) must rank first in the collision report even
    though word-level Jaccard between them is low — the char-level
    detector's reason to exist."""
    from goconnect_spark.queries.dedup2 import fingerprint_collision_dedup

    rng = random.Random(21)
    # distinct vocabularies so background docs share few fingerprints
    voc = lambda p: [f"{p}{i}" for i in range(25)]  # noqa: E731
    passage = " ".join(rng.choice(voc("shared")) for _ in range(30))
    docs = [
        (0, " ".join(rng.choice(voc("aa")) for _ in range(40)) + " " + passage),
        (1, passage + " " + " ".join(rng.choice(voc("bb")) for _ in range(40))),
    ]
    for i in range(2, 20):
        docs.append((i, " ".join(rng.choice(voc(f"x{i}")) for _ in range(60))))
    sf = _write_docs(spark, tmp_path, docs)
    rows = fingerprint_collision_dedup(spark, sf).collect()
    assert rows, "no collisions found at all"
    top = rows[0]
    assert (top.doc_a, top.doc_b) == (0, 1)
    assert top.sim > 0.2 and top.shared_fps >= 10


def test_hourly_autocorr_matches_python(spark, tmp_path):
    """Synthetic events with a deliberate daily cycle plus gaps: the
    lag-1/lag-24 Pearson r must equal a plain-Python recompute over
    integer moments, and a constant sub-series must yield NULL (zero
    variance), not a crash or a fake 1.0."""
    import datetime

    from goconnect_spark.queries.events_series import hourly_count_autocorr

    base = datetime.datetime(2025, 1, 1)
    rows = []
    counts = {}
    eid = 0
    rng = random.Random(7)
    for h in range(120):
        if h % 17 == 3:
            continue  # gap hours
        c = 5 + (h % 24) + rng.randrange(3)
        counts[h] = c
        for _ in range(c):
            rows.append((eid, base + datetime.timedelta(hours=h, minutes=1), 1, "view", 1.0, "{}"))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    got = {r.lag_hours: r for r in hourly_count_autocorr(spark, str(tmp_path)).collect()}
    for k in (1, 24):
        xs = [(counts[h], counts[h + k]) for h in counts if h + k in counts]
        n = len(xs)
        sx = sum(x for x, _ in xs); sy = sum(y for _, y in xs)
        sxx = sum(x * x for x, _ in xs); syy = sum(y * y for _, y in xs)
        sxy = sum(x * y for x, y in xs)
        num = n * sxy - sx * sy
        r = got[k]
        assert r.n_pairs == n and r.cov_num == num
        want = num / (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
        assert abs(r.autocorr - want) < 1e-12
    assert got[24].autocorr > 0.5  # the planted daily cycle is detected


def test_dim_covariance_matches_python(spark, tmp_path):
    """Planted correlated dimension pair (dim1 = dim0 + small noise)
    must rank first, with integer moments equal to a Python
    recompute."""
    from goconnect_spark.queries.similarity2 import embedding_dim_covariance

    rng = np.random.RandomState(3)
    n, dim = 60, 6
    m = (rng.rand(n, dim) - 0.5).astype(np.float32)
    m[:, 1] = (m[:, 0] + 0.01 * (rng.rand(n).astype(np.float32) - 0.5)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(v) for v in m[i]], 0) for i in range(n)],
        "vec_id long, embedding array<float>, label int",
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")
    got = embedding_dim_covariance(spark, str(tmp_path)).collect()
    q = [[math.floor(float(np.float64(x)) * 10000) for x in row] for row in m]
    want = {}
    for i in range(dim):
        for j in range(i + 1, dim):
            sx = sum(r[i] for r in q); sy = sum(r[j] for r in q)
            sxx = sum(r[i] ** 2 for r in q); syy = sum(r[j] ** 2 for r in q)
            sxy = sum(r[i] * r[j] for r in q)
            num = n * sxy - sx * sy
            want[(i, j)] = (
                num,
                num / (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy)),
            )
    order = sorted(want, key=lambda p: (-abs(want[p][0]), p))
    assert [(r.d_i, r.d_j) for r in got] == order[: len(got)]
    assert (got[0].d_i, got[0].d_j) == (0, 1) and got[0].corr > 0.99
    for r in got:
        assert r.cov_num == want[(r.d_i, r.d_j)][0]
        assert abs(r.corr - want[(r.d_i, r.d_j)][1]) < 1e-12


def test_quantization_error_matches_python(spark, tmp_path):
    from goconnect_spark.queries.similarity2 import embedding_quantization_error

    sf, vecs = _write_embeddings(spark, tmp_path, 11, n=40, dim=6)
    got = {r.label: r for r in embedding_quantization_error(spark, sf).collect()}
    per_label = {}
    for i, v in enumerate(vecs):
        sse = 0
        for x in v:
            xd = float(np.float64(x))
            r = math.floor(xd * 10000) - 100 * math.floor(xd * 100)
            assert 0 <= r <= 99
            sse += r * r
        n, tot, mx, dims = per_label.get(i % 4, (0, 0, 0, 0))
        per_label[i % 4] = (n + 1, tot + sse, max(mx, sse), dims + len(v))
    assert set(got) == set(per_label)
    for lb, (n, tot, mx, dims) in per_label.items():
        r = got[lb]
        assert (r.n_vecs, r.total_sse, r.max_sse, r.total_dims) == (n, tot, mx, dims)
        assert abs(r.mean_sse - tot / n) < 1e-9
        assert abs(r.rms_residual - math.sqrt(tot / dims)) < 1e-12


def test_quality_keepers_wide_vocab_no_int_overflow(spark, tmp_path):
    # Regression: ttr_fp = distinct_tokens * 1e6 must widen to BIGINT
    # BEFORE the multiply — size() is 32-bit, and a doc with >2147
    # distinct tokens used to overflow (ANSI ArithmeticException; wrong
    # keeper with ANSI off). Two near-dup docs with 3000-token vocab:
    # the query must run and elect the higher-TTR doc.
    from goconnect_spark.queries.dedup import dedup_quality_keepers

    words = " ".join(f"tok{i}" for i in range(3000))
    docs = [
        (0, words, "en", "src0", len(words)),
        # near-dup of doc 0 (one word mutated) with one REPEATED token
        # appended -> strictly lower type-token ratio than doc 0
        (1, words.replace("tok7 ", "tokX ") + " tok0 tok0", "en", "src0", 0),
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{sf}/documents.parquet")
    rows = dedup_quality_keepers(spark, sf).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.component_size == 2
    assert r.quality_keeper == 0  # higher TTR wins
    assert r.keeper_ttr_fp == 1_000_000  # 3000 distinct / 3000 tokens
