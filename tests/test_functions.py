"""Unit tests for the reusable functions layer (text/vector/serde)."""

import math

import pyspark.sql.functions as F
import pytest

from goconnect_spark.functions import serde, text, vector


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy cat"),
        (2, "completely different content here entirely"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_tokens_and_shingles(docs):
    t = text.tokens(docs).groupBy("doc_id").count().collect()
    assert {r.doc_id: r["count"] for r in t} == {0: 9, 1: 9, 2: 5}
    sh = text.word_shingles(docs, n=2)
    n0 = sh.where("doc_id = 0").count()
    assert n0 == 8  # 9 words -> 8 bigrams, all distinct here


def test_minhash_similar_docs_share_bands(docs):
    sh = text.word_shingles(docs, n=2)
    sig = text.minhash_signature(sh, n_hashes=12)
    bands = text.lsh_band_keys(sig, band_size=3)
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(b, ["band", "band_key"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("x"), F.col("b.doc_id").alias("y"))
        .distinct()
        .collect()
    )
    pairs = {(r.x, r.y) for r in cand}
    assert (0, 1) in pairs  # near-dups collide
    assert (0, 2) not in pairs and (1, 2) not in pairs


def test_jaccard_pairs_exact(spark, docs):
    sh = text.word_shingles(docs, n=2)
    cand = spark.createDataFrame([(0, 1), (0, 2)], "doc_a long, doc_b long")
    out = {(r.doc_a, r.doc_b): r.jaccard for r in text.jaccard_pairs(sh, cand).collect()}
    # docs 0/1 share 7 of 9 distinct bigrams -> 7/9
    assert abs(out[(0, 1)] - 7 / 9) < 1e-12
    assert (0, 2) not in out  # zero intersection drops out


def test_simhash_distance_orders_similarity(spark, docs):
    freqs = text.tokens(docs).groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("f"))
    sims = {r.doc_id: r.simhash for r in text.simhash(freqs, bits=32).collect()}
    d01 = bin(sims[0] ^ sims[1]).count("1")
    d02 = bin(sims[0] ^ sims[2]).count("1")
    assert d01 < d02  # near-dups closer than unrelated docs
    assert 0 <= sims[0] < 2**32


def test_vector_cosine(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0], [1.0, 0.0, 0.0]), (2, [1.0, 0.0, 0.0], [0.0, 1.0, 0.0])],
        "id long, a array<double>, b array<double>",
    )
    out = {r.id: r.c for r in df.select("id", vector.cosine_sim(F.col("a"), F.col("b")).alias("c")).collect()}
    assert abs(out[1] - 1.0) < 1e-12 and abs(out[2]) < 1e-12


def test_brute_force_topk(spark):
    import random

    rnd = random.Random(7)
    rows = [(i, [rnd.uniform(-1, 1) for _ in range(16)]) for i in range(50)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    quant = vector.quantize(emb)
    probes = spark.createDataFrame([(0,)], "vec_id long")
    top = vector.brute_force_topk(quant, probes, k=3).collect()
    assert len(top) == 3 and all(r.probe_id == 0 and r.vec_id != 0 for r in top)
    # exact check vs python
    def cos(a, b):
        qa = [math.floor(x * 10000) for x in a]
        qb = [math.floor(x * 10000) for x in b]
        dot = sum(x * y for x, y in zip(qa, qb))
        na = math.sqrt(sum(x * x for x in qa))
        nb = math.sqrt(sum(x * x for x in qb))
        return dot / (na * nb)

    import numpy as np

    a0 = [float(np.float32(v)) for v in rows[0][1]]
    best = max(
        ((j, cos(a0, [float(np.float32(v)) for v in rows[j][1]])) for j in range(1, 50)),
        key=lambda t: t[1],
    )
    assert top[0].vec_id == best[0]


def test_sr_wire_format_roundtrip(spark):
    payload = b"\x01\x02\x03\x04"
    df = spark.createDataFrame([(bytearray(payload),)], "body binary")
    wired = df.select(serde.sr_prepend_header(F.col("body"), 1234).alias("v"))
    out = wired.select(
        serde.sr_schema_id(F.col("v")).alias("sid"),
        serde.sr_strip_header(F.col("v")).alias("body"),
        F.length("v").alias("n"),
    ).collect()[0]
    assert out.sid == 1234
    assert bytes(out.body) == payload
    assert out.n == len(payload) + 5


def test_xml_decode_attributes(spark):
    df = spark.createDataFrame(
        [('<r><item mode="fast"><file>x.txt</file></item></r>',)], "xml string"
    )
    parsed = df.select(
        serde.xml_decode(F.col("xml"), "item STRUCT<_mode: STRING, file: STRING>").alias("d")
    ).collect()[0]
    assert parsed.d.item._mode == "fast" and parsed.d.item.file == "x.txt"


def test_json_roundtrip(spark):
    df = spark.createDataFrame([(1, "a")], "id long, s string")
    out = (
        df.select(serde.json_encode(F.struct("id", "s")).alias("j"))
        .select(serde.json_decode(F.col("j"), "id LONG, s STRING").alias("d"))
        .collect()[0]
    )
    assert out.d.id == 1 and out.d.s == "a"


def test_xml_encode_roundtrip(spark):
    df = spark.createDataFrame([(1, "fast")], "id long, mode string")
    xml = df.select(serde.xml_encode(F.struct("id", "mode"), row_tag="item").alias("x"))
    s = xml.collect()[0].x
    assert "<item>" in s and "<mode>fast</mode>" in s
    back = xml.select(serde.xml_decode(F.col("x"), "id BIGINT, mode STRING").alias("d")).collect()[0]
    assert back.d.id == 1 and back.d.mode == "fast"


def test_xml_nodes_full_tree(spark):
    """Node-type parity with the reference's coder/xml/node.go:35-72:
    Root/Tag/Text/Comment/ProcInst/Directive all surface, preorder,
    with the accessor partition (tag+attrs vs text vs comment vs
    target+inst vs directive) and NULL for malformed input."""
    doc = (
        '<?xml version="1.0"?><!DOCTYPE note>'
        '<root a="1"><!--hi--><child>txt<?php echo?></child>tail</root>'
    )
    df = spark.createDataFrame([(doc,), (None,), ("<bad",)], "xml string")
    rows = df.select(serde.xml_nodes()(F.col("xml")).alias("n")).collect()
    nodes = rows[0].n
    types = [n.type for n in nodes]
    assert types == ["root", "directive", "tag", "comment", "tag", "text", "procinst", "text"]
    assert nodes[0].parent_id == -1
    root_tag = nodes[2]
    assert root_tag.tag == "root" and root_tag.attrs == {"a": "1"}
    assert nodes[1].directive == "DOCTYPE note"
    assert nodes[3].comment == "hi" and nodes[3].parent_id == root_tag.node_id
    child = nodes[4]
    assert (nodes[5].text, nodes[5].parent_id) == ("txt", child.node_id)
    assert (nodes[6].target, nodes[6].inst) == ("php", "echo")
    assert (nodes[7].text, nodes[7].parent_id) == ("tail", root_tag.node_id)
    # non-matching accessors stay NULL, like the reference's empty returns
    assert nodes[5].tag is None and root_tag.text is None
    # PERMISSIVE: null in, malformed in -> NULL out
    assert rows[1].n is None and rows[2].n is None


def test_minhash_estimates_jaccard(spark):
    # statistical validation: the banded-minhash signature agreement
    # rate approximates the true Jaccard within sampling error
    import random

    rnd = random.Random(11)
    vocab = [f"w{i}" for i in range(200)]
    base = rnd.sample(vocab, 80)
    rows = []
    for d in range(20):
        # each doc shares ~75% of the base set plus its own tail
        words = [w for w in base if rnd.random() < 0.75] + rnd.sample(vocab, 20)
        rows.append((d, " ".join(words)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sh = text.word_shingles(docs, n=1)
    sig = text.minhash_signature(sh, n_hashes=24)
    import pyspark.sql.functions as FF

    wide = sig.groupBy("doc_id").pivot("seed", list(range(24))).agg(FF.first("mh"))
    a = wide.where("doc_id = 0").collect()[0]
    b = wide.where("doc_id = 1").collect()[0]
    agree = sum(1 for s in range(24) if a[str(s)] == b[str(s)]) / 24
    true_j = (
        text.jaccard_pairs(sh, spark.createDataFrame([(0, 1)], "doc_a long, doc_b long"))
        .collect()[0]
        .jaccard
    )
    assert abs(agree - true_j) < 0.25  # 24 samples -> wide but real bound


def test_grouping_sets_null_key_not_conflated_with_rollup(spark, tmp_path):
    # orders_grouping_sets uses GROUPING() markers: a genuine NULL
    # group value must stay NULL (distinct from the 'ALL' subtotal
    # rows), and the aggregate values must match DuckDB running the
    # oracle SQL on the same NULL-bearing data.
    import duckdb

    from goconnect_spark.queries.relational import (
        _GROUPING_SETS_SQL,
        orders_grouping_sets,
    )

    rows = [
        ("O", "1-URGENT", "10.00"),
        ("O", None, "20.00"),
        (None, "1-URGENT", "40.00"),
        (None, None, "80.00"),
        ("F", "2-HIGH", "160.00"),
    ]
    df = spark.createDataFrame(
        [(i, s, p, float(v)) for i, (s, p, v) in enumerate(rows)],
        "o_orderkey long, o_orderstatus string, o_orderpriority string, o_totalprice double",
    )
    sf = str(tmp_path)
    df.coalesce(1).write.mode("overwrite").parquet(f"{sf}/orders.parquet")

    got = orders_grouping_sets(spark, sf).collect()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM read_parquet('{sf}/orders.parquet/*.parquet')"
    )
    want = con.execute(_GROUPING_SETS_SQL).fetchall()

    norm = lambda rs: sorted(
        ((r[0] or "", r[1] or "", r[0] is None, r[1] is None, int(r[2]), round(float(r[3]), 6)) for r in rs)
    )
    assert norm(got) == norm(want)
    # the NULL-status group and the 'ALL' rollup are separate rows
    statuses = [r[0] for r in got]
    assert None in statuses and "ALL" in statuses
    null_detail = [r for r in got if r[0] is None and r[1] == "1-URGENT"]
    assert null_detail and null_detail[0][2] == 1


def test_winnowing_inrow_matches_reference_impl(spark):
    """Property test guarding the in-row winnowing rewrite
    (text.doc_fingerprint): for random strings, the array-expression
    pipeline must equal an independent pure-Python winnowing
    (k=8 shingle md5, w=4 window-min, distinct)."""
    import hashlib
    import random

    rng = random.Random(42)
    alphabet = "ab cd"
    docs = [
        (i, "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 60))))
        for i in range(40)
    ]

    def winnow(text, k=8, w=4):
        n = max(len(text) - (k - 1), 1)
        hs = [hashlib.md5(text[i:i + k].encode()).hexdigest() for i in range(n)]
        wmins = [min(hs[i:i + w]) for i in range(n)]
        fps = sorted(set(wmins))
        return len(fps), min(fps)

    import pandas as pd

    sf = spark.createDataFrame(pd.DataFrame(docs, columns=["doc_id", "text"]))
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        sf.write.parquet(f"{d}/documents.parquet")
        from goconnect_spark.queries.text import doc_fingerprint

        out = {r.doc_id: (r.n_fingerprints, r.min_fingerprint)
               for r in doc_fingerprint(spark, d).collect()}
    for i, text in docs:
        assert out[i] == winnow(text), (i, repr(text))
