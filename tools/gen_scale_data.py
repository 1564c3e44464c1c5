"""Deterministic synthetic dataset generator for LARGER scale factors.

The driver ships read-only sf0.001/0.01/0.1 under /root/testdata
(TESTDATA.md); round 14's core finding (VERDICT r14 item 1 / the
8-core scaling audit) is that sf0.1 is FIXED-OVERHEAD-BOUND on a
32-thread box — per-query walls measure scheduler and micro-batch
machinery, not data work, so further optimization at that SF measures
noise. This tool emits the same star schema at sf1+ so the hot
operator families can be measured at a data-dominated scale point.

Distribution fidelity: every marginal was fitted against the shipped
sf0.1 tables (tools/bench_captures/r15_sf1_fit.md records the
comparison) — iid uniforms over the observed domains, the events
value exponential(mean 50), unit-norm 64-d Gaussian embeddings, the
31-word document vocabulary with the rare 'dup' token and planted
exact-duplicate text pairs at the observed ~0.32% row rate. Row
counts extrapolate the shipped SF ladder (linear for the TPC-H
tables + events/documents, the embeddings table's observed x4 per
decade).

This is a MEASUREMENT tool only: nothing in the engine or bench path
reads its output unless $SPARK_GRAFT_SF_DIR points at it explicitly.
Seeded numpy; byte-identical output for a given (sf, seed).

Usage: python tools/gen_scale_data.py SF OUT_DIR [--seed 42]
e.g.:  python tools/gen_scale_data.py 1 /root/sfdata/sf1
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REF = "/root/testdata/sf0.1"  # fixed dims (region, nation) copied verbatim

VOCAB = [
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "data", "small", "join", "filter", "big", "group", "hash",
    "customer", "sort", "order", "slow", "line", "part", "fast", "row",
    "the", "agg", "key", "query", "a", "scan", "batch",
]
DUP_TOKEN_RATE = 0.00094  # 'dup' token frequency observed at sf0.1
DOC_DUP_ROW_RATE = 0.0032  # planted exact-duplicate text rows
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_W = [0.41, 0.15, 0.15, 0.15, 0.14]
SEGMENTS = ["MACHINERY", "AUTOMOBILE", "HOUSEHOLD", "BUILDING", "FURNITURE"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
P_ADJ = ["blue", "cold", "hot", "large", "new", "old", "red", "small"]
P_NOUN = ["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget"]
P_TYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
EVENT_TYPES = ["signup", "purchase", "view", "click", "error"]

US_PER_DAY = 86_400_000_000


def _ts_us(date: str) -> int:
    return int(np.datetime64(date, "us").astype("int64"))


def _write(out_dir: str, name: str, table: pa.Table, row_group_rows: int) -> None:
    path = os.path.join(out_dir, f"{name}.parquet")
    pq.write_table(table, path, row_group_size=row_group_rows)
    meta = pq.ParquetFile(path).metadata
    print(f"{name}: {meta.num_rows} rows, {meta.num_row_groups} row groups, "
          f"{os.path.getsize(path) / 1e6:.1f} MB")


def _counts(sf: float) -> dict[str, int]:
    return {
        "customer": int(150_000 * sf),
        "supplier": int(10_000 * sf),
        "part": int(200_000 * sf),
        "orders": int(1_500_000 * sf),
        "lineitem": int(6_000_000 * sf),
        "events": int(1_000_000 * sf),
        "users": int(15_000 * sf),
        # documents: 500 @ sf0.01 -> 5000 @ sf0.1 (x10/decade)
        "documents": int(50_000 * sf),
        # embeddings: 500 @ sf0.01 -> 2000 @ sf0.1 (x4/decade)
        "embeddings": int(2000 * (4 ** np.log10(sf / 0.1)) + 0.5),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf", type=float)
    ap.add_argument("out_dir")
    ap.add_argument("--seed", type=int, default=42)
    ns = ap.parse_args()
    os.makedirs(ns.out_dir, exist_ok=True)
    n = _counts(ns.sf)

    # fixed dims copied from the shipped reference data
    for name in ("region", "nation"):
        t = pq.read_table(os.path.join(REF, f"{name}.parquet"))
        _write(ns.out_dir, name, t, max(t.num_rows, 1))

    rng = np.random.default_rng(ns.seed)

    # customer
    k = np.arange(n["customer"], dtype=np.int64)
    _write(ns.out_dir, "customer", pa.table({
        "c_custkey": k,
        "c_name": [f"Customer#{i:09d}" for i in k],
        "c_nationkey": rng.integers(0, 25, n["customer"]).astype(np.int32),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, n["customer"]), 2),
        "c_mktsegment": np.array(SEGMENTS)[rng.integers(0, 5, n["customer"])],
    }), 1 << 19)

    # supplier
    k = np.arange(n["supplier"], dtype=np.int64)
    _write(ns.out_dir, "supplier", pa.table({
        "s_suppkey": k,
        "s_name": [f"Supplier#{i:09d}" for i in k],
        "s_nationkey": rng.integers(0, 25, n["supplier"]).astype(np.int32),
        "s_acctbal": np.round(rng.uniform(-1000, 10000, n["supplier"]), 2),
    }), 1 << 19)

    # part
    k = np.arange(n["part"], dtype=np.int64)
    adj = np.array(P_ADJ)[rng.integers(0, len(P_ADJ), n["part"])]
    noun = np.array(P_NOUN)[rng.integers(0, len(P_NOUN), n["part"])]
    _write(ns.out_dir, "part", pa.table({
        "p_partkey": k,
        "p_name": np.char.add(np.char.add(adj, " "), noun),
        "p_brand": np.array([f"Brand#{i}" for i in range(1, 26)])[
            rng.integers(0, 25, n["part"])],
        "p_type": np.array(P_TYPES)[rng.integers(0, len(P_TYPES), n["part"])],
        "p_size": rng.integers(1, 51, n["part"]).astype(np.int32),
        "p_retailprice": np.round(rng.uniform(900, 1000, n["part"]), 2),
    }), 1 << 19)

    # orders: dates uniform 1995-01-01 .. 2001-08-01 (day grain)
    k = np.arange(n["orders"], dtype=np.int64)
    d0, d1 = _ts_us("1995-01-01"), _ts_us("2001-08-01")
    odays = rng.integers(0, (d1 - d0) // US_PER_DAY + 1, n["orders"])
    _write(ns.out_dir, "orders", pa.table({
        "o_orderkey": k,
        "o_custkey": rng.integers(0, n["customer"], n["orders"]),
        "o_orderstatus": np.array(["P", "O", "F"])[rng.integers(0, 3, n["orders"])],
        "o_totalprice": np.round(rng.uniform(1000, 500000, n["orders"]), 2),
        "o_orderdate": pa.array(d0 + odays * US_PER_DAY,
                                type=pa.timestamp("us")),
        "o_orderpriority": np.array(PRIORITIES)[rng.integers(0, 5, n["orders"])],
    }), 1 << 19)

    # lineitem: iid rows (orderkey uniform — matches the observed
    # 1-e^-4 distinct-order coverage), shipdate iid over its own range
    m = n["lineitem"]
    s0, s1 = _ts_us("1995-01-02"), _ts_us("2001-11-04")
    sdays = rng.integers(0, (s1 - s0) // US_PER_DAY + 1, m)
    _write(ns.out_dir, "lineitem", pa.table({
        "l_orderkey": rng.integers(0, n["orders"], m),
        "l_partkey": rng.integers(0, n["part"], m),
        "l_suppkey": rng.integers(0, n["supplier"], m),
        "l_linenumber": rng.integers(1, 8, m).astype(np.int32),
        "l_quantity": rng.integers(1, 51, m).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 105000, m), 2),
        "l_discount": np.round(rng.integers(0, 11, m) * 0.01, 2),
        "l_tax": np.round(rng.integers(0, 9, m) * 0.01, 2),
        "l_returnflag": np.array(["N", "R", "A"])[rng.integers(0, 3, m)],
        "l_linestatus": np.array(["F", "O"])[rng.integers(0, 2, m)],
        "l_shipdate": pa.array(s0 + sdays * US_PER_DAY, type=pa.timestamp("us")),
    }), 1 << 19)

    # events: Jan 2024, exponential(50) values, {"k": 0..99} props
    m = n["events"]
    t0, t1 = _ts_us("2024-01-01"), _ts_us("2024-01-31")
    props_k = rng.integers(0, 100, m)
    _write(ns.out_dir, "events", pa.table({
        "event_id": np.arange(m, dtype=np.int64),
        "ts": pa.array(np.sort(rng.integers(t0, t1, m)), type=pa.timestamp("us")),
        "user_id": rng.integers(0, n["users"], m),
        "event_type": np.array(EVENT_TYPES)[rng.integers(0, 5, m)],
        "value": np.round(rng.exponential(50.0, m), 2),
        "props": [f'{{"k": {v}}}' for v in props_k],
    }), 1 << 19)

    # documents: iid words from the 30-word vocab (+ rare 'dup'),
    # uniform 10..100 words, planted exact-duplicate pairs
    m = n["documents"]
    lens = rng.integers(10, 101, m)
    words = np.array(VOCAB + ["dup"])
    w = np.full(len(words), (1.0 - DUP_TOKEN_RATE) / len(VOCAB))
    w[-1] = DUP_TOKEN_RATE
    texts = [
        " ".join(words[rng.choice(len(words), size=ln, p=w)]) for ln in lens
    ]
    n_dup = int(m * DOC_DUP_ROW_RATE / 2)
    src_idx = rng.integers(0, m, n_dup)
    dst_idx = rng.integers(0, m, n_dup)
    for si, di in zip(src_idx, dst_idx):
        if si != di:
            texts[di] = texts[si]
    _write(ns.out_dir, "documents", pa.table({
        "doc_id": np.arange(m, dtype=np.int64),
        "text": texts,
        "lang": np.array(LANGS)[rng.choice(len(LANGS), size=m, p=LANG_W)],
        "source": np.array([f"src{i}" for i in range(20)])[
            rng.integers(0, 20, m)],
        "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
    }), 1 << 16)

    # embeddings: unit-norm 64-d float32, labels 0..9
    m = n["embeddings"]
    vecs = rng.standard_normal((m, 64)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    _write(ns.out_dir, "embeddings", pa.table({
        "vec_id": np.arange(m, dtype=np.int64),
        "embedding": pa.array(list(vecs), type=pa.list_(pa.float32())),
        "label": rng.integers(0, 10, m).astype(np.int32),
    }), 1 << 14)

    with open(os.path.join(ns.out_dir, "GENERATED.json"), "w") as f:
        json.dump({"sf": ns.sf, "seed": ns.seed, "tool": "tools/gen_scale_data.py"}, f)


if __name__ == "__main__":
    main()
