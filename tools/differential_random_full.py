"""Full-catalog randomized oracle differential.

Generates a COMPLETE random dataset (star schema + events + documents
+ embeddings, with the planted hazards from
tests/test_oracle_differential_random.py) into a temp dir, then runs
EVERY catalog query on Spark AND its DuckDB oracle and hash-compares —
the driver's correctness gate on data no sf dir ever contained.

Run: python tools/differential_random_full.py [seed ...]   (default 1)
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests")
)


def _write_pathological(spark, tmp: str) -> None:
    """Degenerate everything: identical docs + empty/one-char docs,
    constant-value same-timestamp events from one user, identical
    embeddings, a star schema with one customer, childless orders,
    constant part sizes and zero discounts. Queries may return empty
    or NULL-bearing results but must not crash and must still match
    their oracles."""
    import datetime

    docs = (
        [(i, "alpha beta gamma alpha beta", "en", "src0", 27) for i in range(10)]
        + [(10, "", "en", "src0", 0), (11, "x", "de", "src1", 1), (12, "ab", "fr", "src1", 2)]
    )
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
    vec = [0.1] * 64
    spark.createDataFrame(
        [(i, vec, 0) for i in range(5)],
        "vec_id long, embedding array<float>, label int",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/embeddings.parquet")
    ts = datetime.datetime(2024, 1, 1, 12, 0, 0)
    spark.createDataFrame(
        [(i, ts, 1, "view", 10.0, '{"k": 1}') for i in range(20)],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/events.parquet")
    spark.createDataFrame(
        [(0, "AFRICA")], "r_regionkey int, r_name string"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/region.parquet")
    spark.createDataFrame(
        [(0, "NATION0", 0)], "n_nationkey int, n_name string, n_regionkey int"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/nation.parquet")
    spark.createDataFrame(
        [(0, "Customer#0", 0, 0.0, "BUILDING")],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, c_mktsegment string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/customer.parquet")
    spark.createDataFrame(
        [(0, "Supplier#0", 0, 0.0)],
        "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/supplier.parquet")
    spark.createDataFrame(
        [(i, f"part {i}", "Brand#1", "PROMO", 7, 100.0) for i in range(3)],
        "p_partkey long, p_name string, p_brand string, p_type string, p_size int, p_retailprice double",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/part.parquet")
    od = datetime.datetime(1995, 6, 1)
    spark.createDataFrame(
        [(0, 0, "O", 100.0, od, "1-URGENT"), (1, 0, "F", 100.0, od, "5-LOW")],
        "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/orders.parquet")
    spark.createDataFrame(
        [(0, 0, 0, 1, 1.0, 100.0, 0.0, 0.0, "N", "O", od + datetime.timedelta(days=10))],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, l_quantity double, l_extendedprice double, l_discount double, l_tax double, l_returnflag string, l_linestatus string, l_shipdate timestamp",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/lineitem.parquet")


def run_seed(spark, seed: int) -> list:
    import duckdb
    import test_oracle_differential_random as gen

    import goconnect_spark.queries as Q
    from tools.verify_local import _hash_rows, _norm

    qs, oracles = {}, {}
    for mod in Q.ALL_MODULES:
        qs.update(mod.QUERIES)
        oracles.update(mod.ORACLE)

    tmp = tempfile.mkdtemp(prefix=f"diffrand{seed}_")
    if seed == 0:
        _write_pathological(spark, tmp)
    else:
        _write_random(spark, gen, tmp, seed)

    con = duckdb.connect()
    return _compare_all(spark, con, tmp, qs, oracles)


def _write_random(spark, gen, tmp: str, seed: int) -> None:
    # star schema (writes its own duckdb views we re-create below)
    gen._write_star(spark, tmp, seed)
    # documents
    docs = gen._random_corpus(seed, n=80)
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
    # embeddings
    import numpy as np

    rng = np.random.RandomState(seed)
    n, dim = 60, 64
    m = (rng.rand(n, dim).astype(np.float32) - 0.5).astype(np.float32)
    m[7] = m[3]
    m[11] = (m[4] * 0.5).astype(np.float32)
    spark.createDataFrame(
        [(i, [float(v) for v in m[i]], int(i % 10)) for i in range(n)],
        "vec_id long, embedding array<float>, label int",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/embeddings.parquet")
    # events
    import datetime
    import random as pyrandom

    prng = pyrandom.Random(seed)
    types = ["view", "click", "purchase", "signup", "error"]
    base = datetime.datetime(2024, 1, 1)
    rows, eid = [], 0
    for day in range(30):
        if day % 7 == 3:
            continue
        for _ in range(prng.randint(10, 80)):
            ts = base + datetime.timedelta(
                days=day, hours=prng.randrange(24), minutes=prng.randrange(60),
                seconds=prng.randrange(60), microseconds=prng.randrange(10**6),
            )
            for _ in range(3 if prng.random() < 0.05 else 1):
                rows.append(
                    (eid, ts, prng.randrange(1, 12), prng.choice(types),
                     round(prng.uniform(-50, 500), 2), f'{{"k": {prng.randrange(100)}}}')
                )
                eid += 1
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/events.parquet")


def _compare_all(spark, con, tmp, qs, oracles) -> list:
    from tools.verify_local import _hash_rows, _norm
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings".split()
    ):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{tmp}/{t}.parquet/*.parquet'")

    failures = []
    for name, fn in qs.items():
        t0 = time.time()
        try:
            sdf = fn(spark, tmp)
            scols, srows = sdf.columns, [tuple(r) for r in sdf.collect()]
            if name not in oracles:
                # rows-only catalog entry (none since round 7 — every
                # entry is oracle-gated; kept as a guard for future
                # genuinely non-SQL-expressible additions)
                print(f"rows  {name}: {len(srows)} rows (no oracle) [{time.time()-t0:.1f}s]")
                continue
            res = con.execute(oracles[name])
            dcols, drows = [d[0] for d in res.description], res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: error: {e}")
            failures.append(name)
            continue
        problems = []
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duck={len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append("schema")
        if not problems and _hash_rows(scols, srows) != _hash_rows(dcols, drows):
            problems.append("value-hash mismatch")
            order_s = sorted(range(len(scols)), key=lambda i: scols[i])
            order_d = sorted(range(len(dcols)), key=lambda i: dcols[i])
            ls = sorted("|".join(_norm(r[i]) for i in order_s) for r in srows)
            ld = sorted("|".join(_norm(r[i]) for i in order_d) for r in drows)
            for a, b in zip(ls, ld):
                if a != b:
                    print(f"      spark: {a}\n      duck : {b}")
                    break
        status = "ok   " if not problems else "FAIL "
        print(f"{status} {name}: {len(srows)} rows [{time.time()-t0:.1f}s] {'; '.join(problems)}")
        if problems:
            failures.append(name)
    return failures


def main():
    seeds = [int(s) for s in sys.argv[1:]] or [1]
    from goconnect_spark.session import get_spark

    spark = get_spark("differential-random")
    spark.sparkContext.setLogLevel("ERROR")
    all_failures = {}
    for seed in seeds:
        print(f"== seed {seed} ==")
        f = run_seed(spark, seed)
        if f:
            all_failures[seed] = f
    print(f"\n{sum(map(len, all_failures.values()))} failures: {all_failures}")
    sys.exit(1 if all_failures else 0)


if __name__ == "__main__":
    main()
