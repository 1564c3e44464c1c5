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

    con = duckdb.connect()
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
