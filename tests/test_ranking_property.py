"""Two-phase global ranking (operators/ranking.py) must agree exactly
with the single-task Window formulation it replaces — on random data,
under every ntile edge case (n < k, n % k != 0, duplicate sort keys
broken by a unique tiebreak)."""

import random

import pyspark.sql.functions as F
from pyspark.sql import Window

from goconnect_spark.operators.ranking import global_row_number, ntile_from_rn


def _random_df(spark, seed, n):
    rng = random.Random(seed)
    rows = [(i, rng.randrange(50), rng.random()) for i in range(n)]
    return spark.createDataFrame(rows, "id: long, key: long, val: double")


def test_global_row_number_matches_window(spark):
    for seed, n in [(1, 500), (2, 37), (3, 1)]:
        df = _random_df(spark, seed, n)
        order = [F.desc("key"), F.asc("id")]
        got = {
            r.id: (r.rn, r.n_total)
            for r in global_row_number(df, order).collect()
        }
        w = Window.orderBy(*order)
        want = {
            r.id: (r.rn, n)
            for r in df.select("id", F.row_number().over(w).alias("rn")).collect()
        }
        assert got == want, f"seed={seed} n={n}"


def test_ntile_from_rn_matches_ntile(spark):
    # includes n < k (every tile gets <=1 row), n % k == 0, and ragged
    for seed, n in [(11, 500), (12, 40), (13, 7)]:
        df = _random_df(spark, seed, n)
        order = [F.desc("key"), F.asc("id")]
        numbered = global_row_number(df, order)
        for k in (3, 4, 10):
            got = {
                r.id: r.t
                for r in numbered.select(
                    "id", ntile_from_rn(k).cast("int").alias("t")
                ).collect()
            }
            w = Window.orderBy(*order)
            want = {
                r.id: r.t
                for r in df.select("id", F.ntile(k).over(w).alias("t")).collect()
            }
            assert got == want, f"seed={seed} n={n} k={k}"


def test_global_row_number_plan_has_no_unpartitioned_data_window(spark):
    df = _random_df(spark, 99, 1000)
    out = global_row_number(df, [F.desc("key"), F.asc("id")])
    plan = out._jdf.queryExecution().executedPlan().toString()
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_plans import _unpartitioned_window_sorts

    # the only unpartitioned window sorts on __pid (constant-size
    # per-partition counts), never on the data itself
    for s in _unpartitioned_window_sorts(plan):
        assert "pid" in s.split("#")[0].lower(), s


def test_ntile_closed_form_matches_sql_definition():
    # pure-arithmetic check (no Spark): with n = q*k + r, tiles 1..r
    # hold q+1 rows and tiles r+1..k hold q rows — the SQL NTILE
    # definition — for every (n, k) in a dense sweep plus random draws
    from hypothesis import given, settings, strategies as st

    def closed_form(rn, n, k):
        q, r = divmod(n, k)
        if rn <= r * (q + 1):
            return (rn + q) // (q + 1)
        return r + (rn - r * (q + 1) + q - 1) // q

    def reference(n, k):
        q, r = divmod(n, k)
        out = []
        for tile in range(1, k + 1):
            out.extend([tile] * ((q + 1) if tile <= r else q))
        return out

    for n in range(1, 60):
        for k in range(1, 15):
            want = reference(n, k)
            got = [closed_form(rn, n, k) for rn in range(1, n + 1)]
            assert got == want, (n, k)

    @settings(max_examples=200, deadline=None)
    @given(st.integers(1, 10_000_000), st.integers(1, 1000), st.data())
    def fuzz(n, k, data):
        rn = data.draw(st.integers(1, n))
        q, r = divmod(n, k)
        tile = closed_form(rn, n, k)
        # row rn lands in tile t iff the cumulative size of tiles 1..t-1
        # is < rn <= cumulative size of tiles 1..t
        def cum(t):
            return min(t, r) * (q + 1) + max(0, t - r) * q
        assert cum(tile - 1) < rn <= cum(tile), (n, k, rn, tile)

    fuzz()
