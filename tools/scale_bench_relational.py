"""Relational-family scaling measurement (companion to
scale_bench_dedup.py). Synthesizes m-x fact tables from sf0.1 by
replicating orders+lineitem with offset keys (dimension tables stay
fixed, as they would in a real warehouse: facts grow, dims don't) and
times the headline relational queries at each multiplier.

Run: python tools/scale_bench_relational.py [multipliers...] (default 1 4 8)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

BASE = "/root/testdata/sf0.1"
_KEY_STRIDE = 100_000_000
QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "q7_trade_volume",
    "q18_large_volume_customers",
    # round-4 TPC-H completions: the grouped-threshold (q11), fact-
    # fact priority matrix (q12), distinct-pair grouping (q16),
    # two-granularity share join (q20) and only-late-supplier
    # aggregation (q21) shapes. Fact replication with offset
    # orderkeys leaves per-order structure intact, so q21's per-order
    # supplier counts scale linearly in orders.
    "q11_important_stock",
    "q12_shipmode_priority",
    "q16_parts_supplier_counts",
    "q20_potential_promotion",
    "q21_late_suppliers",
]
DIMS = ["region", "nation", "customer", "supplier", "part", "events", "documents", "embeddings"]


def synthesize(spark, m: int, out_dir: str) -> None:
    reps = spark.range(m).select(F.col("id").cast("long").alias("rep"))
    orders = spark.read.parquet(f"{BASE}/orders.parquet")
    li = spark.read.parquet(f"{BASE}/lineitem.parquet")
    (
        orders.crossJoin(reps)
        .select(
            (F.col("o_orderkey") + F.col("rep") * _KEY_STRIDE).alias("o_orderkey"),
            *[c for c in orders.columns if c != "o_orderkey"],
        )
        .drop("rep")
        .write.mode("overwrite").parquet(f"{out_dir}/orders.parquet")
    )
    (
        li.crossJoin(reps)
        .select(
            (F.col("l_orderkey") + F.col("rep") * _KEY_STRIDE).alias("l_orderkey"),
            *[c for c in li.columns if c != "l_orderkey"],
        )
        .drop("rep")
        .write.mode("overwrite").parquet(f"{out_dir}/lineitem.parquet")
    )
    for t in DIMS:
        os.symlink(f"{BASE}/{t}.parquet", f"{out_dir}/{t}.parquet")


def main():
    mults = [int(a) for a in sys.argv[1:]] or [1, 4, 8]
    from goconnect_spark.queries import all_queries
    from goconnect_spark.session import get_spark

    spark = get_spark("relational-scale")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()

    for m in mults:
        work = tempfile.mkdtemp(prefix=f"rel_scale_m{m}_")
        try:
            synthesize(spark, m, work)
            n_li = spark.read.parquet(f"{work}/lineitem.parquet").count()
            for name in QUERIES:
                t0 = time.time()
                rows = qs[name](spark, work).count()
                print(
                    json.dumps(
                        {"query": name, "multiplier": m, "lineitem_rows": n_li,
                         "rows": rows, "sec": round(time.time() - t0, 2)}
                    ),
                    flush=True,
                )
        finally:
            shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
