"""Scale behavior demo: the flagship q1-shape aggregation on
replicated lineitem (no disk writes — a crossJoin with a replication
dim multiplies the scan in memory).

Shows rows/sec holding as data grows 10x and 50x: the plan is a
scan -> partial agg -> 6-row shuffle -> final agg, so wall time scales
~linearly with input while shuffle volume stays constant — the shape
that survives a 100 TB cluster run.

Run: python examples/scale_demo.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

import pyspark.sql.functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from goconnect_spark.session import get_spark  # noqa: E402

_PRICE = "decimal(12,2)"
_RATE = "decimal(6,4)"


def q1_shape(li):
    disc_price = F.col("l_extendedprice").cast(_PRICE) * (
        F.lit(1).cast(_RATE) - F.col("l_discount").cast(_RATE)
    )
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast(_PRICE)).cast("double").alias("sum_qty"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.count(F.lit(1)).alias("n"),
        )
    )


def main(sf_dir: str = "/root/testdata/sf0.1") -> None:
    spark = get_spark("scale-demo")
    spark.sparkContext.setLogLevel("ERROR")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    base = li.count()

    for mult in (1, 10, 50):
        rep = spark.range(mult).select(F.col("id").alias("rep"))
        big = li.crossJoin(F.broadcast(rep))
        t0 = time.time()
        rows = q1_shape(big).collect()
        dt = time.time() - t0
        n = base * mult
        print(
            f"x{mult:>3}: {n:>10,} rows in {dt:6.2f}s "
            f"-> {n / dt / 1e6:6.2f} M rows/s ({len(rows)} groups)"
        )
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1")
