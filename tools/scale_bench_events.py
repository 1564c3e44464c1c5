"""Events-family (batch sliding-window) scaling measurement —
companion to scale_bench_dedup.py / scale_bench_relational.py for the
time-series queries whose input is the events table.

Synthesis models natural stream growth: replica k of the sf0.1 events
table (~100k rows / 30 days) is time-shifted by k*31 days with offset
event_ids and the SAME user population — more history at the same
arrival rate. Under that growth the right cost model for a sliding
aggregate is: number of windows grows linearly with m, per-window work
stays constant (bounded by window span x daily volume). Wall clock
should therefore grow ~linearly and the per-window cost stay flat —
the property that lets a daily 100 TB rollup run incrementally
forever. A super-linear curve would mean some global (corpus-sized)
state leaked into the per-window path.

Run: python tools/scale_bench_events.py [multipliers...]  (default 1 5 10)
Record the table in SCALING.md.
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
_ID_STRIDE = 100_000_000

QUERIES = [
    # register-merge sliding distinct: per-day sketches are reused
    # across the 7 windows each day feeds — the mergeability claim.
    # Retired as a standalone catalog entry in r13 (folded into
    # hll_sliding_calibration); the scale axis still measures the
    # PURE register path, resolved from sketches.py directly below,
    # because calibration adds the brute-force exact join the sketch
    # exists to avoid — that would drown the mergeability signal
    "hll_sliding_7d_users",
    # exact trailing-7d per-user counts (range-frame window)
    "user_rolling_7d",
    # week-grid distinct users (grid grows linearly with history)
    "weekly_active_users",
    # first-seen trick + calendar-day cumulative
    "daily_new_users_cumulative",
    # foreachBatch-maintained IVM view: 4 micro-batches regardless of
    # m, so wall tracks the per-batch delta aggregates
    "streaming_ivm_hourly_counts",
    # seasonal median baseline: day x 24 grid, per-hod windows
    "hourly_seasonal_residuals",
]

if os.environ.get("SCALE_QUERIES"):
    QUERIES = [q for q in QUERIES if q in os.environ["SCALE_QUERIES"].split(",")]


def synthesize(spark, m: int, out_dir: str) -> None:
    from goconnect_spark.tables import load  # nanos-timestamp handling

    ev = load(spark, "events", BASE)
    reps = spark.range(m).select(F.col("id").cast("int").alias("k"))
    out = (
        ev.crossJoin(reps)
        .select(
            # k must be widened first: k(int) * 1e8 overflows int32 at
            # m >= 22, killing the 100x point under ANSI mode
            (F.col("event_id") + F.col("k").cast("long") * _ID_STRIDE).alias("event_id"),
            F.expr("timestampadd(DAY, k * 31, ts)").alias("ts"),
            *[c for c in ev.columns if c not in ("event_id", "ts")],
        )
        .drop("k")
    )
    out.write.mode("overwrite").parquet(f"{out_dir}/events.parquet")


def main():
    mults = [int(a) for a in sys.argv[1:]] or [1, 5, 10]
    from goconnect_spark.queries import all_queries
    from goconnect_spark.session import get_spark

    spark = get_spark("events-scale")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    from goconnect_spark.queries.sketches import hll_sliding_7d_users

    qs.setdefault("hll_sliding_7d_users", hll_sliding_7d_users)

    for m in mults:
        work = tempfile.mkdtemp(prefix=f"events_scale_m{m}_")
        try:
            synthesize(spark, m, work)
            n_ev = spark.read.parquet(f"{work}/events.parquet").count()
            for name in QUERIES:
                t0 = time.time()
                rows = qs[name](spark, work).count()
                print(
                    json.dumps(
                        {
                            "query": name,
                            "multiplier": m,
                            "events": n_ev,
                            "rows": rows,
                            "sec": round(time.time() - t0, 2),
                        }
                    ),
                    flush=True,
                )
            spark.catalog.clearCache()
        finally:
            shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
