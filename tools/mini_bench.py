"""Focused re-measure: bench a subset of catalog queries with the
same methodology as bench.py (same session factory, min of 3 passes,
count() materialization), print per-query seconds + comparison vs a
baseline JSON of {name: sec}. Usage:

    python tools/mini_bench.py [--baseline /tmp/baseline_times.json] q1 q2 ...
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    args = sys.argv[1:]
    baseline = None
    if args and args[0] == "--baseline":
        baseline = json.load(open(args[1]))
        args = args[2:]
    names = args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from goconnect_spark.queries import all_queries
    from goconnect_spark.session import get_spark

    spark = get_spark("mini-bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()

    times = {}
    for pass_no in range(3):
        for name in names:
            spark.sparkContext.setJobDescription(f"mini:{name}")
            t0 = time.time()
            n = qs[name](spark, sf_dir).count()
            dt = round(time.time() - t0, 3)
            times[name] = min(times.get(name, dt), dt)
            spark.sparkContext.setJobDescription(None)
    total_new = sum(times.values())
    total_old = 0.0
    for name in names:
        if baseline and name in baseline:
            o = baseline[name]
            total_old += o
            print(f"{times[name]:7.3f}  (was {o:7.3f}, {times[name]/o:4.2f}x)  {name}")
        else:
            print(f"{times[name]:7.3f}  {name}")
    if baseline:
        print(f"TOTAL {total_new:.2f} vs {total_old:.2f} ({total_new/max(total_old,1e-9):.2f}x)")
    spark.stop()


if __name__ == "__main__":
    main()
