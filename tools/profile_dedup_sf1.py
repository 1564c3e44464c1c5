"""Stage-level profile of the dedup candidate pipelines at a given SF
(guide §1: measure first). Prints per-sub-stage walls and row counts:
dictionary build, candidate-join volume, count-filter survivors,
verify pairs — the numbers that locate the sf1 wall.

Usage: SPARK_GRAFT_SF_DIR=/root/sfdata/sf1 python tools/profile_dedup_sf1.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/sfdata/sf1")
    from goconnect_spark.queries.corpus import doc_shingle_ids
    from goconnect_spark.session import get_spark

    spark = get_spark("profile-dedup")
    spark.sparkContext.setLogLevel("ERROR")

    def timed(label, fn):
        spark.sparkContext.setJobDescription(label)
        t0 = time.time()
        out = fn()
        print(f"{label}: {time.time() - t0:.2f}s -> {out}", flush=True)
        return out

    ids = None

    def build_ids():
        nonlocal ids
        ids = doc_shingle_ids(spark, sf_dir)
        return ids.count()

    timed("ids build (cached_table)", build_ids)
    timed("dict size (distinct sids)", lambda: ids.select(
        F.explode("sids").alias("s")).distinct().count())
    timed("total sid incidence", lambda: ids.select(
        F.explode("sids")).count())
    timed("n stats", lambda: ids.agg(
        F.min("n"), F.expr("percentile(n, 0.5)"), F.max("n")).collect())

    K = 8
    pref = ids.select(
        "doc_id", "n",
        F.explode(F.expr(
            f"slice(sids, 1, cast(n - (4*n + 4) DIV 5 + {K} as int))"
        )).alias("sid"),
    )
    full = ids.select("doc_id", "n", F.explode("sids").alias("sid"))
    timed("pref rows", pref.count)
    timed("full rows", full.count)

    # --- ngram_jaccard candidate join volumes ---
    joined = (
        pref.alias("a").join(full.alias("b"), "sid")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
    )
    timed("jaccard join rows (pre length filter)", joined.count)
    lenf = joined.where(
        (4 * F.col("a.n") <= 5 * F.col("b.n"))
        & (4 * F.col("b.n") <= 5 * F.col("a.n"))
    )
    timed("jaccard join rows (post length filter)", lenf.count)
    required = F.expr(
        f"(4*(a.n + b.n) + 8) DIV 9 - (4*a.n + 4) DIV 5"
        f" + least({K}, (4*a.n + 4) DIV 5)"
    )
    cand = (
        lenf.groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("pmatch"), F.min(required).alias("req"))
    )
    timed("jaccard distinct candidate pairs (agg out)", cand.count)
    timed("jaccard count-filter survivors",
          cand.where(F.col("pmatch") >= F.col("req")).count)

    # --- containment candidate join volumes ---
    fullb = ids.select(
        F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"),
        F.explode("sids").alias("sid"),
    )
    cj = (
        pref.alias("a").join(fullb, "sid")
        .where(F.col("a.doc_id") != F.col("doc_b"))
    )
    timed("containment join rows (pre nb filter)", cj.count)
    cjf = cj.where(F.col("nb") >= F.expr("(4 * a.n + 4) DIV 5"))
    timed("containment join rows (post nb filter)", cjf.count)
    ccand = (
        cjf.select(
            (F.shiftleft(F.col("a.doc_id"), 32) + F.col("doc_b")).alias("pk"),
            F.col("a.n").alias("an"),
        )
        .groupBy("pk")
        .agg(F.count(F.lit(1)).alias("pmatch"), F.max("an").alias("an"))
    )
    timed("containment distinct candidate pairs (agg out)", ccand.count)
    timed("containment count-filter survivors", ccand.where(
        F.col("pmatch")
        >= F.least(F.lit(K).cast("long"), F.expr("(4 * an + 4) DIV 5"))
    ).count)
    spark.stop()


if __name__ == "__main__":
    main()
