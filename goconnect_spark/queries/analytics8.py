"""Time-series diagnostics over the events stream.

hourly_count_autocorr: lag-k Pearson autocorrelation of the hourly
event-count series (k = 1 hour and 24 hours — adjacency and daily
seasonality). The classic ops-dashboard statistic, computed the way a
100 TB pipeline must: ONE aggregation builds the hourly series (the
only pass over the fact table), then the lag pairing is a self-join
of the tiny hour-level series on hidx + k, and the correlation is
assembled from INTEGER moment sums (n, Σx, Σy, Σx², Σy², Σxy) so the
only floating-point steps are the final two SQRTs and one division
over identical operands in both engines — bit-exact across Spark and
DuckDB with no float accumulation order to worry about.

Missing hours are absent rows (not zero-filled): a pair (h, h+k)
enters the statistic only when both hours have events. The gap-fill
variant is events_hourly_gapfill's territory.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from goconnect_spark.tables import load

QUERIES = {}
ORACLE = {}

_LAGS = (1, 24)


def hourly_count_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, "events", sf_dir)
    hourly = ev.groupBy(
        (F.unix_timestamp(F.date_trunc("hour", "ts")) / F.lit(3600))
        .cast("long")
        .alias("hidx")
    ).agg(F.count(F.lit(1)).alias("c"))

    out = None
    for k in _LAGS:
        pairs = (
            hourly.alias("a")
            .join(
                hourly.alias("b"),
                F.col("b.hidx") == F.col("a.hidx") + F.lit(k),
            )
            .select(F.col("a.c").alias("x"), F.col("b.c").alias("y"))
        )
        agg = pairs.agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum("x").cast("long").alias("sx"),
            F.sum("y").cast("long").alias("sy"),
            F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
            F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
            F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        ).select(
            F.lit(k).cast("int").alias("lag_hours"),
            "n_pairs",
            (F.col("n_pairs") * F.col("sxy") - F.col("sx") * F.col("sy"))
            .cast("long")
            .alias("cov_num"),
            F.when(
                (F.col("n_pairs") * F.col("sxx") - F.col("sx") * F.col("sx") > 0)
                & (F.col("n_pairs") * F.col("syy") - F.col("sy") * F.col("sy") > 0),
                (F.col("n_pairs") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
                    "double"
                )
                / (
                    F.sqrt(
                        (
                            F.col("n_pairs") * F.col("sxx")
                            - F.col("sx") * F.col("sx")
                        ).cast("double")
                    )
                    * F.sqrt(
                        (
                            F.col("n_pairs") * F.col("syy")
                            - F.col("sy") * F.col("sy")
                        ).cast("double")
                    )
                ),
            ).alias("autocorr"),
        )
        out = agg if out is None else out.unionByName(agg)
    return out.orderBy("lag_hours")


def _lag_sql(k: int) -> str:
    return f"""
  SELECT CAST({k} AS INT) AS lag_hours,
         CAST(COUNT(*) AS BIGINT) AS n_pairs,
         CAST(COUNT(*) * SUM(x * y) - SUM(x) * SUM(y) AS BIGINT) AS cov_num,
         CASE WHEN COUNT(*) * SUM(x * x) - SUM(x) * SUM(x) > 0
               AND COUNT(*) * SUM(y * y) - SUM(y) * SUM(y) > 0
              THEN CAST(COUNT(*) * SUM(x * y) - SUM(x) * SUM(y) AS DOUBLE)
                   / (SQRT(CAST(COUNT(*) * SUM(x * x) - SUM(x) * SUM(x) AS DOUBLE))
                      * SQRT(CAST(COUNT(*) * SUM(y * y) - SUM(y) * SUM(y) AS DOUBLE)))
              ELSE NULL END AS autocorr
  FROM (
    SELECT a.c AS x, b.c AS y
    FROM hourly a JOIN hourly b ON b.hidx = a.hidx + {k}
  )
"""


_AUTOCORR_SQL = f"""
WITH hourly AS (
  SELECT CAST(FLOOR(EPOCH(date_trunc('hour', ts))) AS BIGINT) // 3600 AS hidx,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events
  GROUP BY 1
)
{" UNION ALL ".join(_lag_sql(k) for k in _LAGS)}
ORDER BY lag_hours
"""

QUERIES["hourly_count_autocorr"] = hourly_count_autocorr
ORACLE["hourly_count_autocorr"] = _AUTOCORR_SQL
