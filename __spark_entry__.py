"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  -> flagship query on sf0.001.
queries()     -> name -> fn(spark, sf_dir) -> DataFrame, one per
                 implemented operator (SURVEY.md §2 + LLM-data ops).
oracle_sql()  -> matching DuckDB SQL for the correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from goconnect_spark.queries import all_oracles, all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape) on /root/testdata/sf0.001."""
    from goconnect_spark.queries.tpch import q1_pricing_summary

    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return all_queries()


def oracle_sql() -> dict[str, str]:
    return all_oracles()
