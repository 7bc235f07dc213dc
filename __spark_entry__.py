"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (TPC-H Q1 pricing summary) at
sf0.001. ``queries()`` / ``oracle_sql()`` expose the full operator registry
(xgboost_ray_spark/registry.py) — one entry per implemented operator from
SURVEY.md §2, each Spark builder paired with its DuckDB oracle SQL where
SQL-expressible (ML/streaming-append entries are rows-only by design).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from xgboost_ray_spark.registry import all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from xgboost_ray_spark.operators.relational import pricing_summary

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    return pricing_summary(li)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.build for name, spec in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted => rows-only check)."""
    return {
        name: spec.oracle
        for name, spec in all_queries().items()
        if spec.oracle is not None
    }
