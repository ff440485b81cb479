"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001; ``queries()``
exposes the full corpus (empujar_spark/plans/corpus.py — the SURVEY.md §2
operator inventory plus the scale-extension operators); ``oracle_sql()``
returns the DuckDB twin for every SQL-expressible entry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from empujar_spark.plans.corpus import CORPUS


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H-Q1-style pricing summary) on sf0.001."""
    return CORPUS["q1_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: query.fn for name, query in CORPUS.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: query.sql for name, query in CORPUS.items() if query.sql is not None
    }
