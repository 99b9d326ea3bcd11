"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship interval-collapse query at sf0.001;
``queries()`` / ``oracle_sql()`` expose the engine's query catalog
(data_pipelines_examples_spark/queries.py) — one entry per implemented
operator cluster from SURVEY.md §2, each with a DuckDB oracle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from data_pipelines_examples_spark import queries as _catalog


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _catalog.q03_interval_collapse(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _catalog.queries()


def oracle_sql() -> dict[str, str]:
    return _catalog.oracle_sql()
