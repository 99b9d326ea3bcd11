"""SQL-text entry path (SURVEY §3.1) — the reference's dominant query
lifecycle: register DataFrames as temp views, run templated SQL, get a
DataFrame back.

Reference parity: createOrReplaceTempView as the hand-off IR between
stages (usage_analysis.py:103,203; slow_temp_table...py:83,108,185) and
parameterized query text (usage_analysis.py:210-254). Parameters go
through Spark's native parameterized ``spark.sql(sql, args=...)`` — no
string interpolation, no injection surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def run_sql(
    spark: SparkSession,
    sql: str,
    views: dict[str, DataFrame] | None = None,
    params: dict[str, object] | None = None,
) -> DataFrame:
    """Register ``views`` as temp views, then run ``sql`` with named
    parameters (``:name`` placeholders)."""
    for name, df in (views or {}).items():
        df.createOrReplaceTempView(name)
    if params:
        return spark.sql(sql, args=params)
    return spark.sql(sql)


def view_registry(spark: SparkSession, base: dict[str, DataFrame]):
    """Small stage-to-stage view registry: each ``put`` registers the next
    intermediate result under a name, mirroring the reference's
    notebook-cell pipeline style."""

    class _Registry:
        def __init__(self):
            self.names: list[str] = []
            for n, df in base.items():
                self.put(n, df)

        def put(self, name: str, df: DataFrame) -> DataFrame:
            df.createOrReplaceTempView(name)
            if name not in self.names:
                self.names.append(name)
            return df

        def sql(self, text: str, params: dict[str, object] | None = None) -> DataFrame:
            return spark.sql(text, args=params) if params else spark.sql(text)

    return _Registry()
