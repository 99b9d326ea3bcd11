"""Plan inspection helpers — assert the physical plan has the shape you
designed for (broadcasts broadcast, filters pushed, codegen wide).

Used by tests and during development: a correct-but-mis-planned operator
(e.g. a dim that sort-merge-joins instead of broadcasting) is a 100 TB
regression that row-equality tests cannot catch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in physical_plan(df) or "BroadcastNestedLoopJoin" in physical_plan(df)


def count_shuffles(df: DataFrame) -> int:
    """Number of shuffle exchanges in the physical plan (AQE may remove
    some at runtime; this counts the static plan)."""
    return physical_plan(df).count("Exchange hashpartitioning") + physical_plan(
        df
    ).count("Exchange rangepartitioning")


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters section of a file-scan plan, for asserting
    predicate pushdown reached the parquet reader."""
    plan = formatted_plan(df)
    return "\n".join(line for line in plan.splitlines() if "PushedFilters" in line)
