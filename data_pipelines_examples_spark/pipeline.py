"""Orchestration-level helpers (SURVEY §2.11): run parameters, watermark
sensors, incremental-run bookkeeping, and the Spark-native replacement for
the reference's manual scatter/gather parallelism.

Reference parity:
- parameter widgets with defaults — usage_analysis.py:36-42,
  tpcds_automated_population.py:24-27 (dbutils.widgets → env/dict params)
- sensor: max-timestamp probe deciding whether new data arrived —
  get_latest_mongo_db_insert.py:59-72
- incremental watermark fetch — from_api_call_to_columnar_db.py:176-215
- two-day reprocess window — windowed_lagN...py:32-52
- manual file-split scatter/gather capped at 4000 tasks / ≥1000 rows per
  split — dags/dataswm/utils/distributed_script_util.py:30-32,48-65 →
  replaced by ``spark.read.text + repartition + mapPartitions``.
"""

from __future__ import annotations

import os
from collections.abc import Callable, Iterable, Iterator
from datetime import date, timedelta

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class Params:
    """Widget-style run parameters: defaults overridden by env vars
    (``PREFIX_NAME``) or an explicit override dict — the batch analog of
    dbutils.widgets."""

    def __init__(self, defaults: dict[str, str], env_prefix: str = "PIPELINE", overrides: dict[str, str] | None = None):
        self._values = dict(defaults)
        for k in defaults:
            env_key = f"{env_prefix}_{k.upper()}"
            if env_key in os.environ:
                self._values[k] = os.environ[env_key]
        if overrides:
            self._values.update({k: v for k, v in overrides.items() if k in defaults})

    def get(self, name: str) -> str:
        return self._values[name]

    def get_int(self, name: str) -> int:
        return int(self._values[name])

    def as_dict(self) -> dict[str, str]:
        return dict(self._values)


def max_watermark(df: DataFrame, ts_col: str):
    """Max-timestamp probe — the incremental-load watermark fetch
    (one cheap aggregate; with a sorted/partitioned source this prunes to
    the newest partitions)."""
    return df.agg(F.max(ts_col).alias("wm")).first().wm


def has_new_data(df: DataFrame, ts_col: str, last_seen) -> bool:
    """Sensor: did anything newer than ``last_seen`` arrive?"""
    wm = max_watermark(df, ts_col)
    return wm is not None and (last_seen is None or wm > last_seen)


def sensor_status(df: DataFrame, ts_col: str, sensor_point) -> str:
    """Tri-state source-caught-up sensor (reference:
    get_latest_mongo_db_insert.py:60-72): ``"failed"`` when the source has
    no data at all (connectivity / empty collection), ``"run"`` when its
    max timestamp has passed ``sensor_point`` (the downstream interval may
    fire), ``"retry"`` when data exists but hasn't caught up yet."""
    wm = max_watermark(df, ts_col)
    if wm is None:
        return "failed"
    return "run" if wm > sensor_point else "retry"


def incremental_filter(df: DataFrame, ts_col: str, last_seen) -> DataFrame:
    """Rows newer than the stored watermark (pushes down to the scan)."""
    if last_seen is None:
        return df
    return df.filter(F.col(ts_col) > F.lit(last_seen))


def reprocess_dates(run_date: date, days_back: int = 1) -> list[str]:
    """The reference's late-data strategy: reprocess the run date plus N
    previous partition dates (windowed_lagN...py reprocesses two days).
    Returns ISO date strings for partition pruning."""
    return [
        (run_date - timedelta(days=d)).isoformat() for d in range(days_back, -1, -1)
    ]


def distributed_map_text(
    spark: SparkSession,
    path: str,
    fn: Callable[[Iterable[str]], Iterable[str]],
    target_parallelism: int | None = None,
    min_rows_per_partition: int = 1000,
    max_tasks: int = 4000,
) -> DataFrame:
    """Spark-native scatter/gather: read text, choose a partition count with
    the reference's caps (≥``min_rows_per_partition`` rows per task, at most
    ``max_tasks`` tasks), run ``fn`` per partition, return a line DataFrame.

    Replaces the reference's DynamicPipeOperator file-splitting: Spark's
    scheduler IS the scatter/gather — no temp files, no manual joins, and
    data never funnels through the driver.
    """
    lines = spark.read.text(path)
    n = lines.count()
    if target_parallelism is None:
        target_parallelism = max(1, min(max_tasks, n // max(min_rows_per_partition, 1)))
    repartitioned = lines.repartition(target_parallelism)

    def run(part: Iterator) -> Iterator:
        out = fn(r.value for r in part)
        from pyspark.sql import Row

        return (Row(value=v) for v in out)

    return repartitioned.rdd.mapPartitions(run).toDF("value string")
