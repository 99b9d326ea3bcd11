"""Temporal edge-case pins for the --times differential axis
(tools/resample_testdata.py): pre-epoch and far-future timestamps,
microsecond edges, and the resample grid-explosion guard.

The gate clients (toPandas in check_oracle.py and the driver) ride
pandas' int64-NANOSECOND Timestamp, whose range is 1677-09-21 ..
2262-04-11 — so the injected payloads stay inside it. The ENGINE has no
such ceiling: these tests pin the far-future contract via collect(),
which returns plain datetimes, proving that a year-9000 value is a
client-materialization limit, not an engine one.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F


def test_far_future_engine_side_arithmetic(spark):
    """Year-9000 timestamps compute fine engine-side (date_trunc, month
    arithmetic, unix_micros) — only the pandas ns client path overflows.
    collect() has no ns ceiling and must round-trip the exact value."""
    df = spark.createDataFrame(
        [(1, dt.datetime(9000, 6, 15, 13, 45, 30, 123456))], "id int, ts timestamp"
    )
    row = df.select(
        F.col("ts"),
        F.date_trunc("hour", "ts").alias("h"),
        F.add_months(F.col("ts").cast("date"), 2).alias("m2"),
        F.unix_micros("ts").alias("us"),
    ).collect()[0]
    assert row["ts"] == dt.datetime(9000, 6, 15, 13, 45, 30, 123456)
    assert row["h"] == dt.datetime(9000, 6, 15, 13, 0, 0)
    assert row["m2"] == dt.date(9000, 8, 15)
    # independent epoch-micros computation: days since epoch * 86400e6
    expected_us = int(
        (dt.datetime(9000, 6, 15, 13, 45, 30, 123456) - dt.datetime(1970, 1, 1))
        / dt.timedelta(microseconds=1)
    )
    assert row["us"] == expected_us


def test_pre_epoch_unix_micros_negative(spark):
    """unix_micros on the last pre-epoch microsecond is exactly -1;
    naive second-floor casts would shift it to -1_000_000."""
    df = spark.createDataFrame(
        [
            (1, dt.datetime(1969, 12, 31, 23, 59, 59, 999999)),
            (2, dt.datetime(1970, 1, 1, 0, 0, 0)),
            (3, dt.datetime(1900, 1, 1, 12, 0, 0)),
        ],
        "id int, ts timestamp",
    )
    got = {r["id"]: r["us"] for r in df.select("id", F.unix_micros("ts").alias("us")).collect()}
    assert got[1] == -1
    assert got[2] == 0
    assert got[3] == int(
        (dt.datetime(1900, 1, 1, 12) - dt.datetime(1970, 1, 1)) / dt.timedelta(microseconds=1)
    )


def test_detect_gaps_across_epoch_boundary(spark):
    """Gap detection is microsecond-exact across the epoch sign flip:
    the 2-microsecond hop from -1us to +1us is NOT a gap, while a
    pre-epoch-only 10s hop is."""
    from data_pipelines_examples_spark.operators.windows import detect_gaps

    rows = [
        ("k", dt.datetime(1969, 12, 31, 23, 59, 49, 999999)),  # 10s gap ↓
        ("k", dt.datetime(1969, 12, 31, 23, 59, 59, 999999)),  # -1us
        ("k", dt.datetime(1970, 1, 1, 0, 0, 0, 1)),            # +1us: no gap
    ]
    df = spark.createDataFrame(rows, "key string, ts timestamp")
    gaps = detect_gaps(df, "key", "ts", max_gap_seconds=5).collect()
    assert len(gaps) == 1
    assert gaps[0]["gap_start"] == dt.datetime(1969, 12, 31, 23, 59, 49, 999999)
    assert gaps[0]["gap_end"] == dt.datetime(1969, 12, 31, 23, 59, 59, 999999)


def test_resample_guard_rejects_corrupt_span(spark):
    """One corrupt far-future timestamp must raise the max_grid_points
    guard, not OOM the executors: a 1900→9000 span at an hourly grid is
    ~62M ticks per key (measured killing a local[32] JVM before the
    guard existed)."""
    from data_pipelines_examples_spark.operators.windows import resample_asof

    rows = [
        ("k", dt.datetime(2024, 1, 1, 0, 30), 1.0),
        ("k", dt.datetime(2024, 1, 1, 2, 15), 2.0),
        ("k", dt.datetime(9000, 1, 1, 0, 0), 3.0),  # corrupt
    ]
    df = spark.createDataFrame(rows, "key string, ts timestamp, value double")
    with pytest.raises(ValueError, match="max_grid_points"):
        resample_asof(df, "key", "ts", ["value"], interval="1 hour", trunc_unit="hour")


def test_resample_guard_passes_sane_span_and_interval_units(spark):
    """The guard's tick size is engine-evaluated from the INTERVAL
    literal (not a naive leading-unit cast): '30 minutes' over a 2-hour
    span is 5 ticks and must pass with a tight max_grid_points that a
    seconds-vs-minutes confusion would trip."""
    from data_pipelines_examples_spark.operators.windows import resample_asof

    rows = [
        ("k", dt.datetime(2024, 1, 1, 0, 10), 1.0),
        ("k", dt.datetime(2024, 1, 1, 2, 5), 2.0),
    ]
    df = spark.createDataFrame(rows, "key string, ts timestamp, value double")
    out = resample_asof(
        df,
        "key",
        "ts",
        ["value"],
        interval="30 minutes",
        trunc_unit="hour",
        max_grid_points=10,
    ).collect()
    # grid = 00:00, 00:30, ..., 02:00 → 5 ticks; first tick precedes the
    # first observation so its fill is NULL
    assert len(out) == 5
    by_ts = {r["grid_ts"]: r["value"] for r in out}
    assert by_ts[dt.datetime(2024, 1, 1, 0, 0)] is None
    assert by_ts[dt.datetime(2024, 1, 1, 0, 30)] == 1.0
    assert by_ts[dt.datetime(2024, 1, 1, 2, 0)] == 1.0


def test_leap_day_and_fiscal_month_arithmetic(spark):
    """Leap-day month arithmetic clamps (2024-02-29 + 12 months →
    2025-02-28) and the fiscal sentinel-lag helper is stable at the
    year boundary (202501 rolled -2 months → 202411)."""
    from data_pipelines_examples_spark.functions.udfs import lag_month_sentinel

    df = spark.createDataFrame(
        [(1, dt.date(2024, 2, 29), "20250101")], "id int, d date, ds string"
    )
    row = df.select(
        F.add_months("d", 12).alias("plus12"),
        lag_month_sentinel("ds", months=-2).alias("fiscal_lag"),
    ).collect()[0]
    assert row["plus12"] == dt.date(2025, 2, 28)
    assert str(row["fiscal_lag"]).startswith("202411")


def test_resample_guard_is_timezone_independent(spark):
    """The guard's tick size is a DIFFERENCE of two timestamp casts so
    the session-timezone offset cancels: under Asia/Kolkata a bare
    CAST(epoch + interval AS DOUBLE) is NEGATIVE (-16200 for 1 hour),
    which silently disabled the guard entirely."""
    from data_pipelines_examples_spark.operators.windows import resample_asof

    rows = [
        ("k", dt.datetime(2024, 1, 1, 0, 30), 1.0),
        ("k", dt.datetime(2024, 1, 3, 2, 15), 2.0),  # ~50 hourly ticks
    ]
    df = spark.createDataFrame(rows, "key string, ts timestamp, value double")
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "Asia/Kolkata")
        with pytest.raises(ValueError, match="max_grid_points"):
            resample_asof(
                df, "key", "ts", ["value"],
                interval="1 hour", trunc_unit="hour", max_grid_points=10,
            )
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_nonfinite_guards_are_ansi_safe(spark):
    """The non-finite money contract claims ANSI-mode safety: try_cast
    and finite_or_null must neither throw nor change results when
    spark.sql.ansi.enabled=true (Spark 4's default for vanilla user
    sessions — the catalog pins ANSI off, but library OPERATORS run
    under whatever session the caller owns)."""
    from data_pipelines_examples_spark.functions.udfs import finite_or_null
    from data_pipelines_examples_spark.operators.zorder import zorder_key
    from data_pipelines_examples_spark.queries import _dsum

    rows = [
        (1, 10.0), (2, float("nan")), (3, float("inf")),
        (4, float("-inf")), (5, -0.0), (6, 32.5),
    ]
    df = spark.createDataFrame(rows, "id long, v double")

    def run():
        total = df.agg(_dsum("v").alias("s")).first()["s"]
        fin = sorted(
            r["f"] for r in df.select(finite_or_null("v").alias("f")).collect()
            if r["f"] is not None
        )
        zk = {
            r["id"]: r["__z"]
            for r in zorder_key(df, ["id", "v"], how="minmax").collect()
        }
        return total, fin, zk

    prev = spark.conf.get("spark.sql.ansi.enabled")
    try:
        spark.conf.set("spark.sql.ansi.enabled", "false")
        base = run()
        spark.conf.set("spark.sql.ansi.enabled", "true")
        ansi = run()
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)
    assert base == ansi
    assert base[0] == 42.5  # non-finite excluded, -0.0 contributes 0
