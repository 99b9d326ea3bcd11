"""Tests for window operators and the fixpoint iteration operator."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipelines_examples_spark.operators.iterate import (
    iterate_until_fixpoint,
    transitive_reachability,
)
from data_pipelines_examples_spark.operators.windows import (
    cumulative_sum,
    lag_features,
    ntile_bucket,
    streaks,
)


def test_cumulative_sum(spark):
    df = spark.createDataFrame([(1, 10), (2, 20), (3, 30)], "d int, v int")
    out = cumulative_sum(df, "v", "d")
    got = {(r.d, r.v_cum) for r in out.collect()}
    assert got == {(1, 10), (2, 30), (3, 60)}


def test_lag_features_one_sort(spark):
    df = spark.createDataFrame([(1, 1.0), (2, 2.0), (3, 3.0)], "d int, v double")
    out = lag_features(df, "v", "d", [1, 2])
    got = {(r.d, r.v_lag1, r.v_lag2) for r in out.collect()}
    assert got == {(1, None, None), (2, 1.0, None), (3, 2.0, 1.0)}


def test_ntile(spark):
    df = spark.createDataFrame([(i,) for i in range(8)], "v int")
    out = ntile_bucket(df, "v", n=4)
    got = sorted((r.v, r.ntile) for r in out.collect())
    assert got == [(0, 1), (1, 1), (2, 2), (3, 2), (4, 3), (5, 3), (6, 4), (7, 4)]


def test_streaks(spark):
    df = spark.createDataFrame(
        [(1, 0), (2, 1), (3, 1), (4, 0), (5, 1)], "d int, flag int"
    )
    out = streaks(df, "flag", "d")
    got = {(r.d, r.streak_len) for r in out.collect()}
    assert got == {(1, 0), (2, 1), (3, 2), (4, 0), (5, 1)}


def test_fixpoint_transitive_closure(spark, tmp_path):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("x", "y")], "src string, dst string"
    )
    out = transitive_reachability(edges, state_path=str(tmp_path / "state"))
    got = {(r.src, r.dst) for r in out.collect()}
    assert got == {
        ("a", "b"), ("a", "c"), ("a", "d"),
        ("b", "c"), ("b", "d"),
        ("c", "d"),
        ("x", "y"),
    }


def test_fixpoint_respects_max_iterations(spark, tmp_path):
    df = spark.createDataFrame([(1,)], "v int")
    calls = []

    def step(state, i):
        calls.append(i)
        # never converges: add a new row each time
        return state.union(spark.createDataFrame([(len(calls) + 1,)], "v int"))

    iterate_until_fixpoint(df, step, max_iterations=3, state_path=str(tmp_path / "s"))
    assert len(calls) == 3


def test_fixpoint_raises_on_non_convergence(spark, tmp_path):
    """on_max='raise' surfaces a still-moving metric instead of returning
    silently stale state."""
    import pytest

    from pyspark.sql import functions as F

    from data_pipelines_examples_spark.operators.iterate import (
        FixpointNotReached,
        iterate_until_fixpoint,
    )

    init = spark.range(3)

    def grow(state, _i):  # never converges: one more row each round
        return state.unionByName(
            state.agg((F.max("id") + 1).alias("id"))
        )

    with pytest.raises(FixpointNotReached):
        iterate_until_fixpoint(
            init, grow, max_iterations=3,
            state_path=str(tmp_path / "fp"), on_max="raise",
        )
    # default 'warn' returns the last state
    out = iterate_until_fixpoint(
        init, grow, max_iterations=3, state_path=str(tmp_path / "fp2")
    )
    assert out.count() == 6


def test_resample_asof_forward_fill(spark):
    from data_pipelines_examples_spark.operators.windows import resample_asof

    rows = [
        (1, "2024-01-01 00:15:00", 10.0),
        (1, "2024-01-01 02:45:00", 20.0),
        (2, "2024-01-01 05:30:00", 7.0),
    ]
    df = spark.createDataFrame(rows, "k int, ts string, v double").selectExpr(
        "k", "cast(ts as timestamp) as ts", "v"
    )
    out = resample_asof(df, "k", "ts", ["v"], interval="1 hour", trunc_unit="hour")
    got = {
        (r["k"], str(r["grid_ts"])): r["v"] for r in out.collect()
    }
    # key 1: grid 00:00..02:00; 00:00 precedes the first obs -> NULL edge
    assert got[(1, "2024-01-01 00:00:00")] is None
    assert got[(1, "2024-01-01 01:00:00")] == 10.0  # forward-filled
    assert got[(1, "2024-01-01 02:00:00")] == 10.0  # 02:45 obs is later
    # key 2: single obs -> single tick at 05:00, NULL edge
    assert got[(2, "2024-01-01 05:00:00")] is None
    assert len(got) == 4
