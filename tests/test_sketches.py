"""Mergeable HLL distinct-count sketches: merge-exactness (union of
daily sketches == one-pass sketch) and error bounds vs exact twins."""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import SF_SMOKE
from data_pipelines_examples_spark.operators.sketches import (
    distinct_rollup,
    distinct_sketches,
    rollup_sketches,
)


def _events(spark):
    return (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .withColumn("day", F.to_date("ts"))
    )


def test_sketch_rollup_equals_one_pass_sketch(spark):
    """HLL state depends only on the absorbed value set, so merging the
    per-day sketches must estimate EXACTLY what a single sketch over the
    whole range estimates — the property that makes the daily sketch
    table a lossless artifact for any later rollup."""
    ev = _events(spark)
    daily = distinct_sketches(ev, "user_id", ["day", "event_type"])
    merged = rollup_sketches(daily, ["event_type"]).collect()
    direct = (
        ev.groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id", F.lit(14))).alias("n_distinct"))
        .collect()
    )
    m = {r["event_type"]: r["n_distinct"] for r in merged}
    d = {r["event_type"]: r["n_distinct"] for r in direct}
    assert m == d


def test_sketch_estimate_within_error_of_exact(spark):
    ev = _events(spark)
    _, coarse = distinct_rollup(
        ev, "user_id", ["day", "event_type"], ["event_type"]
    )
    est = {r["event_type"]: r["n_distinct"] for r in coarse.collect()}
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(est) == set(exact)
    for k in exact:
        # lgk=14 -> ~0.8% RSE; allow 5 sigma
        assert abs(est[k] - exact[k]) <= max(0.04 * exact[k], 2.0), (
            k,
            est[k],
            exact[k],
        )


def test_rollup_keep_sketch_stays_mergeable(spark):
    """keep_sketch=True retains a sketch column that can merge again —
    incremental cube maintenance (day -> month -> year)."""
    ev = _events(spark)
    daily = distinct_sketches(ev, "user_id", ["day", "event_type"])
    monthly = rollup_sketches(
        daily.withColumn("month", F.trunc("day", "month")),
        ["month", "event_type"],
        keep_sketch=True,
    )
    total = rollup_sketches(monthly.select("event_type", "sketch"), ["event_type"])
    one_pass = rollup_sketches(daily, ["event_type"])
    a = {r["event_type"]: r["n_distinct"] for r in total.collect()}
    b = {r["event_type"]: r["n_distinct"] for r in one_pass.collect()}
    assert a == b
