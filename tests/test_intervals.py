"""Golden tests for the interval-collapse operator — the reference's one
true end-to-end golden pair (collapsed_data_pre/post.csv shape, SURVEY §5.1),
re-expressed as handcrafted cases covering overlap, touch, gap≤1 merge,
containment, and duplicates."""

from __future__ import annotations

import datetime as dt

from data_pipelines_examples_spark.operators.intervals import collapse_intervals, overlap_join


def _d(s: str) -> dt.date:
    return dt.date.fromisoformat(s)


CASES = [
    # overlapping intervals merge
    ("m1", "2020-01-01", "2020-01-10"),
    ("m1", "2020-01-05", "2020-01-20"),
    # touching (gap == 1 day) merges
    ("m1", "2020-01-21", "2020-01-25"),
    # gap > 1 day starts a new island
    ("m1", "2020-01-28", "2020-02-02"),
    # containment: inner interval absorbed
    ("m2", "2020-03-01", "2020-03-31"),
    ("m2", "2020-03-10", "2020-03-12"),
    # trailing overlap extends only past the containing end
    ("m2", "2020-03-30", "2020-04-05"),
    # exact duplicate rows are deduped first
    ("m3", "2020-05-01", "2020-05-02"),
    ("m3", "2020-05-01", "2020-05-02"),
]

EXPECTED = {
    ("m1", _d("2020-01-01"), _d("2020-01-25")),
    ("m1", _d("2020-01-28"), _d("2020-02-02")),
    ("m2", _d("2020-03-01"), _d("2020-04-05")),
    ("m3", _d("2020-05-01"), _d("2020-05-02")),
}


def test_collapse_golden(spark):
    df = spark.createDataFrame(
        [(m, _d(b), _d(e)) for m, b, e in CASES],
        "memnum string, begindt date, enddt date",
    )
    out = collapse_intervals(df, "memnum")
    rows = {(r.memnum, r.eligeff_coll, r.eligend_coll) for r in out.collect()}
    assert rows == EXPECTED


def test_collapse_idempotent(spark):
    """Collapsing already-collapsed intervals is a no-op."""
    df = spark.createDataFrame(
        [(m, _d(b), _d(e)) for m, b, e in CASES],
        "memnum string, begindt date, enddt date",
    )
    once = collapse_intervals(df, "memnum")
    twice = collapse_intervals(
        once, "memnum", start="eligeff_coll", end="eligend_coll"
    )
    assert {tuple(r) for r in once.collect()} == {tuple(r) for r in twice.collect()}


def test_overlap_join_self(spark):
    df = spark.createDataFrame(
        [("m1", _d("2020-01-01"), _d("2020-01-10")),
         ("m1", _d("2020-01-08"), _d("2020-01-20")),
         ("m1", _d("2020-02-01"), _d("2020-02-05"))],
        "memnum string, begindt date, enddt date",
    )
    left = df.alias("l")
    right = df.select(
        df.memnum.alias("memnum"), df.begindt.alias("b2"), df.enddt.alias("e2")
    )
    joined = overlap_join(left, right, "memnum", "begindt", "enddt", "b2", "e2")
    # 3 self-pairs + 2 symmetric overlapping pairs
    assert joined.count() == 5
