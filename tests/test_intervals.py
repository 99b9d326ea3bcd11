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


def test_overlap_join_binned_equals_theta(spark):
    """The binned scale path is row-identical to the theta overlap_join,
    including a hot key, boundary-touching intervals, and a gap."""
    import random

    from data_pipelines_examples_spark.operators.intervals import (
        overlap_join,
        overlap_join_binned,
    )
    from pyspark.sql import functions as F

    rng = random.Random(4)
    rows = []
    for i in range(300):
        key = "hot" if i % 3 else f"k{i % 20}"
        start = rng.randint(0, 400)
        rows.append((i, key, start, start + rng.randint(0, 90)))
    df = (
        spark.createDataFrame(rows, "id bigint, k string, s int, e int")
        .select(
            "id",
            "k",
            F.date_add(F.lit("2023-01-01"), F.col("s")).alias("start"),
            F.date_add(F.lit("2023-01-01"), F.col("e")).alias("end"),
        )
    )
    l = df.select(
        F.col("id").alias("l_id"), "k",
        F.col("start").alias("l_s"), F.col("end").alias("l_e"),
    )
    r = df.select(
        F.col("id").alias("r_id"), F.col("k").alias("k2"),
        F.col("start").alias("r_s"), F.col("end").alias("r_e"),
    ).withColumnRenamed("k2", "k")

    for gap in (0, 5):
        theta = overlap_join(l, r, "k", "l_s", "l_e", "r_s", "r_e", gap_days=gap)
        binned = overlap_join_binned(
            l, r, "k", "l_s", "l_e", "r_s", "r_e", bin_days=30, gap_days=gap
        )
        t = sorted((x["l_id"], x["r_id"]) for x in theta.select("l_id", "r_id").collect())
        b = sorted((x["l_id"], x["r_id"]) for x in binned.select("l_id", "r_id").collect())
        assert t == b and len(t) > 1000


def test_overlap_join_binned_fuse_trips_on_corrupt_end(spark):
    """One corrupt far-future end date against a sane start must error
    the job with the offending span (max_bins_per_interval fuse), not
    silently fan one row out into millions of bin rows inside a task."""
    import pytest
    from pyspark.sql import functions as F

    from data_pipelines_examples_spark.operators.intervals import (
        overlap_join_binned,
    )

    l = spark.createDataFrame(
        [(1, "k", "2023-01-01", "2023-02-01"),
         (2, "k", "2023-01-05", "9999-12-31")],  # corrupt end
        "l_id bigint, k string, l_s string, l_e string",
    ).select("l_id", "k", F.col("l_s").cast("date"), F.col("l_e").cast("date"))
    r = spark.createDataFrame(
        [(10, "k", "2023-01-10", "2023-01-20")],
        "r_id bigint, k string, r_s string, r_e string",
    ).select("r_id", "k", F.col("r_s").cast("date"), F.col("r_e").cast("date"))

    out = overlap_join_binned(
        l, r, "k", "l_s", "l_e", "r_s", "r_e", bin_days=30,
        max_bins_per_interval=50,
    )
    with pytest.raises(Exception, match="max_bins_per_interval"):
        out.collect()

    # fuse raised → no partial work trusted; with a fuse that admits the
    # corrupt span the join still computes (row 2 genuinely overlaps)
    ok = overlap_join_binned(
        l, r, "k", "l_s", "l_e", "r_s", "r_e", bin_days=30,
        max_bins_per_interval=200_000,
    )
    pairs = sorted((x["l_id"], x["r_id"]) for x in ok.select("l_id", "r_id").collect())
    assert pairs == [(1, 10), (2, 10)]


def test_overlap_join_binned_fuse_trips_on_corrupt_start(spark):
    """Spark's sequence(start, stop) DESCENDS when start > stop, so a
    corrupt far-future START fans out exactly like a corrupt end — the
    fuse must trip on the absolute span, not the signed one."""
    import pytest
    from pyspark.sql import functions as F

    from data_pipelines_examples_spark.operators.intervals import (
        overlap_join_binned,
    )

    l = spark.createDataFrame(
        [(1, "k", "9999-01-01", "2023-06-01")],  # corrupt start
        "l_id bigint, k string, l_s string, l_e string",
    ).select("l_id", "k", F.col("l_s").cast("date"), F.col("l_e").cast("date"))
    r = spark.createDataFrame(
        [(10, "k", "2023-01-10", "2023-01-20")],
        "r_id bigint, k string, r_s string, r_e string",
    ).select("r_id", "k", F.col("r_s").cast("date"), F.col("r_e").cast("date"))

    out = overlap_join_binned(
        l, r, "k", "l_s", "l_e", "r_s", "r_e", bin_days=30,
        max_bins_per_interval=50,
    )
    with pytest.raises(Exception, match="max_bins_per_interval"):
        out.collect()


def _selfjoin_df(spark):
    """Random per-key intervals incl. a hot key and an extra non-key col."""
    import random

    from pyspark.sql import functions as F

    rng = random.Random(8)
    rows = []
    for i in range(240):
        key = "hot" if i % 3 else f"k{i % 15}"
        start = rng.randint(0, 300)
        rows.append((i, key, start, start + rng.randint(0, 60)))
    return (
        spark.createDataFrame(rows, "id bigint, k string, s int, e int")
        .select(
            "id",
            "k",
            F.date_add(F.lit("2023-01-01"), F.col("s")).alias("start"),
            F.date_add(F.lit("2023-01-01"), F.col("e")).alias("end"),
        )
    )


def test_overlap_self_join_equals_two_sided(spark):
    """overlap_self_join (plain and binned) is row-identical to building
    the renamed right side by hand and calling the two-sided join — the
    single shared hot-key guard must not change output."""
    from pyspark.sql import functions as F

    from data_pipelines_examples_spark.operators.intervals import (
        overlap_join,
        overlap_join_binned,
        overlap_self_join,
    )

    df = _selfjoin_df(spark)
    right = df.select(
        "k",
        F.col("id").alias("id_r"),
        F.col("start").alias("start_r"),
        F.col("end").alias("end_r"),
    )
    for gap in (0, 5):
        two_sided = overlap_join(
            df, right, "k", "start", "end", "start_r", "end_r", gap_days=gap
        )
        for binned in (False, True):
            got = overlap_self_join(
                df, "k", "start", "end", gap_days=gap, binned=binned, bin_days=30
            )
            assert got.columns == ["id", "k", "start", "end", "id_r", "start_r", "end_r"]
            g = sorted((x["id"], x["id_r"]) for x in got.select("id", "id_r").collect())
            t = sorted((x["id"], x["id_r"]) for x in two_sided.select("id", "id_r").collect())
            assert g == t and len(g) > 500


def test_overlap_self_join_guard_aggregate_is_shared(spark):
    """The point of the self-join form: ONE per-key count aggregate
    feeds both join branches. Pin the physical plan — the second guard
    broadcast must be a ReusedExchange, and only one side builds the
    __k_n aggregate."""
    df = _selfjoin_df(spark)
    from data_pipelines_examples_spark.operators.intervals import overlap_self_join

    for binned in (False, True):
        out = overlap_self_join(df, "k", "start", "end", binned=binned)
        # execute THIS dataframe's plan (count() plans a different query);
        # under AQE the reuse only appears in the final executed plan
        out.collect()
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "ReusedExchange" in plan or "ReusedQueryStage" in plan, plan


def test_overlap_self_join_guard_error_names_hot_key(spark):
    import pytest

    from data_pipelines_examples_spark.operators.intervals import overlap_self_join

    df = _selfjoin_df(spark)
    out = overlap_self_join(df, "k", "start", "end", max_intervals_per_key=50)
    with pytest.raises(Exception, match=r"key \(hot\) holds \d+ intervals"):
        out.count()


def test_overlap_self_join_cut_mode_drops_hot_key_only(spark):
    from data_pipelines_examples_spark.operators.intervals import overlap_self_join

    df = _selfjoin_df(spark)
    out = overlap_self_join(
        df, "k", "start", "end", max_intervals_per_key=50, cap_mode="cut"
    )
    keys = {r["k"] for r in out.select("k").distinct().collect()}
    # non-hot rows are i % 3 == 0 → exactly the 5 keys k0,k3,k6,k9,k12
    assert "hot" not in keys and keys == {"k0", "k3", "k6", "k9", "k12"}


def test_overlap_self_join_suffix_collision_raises(spark):
    import pytest
    from pyspark.sql import functions as F

    from data_pipelines_examples_spark.operators.intervals import overlap_self_join

    df = _selfjoin_df(spark).withColumn("id_r", F.col("id"))
    with pytest.raises(ValueError, match="suffix"):
        overlap_self_join(df, "k", "start", "end", suffix="_r")


def test_overlap_self_join_reserved_prefix_raises(spark):
    """An input column in the internal '__self_join_dup_' namespace
    would be silently dropped with the right side's duplicate keys —
    must fail loudly like the suffix clash does."""
    import pytest
    from pyspark.sql import functions as F

    from data_pipelines_examples_spark.operators.intervals import overlap_self_join

    df = _selfjoin_df(spark).withColumn("__self_join_dup_k", F.col("id"))
    with pytest.raises(ValueError, match="reserved"):
        overlap_self_join(df, "k", "start", "end")
