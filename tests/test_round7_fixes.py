"""Round-7 regression pins.

1. Terminal pipeline compositions drain their internal persists via the
   SCOPED registry drain (r6 verdict item 4, sharpened by the r7
   self-review): ml.fit_evaluate, ml.train_quality_classifier and
   reporting.corpus_datacard release exactly the persists armed inside
   the call — on success or exception — and never touch a caller's
   pre-armed persists (whose lazy frames would silently recompute). A
   resident service calling them in a loop holds zero accumulated
   library storage. The lazy compositions (curate_corpus,
   leakage_free_split) turn out to leave nothing either — pinned.

2. The overlap-join hot-key guard is ON BY DEFAULT in error mode (r6
   verdict item 5): one hot key at production density implies a
   quadratic pair explosion (~10⁹ pairs measured at the sf1 rung), so
   the unguarded theta join was the repo's last reachable runaway
   stage. Error mode is parity-safe (identical rows or a loud refusal),
   and the refusal names the offending key.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F


def _is_cached(df) -> bool:
    lvl = df.storageLevel
    return lvl.useMemory or lvl.useDisk or lvl.useOffHeap


def _arm_internal(spark):
    """Simulate an upstream operator's internal persist in the same
    logical unit."""
    from data_pipelines_examples_spark.cache import persist_internal

    df = spark.range(100).withColumn("k", F.col("id") % 7)
    persist_internal(df)
    df.count()
    assert _is_cached(df)
    return df


def test_internal_persist_scope_drains_only_what_it_armed(spark):
    """The scope releases exactly the persists armed inside it — on
    success or exception — and never touches persists armed before it
    (a caller's still-unconsumed lazy frame would otherwise silently
    recompute)."""
    from data_pipelines_examples_spark import release_cached
    from data_pipelines_examples_spark.cache import (
        internal_persist_scope,
        persist_internal,
    )

    release_cached()
    outside = _arm_internal(spark)
    with internal_persist_scope():
        inside = persist_internal(spark.range(50).withColumn("x", F.col("id") * 2))
        inside.count()
        assert _is_cached(inside)
    assert not _is_cached(inside), "scope exit must drain what it armed"
    assert _is_cached(outside), "scope must not touch pre-armed persists"

    # exception path: the drain still runs
    try:
        with internal_persist_scope():
            inside2 = persist_internal(spark.range(30))
            inside2.count()
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert not _is_cached(inside2), "scope must drain on the exception path"
    assert _is_cached(outside)
    assert release_cached() == 1  # exactly the pre-armed frame remains


def test_fit_evaluate_leaves_registry_unchanged(spark):
    """Terminal pipeline: drains its own internal persists (scoped) and
    leaves the caller's pre-armed persists cached — the resident-session
    contract (r6 verdict item 4, sharpened by the r7 self-review)."""
    from data_pipelines_examples_spark import release_cached
    from data_pipelines_examples_spark.ml import fit_evaluate
    from data_pipelines_examples_spark.operators.windows import lag_features

    release_cached()
    callers_frame = _arm_internal(spark)
    user_df = spark.range(10).cache()
    user_df.count()

    df = spark.createDataFrame(
        [(t, 3.0 + 0.5 * t) for t in range(40)], "t int, v double"
    )
    res = fit_evaluate(lag_features(df, "v", "t", [1]), ["v"], "v", "t", 30)
    assert res[1]["n_train"] > 0

    assert _is_cached(callers_frame), "terminal fit must not drop caller persists"
    assert _is_cached(user_df), "user cache must never be touched"
    assert release_cached() == 1  # only the caller's frame was left armed
    user_df.unpersist()


def test_train_quality_classifier_scoped_drain(spark):
    from data_pipelines_examples_spark import release_cached
    from data_pipelines_examples_spark.ml import train_quality_classifier

    release_cached()
    callers_frame = _arm_internal(spark)
    df = spark.createDataFrame(
        [(1, 1.0, "good careful text"), (2, 0.0, "spam click now")] * 5,
        "doc_id int, label double, text string",
    )
    model = train_quality_classifier(df, "label")
    assert model is not None
    assert _is_cached(callers_frame)
    assert release_cached() == 1


def test_corpus_datacard_scoped_drain(spark):
    from data_pipelines_examples_spark import release_cached
    from data_pipelines_examples_spark.reporting import corpus_datacard

    release_cached()
    callers_frame = _arm_internal(spark)
    df = spark.createDataFrame(
        [(i, f"some text {i % 3}") for i in range(20)], "doc_id int, text string"
    )
    card = corpus_datacard(df, source_col=None, lang_col=None)
    assert card["n_docs"] == 20
    assert _is_cached(callers_frame)
    assert release_cached() == 1


def test_curate_corpus_leaves_no_internal_persists(spark):
    """curate_corpus returns a LAZY frame, yet leaves nothing in the
    registry: its only persisting stage (duplicate_components) is the
    materialize-then-release shape — the docstring's cache-lifecycle
    claim, pinned."""
    from data_pipelines_examples_spark import release_cached
    from data_pipelines_examples_spark.curation import curate_corpus

    release_cached()
    docs = spark.createDataFrame(
        [
            (i, "the quick brown fox jumps over the lazy dog " * 5 + str(i % 4))
            for i in range(30)
        ],
        "doc_id int, text string",
    )
    out, stats = curate_corpus(docs, collect_stats=False)
    assert out.count() > 0  # caller materializes
    assert release_cached() == 0, (
        "curate_corpus left internal persists — its docstring promises none"
    )


def test_leakage_free_split_leaves_no_internal_persists(spark):
    """Same property for the other lazy composition: its only persisting
    stage (duplicate_components) is materialize-then-release."""
    from data_pipelines_examples_spark import release_cached
    from data_pipelines_examples_spark.curation import leakage_free_split

    release_cached()
    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(20)], "doc_id int, text string"
    )
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (5, 6)], "id_a int, id_b int"
    )
    out = leakage_free_split(docs, pairs)
    assert out.count() == 20  # caller materializes
    assert {r["split"] for r in out.select("split").distinct().collect()} <= {
        "train",
        "val",
    }
    assert release_cached() == 0, (
        "leakage_free_split left internal persists — SCALING.md promises none"
    )


def test_cap_intervals_per_key_rejects_unknown_mode(spark):
    """A cap_mode typo must refuse, never silently fall through to the
    cut path (armed-by-default guard would silently drop hot keys)."""
    from data_pipelines_examples_spark.operators.intervals import (
        cap_intervals_per_key,
    )

    df = _intervals(spark, n_hot=3)
    with pytest.raises(ValueError, match="unknown mode"):
        cap_intervals_per_key(df, ["k"], 5, mode="erorr")


# --- overlap-join hot-key guard: guided default -------------------------


def _intervals(spark, n_hot: int):
    rows = [
        ("hot", dt.date(2024, 1, 1 + i % 27), dt.date(2024, 2, 1 + i % 27))
        for i in range(n_hot)
    ] + [("cold", dt.date(2024, 1, 5), dt.date(2024, 1, 9))]
    return spark.createDataFrame(rows, "k string, s date, e date")


def test_overlap_join_guard_default_is_on_and_parity_safe(spark):
    """Defaults: guard armed at DEFAULT_MAX_INTERVALS_PER_KEY in error
    mode. Sane data runs identically to the unguarded join; an over-cap
    key refuses the job with a message NAMING the hot key."""
    from data_pipelines_examples_spark.operators.intervals import (
        DEFAULT_MAX_INTERVALS_PER_KEY,
        overlap_join,
    )

    assert DEFAULT_MAX_INTERVALS_PER_KEY >= 10_000  # conservative ceiling

    df = _intervals(spark, n_hot=8)
    right = df.select("k", F.col("s").alias("s2"), F.col("e").alias("e2"))
    guarded = overlap_join(df, right, "k", "s", "e", "s2", "e2")
    unguarded = overlap_join(
        df, right, "k", "s", "e", "s2", "e2", max_intervals_per_key=None
    )
    assert guarded.exceptAll(unguarded).isEmpty()
    assert unguarded.exceptAll(guarded).isEmpty()


@pytest.mark.parametrize("which", ["theta", "binned"])
def test_overlap_join_guard_error_names_hot_key(spark, which):
    from data_pipelines_examples_spark.operators import intervals as iv

    df = _intervals(spark, n_hot=9)
    right = df.select("k", F.col("s").alias("s2"), F.col("e").alias("e2"))
    kwargs = dict(max_intervals_per_key=5)  # error mode is the default
    if which == "theta":
        run = lambda: iv.overlap_join(  # noqa: E731
            df, right, "k", "s", "e", "s2", "e2", **kwargs
        ).count()
    else:
        run = lambda: iv.overlap_join_binned(  # noqa: E731
            df, right, "k", "s", "e", "s2", "e2", bin_days=7, **kwargs
        ).count()
    with pytest.raises(Exception, match=r"key \(hot\) holds 9 intervals"):
        run()
