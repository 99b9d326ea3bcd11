"""Round-7 regression pins.

1. Terminal pipeline compositions drain the internal-persist registry
   (r6 verdict item 4): ml.fit_evaluate, ml.train_quality_classifier and
   reporting.corpus_datacard call release_cached() before returning, so
   a resident service calling them in a loop holds zero accumulated
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


def test_fit_evaluate_drains_internal_persists(spark):
    from data_pipelines_examples_spark import release_cached
    from data_pipelines_examples_spark.ml import fit_evaluate
    from data_pipelines_examples_spark.operators.windows import lag_features

    release_cached()
    internal = _arm_internal(spark)
    user_df = spark.range(10).cache()
    user_df.count()

    df = spark.createDataFrame(
        [(t, 3.0 + 0.5 * t) for t in range(40)], "t int, v double"
    )
    res = fit_evaluate(lag_features(df, "v", "t", [1]), ["v"], "v", "t", 30)
    assert res[1]["n_train"] > 0

    assert not _is_cached(internal), "terminal fit left internal persist armed"
    assert release_cached() == 0, "registry not drained by fit_evaluate"
    assert _is_cached(user_df), "user cache must never be touched"
    user_df.unpersist()


def test_train_quality_classifier_drains_internal_persists(spark):
    from data_pipelines_examples_spark import release_cached
    from data_pipelines_examples_spark.ml import train_quality_classifier

    release_cached()
    internal = _arm_internal(spark)
    df = spark.createDataFrame(
        [(1, 1.0, "good careful text"), (2, 0.0, "spam click now")] * 5,
        "doc_id int, label double, text string",
    )
    model = train_quality_classifier(df, "label")
    assert model is not None
    assert not _is_cached(internal)
    assert release_cached() == 0


def test_corpus_datacard_drains_internal_persists(spark):
    from data_pipelines_examples_spark import release_cached
    from data_pipelines_examples_spark.reporting import corpus_datacard

    release_cached()
    internal = _arm_internal(spark)
    df = spark.createDataFrame(
        [(i, f"some text {i % 3}") for i in range(20)], "doc_id int, text string"
    )
    card = corpus_datacard(df, source_col=None, lang_col=None)
    assert card["n_docs"] == 20
    assert not _is_cached(internal)
    assert release_cached() == 0


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
