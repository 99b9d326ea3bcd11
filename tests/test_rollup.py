"""Incremental rollup maintenance: N increments == one-shot aggregate
over the concatenated history, plus the AVG-as-(sum,count) and
distinct-as-sketch compositions."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_pipelines_examples_spark.operators.rollup import (
    incremental_rollup,
    merge_rollups,
    partial_rollup,
)

AGGS = {
    "revenue": ("sum", "amount"),
    "n_events": ("count", "amount"),
    "min_amount": ("min", "amount"),
    "max_amount": ("max", "amount"),
}


def _day(spark, rows):
    return spark.createDataFrame(rows, "k string, amount double")


def test_incremental_equals_one_shot(spark, tmp_path):
    d1 = _day(spark, [("a", 1.0), ("a", 2.0), ("b", 10.0)])
    d2 = _day(spark, [("a", 4.0), ("c", 7.0)])
    d3 = _day(spark, [("b", -3.0), ("c", 0.5), ("a", 0.25)])
    path = str(tmp_path / "rollup")
    for d in (d1, d2, d3):
        state = incremental_rollup(spark, path, d, ["k"], AGGS)
    got = {r["k"]: (r["revenue"], r["n_events"], r["min_amount"], r["max_amount"])
           for r in state.collect()}
    expected_df = partial_rollup(d1.union(d2).union(d3), ["k"], AGGS)
    expected = {r["k"]: (r["revenue"], r["n_events"], r["min_amount"], r["max_amount"])
                for r in expected_df.collect()}
    assert got == expected
    # counts merged by summing partials, exact
    assert got["a"][1] == 4 and got["b"][1] == 2


def test_avg_composes_from_sum_and_count(spark, tmp_path):
    path = str(tmp_path / "avg_rollup")
    for rows in ([("a", 2.0), ("a", 4.0)], [("a", 9.0)]):
        state = incremental_rollup(spark, path, _day(spark, rows), ["k"], AGGS)
    row = state.withColumn("avg_amount", F.col("revenue") / F.col("n_events")).first()
    assert row["avg_amount"] == 5.0


def test_non_mergeable_kind_raises(spark):
    with pytest.raises(ValueError, match="non-mergeable"):
        partial_rollup(_day(spark, [("a", 1.0)]), ["k"], {"m": ("median", "amount")})


def test_distinct_composes_with_sketches(spark, tmp_path):
    """COUNT DISTINCT across increments: carry the HLL sketch column
    through merge_rollups-style maintenance via rollup_sketches."""
    from data_pipelines_examples_spark.operators.sketches import (
        distinct_sketches,
        rollup_sketches,
    )

    d1 = spark.createDataFrame([("a", 1), ("a", 2)], "k string, user int")
    d2 = spark.createDataFrame([("a", 2), ("a", 3)], "k string, user int")
    s1 = distinct_sketches(d1, "user", ["k"])
    s2 = distinct_sketches(d2, "user", ["k"])
    merged = rollup_sketches(s1.unionByName(s2), ["k"])
    assert merged.first()["n_distinct"] == 3  # {1,2,3}; exact at tiny n


def test_cooccurrence_pairs_analytic(spark):
    from data_pipelines_examples_spark.operators.itemsets import cooccurrence_pairs

    rows = [
        (1, "a"), (1, "b"), (1, "c"),
        (2, "a"), (2, "b"),
        (3, "a"), (3, "b"), (3, "b"),  # duplicate item in basket dedupes
        (4, "c"), (4, "d"),            # d appears once -> pruned
    ]
    df = spark.createDataFrame(rows, "basket int, item string")
    out = {
        (r["item_a"], r["item_b"]): r["n_baskets"]
        for r in cooccurrence_pairs(df, "basket", "item", min_support=2).collect()
    }
    assert out == {("a", "b"): 3}  # (a,c)/(b,c) in 1 basket only; d pruned


def test_fpgrowth_size2_agrees_with_exact_pairs(spark):
    from data_pipelines_examples_spark.operators.itemsets import (
        cooccurrence_pairs,
        frequent_itemsets,
    )

    import random

    rng = random.Random(11)
    rows = []
    for b in range(200):
        for i in rng.sample("abcdefgh", rng.randint(1, 5)):
            rows.append((b, i))
    df = spark.createDataFrame(rows, "basket int, item string")
    n_baskets = 200
    min_sup_abs = 20
    exact = {
        frozenset((r["item_a"], r["item_b"])): r["n_baskets"]
        for r in cooccurrence_pairs(df, "basket", "item", min_support=min_sup_abs).collect()
    }
    itemsets, _ = frequent_itemsets(
        df, "basket", "item", min_support=min_sup_abs / n_baskets
    )
    fp = {
        frozenset(r["items"]): r["freq"]
        for r in itemsets.collect()
        if len(r["items"]) == 2
    }
    assert fp == exact and exact  # identical pairs AND non-trivial


def test_incremental_rollup_tagged_replay_is_noop(spark, tmp_path):
    from data_pipelines_examples_spark.operators.rollup import incremental_rollup

    path = str(tmp_path / "state")
    d1 = _day(spark, [("a", 1.0), ("b", 2.0)])
    d2 = _day(spark, [("a", 10.0)])
    incremental_rollup(spark, path, d1, ["k"], AGGS, batch_tag="b1")
    incremental_rollup(spark, path, d1, ["k"], AGGS, batch_tag="b1")  # replay
    state = incremental_rollup(spark, path, d2, ["k"], AGGS, batch_tag="b2")
    got = {r["k"]: (r["revenue"], r["n_events"]) for r in state.collect()}
    assert got == {"a": (11.0, 2), "b": (2.0, 1)}  # b1 applied ONCE
    # ledger survives the swap inside the state dir
    again = incremental_rollup(spark, path, d2, ["k"], AGGS, batch_tag="b2")
    got2 = {r["k"]: (r["revenue"], r["n_events"]) for r in again.collect()}
    assert got2 == got


def test_stream_incremental_rollup_exactly_once(spark, tmp_path):
    import json

    from data_pipelines_examples_spark.operators.rollup import (
        stream_incremental_rollup,
    )

    src = tmp_path / "src"
    src.mkdir()
    for b in range(2):
        (src / f"b{b}.json").write_text(
            "\n".join(
                json.dumps({"k": k, "amount": float(10 * b + i)})
                for i, k in enumerate(["x", "x", "y"])
            )
        )
    stream = (
        spark.readStream.schema("k string, amount double")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    state_path = str(tmp_path / "state")
    q = stream_incremental_rollup(
        stream, state_path, ["k"], AGGS, checkpoint=str(tmp_path / "ck")
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {r["k"]: (r["revenue"], r["n_events"]) for r in spark.read.parquet(state_path).collect()}
    # x: 0+1 + 10+11 = 22 over 4 events; y: 2 + 12 = 14 over 2
    assert got == {"x": (22.0, 4), "y": (14.0, 2)}


def test_funnel_steps_strict_ordering(spark):
    from data_pipelines_examples_spark.operators.funnel import (
        funnel_counts,
        funnel_steps,
    )

    rows = [
        # user 1: full ordered journey
        (1, 10, "view"), (1, 20, "click"), (1, 30, "purchase"),
        # user 2: clicked BEFORE viewing -> click doesn't count; no purchase
        (2, 20, "click"), (2, 30, "view"),
        # user 3: view then click, purchase BEFORE click -> stops at 2
        (3, 10, "view"), (3, 5, "purchase"), (3, 15, "click"),
        # user 4: never viewed -> not in the funnel at all
        (4, 10, "purchase"),
        # user 5: earliest-strict chain across repeats
        (5, 10, "view"), (5, 11, "click"), (5, 12, "click"), (5, 13, "purchase"),
    ]
    df = spark.createDataFrame(rows, "u int, t int, e string")
    out = {r["u"]: r for r in funnel_steps(df, "u", "t", "e", ["view", "click", "purchase"]).collect()}
    assert set(out) == {1, 2, 3, 5}
    assert (out[1]["step_1_ts"], out[1]["step_2_ts"], out[1]["step_3_ts"]) == (10, 20, 30)
    assert out[1]["steps_completed"] == 3
    assert out[2]["step_2_ts"] is None and out[2]["steps_completed"] == 1
    assert out[3]["step_2_ts"] == 15 and out[3]["step_3_ts"] is None
    assert out[3]["steps_completed"] == 2
    assert (out[5]["step_2_ts"], out[5]["step_3_ts"]) == (11, 13)
    counts = {r["step"]: r["n_keys"] for r in funnel_counts(df, "u", "t", "e", ["view", "click", "purchase"]).collect()}
    assert counts == {1: 4, 2: 3, 3: 2}


def test_retention_cohorts_day_grid(spark):
    from data_pipelines_examples_spark.operators.funnel import retention_cohorts

    rows = [
        (1, "2024-01-01"), (1, "2024-01-03"), (1, "2024-01-10"),  # p0, p0, p1
        (2, "2024-01-02"), (2, "2024-01-20"),                      # p0, p2
        (3, "2024-01-08"),                                         # own cohort, p0
    ]
    df = spark.createDataFrame(rows, "u int, d string").selectExpr(
        "u", "cast(d as timestamp) as ts"
    )
    out = {
        (str(r["cohort_start"]), r["periods_since"]): r["n_active"]
        for r in retention_cohorts(df, "u", "ts", period_days=7).collect()
    }
    assert out == {
        ("2024-01-01", 0): 1, ("2024-01-01", 1): 1,
        ("2024-01-02", 0): 1, ("2024-01-02", 2): 1,
        ("2024-01-08", 0): 1,
    }


def test_ab_test_summary_analytic(spark):
    import math

    from data_pipelines_examples_spark.operators.funnel import ab_test_summary

    rows = (
        [("a", 1)] * 30 + [("a", 0)] * 70   # control: 30%
        + [("b", 1)] * 45 + [("b", 0)] * 55  # treatment: 45%
        + [("c", 1)] * 5                     # unrelated arm: excluded
    )
    df = spark.createDataFrame(
        [(v, s, i) for i, (v, s) in enumerate(rows)], "variant string, ok int, i int"
    )
    r = ab_test_summary(df, "variant", "ok", control="a", treatment="b").first()
    assert (r["n_control"], r["x_control"]) == (100, 30.0)
    assert (r["n_treatment"], r["x_treatment"]) == (100, 45.0)
    assert abs(r["lift"] - 0.15) < 1e-12
    pp = 75 / 200
    z = 0.15 / math.sqrt(pp * (1 - pp) * (1 / 100 + 1 / 100))
    assert abs(r["z"] - z) < 1e-7
    assert r["z"] > 1.96  # a real effect at these sizes


def test_association_metrics_confidence_and_lift(spark):
    from data_pipelines_examples_spark.operators.itemsets import association_metrics

    rows = [
        (1, "a"), (1, "b"),
        (2, "a"), (2, "b"),
        (3, "a"),
        (4, "c"), (4, "b"),
    ]
    df = spark.createDataFrame(rows, "basket int, item string")
    out = {
        (r["antecedent"], r["consequent"]): r
        for r in association_metrics(df, "basket", "item", min_support=2).collect()
    }
    ab = out[("a", "b")]
    assert ab["n_both"] == 2 and ab["n_antecedent"] == 3
    assert abs(ab["confidence"] - 2 / 3) < 1e-12
    # P(b) = 3/4 baskets; lift = (2/3)/(3/4) = 8/9 < 1: a and b are
    # actually slightly ANTI-correlated despite co-occurring twice
    assert abs(ab["lift"] - 8 / 9) < 1e-12
    ba = out[("b", "a")]
    assert abs(ba["confidence"] - 2 / 3) < 1e-12


def test_transition_matrix_analytic(spark):
    from data_pipelines_examples_spark.operators.funnel import transition_matrix

    rows = [
        (1, 1, "a"), (1, 2, "b"), (1, 3, "a"), (1, 4, "b"),
        (2, 1, "a"), (2, 2, "a"),
    ]
    df = spark.createDataFrame(rows, "u int, t int, s string")
    out = {
        (r["from_state"], r["to_state"]): (r["n_transitions"], r["probability"])
        for r in transition_matrix(df, "u", "t", "s").collect()
    }
    # from 'a': a->b twice (user 1), a->a once (user 2) -> probs 2/3, 1/3
    assert out[("a", "b")] == (2, 2 / 3)
    assert out[("a", "a")] == (1, 1 / 3)
    assert out[("b", "a")] == (1, 1.0)
    # rows are within-user only: no cross-user transition u1->u2
    assert sum(n for n, _ in out.values()) == 4


def test_incremental_rollup_recovers_interrupted_swap(spark, tmp_path):
    """Crash window between the two swap renames: the state was renamed
    aside to __old and the staging install never ran. The re-run must
    restore the full history, NOT rebuild from the lone delta and then
    delete the only surviving copy (the silent-data-loss path this
    regression pins)."""
    import shutil

    path = str(tmp_path / "rollup")
    d1 = _day(spark, [("a", 1.0), ("b", 10.0)])
    d2 = _day(spark, [("a", 4.0)])
    incremental_rollup(spark, path, d1, ["k"], AGGS, batch_tag="b1")
    # simulate the crash: state renamed aside, install never happened
    shutil.move(path, path + "__old")
    state = incremental_rollup(spark, path, d2, ["k"], AGGS, batch_tag="b2")
    got = {r["k"]: r["revenue"] for r in state.collect()}
    assert got == {"a": 5.0, "b": 10.0}  # history survived
    # ledger recovered too: replaying either batch is a no-op
    state = incremental_rollup(spark, path, d1, ["k"], AGGS, batch_tag="b1")
    got = {r["k"]: r["revenue"] for r in state.collect()}
    assert got == {"a": 5.0, "b": 10.0}


def test_incremental_rollup_failed_rename_raises_not_deletes(spark, tmp_path):
    """A failed staging->target rename must raise, never fall through to
    deleting the renamed-aside previous state (Hadoop rename reports
    failure by returning False)."""
    from data_pipelines_examples_spark.sources.writers import (
        _checked_rename,
        _hadoop_fs,
    )

    fs, missing = _hadoop_fs(spark, str(tmp_path / "does_not_exist"))
    dst = _hadoop_fs(spark, str(tmp_path / "dst"))[1]
    # local FS raises Java-side for a missing source; HDFS/object-store
    # implementations return False instead — _checked_rename turns that
    # into IOError. Either way the call must raise, never fall through.
    with pytest.raises(Exception):
        _checked_rename(fs, missing, dst, "install staging")
    # the return-False path specifically maps to IOError
    class _FalseFS:
        def rename(self, a, b):
            return False

    with pytest.raises(IOError, match="rename failed"):
        _checked_rename(_FalseFS(), missing, dst, "install staging")
