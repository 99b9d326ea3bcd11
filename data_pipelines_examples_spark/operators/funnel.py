"""Funnel (ordered event-sequence) analytics: for each key, the earliest
time it completed step 1, then step 2 STRICTLY AFTER step 1, and so on —
the product-analytics workhorse (view → click → purchase) and the
simplest member of the MATCH_RECOGNIZE pattern family, expressed with
joins and aggregates Spark already optimizes.

Semantics: step i's timestamp is the MINIMUM event time of step i's
event type occurring strictly after the key's step i−1 timestamp
("earliest strictly-ordered completion"). A key that never reaches step
i has NULL from there on; ``steps_completed`` counts the contiguous
prefix reached. Greedy-earliest is the standard funnel definition and
is order-deterministic.

Scale shape: one aggregation per step plus one key-equi-join per step
transition — every join is on the funnel key (dimension-keyed, AQE
handles skew), the per-step candidate sets are filtered to ONE event
type before any shuffle, and nothing is ever windowed over the whole
event stream. k steps = k narrow passes, not a per-key sort of all
events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..cache import persist_internal


def funnel_steps(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    event_col: str,
    steps: list[str],
) -> DataFrame:
    """Per-key funnel table: (key, step_1_ts..step_k_ts,
    steps_completed). Only keys that complete step 1 appear."""
    if not steps:
        raise ValueError("steps must be non-empty")
    # ONE narrow scan for the whole funnel: filter to the union of step
    # types and project (key, ts, event) once, then each step filters
    # the persisted frame. Without this every step re-scanned the full
    # event source (k steps = k corpus scans at 100 TB); with it the
    # cached frame is funnel-relevant events only — three columns.
    base = (
        df.filter(F.col(event_col).isin(steps))
        .select(F.col(key_col), F.col(ts_col), F.col(event_col))
        .transform(persist_internal)
    )
    cur = (
        base.filter(F.col(event_col) == steps[0])
        .groupBy(key_col)
        .agg(F.min(ts_col).alias("step_1_ts"))
    )
    for i, step in enumerate(steps[1:], start=2):
        cand = base.filter(F.col(event_col) == step).select(
            F.col(key_col), F.col(ts_col).alias("__t")
        )
        nxt = (
            cur.select(key_col, f"step_{i - 1}_ts")
            .join(cand, key_col)
            .filter(F.col("__t") > F.col(f"step_{i - 1}_ts"))
            .groupBy(key_col)
            .agg(F.min("__t").alias(f"step_{i}_ts"))
        )
        cur = cur.join(nxt, key_col, "left")
    completed = F.lit(0)
    # ascending wrap order: the LAST when() built is evaluated first, so
    # the deepest completed step must be the outermost branch
    for i in range(1, len(steps) + 1):
        completed = F.when(
            F.col(f"step_{i}_ts").isNotNull(), F.lit(i)
        ).otherwise(completed)
    return cur.withColumn("steps_completed", completed.cast("int"))


def funnel_counts(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    event_col: str,
    steps: list[str],
) -> DataFrame:
    """Aggregate funnel: one row per step with the count of keys whose
    ordered journey reached it (monotonically non-increasing by
    construction) — the conversion chart."""
    per_key = funnel_steps(df, key_col, ts_col, event_col, steps)
    # typed literals, not a spliced stack() selectExpr: step names are
    # DATA (F.lit round-trips quotes, backslashes, anything), never SQL
    # text — a name like "add'l \\ step" must not parse as syntax
    unpivot = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("step"),
                    F.lit(s).alias("event_type"),
                    F.col(f"n_step_{i}").alias("n_keys"),
                )
                for i, s in enumerate(steps, start=1)
            ]
        )
    ).alias("__r")
    return (
        per_key.agg(
            *[
                F.count(F.col(f"step_{i}_ts")).alias(f"n_step_{i}")
                for i in range(1, len(steps) + 1)
            ]
        )
        .select(unpivot)
        .select("__r.step", "__r.event_type", "__r.n_keys")
    )


def retention_cohorts(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    period_days: int = 7,
) -> DataFrame:
    """Cohort retention matrix: keys cohort by the DAY-GRID period of
    their first event (period 0 = first ``period_days`` days from the
    cohort start), and each later period counts the cohort's keys active
    in it — the (cohort, periods_since, n_active) long-form behind every
    retention curve. Day-based arithmetic (floor(days_since /
    period_days)) keeps the bucketing exact and engine-independent —
    calendar weeks/months vary by engine and locale; a day grid doesn't.

    Shape: ONE narrow scan — first-seen is a window min over the key
    (the same keyed shuffle the old groupBy+join-back needed, minus the
    second scan and the join), then one distinct-count aggregation.
    Period 0 equals cohort size by construction, so the curve
    normalizes in SQL.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(key_col)
    activity = (
        df.select(F.col(key_col), F.to_date(ts_col).alias("__d"))
        .withColumn("__c0", F.min("__d").over(w))
        .select(
            F.col(key_col),
            F.col("__c0").alias("cohort_start"),
            F.floor(F.datediff(F.col("__d"), F.col("__c0")) / period_days)
            .cast("int")
            .alias("periods_since"),
        )
    )
    return activity.groupBy("cohort_start", "periods_since").agg(
        F.countDistinct(key_col).alias("n_active")
    )


def ab_test_summary(
    df: DataFrame,
    variant_col: str,
    success_col: str,
    control: str,
    treatment: str,
) -> DataFrame:
    """Two-proportion z-test summary for an A/B experiment: one row with
    each arm's size and conversion rate, the absolute lift, and the
    pooled-variance z statistic — the number a launch review reads
    (|z| > 1.96 ≈ 95%). The p-value lookup stays caller-side: Spark has
    no erf expression, and shipping a hand-rolled approximation would
    imply precision the normal approximation doesn't have at small n.

    ``success_col`` is boolean/0-1 per exposure row. One aggregation
    pass; all arithmetic is exact-input division and a correctly-rounded
    sqrt, so the statistic is engine-deterministic (z additionally
    rounds through DECIMAL(18,8) for cross-engine hashing).
    """
    s = F.col(success_col).cast("double")
    v = F.col(variant_col)
    agg = df.filter(v.isin([control, treatment])).agg(
        F.count(F.when(v == control, True)).alias("n_control"),
        F.sum(F.when(v == control, s)).alias("x_control"),
        F.count(F.when(v == treatment, True)).alias("n_treatment"),
        F.sum(F.when(v == treatment, s)).alias("x_treatment"),
    )
    p0 = F.col("x_control") / F.col("n_control")
    p1 = F.col("x_treatment") / F.col("n_treatment")
    pp = (F.col("x_control") + F.col("x_treatment")) / (
        F.col("n_control") + F.col("n_treatment")
    )
    se = F.sqrt(
        pp * (F.lit(1.0) - pp)
        * (F.lit(1.0) / F.col("n_control") + F.lit(1.0) / F.col("n_treatment"))
    )
    return agg.select(
        "n_control",
        "x_control",
        "n_treatment",
        "x_treatment",
        p0.alias("rate_control"),
        p1.alias("rate_treatment"),
        (p1 - p0).alias("lift"),
        ((p1 - p0) / se).cast("decimal(18,8)").cast("double").alias("z"),
    )


def transition_matrix(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    state_col: str,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """First-order (Markov) transition statistics over per-key event
    sequences: (from_state, to_state, n_transitions, probability) where
    probability is row-normalized per from_state — the behavioral map
    behind next-action prediction, anomaly scoring (improbable
    transitions), and journey visualization.

    One window sort per key builds the adjacent pairs (lead), then a
    dimension-sized groupBy; normalization joins the per-from totals
    back — states² rows at most, tiny regardless of event volume.

    ``tiebreak_cols`` extend the per-key ordering past ``ts_col``:
    with duplicate timestamps inside a key, the adjacent-pair order —
    and therefore the transition COUNTS — is engine- and
    partitioning-dependent without a total order. Pass the event's
    unique id whenever timestamps can collide (found by the composed
    differential axes: duplicate injected timestamps made Spark and
    DuckDB count different transitions).
    """
    from pyspark.sql import Window

    order = [ts_col, *(tiebreak_cols or [])]
    w = Window.partitionBy(key_col).orderBy(*order)
    pairs = (
        df.select(key_col, *order, F.col(state_col).alias("from_state"))
        .withColumn("to_state", F.lead("from_state").over(w))
        .filter(F.col("to_state").isNotNull())
    )
    counts = pairs.groupBy("from_state", "to_state").agg(
        F.count("*").alias("n_transitions")
    )
    totals = counts.groupBy("from_state").agg(
        F.sum("n_transitions").alias("__t")
    )
    return (
        counts.join(F.broadcast(totals), "from_state")
        .withColumn("probability", F.col("n_transitions") / F.col("__t"))
        .drop("__t")
    )
