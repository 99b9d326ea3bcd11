"""Data-quality rule framework: filter-expression rules evaluated against a
table, violations logged to an audit DataFrame; plus day-over-day drift
checks on approximate distinct counts.

Reference parity:
- rule runner + audit rows — dags/dataswm/dq_check_for_target_table.py:46-334,
  dags/dataswm/utils/dq_utils.py:135-236 (Presto EXISTS/NOT EXISTS rules →
  Spark filter expressions / anti-joins; audit table partitioned by
  (ds, table_name, rule_name)).
- APPROX_DISTINCT drift — dq_check_for_target_table.py:353-412,
  dq_utils.py:47-111 (map-literal aggregation row → typed long columns).

Scale notes: ALL rule counts evaluate in one conditional-aggregation job
(one scan for N rules — the reference runs one Presto query per rule).
The drift check likewise computes all columns' approx distincts in ONE
pass (single aggregate row), not one job per column.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class DQRule:
    """A violation rule: rows matching ``condition`` are violations."""

    name: str
    condition: str | Column
    description: str = ""
    severity: str = "error"


@dataclass
class DQResult:
    rule: DQRule
    n_violations: int
    n_total: int

    @property
    def passed(self) -> bool:
        return self.n_violations == 0


@dataclass
class DQReport:
    results: list[DQResult] = field(default_factory=list)

    @property
    def passed(self) -> bool:
        return all(r.passed for r in self.results if r.rule.severity == "error")

    def summary(self) -> str:
        return "\n".join(
            f"[{'PASS' if r.passed else 'FAIL'}] {r.rule.name}: "
            f"{r.n_violations}/{r.n_total} violations"
            for r in self.results
        )


def run_rules(
    df: DataFrame,
    rules: list[DQRule],
    audit_cols: list[str] | None = None,
) -> tuple[DQReport, DataFrame | None]:
    """Evaluate rules; return (report, audit DataFrame of violating rows
    tagged with rule_name — the reference's audit-table shape).

    ONE aggregation job computes the total and every rule's violation
    count (``count(when(cond, ...))`` per rule) — N rules cost one scan,
    not N, so no cache is needed and at 100 TB the input is read once.
    The audit frame is a lazy union of tagged violation subsets; it only
    re-scans if the caller materializes it (and then only for rules that
    actually violated).
    """
    conds = [
        F.expr(r.condition) if isinstance(r.condition, str) else r.condition
        for r in rules
    ]
    row = df.agg(
        F.count(F.lit(1)).alias("__n_total"),
        *[F.count(F.when(c, True)).alias(f"__v{i}") for i, c in enumerate(conds)],
    ).first()
    n_total = row["__n_total"]
    report = DQReport()
    audits: list[DataFrame] = []
    for i, (rule, cond) in enumerate(zip(rules, conds)):
        n = row[f"__v{i}"]
        report.results.append(DQResult(rule, n, n_total))
        if n > 0:
            tagged = df.filter(cond).withColumn("rule_name", F.lit(rule.name))
            if audit_cols:
                tagged = tagged.select(*audit_cols, "rule_name")
            audits.append(tagged)
    audit_df = None
    if audits:
        from functools import reduce

        audit_df = reduce(DataFrame.unionByName, audits)
    return report, audit_df


def approx_distinct_profile(df: DataFrame, cols: list[str] | None = None) -> dict[str, int]:
    """Approx distinct count per column in a single aggregate pass
    (reference: dq_utils.py:47-59 MAP(names, APPROX_DISTINCT(...)))."""
    cols = cols or df.columns
    row = df.agg(
        *[F.approx_count_distinct(c).alias(c) for c in cols]
    ).first()
    return {c: row[c] for c in cols}


def distinct_drift(
    today: DataFrame,
    yesterday: DataFrame,
    cols: list[str] | None = None,
    max_ratio: float = 2.0,
) -> dict[str, tuple[int, int, bool]]:
    """Day-over-day approx-distinct drift: per column (today, yesterday,
    ok?) where ok = ratio within [1/max_ratio, max_ratio]
    (reference: dq_check_for_target_table.py:353-412)."""
    t = approx_distinct_profile(today, cols)
    y = approx_distinct_profile(yesterday, cols)
    out = {}
    for c in t:
        a, b = t[c], y.get(c, 0)
        ok = (a == b == 0) or (b > 0 and a > 0 and (1 / max_ratio) <= a / b <= max_ratio)
        out[c] = (a, b, ok)
    return out


def new_values(today: DataFrame, yesterday: DataFrame, col: str) -> DataFrame:
    """Values present today but never seen yesterday (reference:
    dq_utils.py:97-111 EXCEPT-based new-value detection)."""
    return today.select(col).distinct().subtract(yesterday.select(col).distinct())


def quarantine_split(
    df: DataFrame,
    rules: list[DQRule],
    reasons_col: str = "dq_failed_rules",
) -> tuple[DataFrame, DataFrame]:
    """Dead-letter split: route every row to (valid, quarantined), the
    quarantine side tagged with the comma-joined names of ALL rules it
    violates — the row-level complement of ``run_rules``'s counting.
    Valid rows keep the input schema exactly; quarantined rows gain
    ``reasons_col`` so the dead-letter sink is self-describing (the
    audit-table idiom of dq_check_for_target_table.py:46-334 applied at
    ingestion time instead of post-hoc).

    ONE narrow projection computes every rule's verdict per row — both
    sides filter the same tagged frame, so the input is scanned once per
    materialized side and no rule ever triggers its own job. All-rule
    evaluation (not first-failure) is deliberate: a quarantine row that
    names ONLY the first broken rule sends the fix-loop through N
    round-trips.
    """
    conds = [
        F.expr(r.condition) if isinstance(r.condition, str) else r.condition
        for r in rules
    ]
    reasons = F.array_compact(
        F.array(
            *[
                F.when(F.coalesce(c.cast("boolean"), F.lit(False)), F.lit(r.name))
                for c, r in zip(conds, rules)
            ]
        )
    )
    tagged = df.withColumn(reasons_col, F.array_join(reasons, ","))
    valid = tagged.filter(F.col(reasons_col) == "").drop(reasons_col)
    quarantined = tagged.filter(F.col(reasons_col) != "")
    return valid, quarantined


def flag_outliers(
    df: DataFrame,
    cols: list[str],
    method: str = "iqr",
    factor: float = 1.5,
    relative_error: float = 0.001,
    suffix: str = "_outlier",
) -> DataFrame:
    """Append per-column boolean outlier flags: ``iqr`` marks values
    outside [Q1 − factor·IQR, Q3 + factor·IQR] (Tukey fences), ``zscore``
    marks |x − mean| > factor·stddev. NULLs are never outliers.

    Bounds come from ONE stats pass for all columns (a single
    approxQuantile call / a single aggregate row) and are embedded as
    literals, so flagging is a narrow projection that composes with
    ``quarantine_split`` (build DQRules from the flag columns) and
    fuses into the scan.  Approximate quantiles (Greenwald-Khanna) are
    deliberate: exact quantiles cost a global sort per column at 100 TB
    and fence positions don't need them — tune ``relative_error`` if
    the fences must tighten.
    """
    out = df
    if method == "iqr":
        qs = df.approxQuantile(cols, [0.25, 0.75], relative_error)
        for c, (q1, q3) in zip(cols, qs):
            iqr = q3 - q1
            lo, hi = q1 - factor * iqr, q3 + factor * iqr
            out = out.withColumn(
                f"{c}{suffix}",
                F.when(F.col(c).isNull(), F.lit(False)).otherwise(
                    (F.col(c) < lo) | (F.col(c) > hi)
                ),
            )
    elif method == "zscore":
        row = df.agg(
            *[F.avg(c).alias(f"__m_{c}") for c in cols],
            *[F.stddev_samp(c).alias(f"__s_{c}") for c in cols],
        ).first()
        for c in cols:
            m, s = row[f"__m_{c}"], row[f"__s_{c}"]
            if s is None or s == 0.0:
                out = out.withColumn(f"{c}{suffix}", F.lit(False))
            else:
                out = out.withColumn(
                    f"{c}{suffix}",
                    F.when(F.col(c).isNull(), F.lit(False)).otherwise(
                        F.abs(F.col(c) - m) > factor * s
                    ),
                )
    else:
        raise ValueError(f"unknown method: {method!r}")
    return out


def numeric_drift(
    today: DataFrame,
    yesterday: DataFrame,
    cols: list[str],
    n_quantiles: int = 10,
    max_shift: float = 0.2,
    relative_error: float = 0.001,
) -> dict[str, tuple[float, bool]]:
    """Distribution drift between two snapshots of numeric columns: the
    maximum relative shift across ``n_quantiles`` quantile points (a
    sketch-friendly stand-in for a KS test — quantile sketches merge and
    ship, empirical CDFs don't). Complements ``distinct_drift`` (which
    sees cardinality changes but is blind to value shifts: a feed whose
    amounts silently 100x keeps its distinct count).

    Returns {col: (max_relative_shift, ok)}. Shift is |t−y| / max(|y|,
    1) per quantile, maxed. One approxQuantile pass per side covers all
    columns.
    """
    probs = [i / n_quantiles for i in range(1, n_quantiles)]
    tq = today.approxQuantile(cols, probs, relative_error)
    yq = yesterday.approxQuantile(cols, probs, relative_error)
    out = {}
    for c, t_qs, y_qs in zip(cols, tq, yq):
        shift = max(
            abs(t - y) / max(abs(y), 1.0) for t, y in zip(t_qs, y_qs)
        )
        out[c] = (shift, shift <= max_shift)
    return out
