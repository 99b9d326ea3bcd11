"""Source-level contract pins over the oracle SQL catalog.

The non-finite money contract (--floats differential axis) is
single-sourced on the Spark side (``queries._dsum`` /
``functions.udfs.finite_or_null``) but necessarily spelled out inside
each DuckDB oracle string. These lints make a drifted or forgotten
spelling fail the suite instead of silently diverging the gate:
a bare ``CAST(money_col AS DECIMAL)`` THROWS in DuckDB on ±inf, and a
bare ``TRY_CAST`` still throws on NaN in DuckDB 1.0 — the required
idiom is ``TRY_CAST(nullif(col, CAST('NaN' AS DOUBLE)) AS DECIMAL)``.
"""

from __future__ import annotations

import re

import __spark_entry__ as entry_mod

# every double-typed money/measure column across the testdata tables
# (including events.value — the --floats axis injects into all of them)
MONEY_COLS = (
    "l_quantity|l_extendedprice|l_discount|l_tax|o_totalprice|"
    "c_acctbal|s_acctbal|p_retailprice|value"
)

MONEY_COL_RE = re.compile(rf"\b({MONEY_COLS})\b", re.IGNORECASE)
DECIMAL_TARGET_RE = re.compile(r"AS\s+DECIMAL", re.IGNORECASE)


def _cast_argument_spans(sql: str):
    """For every ``AS DECIMAL`` target, walk parens backward to the
    enclosing CAST('s opening paren and yield the full argument
    substring — catches money columns buried in COMPOUND expressions
    (e.g. ``CAST(a * (1 - b) AS DECIMAL)``), which a flat
    column-immediately-before-AS regex misses."""
    for m in DECIMAL_TARGET_RE.finditer(sql):
        depth = 0
        start = None
        for i in range(m.start() - 1, -1, -1):
            ch = sql[i]
            if ch == ")":
                depth += 1
            elif ch == "(":
                if depth == 0:
                    start = i + 1
                    break
                depth -= 1
        if start is not None:
            yield sql[start:m.start()]


def test_no_unguarded_money_column_in_decimal_casts():
    """Any money column feeding a DECIMAL cast must sit DIRECTLY inside
    the nullif(NaN) guard: DuckDB CAST throws on ±inf (and DuckDB 1.0
    TRY_CAST throws on NaN) while Spark try_cast NULLs — an unguarded
    operand diverges the gate under the --floats axis. Paren-walking
    catches compound expressions, not just bare-column casts."""
    offenders = []
    for name, sql in entry_mod.oracle_sql().items():
        for arg in _cast_argument_spans(sql):
            # a window ORDER BY inside the cast argument (e.g. q19's
            # tiebreak `ORDER BY ..., o_totalprice NULLS LAST`) ORDERS
            # by the money column — no decimal arithmetic touches it,
            # so it needs no guard; strip OVER bodies before linting
            arg = re.sub(
                r"OVER\s*\([^()]*(?:\([^()]*\)[^()]*)*\)",
                "OVER ()",
                arg,
                flags=re.IGNORECASE,
            )
            for cm in MONEY_COL_RE.finditer(arg):
                prefix = arg[: cm.start()]
                # directly guarded: ...nullif( [alias.] col — or inside
                # the canonical isfinite CASE (its exact shape is
                # enforced by test_isfinite_uses_the_canonical_spelling,
                # so accepting `isfinite(` / `THEN ` prefixes is safe)
                if re.search(
                    r"(?:nullif\(|isfinite\(|THEN)\s*(?:\w+\.)?$",
                    prefix,
                    re.IGNORECASE,
                ):
                    continue
                offenders.append(f"{name}: CAST(...{arg.strip()[:90]}... AS DECIMAL)")
    assert not offenders, (
        "money column reaches a DECIMAL cast outside the "
        "TRY_CAST(nullif(col, CAST('NaN' AS DOUBLE))) guard:\n"
        + "\n".join(offenders)
    )


def test_isfinite_uses_the_canonical_spelling():
    """Every DuckDB-side finite-only guard must be the exact
    ``functions.udfs.FINITE_OR_NULL_SQL`` spelling (modulo the column),
    so the CASE shape can't drift into a variant with different NaN
    semantics."""
    canonical = re.compile(
        r"CASE WHEN isfinite\((?:\w+\.)?(\w+)\) THEN (?:\w+\.)?\1 END",
        re.IGNORECASE,
    )
    for name, sql in entry_mod.oracle_sql().items():
        n_isfinite = len(re.findall(r"isfinite\(", sql, re.IGNORECASE))
        n_canon = len(canonical.findall(sql))
        assert n_isfinite == n_canon, (
            f"{name}: {n_isfinite} isfinite() uses but only {n_canon} match "
            "the canonical 'CASE WHEN isfinite(x) THEN x END' spelling "
            "(FINITE_OR_NULL_SQL) — variant detected"
        )


def test_guarded_decimal_sums_use_the_exact_idiom():
    """Every nullif-guarded decimal cast must use the ONE canonical
    spelling (TRY_CAST + CAST('NaN' AS DOUBLE) sentinel), so a future
    site can't introduce a variant that parses but behaves differently
    (e.g. plain CAST outside nullif, which still throws on inf)."""
    canonical = re.compile(
        r"TRY_CAST\(nullif\((?:\w+\.)?(?:" + MONEY_COLS + r"),\s*"
        r"CAST\('NaN' AS DOUBLE\)\)\s+AS\s+DECIMAL\(18,4\)\)",
        re.IGNORECASE,
    )
    loose = re.compile(
        rf"nullif\(\s*(?:\w+\.)?({MONEY_COLS})", re.IGNORECASE
    )
    for name, sql in entry_mod.oracle_sql().items():
        n_loose = len(loose.findall(sql))
        n_canon = len(canonical.findall(sql))
        assert n_loose == n_canon, (
            f"{name}: {n_loose} nullif-guarded money casts but only "
            f"{n_canon} match the canonical idiom — variant spelling "
            "detected, keep the contract single-form"
        )


def test_maxby_null_divergence_and_the_rownumber_mirror(spark):
    """Why q49/q93's oracles dedup with row_number instead of DuckDB
    max_by: at a duplicate (key, ts) where the max-event_id row carries
    a NULL value, Spark's max_by RETURNS the NULL while DuckDB's max_by
    SKIPS NULL-arg rows — different answers from identical SQL shapes
    (found by the composed differential axes at sf0.01). The row_number
    formulation replicates Spark's semantics exactly."""
    import duckdb

    s_val = spark.sql(
        "SELECT max_by(v, k) AS r FROM VALUES (1, 10.0D), (2, CAST(NULL AS DOUBLE)) t(k, v)"
    ).first()["r"]
    assert s_val is None  # Spark: value at max key, NULL included

    con = duckdb.connect()
    d_maxby = con.execute(
        "SELECT max_by(v, k) FROM (VALUES (1, 10.0), (2, NULL)) t(k, v)"
    ).fetchone()[0]
    assert d_maxby is not None  # DuckDB: NULL-arg rows skipped → 10.0

    d_rn = con.execute(
        """SELECT v FROM (
             SELECT v, row_number() OVER (ORDER BY k DESC) AS rn
             FROM (VALUES (1, 10.0), (2, NULL)) t(k, v)) WHERE rn = 1"""
    ).fetchone()[0]
    assert d_rn is None  # row_number mirror == Spark


def test_transition_matrix_deterministic_under_duplicate_ts(spark):
    """With duplicate timestamps inside a key, transition counts must
    not depend on input row order — the event-id tiebreak makes the
    per-key sequence total-ordered."""
    import datetime as dt

    from pyspark.sql import functions as F

    from data_pipelines_examples_spark.operators.funnel import transition_matrix

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, "u", t0, "a"),
        (2, "u", t0, "b"),      # same ts as event 1
        (3, "u", t0, "c"),      # and as event 2
        (4, "u", dt.datetime(2024, 1, 1, 13, 0), "a"),
    ]
    base = spark.createDataFrame(
        rows, "event_id long, user_id string, ts timestamp, event_type string"
    )
    perms = [
        base,
        base.orderBy(F.desc("event_id")).repartition(3),
        base.orderBy("event_type").coalesce(1),
    ]
    results = []
    for df in perms:
        out = transition_matrix(
            df, "user_id", "ts", "event_type", tiebreak_cols=["event_id"]
        )
        results.append(
            sorted((r["from_state"], r["to_state"], r["n_transitions"]) for r in out.collect())
        )
    assert results[0] == results[1] == results[2]
    # the tiebroken order is a→b→c→a
    assert ("a", "b", 1) in results[0] and ("b", "c", 1) in results[0]
