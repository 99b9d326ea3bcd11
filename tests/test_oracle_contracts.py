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
MONEY_COLS = (
    "l_quantity|l_extendedprice|l_discount|l_tax|o_totalprice|"
    "c_acctbal|s_acctbal|p_retailprice"
)

# CAST or TRY_CAST applied DIRECTLY to a raw money column with a
# DECIMAL target — i.e. not wrapped in the nullif(NaN) guard
BARE_DECIMAL_CAST = re.compile(
    rf"(?:TRY_)?CAST\(\s*(?:\w+\.)?({MONEY_COLS})\s+AS\s+DECIMAL",
    re.IGNORECASE,
)

REQUIRED_GUARD = "nullif"


def test_no_bare_decimal_cast_of_money_columns_in_oracles():
    offenders = []
    for name, sql in entry_mod.oracle_sql().items():
        for m in BARE_DECIMAL_CAST.finditer(sql):
            offenders.append(f"{name}: ...{sql[max(0, m.start()-40):m.end()+10]}...")
    assert not offenders, (
        "oracle SQL casts a raw money column straight to DECIMAL — on "
        "non-finite values DuckDB CAST throws (and DuckDB 1.0 TRY_CAST "
        "throws on NaN), diverging from Spark. Use "
        "TRY_CAST(nullif(col, CAST('NaN' AS DOUBLE)) AS DECIMAL(18,4)):\n"
        + "\n".join(offenders)
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
