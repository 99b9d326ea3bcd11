"""Scalar functions F1–F11 from SURVEY §2.10 — native-expression first.

The reference wraps these in row-at-a-time Scala/Python UDFs; all but the
julian-date parse reduce to built-in expressions, which keeps them inside
WholeStageCodegen (10-100× faster than Python UDFs at scale and visible to
the optimizer for pushdown/folding).

Reference citations per function are on each docstring.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def finite_or_null(col: str | Column) -> Column:
    """NULL unless the double value is finite — the engine's single
    expression of the non-finite contract (--floats differential axis):
    NaN/±inf in a measure column are data errors, excluded from
    aggregates and orderings exactly like NULL, identically in Spark
    and DuckDB and regardless of ANSI mode. The DuckDB oracle twin is
    ``CASE WHEN isfinite(x) THEN x END`` (``FINITE_OR_NULL_SQL``); the
    decimal-sum variant of the same contract is ``queries._dsum`` /
    its ``TRY_CAST(nullif(x, CAST('NaN' AS DOUBLE)))`` oracle idiom."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(F.isnan(c) | (F.abs(c) == F.lit(float("inf"))), F.lit(None)).otherwise(c)


# DuckDB ORACLE twin of finite_or_null (str.format with col=...).
# DuckDB-only: Spark SQL has no isfinite() (verified on 4.1.2) — the
# Spark-side SQL-string spelling is
# `IF(isnan(x) OR abs(x) = double('inf'), NULL, x)` (see q52).
FINITE_OR_NULL_SQL = "CASE WHEN isfinite({col}) THEN {col} END"


def fiscal_yyyymm(date_str: str | Column, fmt: str = "yyyyMMdd") -> Column:
    """Fiscal yyyyMM with October FY start: calendar month + 3
    (reference: notebooks/zeppelin/bof_30_migrate.scala:170-189).

    Native: add 3 months, format as yyyyMM — null-safe on bad input.
    """
    c = F.col(date_str) if isinstance(date_str, str) else date_str
    return F.date_format(F.add_months(F.to_date(c, fmt), 3), "yyyyMM")


def parse_date_strict(date_str: str | Column, fmt: str = "yyyyMMdd") -> Column:
    """Validated date parse returning null on malformed input (reference:
    notebooks/zeppelin/bof_30_migrate.scala:428-447 ``dateParse2``).

    ``to_date`` with a format is already null-on-bad in non-ANSI mode; we
    additionally require round-tripping so '20230230'→null, not Feb 30
    rollover."""
    c = F.col(date_str) if isinstance(date_str, str) else date_str
    parsed = F.to_date(c, fmt)
    return F.when(F.date_format(parsed, fmt) == c, parsed)


def julian_to_date(julian: str | Column) -> Column:
    """'YDDD'/'YYDDD'-style julian day-of-year strings → date, with decade
    inference for 1-digit years (reference:
    notebooks/zeppelin/bof_30_migrate.scala:449-462,999-1011).

    Native composition: split year/day parts, infer century (2-digit years
    <50 → 2000s, else 1900s; 1-digit → 2020s), then Jan 1 + (ddd-1) days.
    """
    c = F.col(julian) if isinstance(julian, str) else julian
    c = F.trim(c)
    n = F.length(c)
    ddd = F.substring(c, -3, 3).cast("int")
    yy = F.when(n == 4, F.substring(c, 1, 1).cast("int") + 2020).otherwise(
        F.when(
            F.substring(c, 1, 2).cast("int") < 50,
            F.substring(c, 1, 2).cast("int") + 2000,
        ).otherwise(F.substring(c, 1, 2).cast("int") + 1900)
    )
    jan1 = F.to_date(F.concat(yy.cast("string"), F.lit("-01-01")))
    return F.when(
        (n.isin(4, 5)) & c.rlike(r"^\d+$") & (ddd >= 1) & (ddd <= 366),
        F.date_add(jan1, ddd - 1),
    )


def add_days_str(date_str: str | Column, n: int, fmt: str = "yyyyMMdd") -> Column:
    """String-date + n days → string, null-safe (reference:
    notebooks/zeppelin/bof_30_migrate.scala:464-481 ``addDays``)."""
    c = F.col(date_str) if isinstance(date_str, str) else date_str
    return F.date_format(F.date_add(F.to_date(c, fmt), n), fmt)


def lag_month_sentinel(date_str: str | Column, months: int = 2, fmt: str = "yyyyMMdd") -> Column:
    """(month + ``months``) rolled forward, day set to sentinel '00'
    (reference: notebooks/zeppelin/bof_30_migrate.scala:483-499 ``lagDate``)."""
    c = F.col(date_str) if isinstance(date_str, str) else date_str
    return F.concat(
        F.date_format(F.add_months(F.to_date(c, fmt), months), "yyyyMM"), F.lit("00")
    )


def last_day_of_month(date_col: str | Column, fmt: str | None = None) -> Column:
    """Last day of month (reference: bof_30_migrate.scala:501-523 → F.last_day)."""
    c = F.col(date_col) if isinstance(date_col, str) else date_col
    if fmt:
        c = F.to_date(c, fmt)
    return F.last_day(c)


def has_unallowable_chars(col: str | Column, pattern: str = r"[#%&*:<>?/\\{}|\"]") -> Column:
    """Special-character detector as an ``rlike`` predicate (reference:
    notebooks/zeppelin/sap_bw_api.scala:187-198 ``unallowable`` UDF)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.rlike(pattern)


def to_isoformat(col: str | Column) -> Column:
    """ISO-8601 timestamp format (reference:
    notebooks/databricks/python/from_raw_aggregate_and_load.py:16,65)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, "yyyy-MM-dd'T'HH:mm:ss")


def parse_log_record(df, text_col: str = "value"):
    """Combined-Log-Format parse via regexp_extract columns (reference:
    notebooks/databricks/scala/logparsing.scala:42-77 typed-Dataset map;
    expressed as columnar regex extraction — malformed lines yield empty
    strings / nulls rather than failing)."""
    pat = (
        r'^(\S+) (\S+) (\S+) \[([^\]]*)\] "([^"]*)" (\d{3}) (\S+)'
        r'(?: "([^"]*)" "([^"]*)")?'
    )
    c = F.col(text_col)
    to_int = lambda g: F.nullif(F.regexp_extract(c, pat, g), F.lit("")).cast("int")  # noqa: E731
    return df.select(
        F.regexp_extract(c, pat, 1).alias("ip"),
        F.regexp_extract(c, pat, 2).alias("identity"),
        F.regexp_extract(c, pat, 3).alias("userid"),
        F.to_timestamp(
            F.nullif(F.regexp_extract(c, pat, 4), F.lit("")), "dd/MMM/yyyy:HH:mm:ss Z"
        ).alias("ts"),
        F.regexp_extract(c, pat, 5).alias("request"),
        to_int(6).alias("status"),
        F.when(F.regexp_extract(c, pat, 7) == "-", F.lit(0))
        .otherwise(to_int(7))
        .alias("bytes"),
        F.regexp_extract(c, pat, 8).alias("referrer"),
        F.regexp_extract(c, pat, 9).alias("user_agent"),
    )


def pseudonymize(
    df,
    cols: list[str],
    seed: int = 0,
    hash_how: str = "xxhash64",
    suffix: str = "",
):
    """Deterministic pseudonymization of identifier columns: each value
    is replaced by its seeded 64-bit hash, so the SAME value maps to the
    SAME token in every table of a release — joins and referential
    integrity survive, while the raw identifier never leaves the
    cluster (the governance counterpart of ``text.redact_pii``, which
    handles free text; this handles keys).

    The seed is the unlinkability boundary: a new seed is a new
    pseudonym universe, so per-release seeds prevent cross-release
    linkage. Narrow projection — fuses into the scan; NULLs stay NULL.
    ``hash_how='portable'`` makes tokens re-derivable outside Spark
    (and oracle-verifiable, q100).

    Honest caveat (same as every deterministic scheme): frequency and
    join-degree structure is preserved BY DESIGN — that is what keeps
    analytics working — so high-frequency identifiers remain subject to
    frequency analysis; use random suppression for those.
    """
    from pyspark.sql import functions as F

    from .hashing import hash64

    out = df
    for c in cols:
        token = F.when(
            F.col(c).isNotNull(),
            hash64(F.col(c).cast("string"), seed=seed, how=hash_how),
        )
        out = out.withColumn(c + suffix, token)
        if suffix:
            # writing to a NEW column: the raw identifier must not ride
            # along into the release
            out = out.drop(c)
    return out
