"""Z-order (Morton) clustering for multi-dimensional data skipping.

A 100 TB table filtered on EITHER of two columns wants both to be
locality keys, but a plain sort clusters only its leading column. The
Z-order curve interleaves the bits of the (rank-normalized) dimensions so
rows close in ANY dimension land close on the curve; writing
range-partitioned + sorted by the curve value gives every parquet file a
compact min/max envelope in EVERY clustered column, so predicate
pushdown skips whole files/row-groups on any of them. This is the
public technique behind lakehouse OPTIMIZE ZORDER BY — here as plain
column expressions + a normal partitioned write, no table format needed.

Design notes:
- Dimensions are normalized by RANK (percent_rank over the column), not
  by value: skewed or heavy-tailed columns still spread uniformly over
  the curve. The two rank windows are per-column global sorts; at scale
  replace with an approx-quantile bucketizer (one pass, mergeable) — the
  curve only needs a monotone map into [0, 2^bits).
- The interleave itself is ~2·bits shift/mask/or terms — wholly inside
  whole-stage codegen (no HOF lambdas).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def morton_interleave(cols: list[Column], bits: int = 16) -> Column:
    """Interleave ``bits`` bits from each of N pre-normalized integer
    columns (each in [0, 2^bits)) into one Z-value: output bit
    ``b*N + i`` = bit ``b`` of column ``i``."""
    n = len(cols)
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(cols):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(c.cast("long"), b).bitwiseAND(F.lit(1)),
                    b * n + i,
                )
            )
    return z


def zorder_key(
    df: DataFrame, cols: list[str], bits: int = 16, how: str = "rank"
) -> DataFrame:
    """Add ``__z``: the Morton code of the normalized ``cols``.

    Normalization (any monotone map into [0, 2^bits) works — the curve
    doesn't care which):
    - ``how='rank'``: percent_rank per column — uniform on the curve
      regardless of value distribution, but costs one single-partition
      window sort per column. Exactness/testing tier, NOT the scale path.
    - ``how='minmax'``: one aggregate for all columns' global min/max,
      then equal-width scaling — one extra pass total, no sorts, the
      100 TB path; skewed columns cluster less evenly (pre-transform
      them, e.g. log, when it matters)."""
    scale = (1 << bits) - 1
    out = df
    norm_cols = []
    if how == "rank":
        for c in cols:
            w = Window.orderBy(F.col(c))
            nc = f"__n_{c}"
            out = out.withColumn(nc, (F.percent_rank().over(w) * scale).cast("long"))
            norm_cols.append(nc)
    elif how == "minmax":
        # Non-finite floats (NaN/±inf) are treated exactly like NULL:
        # excluded from the bounds aggregate and keyed at the curve top.
        # Without the guard a single inf makes every span infinite and a
        # NaN poisons both bounds — and the engines diverge (Spark's
        # NaN-is-largest max vs DuckDB's decimal-cast error). Found by
        # the --floats differential axis.
        from ..functions.udfs import finite_or_null

        dtypes = dict(df.dtypes)

        def guarded(c: str):
            if dtypes.get(c) not in ("double", "float"):
                return F.col(c)
            return finite_or_null(c)

        aggs = []
        for c in cols:
            aggs += [
                F.min(guarded(c)).alias(f"__lo_{c}"),
                F.max(guarded(c)).alias(f"__hi_{c}"),
            ]
        b = df.agg(*aggs).first()
        for c in cols:
            lo, hi = b[f"__lo_{c}"], b[f"__hi_{c}"]
            if lo is None or hi is None:
                # empty input (or all-NULL column): no non-null values to
                # scale, but the scaling literals must still build
                lo, hi = 0, 0
            span = (hi - lo) or 1
            nc = f"__n_{c}"
            # NULL (and non-finite) cells do NOT produce NULL z-keys:
            # least() skips NULL arguments in BOTH Spark and DuckDB, so a
            # NULL value keys at `scale` — all NULLs cluster together at
            # the curve top, mirroring nulls-last sorting (pinned
            # cross-engine by q70 under the --nulls/--floats axes)
            out = out.withColumn(
                nc,
                F.least(
                    # try_cast: the cell index can still be NaN when a
                    # finite span overflows to inf (inf/inf) — NULL then
                    # keys at the curve top, ANSI mode included
                    ((guarded(c) - F.lit(lo)) / F.lit(span) * scale).try_cast("long"),
                    F.lit(scale),
                ),
            )
            norm_cols.append(nc)
    else:
        raise ValueError(f"unknown normalization how={how!r}")
    out = out.withColumn("__z", morton_interleave([F.col(c) for c in norm_cols], bits))
    return out.drop(*norm_cols)


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 8,
    bits: int = 16,
    fmt: str = "parquet",
    how: str = "rank",
) -> None:
    """Write ``df`` clustered on the Z-curve of ``cols``: range-partition
    by the Z-value into ``n_files`` tasks, sort within each, drop the
    helper column. Every output file then covers a compact rectangle of
    the clustered dimensions — min/max footer stats prune on ANY of them."""
    keyed = zorder_key(df, cols, bits, how=how)
    (
        keyed.repartitionByRange(n_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.format(fmt)
        .mode("overwrite")
        .save(path)
    )
