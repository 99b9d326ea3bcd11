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


def zorder_key(df: DataFrame, cols: list[str], bits: int = 16) -> DataFrame:
    """Add ``__z``: the Morton code of the rank-normalized ``cols``.

    Rank normalization = percent_rank per column scaled to [0, 2^bits):
    monotone in the column, uniform on the curve regardless of the value
    distribution. Costs one window sort per column at this exactness
    level; the approx-quantile bucketizer is the one-pass scale variant
    (any monotone map works — the curve doesn't care which)."""
    out = df
    norm_cols = []
    scale = (1 << bits) - 1
    for c in cols:
        w = Window.orderBy(F.col(c))
        nc = f"__n_{c}"
        out = out.withColumn(
            nc, (F.percent_rank().over(w) * scale).cast("long")
        )
        norm_cols.append(nc)
    out = out.withColumn("__z", morton_interleave([F.col(c) for c in norm_cols], bits))
    return out.drop(*norm_cols)


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 8,
    bits: int = 16,
    fmt: str = "parquet",
) -> None:
    """Write ``df`` clustered on the Z-curve of ``cols``: range-partition
    by the Z-value into ``n_files`` tasks, sort within each, drop the
    helper column. Every output file then covers a compact rectangle of
    the clustered dimensions — min/max footer stats prune on ANY of them."""
    keyed = zorder_key(df, cols, bits)
    (
        keyed.repartitionByRange(n_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.format(fmt)
        .mode("overwrite")
        .save(path)
    )
