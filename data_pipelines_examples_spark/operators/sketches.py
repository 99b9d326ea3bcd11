"""Mergeable distinct-count sketches (Apache DataSketches HLL via Spark's
built-in ``hll_sketch_agg`` / ``hll_union_agg``).

The 100 TB pattern this enables: a daily job reduces each day's raw
events to one small BINARY sketch per (day, dimension) — after which ANY
date-range or dimension rollup of distinct counts is an aggregation over
sketches, never a rescan of raw data. Exact distinct counts cannot do
this (distinct is not mergeable without re-shuffling the raw keys);
sketches make the rollup cube cheap and incremental, which is why every
published OLAP engine (Druid, Presto/Trino, BigQuery) ships the same
primitive.

Determinism: an HLL sketch's state depends only on the SET of hashed
values it absorbed, so union-of-daily-sketches estimates EXACTLY equal a
one-pass sketch over the same rows — pinned in tests. Estimates are
approximate vs the true distinct count (relative error ~1.04/sqrt(2^lgk))
— so these operators are pytest-verified against exact twins with error
bounds, not DuckDB-oracled (the q12/q41 exact/approx pairing).

Reference parity: the reference's usage reports recompute COUNT(DISTINCT)
per window from raw history every run (usage_analysis.py) — the sketch
table replaces that rescan with a merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_LGK = 14  # ~0.8% relative standard error, ~16 KB max per sketch


def distinct_sketches(
    df: DataFrame,
    key_col: str,
    group_cols: list[str],
    lgk: int = DEFAULT_LGK,
    sketch_col: str = "sketch",
) -> DataFrame:
    """Reduce raw rows to one HLL sketch of distinct ``key_col`` values
    per ``group_cols`` cell — the materialize-once daily artifact. One
    aggregation with map-side partial sketches: the shuffle carries
    sketch bytes (KBs per cell), never the raw keys."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(F.col(key_col), F.lit(lgk)).alias(sketch_col)
    )


def rollup_sketches(
    sketches: DataFrame,
    group_cols: list[str],
    sketch_col: str = "sketch",
    estimate_col: str = "n_distinct",
    keep_sketch: bool = False,
) -> DataFrame:
    """Merge sketch rows up to a coarser grain (days → month, per-type →
    all-types) and estimate the distinct count. With ``keep_sketch`` the
    merged sketch is retained so the rollup itself stays mergeable
    (incremental cube maintenance)."""
    merged = sketches.groupBy(*group_cols).agg(
        F.hll_union_agg(F.col(sketch_col)).alias(sketch_col)
    )
    out = merged.withColumn(
        estimate_col, F.hll_sketch_estimate(F.col(sketch_col))
    )
    return out if keep_sketch else out.drop(sketch_col)


def distinct_rollup(
    df: DataFrame,
    key_col: str,
    fine_cols: list[str],
    coarse_cols: list[str],
    lgk: int = DEFAULT_LGK,
) -> tuple[DataFrame, DataFrame]:
    """Convenience pair: (fine-grain sketch table, coarse-grain estimate
    rollup). In production the fine table is written once per period and
    the rollup reads it back — raw data is scanned exactly once per
    period regardless of how many rollups are ever asked."""
    fine = distinct_sketches(df, key_col, fine_cols, lgk=lgk)
    coarse = rollup_sketches(fine, coarse_cols)
    return fine, coarse
