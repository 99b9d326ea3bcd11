"""Key-distribution profiling: heavy-hitter detection for skew
diagnostics and corpus statistics.

Skew is the #1 scale killer in this engine's own operators (the salted
join, the per-group caps, the banded LSH joins all exist because of it);
this module finds the hot keys BEFORE a production run chooses salt
factors and cap thresholds. The reference's closest shape is its manual
salt factor pinned from operator lore
(sas_conversion_with_manual_salt_skewed_join.sql) — heavy-hitter
profiling is how that constant gets derived from data instead.

Two tiers:

- ``heavy_hitters`` — exact: keys with count > n/k. Two aggregations
  (per-key counts with map-side combine, a 1-row total broadcast).
  The per-key agg shuffles one row per distinct key — fine whenever the
  key cardinality is shuffle-sized, which profiling runs at.
- ``heavy_hitters_sketch`` — Misra-Gries summaries per partition via
  ``mapInPandas`` (bounded memory: ≤ capacity counters each), merged by
  a key-sum, then candidates EXACTLY verified with one semi-join-scoped
  count. The two-pass form is exact (the sketch can only over-select:
  any true >n/k key survives every MG summary with positive residual —
  the standard merge guarantee), while the shuffle carries at most
  capacity·partitions candidate rows instead of one per distinct key —
  the 100 TB shape for web-scale key spaces (URLs, user ids).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..cache import persist_internal


def heavy_hitters(df: DataFrame, key_col: str, k: int = 100) -> DataFrame:
    """Exact keys appearing more than n/k times: (key, cnt, frac),
    frac = cnt / n. Deterministic, oracle-replicable."""
    # total derives from the counts table (sum of cnt == n), never from
    # a second pass over the input — for an exploded token stream the
    # old df.count() re-exploded the whole corpus. counts persists
    # because the total aggregate and the filter both consume it.
    counts = (
        df.groupBy(key_col)
        .agg(F.count("*").alias("cnt"))
        .transform(persist_internal)
    )
    total = counts.agg(F.sum("cnt").alias("__n"))
    return (
        counts.crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * k > F.col("__n"))
        .select(
            key_col,
            "cnt",
            (F.col("cnt") / F.col("__n")).alias("frac"),
        )
    )


def heavy_hitters_sketch(
    df: DataFrame, key_col: str, k: int = 100, capacity: int | None = None
) -> DataFrame:
    """Exact heavy hitters with a bounded-shuffle candidate pass.

    Pass 1: each partition folds its rows through a Misra-Gries summary
    of ``capacity`` counters (default 4·k) — classic guarantee: every
    key with local count > local_n/capacity retains a counter, so any
    global >n/k key appears in at least one summary with positive
    weight. Emitting the summaries costs capacity·partitions rows.
    Pass 2: candidate keys (distinct union of summary keys) get EXACT
    counts via a broadcast semi join + one aggregation, then the n/k
    filter. Result is exactly ``heavy_hitters`` (pinned by test), with
    shuffle volume independent of key cardinality.
    """
    capacity = capacity or 4 * k

    def _mg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for pdf in batches:
            for key, cnt in pdf["__k"].value_counts().items():
                if key in counters:
                    counters[key] += int(cnt)
                elif len(counters) < capacity:
                    counters[key] = int(cnt)
                else:
                    # decrement-all by the min residual; batch form of the
                    # per-item MG step (equivalent summary guarantee)
                    dec = int(cnt)
                    m = min(counters.values())
                    step = min(dec, m)
                    counters = {
                        kk: vv - step for kk, vv in counters.items() if vv > step
                    }
                    rem = dec - step
                    if rem > 0 and len(counters) < capacity:
                        counters[key] = rem
        yield pd.DataFrame({"__k": list(counters.keys())})

    keyed = df.select(F.col(key_col).alias("__k"))
    cands = (
        keyed.mapInPandas(_mg, "__k " + dict(keyed.dtypes)["__k"])
        .distinct()
        .withColumnRenamed("__k", key_col)
    )
    counts = (
        df.join(F.broadcast(cands), key_col, "left_semi")
        .groupBy(key_col)
        .agg(F.count("*").alias("cnt"))
    )
    total = df.agg(F.count("*").alias("__n"))
    return (
        counts.crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * k > F.col("__n"))
        .select(key_col, "cnt", (F.col("cnt") / F.col("__n")).alias("frac"))
    )
