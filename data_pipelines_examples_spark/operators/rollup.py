"""Incremental rollup-table maintenance: merge a delta's partial
aggregates into a persisted aggregate state without rescanning history —
materialized-view maintenance by hand, the pattern every daily-metrics
pipeline at 100 TB converges on (the reference's usage report recomputes
its aggregates from full history each run, usage_analysis.py; this
replaces that rescan with a merge of two aggregate tables).

Only MERGEABLE aggregates participate: sum/count merge by summing,
min/max by min/max-ing. AVG must be carried as (sum, count) and divided
at read time; COUNT DISTINCT must be carried as an HLL sketch
(``operators.sketches``) — both compositions are tested. Non-mergeable
forms (median, exact distinct) fundamentally require the raw history;
asking for them here raises instead of silently recomputing wrong.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MERGE = {
    "sum": F.sum,
    "count": F.sum,  # counts merge by summing partial counts
    "min": F.min,
    "max": F.max,
}

_PARTIAL = {
    "sum": F.sum,
    "count": F.count,
    "min": F.min,
    "max": F.max,
}


def partial_rollup(
    df: DataFrame, keys: list[str], aggs: dict[str, tuple[str, str]]
) -> DataFrame:
    """One delta's partial aggregate: ``aggs`` maps output column →
    (kind, source column), kind ∈ {sum, count, min, max}."""
    bad = [k for k, (kind, _) in aggs.items() if kind not in _PARTIAL]
    if bad:
        raise ValueError(
            f"non-mergeable aggregate kinds for {bad}: carry AVG as "
            "(sum, count) and COUNT DISTINCT as an HLL sketch instead"
        )
    return df.groupBy(*keys).agg(
        *[_PARTIAL[kind](src).alias(out) for out, (kind, src) in aggs.items()]
    )


def merge_rollups(
    state: DataFrame, delta: DataFrame, keys: list[str], aggs: dict[str, tuple[str, str]]
) -> DataFrame:
    """Merge two aggregate tables of the same grain: union then one
    re-aggregation with each column's MERGE function (sum-of-sums,
    sum-of-counts, min-of-mins, max-of-maxes)."""
    return state.unionByName(delta).groupBy(*keys).agg(
        *[_MERGE[kind](out).alias(out) for out, (kind, _) in aggs.items()]
    )


_LEDGER = "_applied_batches.json"

# shared swap discipline (rename-aside, checked renames, crash recovery)
# lives in sources.writers next to _hadoop_fs — upsert_by_key and
# compact_path use the same helpers
from ..sources.writers import (  # noqa: E402
    _install_and_validate,
    _recover_interrupted_swap,
)


def _read_ledger(spark, state_path: str) -> list[str]:
    import json

    from ..sources.writers import _hadoop_fs

    fs, p = _hadoop_fs(spark, state_path.rstrip("/") + "/" + _LEDGER)
    if not fs.exists(p):
        return []
    stream = fs.open(p)
    try:
        # py4j can't fill a Python buffer in place — read JVM-side
        text = spark._jvm.org.apache.commons.io.IOUtils.toString(
            stream, "UTF-8"
        )
        return json.loads(text)
    finally:
        stream.close()


def incremental_rollup(
    spark,
    state_path: str,
    delta: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    fmt: str = "parquet",
    batch_tag: str | None = None,
) -> DataFrame:
    """Fold one delta into the persisted rollup at ``state_path`` and
    swap the new state in via staging + rename-aside (the
    ``upsert_by_key`` discipline). Returns the new state DataFrame.
    The swap is NOT atomic (HDFS rename is atomic per-rename but the
    swap is two renames) — the ordering guarantees a complete state
    always exists at ``state_path`` or at ``state_path__old``: every
    call first restores an interrupted swap's ``__old`` copy before
    reading anything, rename failures raise instead of falling through
    (Hadoop rename reports failure by returning False), and ``__old``
    is deleted only after a validation read of the installed state.
    Caveat: object-store rename is copy+delete, so a mid-install crash
    can leave a PARTIAL target that recovery cannot distinguish from a
    complete one — the validation read is the detection backstop there;
    true object-store atomicity needs a table format (Delta/Iceberg).
    The ledger makes re-runs safe either way.

    Exactly-once: pass ``batch_tag`` (a batch/epoch id) and replays are
    NO-OPS — the tag ledger lives INSIDE the state directory and is
    written into the staging dir BEFORE the swap, so state and
    ledger can never disagree: a crash before the swap leaves both
    unapplied, after it leaves both applied. (A side-car ledger written
    after the swap would double-apply on a crash between the two.)
    Without a tag, re-applying the same delta double-counts — the
    caller owns batch discipline.

    Scale shape: the delta aggregates with map-side combine (its raw
    rows never meet history); the merge touches two AGGREGATE tables —
    size = key cardinality, not history length. History is never
    rescanned, which is the entire point.
    """
    import json

    from ..sources.writers import _hadoop_fs, _path_exists

    _recover_interrupted_swap(spark, state_path, fmt)
    applied = _read_ledger(spark, state_path) if batch_tag is not None else []
    if batch_tag is not None and batch_tag in applied:
        return spark.read.format(fmt).load(state_path)
    partial = partial_rollup(delta, keys, aggs)
    if _path_exists(spark, state_path):
        state = spark.read.format(fmt).load(state_path)
        merged = merge_rollups(state, partial, keys, aggs)
    else:
        merged = partial
    staging = state_path.rstrip("/") + "__staging"
    merged.write.format(fmt).mode("overwrite").save(staging)
    if batch_tag is not None:
        fs, lp = _hadoop_fs(spark, staging.rstrip("/") + "/" + _LEDGER)
        out = fs.create(lp, True)
        out.write(bytearray(json.dumps(applied + [batch_tag]).encode()))
        out.close()
    # Rename-aside swap (shared writers discipline): the validation is a
    # FULL count() — a lazy load() only resolves one footer's schema, so
    # an object-store partial install (rename = copy+delete there) could
    # pass it and the parked complete copy would then be deleted. The
    # count fails on any truncated file while __old still holds the
    # complete previous state, and _install_and_validate rolls the
    # partial install back so the next run recovers.
    _install_and_validate(
        spark,
        staging,
        state_path,
        lambda: spark.read.format(fmt).load(state_path).count(),
    )
    return spark.read.format(fmt).load(state_path)


def stream_incremental_rollup(
    stream: DataFrame,
    state_path: str,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    checkpoint: str,
    fmt: str = "parquet",
):
    """Maintain a rollup table from a stream: each micro-batch folds into
    the persisted state via ``incremental_rollup`` tagged with the epoch
    id, so Structured Streaming's replay semantics (a failed batch
    re-runs with the SAME epoch id) land exactly-once on the state.
    Returns the started StreamingQuery."""

    def _apply(batch_df: DataFrame, epoch_id: int) -> None:
        incremental_rollup(
            batch_df.sparkSession,
            state_path,
            batch_df,
            keys,
            aggs,
            fmt=fmt,
            batch_tag=f"epoch-{epoch_id}",
        )

    return (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
        .start()
    )
