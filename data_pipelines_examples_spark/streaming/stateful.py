"""Custom stateful streaming operators via applyInPandasWithState.

The reference handles exactly-once ingestion by reprocessing partition
dates and deduping with prev∪curr ROW_NUMBER (SURVEY §2.9 note,
dags/dataswm/servicenow_api_extract.py:2328-2350). The streaming-native
upgrade keeps per-key state in the state store instead of re-reading
yesterday's output: each key is emitted once across all micro-batches.

Scale notes: state is partitioned by grouping key across executors
(RocksDB-backed in production configs); per-key state here is a single
boolean/timestamp row, so the store stays tiny relative to the stream.
Use a watermark-driven timeout (``state_ttl_seconds``) so keys age out and
state doesn't grow unboundedly over months of streaming.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def stream_dedup_by_key(
    df: DataFrame,
    key_cols: list[str],
    state_ttl_seconds: int | None = None,
) -> DataFrame:
    """Emit only the FIRST row ever seen per key across the whole stream.

    State per key: one marker row. With ``state_ttl_seconds`` set, a key's
    marker expires after that processing-time TTL, after which the key can
    be emitted again (bounded-state mode for infinite keyspaces).
    """
    out_schema = df.schema
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if state_ttl_seconds is not None
        else GroupStateTimeout.NoTimeout
    )

    def dedup(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        first = None
        for pdf in pdfs:
            if len(pdf) > 0:
                first = pdf.head(1)
                break
        if state.exists:
            return
        state.update((1,))
        if state_ttl_seconds is not None:
            state.setTimeoutDuration(state_ttl_seconds * 1000)
        if first is not None:
            yield first

    return (
        df.groupBy(*key_cols)
        .applyInPandasWithState(dedup, out_schema, "seen int", "append", timeout)
    )


def stream_running_counts(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Per-key lifetime event count, updated each micro-batch — the
    minimal custom stateful aggregate (count survives across triggers in
    the state store)."""
    out_schema = ", ".join(f"{c} string" for c in key_cols) + ", n_events bigint"

    def count(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n = state.get[0] if state.exists else 0
        for pdf in pdfs:
            n += len(pdf)
        state.update((n,))
        yield pd.DataFrame(
            [{**{c: str(k) for c, k in zip(key_cols, key)}, "n_events": n}]
        )

    return (
        df.groupBy(*key_cols)
        .applyInPandasWithState(
            count, out_schema, "n bigint", "update", GroupStateTimeout.NoTimeout
        )
    )
