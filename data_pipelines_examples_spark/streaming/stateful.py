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
    ts_col: str | None = None,
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """Emit only the FIRST row ever seen per key across the whole stream.

    State per key: one marker row. With ``state_ttl_seconds`` set, a key's
    marker expires after that TTL, after which the key can be emitted
    again (bounded-state mode for infinite keyspaces).

    TTL clock: pass ``ts_col`` to expire on EVENT time (watermark-driven —
    drain-safe: a drained source stops producing micro-batches and
    ``processAllAvailable()`` returns). Without ``ts_col`` the TTL is
    PROCESSING time — correct for production sources that never drain,
    but a pending processing-time timer keeps the engine scheduling
    micro-batches, so never drive that mode with ``processAllAvailable()``
    on a finite source.
    """
    out_schema = df.schema
    if state_ttl_seconds is None:
        timeout = GroupStateTimeout.NoTimeout
    elif ts_col is not None:
        timeout = GroupStateTimeout.EventTimeTimeout
        df = df.withWatermark(ts_col, watermark_delay)
    else:
        timeout = GroupStateTimeout.ProcessingTimeTimeout
    ttl_ms = None if state_ttl_seconds is None else state_ttl_seconds * 1000

    def dedup(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        first = None
        last_ts_ms = None
        for pdf in pdfs:
            if len(pdf) > 0:
                if first is None:
                    first = pdf.head(1)
                if ts_col is not None:
                    batch_max = int(pd.Timestamp(pdf[ts_col].max()).value // 1_000_000)
                    last_ts_ms = batch_max if last_ts_ms is None else max(last_ts_ms, batch_max)
        if state.exists:
            return
        state.update((1,))
        if ttl_ms is not None:
            if ts_col is not None and last_ts_ms is not None:
                state.setTimeoutTimestamp(
                    max(last_ts_ms + ttl_ms, state.getCurrentWatermarkMs() + 1)
                )
            elif ts_col is None:
                state.setTimeoutDuration(ttl_ms)
        if first is not None:
            yield first

    return (
        df.groupBy(*key_cols)
        .applyInPandasWithState(dedup, out_schema, "seen int", "append", timeout)
    )


def stream_dedup_native(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """Bounded-state streaming dedup via Spark's built-in
    ``dropDuplicatesWithinWatermark`` — the PREFERRED path for the
    TTL'd mode of ``stream_dedup_by_key``: duplicates arriving within the
    watermark delay of the first occurrence are dropped JVM-side, and key
    state expires automatically once the watermark passes (no Python
    worker round-trip, no hand-rolled timers).

    Use ``stream_dedup_by_key`` only for semantics this can't express:
    first-ever-per-key over the WHOLE stream (unbounded state, no
    watermark), or a TTL decoupled from the watermark delay.
    """
    return df.withWatermark(ts_col, watermark_delay).dropDuplicatesWithinWatermark(
        key_cols
    )


def stream_sessionize_native(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """Sessionization via Spark's built-in ``session_window`` — the
    PREFERRED path: session merging runs JVM-side in the streaming
    aggregation operator (no Python worker round-trip, no hand-rolled
    state), and the same expression works identically in batch mode.

    Output matches ``stream_sessionize``: (key, session_start,
    session_end, n_events) where session_end is the LAST EVENT's
    timestamp (``session_window.end`` is last-event + gap; the gap is
    subtracted back here). Sessions emit in append mode once the
    watermark passes the window end.

    Boundary semantics: ``session_window`` windows are half-open, so an
    event arriving EXACTLY ``gap_seconds`` after the previous one starts
    a NEW session; the custom variant (and the batch q11 twin) keeps it
    in the same session (``diff > gap`` splits). Identical for any data
    without exact-boundary gaps. Use ``stream_sessionize`` when the
    closed-boundary rule, early emission of proven-closed sessions, or
    richer per-session state is required.
    """
    from pyspark.sql import functions as F

    gap = f"{gap_seconds} seconds"
    return (
        df.withWatermark(ts_col, watermark_delay)
        .groupBy(F.col(key_col), F.session_window(F.col(ts_col), gap))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col(key_col),
            F.col("session_window.start").alias("session_start"),
            (
                F.col("session_window.end") - F.expr(f"INTERVAL {gap_seconds} SECOND")
            ).alias("session_end"),
            "n_events",
        )
    )


def stream_sessionize(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """Custom stateful sessionization: group events into sessions separated
    by > ``gap_seconds`` of inactivity, across micro-batches.

    Prefer ``stream_sessionize_native`` (JVM-side ``session_window``)
    unless you need this variant's closed-boundary rule, early emission,
    or custom per-session state — this is the custom-logic fallback.
    The batch twin is the windowed gaps-and-islands composition (catalog
    q11); this is its streaming upgrade — state carries the OPEN session
    (start, last_ts, count) per key, closed sessions are emitted as soon
    as a later event proves the gap, and an EVENT-time timeout flushes
    sessions once the watermark passes last_ts + gap. Event-time (not
    processing-time) timeouts keep the query quiescent when no data
    arrives: a processing-time timer would re-arm every invocation and
    keep scheduling micro-batches, so ``processAllAvailable()`` would
    never return on a drained source. State per key is one triple.
    """
    out_schema = (
        f"{key_col} bigint, session_start timestamp, session_end timestamp, n_events bigint"
    )
    gap_ms = gap_seconds * 1000

    def sessionize(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            start_us, last_us, n = state.get
            state.remove()
            yield pd.DataFrame(
                [
                    {
                        key_col: key[0],
                        "session_start": pd.Timestamp(start_us, unit="us"),
                        "session_end": pd.Timestamp(last_us, unit="us"),
                        "n_events": n,
                    }
                ]
            )
            return
        rows = pd.concat(list(pdfs), ignore_index=True).sort_values(ts_col)
        if state.exists:
            start_us, last_us, n = state.get
        else:
            start_us = last_us = None
            n = 0
        closed = []
        for ts in rows[ts_col]:
            ts_us = int(pd.Timestamp(ts).value // 1000)
            if start_us is None:
                start_us, last_us, n = ts_us, ts_us, 1
            elif ts_us - last_us > gap_seconds * 1_000_000:
                closed.append((start_us, last_us, n))
                start_us, last_us, n = ts_us, ts_us, 1
            else:
                last_us, n = ts_us, n + 1
        state.update((start_us, last_us, n))
        # Event-time timeouts must be strictly beyond the current watermark.
        timeout_ms = max(
            last_us // 1000 + gap_ms, state.getCurrentWatermarkMs() + 1
        )
        state.setTimeoutTimestamp(timeout_ms)
        if closed:
            yield pd.DataFrame(
                [
                    {
                        key_col: key[0],
                        "session_start": pd.Timestamp(s, unit="us"),
                        "session_end": pd.Timestamp(e, unit="us"),
                        "n_events": c,
                    }
                    for s, e, c in closed
                ]
            )

    return (
        df.withWatermark(ts_col, watermark_delay)
        .groupBy(key_col)
        .applyInPandasWithState(
            sessionize,
            out_schema,
            "start_us bigint, last_us bigint, n bigint",
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
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


def tws_available():
    """Capability probe for ``transformWithStateInPandas``: returns True
    when usable, else a human-readable reason (missing protobuf — the
    state-server wire protocol — is the common gap in minimal images)."""
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError:
        return "the 'protobuf' Python package is not installed"
    return True


def stream_running_counts_tws(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Per-key lifetime counts via ``transformWithStateInPandas`` — the
    Spark 4 arbitrary-state API (SPARK-49564) and the forward path for
    every custom stateful operator in this module: typed state variables
    (ValueState/ListState/MapState) with per-state TTLs, timers decoupled
    from the grouping pass, and schema-evolvable state — capabilities
    ``applyInPandasWithState`` (``stream_running_counts``) cannot
    express. Output and semantics are identical to the legacy twin; the
    equivalence is pytest-pinned.

    Requires the RocksDB state store provider (transformWithState is
    implemented only there) — set
    ``spark.sql.streaming.stateStore.providerClass`` to
    ``...RocksDBStateStoreProvider``, which is the production profile's
    default anyway (see session.PROFILES / SCALING.md: verified-snapshot
    RocksDB is the 100 TB state backend). ALSO requires the
    ``protobuf`` Python package (the API's state server speaks protobuf
    to the Python worker); ``tws_available()`` probes both so callers
    fail fast with the reason instead of a mid-query worker crash.
    """
    missing = tws_available()
    if missing is not True:
        raise RuntimeError(f"transformWithStateInPandas unavailable: {missing}")
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    out_schema = ", ".join(f"{c} string" for c in key_cols) + ", n_events bigint"

    class RunningCount(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._count = handle.getValueState("count", "n bigint")

        def handleInputRows(self, key, rows, timerValues):
            got = self._count.get()
            n = got[0] if got is not None else 0
            for pdf in rows:
                n += len(pdf)
            self._count.update((n,))
            yield pd.DataFrame(
                [{**{c: str(k) for c, k in zip(key_cols, key)}, "n_events": n}]
            )

        def close(self) -> None:
            pass

    return df.groupBy(*key_cols).transformWithStateInPandas(
        statefulProcessor=RunningCount(),
        outputStructType=out_schema,
        outputMode="Update",
        timeMode="None",
    )
