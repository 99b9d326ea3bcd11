"""Caller-owned release hook for the library's internal persists.

Multi-consumer operators persist a narrow internal frame and return a
LAZY DataFrame over it (see SCALING.md "Internal-persist lifecycle"):
the operator cannot unpersist before returning — the caller hasn't
consumed the result yet — so in a long-lived session those caches
accumulate. ``spark.catalog.clearCache()`` works but nukes the USER'S
caches too; this registry releases exactly the frames this library
persisted.

Every internal persist routes through :func:`persist_internal`, which
records the frame in a process-wide registry. The registry holds STRONG
references deliberately: the JVM's CacheManager keys cache entries by
logical plan, not by the Python wrapper, so an operator's internal
DataFrame object dying at function exit does NOT release the executor
storage — a weak registry would forget exactly the entries that need
releasing. The wrappers are tiny; the registry drains on every call to
:func:`release_cached`. Call it between logical units of a resident
session — notebook cells, benchmark entries, service requests:

    from data_pipelines_examples_spark import release_cached
    ...
    n = release_cached()          # async (non-blocking) by default
    n = release_cached(blocking=True)  # wait for executors to free it
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

_TRACKED: list[DataFrame] = []


def persist_internal(
    df: DataFrame, level: StorageLevel = StorageLevel.MEMORY_AND_DISK
) -> DataFrame:
    """Persist an operator-internal frame and register it for
    :func:`release_cached`. Chain-friendly: ``df.transform(persist_internal)``."""
    df.persist(level)
    _TRACKED.append(df)
    # Self-prune: a long-lived process that clears caches some other way
    # (spark.catalog.clearCache between bench entries) would otherwise
    # accumulate dead wrappers — each pinning a py4j-backed plan —
    # forever. Cheap O(n) sweep, amortized by the threshold.
    if len(_TRACKED) > 128:
        live = []
        for d in _TRACKED:
            try:
                lvl = d.storageLevel
                if lvl.useMemory or lvl.useDisk or lvl.useOffHeap:
                    live.append(d)
            except Exception:  # noqa: BLE001
                pass
        _TRACKED[:] = live
    return df


@contextmanager
def internal_persist_scope(blocking: bool = False):
    """Scope-local drain for TERMINAL library compositions (fit/report
    functions whose return value is driver-resident, not a lazy plan):
    on exit — success OR exception — release exactly the internal
    persists armed INSIDE the scope, leaving persists armed before it
    (e.g. a caller's still-unconsumed ``ngram_jaccard_pairs`` frame)
    untouched. A global :func:`release_cached` here would drop caches
    backing unrelated pending lazy frames and silently trigger full
    recomputes; the snapshot makes the drain precise.

    Identity-based, with a strong-reference ANCHOR: ids in the snapshot
    must stay un-recyclable for the scope's whole lifetime. The registry
    alone cannot guarantee that — a :func:`release_cached` call or the
    self-prune sweep running INSIDE the scope drops the registry's
    references, a collected pre-scope wrapper's id could then be recycled
    by a frame persisted inside the scope, and that frame would be kept
    instead of drained (a deferred release, not corruption — but a leak).
    Holding ``anchor`` until scope exit makes recycling impossible.

    Driver-concurrency contract: the registry is process-wide and
    lock-free, which assumes the standard single-threaded Spark driver.
    If multiple request threads call into this library concurrently, a
    persist armed by one thread while another thread's scope is open is
    drained at that scope's exit — serialize library calls, or give each
    request its own scope and don't overlap them."""
    anchor = list(_TRACKED)
    before = {id(df) for df in anchor}
    try:
        yield
    finally:
        kept: list[DataFrame] = []
        for df in _TRACKED:
            if id(df) in before:
                kept.append(df)
                continue
            try:
                lvl = df.storageLevel
                if lvl.useMemory or lvl.useDisk or lvl.useOffHeap:
                    df.unpersist(blocking)
            except Exception:  # noqa: BLE001 — a dead session's frames just drop
                pass
        _TRACKED[:] = kept
        del anchor  # held until here so no `before` id could be recycled


def release_cached(blocking: bool = False) -> int:
    """Unpersist every still-cached frame this library persisted; returns
    how many were released. Safe to call repeatedly (idempotent) and
    never touches caches the user created directly."""
    released = 0
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            lvl = df.storageLevel
            if lvl.useMemory or lvl.useDisk or lvl.useOffHeap:
                df.unpersist(blocking)
                released += 1
        except Exception:  # noqa: BLE001 — a dead session's frames just drop
            pass
    return released
