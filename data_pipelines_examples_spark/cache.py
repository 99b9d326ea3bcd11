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

Thread model: all registry mutations run under one process-wide lock
(Spark drives foreachBatch bodies on its micro-batch threads, so two
concurrent streams — or a stream plus driver-thread library calls —
interleave here in NORMAL use, not misuse; an unlocked read-modify-
write could lose a concurrent arm, leaving a frame cached but
unreleasable forever). Scopes additionally attribute each arm to the
thread that made it, so one thread's scope exit never drains a
DISTINCT-plan persist another thread armed mid-scope (see
:func:`internal_persist_scope`; Spark's CacheManager keys cache
entries by logical plan, so two arms over one plan SHARE a cache
entry — scope exit defers the unpersist whenever an equal-plan arm is
still registered, leaving the shared entry for the surviving owner's
own drain). :func:`release_cached` stays global across threads by
design — it is the between-logical-units drain.
"""

from __future__ import annotations

import threading
from contextlib import contextmanager

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

# (frame, ident of the thread that armed it, plan key at arm time)
_TRACKED: list[tuple[DataFrame, int, object]] = []
_LOCK = threading.RLock()
# self-prune trigger; doubles past 128 so a registry that LEGITIMATELY
# holds many live entries doesn't re-sweep (n JVM roundtrips) per arm
_PRUNE_AT = 128


def _is_cached(df: DataFrame) -> bool:
    lvl = df.storageLevel
    return lvl.useMemory or lvl.useDisk or lvl.useOffHeap


def _plan_key(df: DataFrame):
    """Semantic identity of the frame's analyzed plan — the key Spark's
    CacheManager dedupes cache entries by (approximated here by the
    canonicalized plan's semanticHash). None when unavailable.

    Known limits, both benign: (a) under Spark CONNECT there is no
    ``_jdf``, so every frame yields None and the equal-plan deferral is
    DISABLED — a scope exit may then evict an entry an equal-plan arm
    still wanted, forcing a silent recompute (perf-only; classic-mode
    sessions, which this sandbox and the target clusters run, are
    unaffected); (b) semanticHash is a hash, so a collision DEFERS an
    unrelated frame's release to its owner's later drain — a bounded
    leak window, never a premature eviction."""
    try:
        return df._jdf.queryExecution().analyzed().semanticHash()
    except Exception:  # noqa: BLE001 — dead session / connect-only API
        return None


def persist_internal(
    df: DataFrame, level: StorageLevel = StorageLevel.MEMORY_AND_DISK
) -> DataFrame:
    """Persist an operator-internal frame and register it for
    :func:`release_cached`. Chain-friendly: ``df.transform(persist_internal)``."""
    global _PRUNE_AT
    # The ARM IS ATOMIC: persist() and the registry append happen under
    # one lock acquisition (r10 — closes the last documented race: a
    # persist() that had not yet appended its entry could lose the
    # shared cache entry to a concurrent scope exit's equal-plan check,
    # which saw no registered owner and unpersisted the plan). Releases
    # hold the same lock across their check+unpersist, so an armed
    # frame is either visible to the check or not yet persisted —
    # never cached-but-unregistered. Cost: the lock spans two py4j
    # roundtrips (persist + semanticHash) per arm; arms are per
    # operator call, not per row, so contention is negligible next to
    # the silent full recompute the race could cause.
    with _LOCK:
        df.persist(level)
        # plan key captured AT ARM TIME so scope exits can re-check
        # equal-plan ownership with no JVM calls — see
        # internal_persist_scope
        pk = _plan_key(df)
        _TRACKED.append((df, threading.get_ident(), pk))
        do_prune = len(_TRACKED) > _PRUNE_AT
        snapshot = list(_TRACKED) if do_prune else None
    # Self-prune: a long-lived process that clears caches some other way
    # (spark.catalog.clearCache between bench entries) would otherwise
    # accumulate dead wrappers — each pinning a py4j-backed plan —
    # forever. The liveness probes are py4j roundtrips, so they run on a
    # snapshot OUTSIDE the lock (holding it would stall every other
    # thread's arm/drain for ~n roundtrips); the rebuild under the lock
    # drops only ids the probe saw dead, never entries added meanwhile.
    if do_prune:
        dead_ids = set()
        for entry in snapshot:
            try:
                if not _is_cached(entry[0]):
                    dead_ids.add(id(entry[0]))
            except Exception:  # noqa: BLE001
                dead_ids.add(id(entry[0]))
        with _LOCK:
            # snapshot entries stay referenced until here, so dead ids
            # cannot have been recycled by frames armed meanwhile
            _TRACKED[:] = [e for e in _TRACKED if id(e[0]) not in dead_ids]
            _PRUNE_AT = max(128, 2 * len(_TRACKED))
        del snapshot
    return df


@contextmanager
def internal_persist_scope(blocking: bool = False):
    """Scope-local drain for TERMINAL library compositions (fit/report
    functions whose return value is driver-resident, not a lazy plan):
    on exit — success OR exception — release exactly the internal
    persists armed INSIDE the scope BY THIS THREAD, leaving untouched
    both persists armed before it (e.g. a caller's still-unconsumed
    ``ngram_jaccard_pairs`` frame) and persists other threads armed
    while the scope was open (e.g. a concurrent stream's micro-batch
    mid-consumption — draining those would force silent full
    recomputes inside its writes). A global :func:`release_cached`
    here would have both problems; the snapshot + thread attribution
    make the drain precise.

    Identity-based, with a strong-reference ANCHOR: ids in the snapshot
    must stay un-recyclable for the scope's whole lifetime. The registry
    alone cannot guarantee that — a :func:`release_cached` call or the
    self-prune sweep running INSIDE the scope drops the registry's
    references, a collected pre-scope wrapper's id could then be recycled
    by a frame persisted inside the scope, and that frame would be kept
    instead of drained (a deferred release, not corruption — but a leak).
    Holding ``anchor`` until scope exit makes recycling impossible.

    EQUAL-PLAN deferral: Spark's CacheManager keys cache entries by
    logical plan, so unpersisting this scope's arm would ALSO evict an
    equal-plan frame another caller armed (same operator over the same
    input — plausible across concurrent requests), forcing its silent
    recompute. Exit therefore skips frames whose plan is still
    registered to someone else; the surviving owner's own drain
    releases the shared entry (a deferred release, never a premature
    one). The equal-plan check re-reads the registry UNDER the lock
    immediately before each unpersist (plan keys are captured at arm
    time, so the locked re-check costs no JVM calls) — an equal-plan
    arm registered at any point before the release is honored, and the
    unpersist itself runs under the SAME lock acquisition as the check
    (r10): since :func:`persist_internal` arms atomically (persist +
    append under one lock hold), a concurrent arm is either fully
    visible to the check — and deferred to — or has not persisted yet
    and will re-create the cache entry after the release. The old
    cached-but-unregistered window is gone. A ``blocking=True`` exit
    holds the lock while executors free storage — acceptable because
    scopes drain between logical units, where a stalled concurrent arm
    is rarer and cheaper than the silent recompute the race caused.
    """
    me = threading.get_ident()
    global _PRUNE_AT
    with _LOCK:
        anchor = [entry[0] for entry in _TRACKED]
    before = {id(df) for df in anchor}
    try:
        yield
    finally:
        with _LOCK:
            kept: list[tuple[DataFrame, int, object]] = []
            to_release: list[tuple[DataFrame, object]] = []
            for entry in _TRACKED:
                df, owner, pk = entry
                if id(df) in before or owner != me:
                    kept.append(entry)
                else:
                    to_release.append((df, pk))
            _TRACKED[:] = kept
            _PRUNE_AT = max(128, 2 * len(_TRACKED))
        # per-frame lock re-acquire spanning the equal-plan check AND
        # the unpersist (r10): check-then-unpersist outside the lock
        # left a window where an arm registered between them lost the
        # shared entry. Arms also persist under this lock, so the pair
        # is race-free; the lock is released between frames to bound
        # any single hold.
        for df, pk in to_release:
            try:
                with _LOCK:
                    if pk is not None and any(e[2] == pk for e in _TRACKED):
                        # the cache entry is shared with a still-
                        # registered arm — defer to that owner's drain
                        continue
                    if _is_cached(df):
                        df.unpersist(blocking)
            except Exception:  # noqa: BLE001 — a dead session's frames just drop
                pass
        del anchor  # held until here so no `before` id could be recycled


def release_cached(blocking: bool = False) -> int:
    """Unpersist every still-cached frame this library persisted —
    across ALL threads; returns how many were released. Safe to call
    repeatedly (idempotent) and never touches caches the user created
    directly."""
    global _PRUNE_AT
    with _LOCK:
        drained = list(_TRACKED)
        _TRACKED.clear()
        # reset the self-prune ratchet: after a transient spike the old
        # (doubled) threshold would otherwise let dead wrappers pile up
        # to the spike's size before the next sweep fires
        _PRUNE_AT = 128
    released = 0
    # same per-frame locked check+unpersist as the scope exit (r10): a
    # concurrent arm that re-registered an equal plan AFTER the clear
    # above owns the shared cache entry now — skip it and let that
    # arm's own drain release it; holding the lock across the pair
    # excludes the arm-between-check-and-unpersist race.
    for df, _owner, pk in drained:
        try:
            with _LOCK:
                if pk is not None and any(e[2] == pk for e in _TRACKED):
                    continue
                if _is_cached(df):
                    df.unpersist(blocking)
                    released += 1
        except Exception:  # noqa: BLE001 — a dead session's frames just drop
            pass
    return released
