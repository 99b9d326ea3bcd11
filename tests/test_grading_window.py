"""The grading window is load-bearing: the driver hash-grades only the
FIRST 50 catalog entries, so the _PROMOTED/_DEPRIORITIZED rotation
mechanism decides which operators get driver verification. A typo in
either list would silently shrink or reshuffle the graded set — these
pins make that a test failure instead.

Round 6 adds the STALENESS INVARIANT (r5 verdict item 2): the rotation
is no longer a hand-written snapshot but a policy checked against the
committed CORRECTNESS_r*.json history — every oracled entry whose last
driver-green row is older than (latest_round − 1), or that has never
been driver-green, must occupy a slot in the upcoming window. A future
promotion that re-orphans an entry (the q25/q64 failure mode of rounds
2-5) now fails pytest instead of surfacing in a judge verdict.
"""

from __future__ import annotations

import json
import re
from pathlib import Path

WINDOW = 50

REPO = Path(__file__).resolve().parent.parent

# Catalog entries that legitimately carry no oracle: engine-specific
# (xxhash64) by design — DuckDB lacks the hash, so their portable md5
# twins q33/q34 are the hash-graded surface. The round-6 experiment of
# giving them graded slots anyway is CONCLUDED: the driver records
# `err: "no_oracle"` and skips unoracled entries (no rows-only check
# exists), so they are permanently rotated out of the window
# (CORRECTNESS_r06.json holds the breadcrumb rows).
NO_ORACLE_ALLOWED = {
    "q87_minhash_fast_path",
    "q88_simhash_fast_path",
}

# No-oracle entries deliberately occupying graded slots this round.
# Empty since round 7 — see NO_ORACLE_ALLOWED above for why q87/q88
# never return to the window.
ROWS_ONLY_GRADED: set[str] = set()


def _catalog():
    from data_pipelines_examples_spark import queries as catalog

    return catalog


def _driver_history():
    """(latest_round, {entry: last_driver_green_round}) from the committed
    CORRECTNESS_r*.json files. "Green" = rows+schema match, hash matches
    when a hash was computed (rows-only entries have hash_match None),
    and no error."""
    last_green: dict[str, int] = {}
    latest = 0
    for p in sorted(REPO.glob("CORRECTNESS_r*.json")):
        r = int(re.search(r"r(\d+)", p.name).group(1))
        latest = max(latest, r)
        for name, row in json.loads(p.read_text()).items():
            ok = (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match") in (True, None)
                and not row.get("err")
            )
            if ok:
                last_green[name] = max(last_green.get(name, 0), r)
    return latest, last_green


def test_rotation_lists_reference_real_entries():
    cat = _catalog()
    qs = cat.queries()
    for name in cat._PROMOTED:
        assert name in qs, f"_PROMOTED names unknown entry {name}"
    for name in cat._DEPRIORITIZED:
        assert name in qs, f"_DEPRIORITIZED names unknown entry {name}"
    overlap = set(cat._PROMOTED) & set(cat._DEPRIORITIZED)
    assert not overlap, f"entries both promoted and deprioritized: {overlap}"


def test_graded_window_is_exactly_the_promoted_list():
    cat = _catalog()
    names = list(cat.queries().keys())
    assert len(cat._PROMOTED) == WINDOW, (
        f"_PROMOTED must fill the window exactly: {len(cat._PROMOTED)}"
    )
    assert names[:WINDOW] == cat._PROMOTED, (
        "graded window drifted from the planned rotation"
    )


def test_staleness_invariant_no_oracled_entry_left_behind():
    """THE rotation policy: anything not driver-green within the last two
    graded rounds (or never green) must be in the upcoming window."""
    cat = _catalog()
    latest, last_green = _driver_history()
    assert latest >= 5, "correctness history missing from repo root"
    window = set(list(cat.queries().keys())[:WINDOW])
    graded_pool = set(cat.oracle_sql().keys()) | ROWS_ONLY_GRADED
    stale = {
        n
        for n in graded_pool
        if last_green.get(n, 0) < latest - 1
    }
    assert len(stale) <= WINDOW, (
        f"{len(stale)} stale entries cannot fit one window — rotation "
        "has fallen more than a full cycle behind"
    )
    left_behind = stale - window
    assert not left_behind, (
        f"oracled entries stale since r{latest - 2} or earlier are not "
        f"in the upcoming graded window: {sorted(left_behind)}"
    )


def test_window_wastes_no_slot_on_fresh_entries():
    """While older-green oracled entries wait outside the window, no slot
    may go to an entry that is already green in the LATEST graded round.
    (Guarded: only enforceable while enough non-fresh entries exist.)"""
    cat = _catalog()
    latest, last_green = _driver_history()
    oracled = set(cat.oracle_sql().keys()) | ROWS_ONLY_GRADED
    not_fresh = {n for n in oracled if last_green.get(n, 0) < latest}
    if len(not_fresh) < WINDOW:
        return
    window = list(cat.queries().keys())[:WINDOW]
    wasted = [n for n in window if last_green.get(n, 0) >= latest]
    assert not wasted, (
        f"window slots spent on entries already green in r{latest} while "
        f"older entries wait: {wasted}"
    )


def test_every_graded_entry_has_oracle_unless_rows_only():
    cat = _catalog()
    names = list(cat.queries().keys())
    oracles = cat.oracle_sql()
    missing = [
        n for n in names[:WINDOW] if n not in oracles and n not in ROWS_ONLY_GRADED
    ]
    assert not missing, f"graded entries without an oracle: {missing}"


def test_every_catalog_entry_has_oracle_unless_allowed():
    cat = _catalog()
    names = set(cat.queries().keys())
    oracles = set(cat.oracle_sql().keys())
    missing = names - oracles - NO_ORACLE_ALLOWED
    assert not missing, f"entries without oracle or allowlist reason: {missing}"
    stale = NO_ORACLE_ALLOWED - names
    assert not stale, f"allowlist names unknown entries: {stale}"
    assert ROWS_ONLY_GRADED <= NO_ORACLE_ALLOWED, (
        "rows-only graded entries must be on the no-oracle allowlist"
    )
