"""The grading window is load-bearing: the driver hash-grades only the
FIRST 50 catalog entries, so the _PROMOTED rotation mechanism decides
which operators get driver verification. A typo in the list would
silently shrink or reshuffle the graded set — these pins make that a
test failure instead.

Round 6 added the STALENESS INVARIANT; round 7 made it TIME-INVARIANT.
The r6 formulation evaluated the window against "the latest committed
CORRECTNESS_r*.json", so the moment the driver dropped the round's own
grading artifact the tests demanded the NEXT rotation — designed-red at
every judging (r6 verdict finding 1). Worse, with 105 oracled entries
and 50 slots/round, "everything green within the last 2 rounds" is
unsatisfiable (2 × 50 < 105), so some entry is ALWAYS two rounds stale
at judging time. The r7 formulation splits the concern:

- the ROTATION POLICY tests evaluate the window against the history
  that existed when the window was planned (rounds < _WINDOW_ROUND,
  committed alongside the window) — green at judging, red the moment a
  builder edits _PROMOTED incorrectly for the round it claims;
- the ROLLING COVERAGE alarm evaluates full history with the capacity-
  honest horizon ceil(n_oracled / 50) rounds — it fires only when a
  rotation was genuinely missed, which is exactly when red is correct.
"""

from __future__ import annotations

import json
import math
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


def _driver_history(before_round: int | None = None):
    """(latest_round, {entry: last_driver_green_round}) from the
    CORRECTNESS_r*.json files at the repo root, optionally truncated to
    rounds < before_round (the history that existed when a window was
    planned). "Green" = rows+schema match, hash matches when a hash was
    computed, and no error."""
    last_green: dict[str, int] = {}
    latest = 0
    for p in sorted(REPO.glob("CORRECTNESS_r*.json")):
        r = int(re.search(r"r(\d+)", p.name).group(1))
        if before_round is not None and r >= before_round:
            continue
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


def _frozen_rounds() -> set[int]:
    """Rounds whose rotation clock was PAUSED: optimization rounds
    (PERF_r*.json ``optimization_round: true``) hold the graded surface
    fixed by their brief — rotating _PROMOTED there would make
    previously-graded queries disappear from that round's CORRECTNESS
    artifact, which the optimization driver treats as a regression. The
    driver still grades the frozen window, so such rounds appear in the
    correctness history without advancing the rotation schedule."""
    frozen: set[int] = set()
    for p in REPO.glob("PERF_r*.json"):
        try:
            if json.loads(p.read_text()).get("optimization_round"):
                frozen.add(int(re.search(r"r(\d+)", p.name).group(1)))
        except (OSError, ValueError):
            pass
    return frozen


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


def test_window_round_is_current():
    """_WINDOW_ROUND tracks the round the committed window targets. It
    may lag the newest correctness file by at most one round — exactly
    the judging moment, when the driver has just graded this window and
    the NEXT builder owes the rotation (enforced one round later by the
    rolling-coverage alarm). A larger lag means rotations stopped."""
    cat = _catalog()
    latest, _ = _driver_history()
    assert latest >= 5, "correctness history missing from repo root"
    # frozen (optimization) rounds hold the window by their brief and
    # don't count against the one-round plannable lag
    lag_allowed = 1 + len(
        _frozen_rounds() & set(range(cat._WINDOW_ROUND + 1, latest + 1))
    )
    assert latest <= cat._WINDOW_ROUND + lag_allowed, (
        f"window planned for r{cat._WINDOW_ROUND} but history reaches "
        f"r{latest} — more than one rotation-eligible grading has passed "
        "without a rotation"
    )
    assert cat._WINDOW_ROUND <= latest + 1, (
        f"_WINDOW_ROUND={cat._WINDOW_ROUND} is ahead of the history "
        f"(r{latest}) by more than the one plannable round"
    )


def test_staleness_invariant_no_oracled_entry_left_behind():
    """THE rotation policy, evaluated against the history that existed
    when the window was planned (time-invariant — the driver dropping
    this round's own artifact cannot flip it): anything not driver-green
    within the two rounds before _WINDOW_ROUND must occupy a slot."""
    cat = _catalog()
    planned_latest, last_green = _driver_history(before_round=cat._WINDOW_ROUND)
    assert planned_latest >= 5, "correctness history missing from repo root"
    window = set(list(cat.queries().keys())[:WINDOW])
    graded_pool = set(cat.oracle_sql().keys()) | ROWS_ONLY_GRADED
    stale = {
        n
        for n in graded_pool
        if last_green.get(n, 0) < planned_latest - 1
    }
    assert len(stale) <= WINDOW, (
        f"{len(stale)} stale entries cannot fit one window — rotation "
        "has fallen more than a full cycle behind"
    )
    left_behind = stale - window
    assert not left_behind, (
        f"oracled entries stale since r{planned_latest - 2} or earlier are "
        f"not in the r{cat._WINDOW_ROUND} graded window: {sorted(left_behind)}"
    )


def test_window_wastes_no_slot_on_fresh_entries():
    """While older-green oracled entries wait outside the window, no slot
    may go to an entry that was already green in the newest round the
    planner could see. (Guarded: only enforceable while enough non-fresh
    entries exist.)"""
    cat = _catalog()
    planned_latest, last_green = _driver_history(before_round=cat._WINDOW_ROUND)
    oracled = set(cat.oracle_sql().keys()) | ROWS_ONLY_GRADED
    not_fresh = {n for n in oracled if last_green.get(n, 0) < planned_latest}
    if len(not_fresh) < WINDOW:
        return
    window = list(cat.queries().keys())[:WINDOW]
    wasted = [n for n in window if last_green.get(n, 0) >= planned_latest]
    assert not wasted, (
        f"window slots spent on entries already green in r{planned_latest} "
        f"while older entries wait: {wasted}"
    )


def test_rolling_coverage_every_oracled_entry_recently_green():
    """The alarm that replaces r6's designed-red tripwire: every oracled
    entry must be driver-green within the last ceil(n/WINDOW) graded
    rounds (full history, judging-time state included). With 105 entries
    that horizon is 3 — satisfiable by construction when each round's
    builder rotates, red exactly when a rotation was missed."""
    cat = _catalog()
    latest, last_green = _driver_history()
    assert latest >= 5, "correctness history missing from repo root"
    oracled = set(cat.oracle_sql().keys())
    horizon = math.ceil(len(oracled) / WINDOW)
    if latest < horizon + 3:
        # not enough history for the horizon to be meaningful pre-r5
        return
    # the horizon counts ROTATION-ELIGIBLE rounds: optimization rounds
    # freeze the window by their brief (see _frozen_rounds), so the
    # coverage threshold is the horizon-th most recent non-frozen
    # graded round — with no frozen rounds this is exactly the old
    # latest - horizon + 1
    frozen = _frozen_rounds()
    graded = sorted(
        (int(re.search(r"r(\d+)", p.name).group(1)) for p in REPO.glob("CORRECTNESS_r*.json")),
        reverse=True,
    )
    eligible = [r for r in graded if r not in frozen]
    if len(eligible) < horizon:
        return
    threshold = eligible[horizon - 1]
    overdue = {n for n in oracled if last_green.get(n, 0) < threshold}
    assert not overdue, (
        f"oracled entries with no driver-green row since the last {horizon} "
        f"rotation-eligible rounds (r{threshold}..r{latest}, frozen "
        f"{sorted(frozen & set(range(threshold, latest + 1)))} excluded): "
        f"{sorted(overdue)} — a rotation was missed; rotate _PROMOTED and "
        "bump _WINDOW_ROUND"
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


def test_rotation_planner_replans_current_window_exactly():
    """tools/plan_rotation.py re-run on the committed history through
    round _WINDOW_ROUND-1 must reproduce queries._PROMOTED verbatim —
    the window in force IS the planner's output, not a hand edit."""
    import re
    import subprocess
    import sys

    out = subprocess.run(
        [sys.executable, str(REPO / "tools" / "plan_rotation.py")],
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    planned = re.findall(r'^\s+"(q[^"]+)",', out, re.M)
    from data_pipelines_examples_spark import queries as cat

    # only compare when the history the planner sees is the history the
    # committed window was planned from (mid-round, before the driver
    # drops this round's files)
    m = re.search(r"window planned for round (\d+)", out)
    assert m is not None, f"planner banner line missing from output:\n{out}"
    if int(m.group(1)) == cat._WINDOW_ROUND:
        assert planned == list(cat._PROMOTED)


def test_rotation_planner_warns_on_short_window(tmp_path):
    """A fill that runs dry must WARN (stderr), never print a silently
    short window a paste could carry into queries._PROMOTED."""
    import importlib.util
    import io
    import sys
    from contextlib import redirect_stderr, redirect_stdout

    spec = importlib.util.spec_from_file_location(
        "plan_rotation", str(REPO / "tools" / "plan_rotation.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    # shrink the catalog the planner sees: pretend only 9 oracled
    # entries exist so stale+fill can never reach the 50-slot window
    import data_pipelines_examples_spark.queries as cat

    real_q, real_o = cat.queries, cat.oracle_sql
    few = dict(list(real_q().items())[:9])
    few_sql = {k: v for k, v in real_o().items() if k in few}
    cat_queries = lambda: few  # noqa: E731
    cat_oracle = lambda: few_sql  # noqa: E731
    try:
        cat.queries, cat.oracle_sql = cat_queries, cat_oracle
        out, err = io.StringIO(), io.StringIO()
        with redirect_stdout(out), redirect_stderr(err):
            mod.main()
        assert "WARNING" in err.getvalue()
        assert "fill ran dry" in err.getvalue()
    finally:
        cat.queries, cat.oracle_sql = real_q, real_o
