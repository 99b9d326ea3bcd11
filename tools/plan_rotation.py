"""Plan the next grading-window rotation from the committed correctness
history — the mechanical form of the policy enforced by
tests/test_grading_window.py.

Usage:
    python tools/plan_rotation.py            # plan for round (latest+1)

Prints the 50-entry _PROMOTED list for the next round: stale entries
first (not driver-green within the two rounds the planner can see),
then the oldest non-fresh entries in catalog order, never spending a
slot on an entry green in the newest graded round. Paste the output
into `queries._PROMOTED`, bump `queries._WINDOW_ROUND`, and run
`pytest tests/test_grading_window.py` — the tests verify the same
policy this script applies.
"""

from __future__ import annotations

import json
import os
import re
import sys

WINDOW = 50
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def history() -> tuple[int, dict[str, int]]:
    last_green: dict[str, int] = {}
    latest = 0
    for name in sorted(os.listdir(REPO)):
        m = re.fullmatch(r"CORRECTNESS_r(\d+)\.json", name)
        if not m:
            continue
        r = int(m.group(1))
        latest = max(latest, r)
        with open(os.path.join(REPO, name)) as f:
            for entry, row in json.load(f).items():
                ok = (
                    row.get("rows_match")
                    and row.get("schema_match")
                    and row.get("hash_match") in (True, None)
                    and not row.get("err")
                )
                if ok:
                    last_green[entry] = max(last_green.get(entry, 0), r)
    return latest, last_green


def frozen_rounds() -> set[int]:
    """Rounds during which the rotation clock was PAUSED: optimization
    rounds (PERF_r*.json ``optimization_round: true``) hold the graded
    surface fixed by their brief — rotating _PROMOTED there would make
    previously-graded queries disappear from the round's CORRECTNESS
    artifact, which the optimization driver treats as a regression. The
    driver still grades the frozen window, so these rounds appear in
    the correctness history without advancing the rotation schedule."""
    frozen: set[int] = set()
    for name in sorted(os.listdir(REPO)):
        m = re.fullmatch(r"PERF_r(\d+)\.json", name)
        if not m:
            continue
        try:
            with open(os.path.join(REPO, name)) as f:
                if json.load(f).get("optimization_round"):
                    frozen.add(int(m.group(1)))
        except (OSError, ValueError):
            pass
    return frozen


def main() -> None:
    from data_pipelines_examples_spark import queries as cat

    latest, last_green = history()
    frozen = frozen_rounds()
    # rotation-eligible graded rounds, newest first: the staleness
    # references skip frozen (optimization) rounds so a paused clock
    # does not mark half the catalog overdue
    eligible = [
        r
        for r in range(latest, 0, -1)
        if r not in frozen
        and os.path.exists(os.path.join(REPO, f"CORRECTNESS_r{r:02d}.json"))
    ]
    newest_rotatable = eligible[0] if eligible else latest
    prev_rotatable = eligible[1] if len(eligible) > 1 else newest_rotatable - 1
    oracled = [n for n in cat.queries() if n in cat.oracle_sql()]
    stale = [n for n in oracled if last_green.get(n, 0) < prev_rotatable]
    # fill with non-fresh entries (not green in the newest rotation-
    # eligible round), oldest-green first, catalog order within a round
    fresh = {n for n in oracled if last_green.get(n, 0) >= newest_rotatable}
    fill = [
        n
        for n in sorted(
            (n for n in oracled if n not in stale and n not in fresh),
            key=lambda n: last_green.get(n, 0),
        )
    ]
    if len(stale) > WINDOW:
        raise SystemExit(
            f"{len(stale)} stale entries exceed the {WINDOW}-slot window — "
            "rotation has fallen more than a full cycle behind"
        )
    window = stale + fill[: WINDOW - len(stale)]
    if len(window) < WINDOW:
        print(
            f"# WARNING: only {len(window)} entries available for a "
            f"{WINDOW}-slot window (fill ran dry) — verify before pasting",
            file=sys.stderr,
        )
    left_out = [n for n in oracled if n not in set(window) and n not in fresh]
    print(f"# window planned for round {latest + 1} "
          f"(history through r{latest}; {len(stale)} stale + {len(window)-len(stale)} fill)")
    print("_WINDOW_ROUND =", latest + 1)
    print("_PROMOTED = [")
    for n in window:
        tag = "stale" if n in set(stale) else f"green r{last_green.get(n, 0)}"
        print(f'    "{n}",  # {tag}')
    print("]")
    if left_out:
        print(f"# waiting for round {latest + 2}: {left_out}")


if __name__ == "__main__":
    main()
