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


def main() -> None:
    from data_pipelines_examples_spark import queries as cat

    latest, last_green = history()
    oracled = [n for n in cat.queries() if n in cat.oracle_sql()]
    stale = [n for n in oracled if last_green.get(n, 0) < latest - 1]
    # fill with non-fresh entries (not green in the newest round),
    # oldest-green first, catalog order within a round
    fresh = {n for n in oracled if last_green.get(n, 0) >= latest}
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
