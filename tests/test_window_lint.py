"""Standing lint: no NEW unpartitioned windows sneak into the package.

Round 10 found two genuine 100-TB defects (pq_adc_topk's global
row_number, q106's Pareto cumsum) by hand-auditing every
``Window.orderBy(...)`` built without a ``partitionBy``. This encodes
that audit: the source tree is scanned for unpartitioned-window
construction sites, and any site not in the reviewed allowlist fails
the build with instructions. An unpartitioned window moves EVERY row to
one partition (WindowExec's warning is literal) — fine over a
dimension-bounded post-agg frame or the k survivors of a
TakeOrderedAndProject, fatal over unbounded data. The scale-path
alternatives are ``global_cumulative_sum`` (distributed prefix sum) and
orderBy+limit-then-window (global top-k).
"""

from __future__ import annotations

import re
from pathlib import Path

PKG = Path(__file__).resolve().parent.parent / "data_pipelines_examples_spark"

# Matches a Window built with NO partition spec: `Window.orderBy(` at a
# call site (not `Window.partitionBy(...).orderBy(`), plus the literal
# empty `Window.partitionBy()` grand-total form.
_UNPARTITIONED = re.compile(r"Window\.orderBy\(|Window\.partitionBy\(\s*\)")

# Reviewed sites: (path relative to the package, exact stripped line)
# -> (expected occurrence count, justification). Each entry states WHY
# the unpartitioned window is legal there AND how many times that exact
# line legitimately appears in the file — so a NEW unbounded window
# whose text happens to match an allowlisted line (e.g. a fourth
# `w = Window.orderBy(*orders)` in operators/windows.py) trips the lint
# instead of hiding behind the existing justification. Adding a site or
# bumping a count requires the same justification discipline — say
# which bound keeps the single WindowExec partition small, or which
# documented non-scale tier the new occurrence belongs to.
ALLOWED: dict[tuple[str, str], tuple[int, str]] = {
    # --- caller-controlled APIs: partition_by=None falls back to the
    # naive global form, documented on each docstring as the
    # bounded-dimension tier (scale path: global_cumulative_sum /
    # explicit partitioning). The `if partition_by` guard is the point.
    ("ml.py", "w = Window.orderBy(*orders)"):
        (1, "lead_label fallback (caller-bounded)"),
    ("operators/windows.py", "w = Window.orderBy(*orders)"):
        (3, "cumulative_sum / lag_features / ntile fallbacks (caller-bounded; "
            "scale path is global_cumulative_sum)"),
    ("operators/windows.py", "w = Window.orderBy(order)"):
        (1, "interval RANGE frame fallback (caller-bounded)"),
    ("operators/windows.py",
     "w = Window.partitionBy(*parts).orderBy(*orders) if parts else Window.orderBy(*orders)"):
        (1, "streaks fallback (caller-bounded)"),
    # --- bounded by construction
    ("operators/windows.py",
     'w_off = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)'):
        (1, "global_cumulative_sum offsets prefix — one row per shuffle partition"),
    ("operators/sampling.py", 'wlev = Window.orderBy(F.col("__q").desc())'):
        (1, "budget_selection level boundaries — one row per distinct quality level"),
    # --- k survivors of a TakeOrderedAndProject (orderBy+limit ran first)
    ("operators/ranking.py",
     'w = Window.orderBy(F.col("score").desc(), F.col(id_col).asc())'):
        (1, "bm25 top-k rank over k rows post-limit"),
    ("operators/similarity.py",
     'w = Window.orderBy(F.col("approx_dist").asc(), F.col(id_col))'):
        (1, "pq_adc top-k rank over k rows post-limit"),
    # --- documented non-scale tiers with a stated scale alternative
    ("ml.py", "w = Window.orderBy(F.coalesce(F.col(c), F.lit(0)))"):
        (1, "quantile_buckets rank tier (docstring points to approxQuantile edges)"),
    ("operators/zorder.py", "w = Window.orderBy(F.col(c))"):
        (1, "zorder rank normalization tier (minmax curve keys are the scale path)"),
}


def scan(source: str, relpath: str) -> list[tuple[str, str]]:
    """Return an offender entry for every unpartitioned-window
    construction site in ``source`` not covered by ALLOWED — including
    occurrences BEYOND an allowlisted line's expected count (each excess
    occurrence is one offender)."""
    counts: dict[str, int] = {}
    for line in source.splitlines():
        stripped = line.strip()
        if stripped.startswith("#"):
            continue
        if _UNPARTITIONED.search(stripped):
            counts[stripped] = counts.get(stripped, 0) + 1
    hits = []
    for stripped, n in counts.items():
        expected = ALLOWED.get((relpath, stripped), (0, ""))[0]
        if n > expected:
            label = (
                f"{stripped} (x{n}, allowlisted x{expected})"
                if expected else stripped
            )
            hits += [(relpath, label)] * (n - expected)
    return hits


def test_no_new_unpartitioned_windows():
    offenders = []
    for py in sorted(PKG.rglob("*.py")):
        rel = py.relative_to(PKG).as_posix()
        offenders += scan(py.read_text(), rel)
    assert not offenders, (
        "New unpartitioned Window site(s) — every row of the input moves "
        "to ONE partition. Either partition the window, use "
        "global_cumulative_sum (distributed prefix sum), or compute the "
        "top-k with orderBy+limit FIRST and window only the k survivors. "
        "If the frame is provably bounded (post-agg dimension, per-"
        "partition totals), add the site (or bump its expected count) in "
        f"ALLOWED in tests/test_window_lint.py with the justification: {offenders}"
    )


def test_lint_trips_on_synthetic_violation():
    src = (
        "from pyspark.sql import Window\n"
        "w = Window.orderBy(F.col('revenue').desc())\n"  # unbounded: must trip
        "w2 = Window.partitionBy().orderBy('k')\n"  # empty grand total: must trip
        "w3 = Window.partitionBy('k').orderBy('v')\n"  # partitioned: fine
        "# w = Window.orderBy('commented out')\n"
    )
    hits = scan(src, "synthetic.py")
    assert len(hits) == 2, hits


def test_lint_trips_on_excess_allowlisted_occurrence():
    """A NEW site whose line text matches an existing allowlisted line
    must still trip: counts are part of the allowlist key's contract."""
    rel = "operators/windows.py"
    snippet = "w = Window.orderBy(*orders)"
    expected = ALLOWED[(rel, snippet)][0]
    src = "\n".join([snippet] * (expected + 1))
    hits = scan(src, rel)
    assert len(hits) == 1 and "allowlisted" in hits[0][1], hits
    # And at exactly the expected count, silence.
    assert scan("\n".join([snippet] * expected), rel) == []


def test_allowlist_counts_still_exact():
    """Every ALLOWED entry must match its expected occurrence count
    exactly on the low side too — if a site is refactored away, the
    entry (or its count) must shrink so the allowlist can't mask a
    future reintroduction elsewhere in the file."""
    stale = []
    for (rel, snippet), (expected, _why) in ALLOWED.items():
        text = (PKG / rel).read_text() if (PKG / rel).exists() else ""
        n = sum(1 for line in text.splitlines() if line.strip() == snippet)
        if n < expected:
            stale.append((rel, snippet, f"found x{n}, allowlisted x{expected}"))
    assert not stale, f"ALLOWED entries overcount the tree — prune/shrink: {stale}"
