"""Property-based test: collapse_intervals vs a brute-force Python oracle
over randomized interval sets (Hypothesis), per SURVEY §5's
randomized-fixture strategy upgraded to actual assertions."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_pipelines_examples_spark.operators.intervals import collapse_intervals

BASE = dt.date(2020, 1, 1)

interval = st.tuples(
    st.integers(min_value=0, max_value=60),  # start offset days
    st.integers(min_value=0, max_value=20),  # duration days
)
member_intervals = st.lists(interval, min_size=1, max_size=12)
dataset = st.dictionaries(
    st.sampled_from(["m1", "m2", "m3"]), member_intervals, min_size=1, max_size=3
)


def python_collapse(intervals: list[tuple[dt.date, dt.date]], gap_days: int = 1):
    """Brute-force reference: sort, sweep, merge when start ≤ maxend + gap."""
    out = []
    for b, e in sorted(intervals):
        if out and b <= out[-1][1] + dt.timedelta(days=gap_days):
            out[-1] = (out[-1][0], max(out[-1][1], e))
        else:
            out.append((b, e))
    return set(out)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(dataset)
def test_collapse_matches_python_oracle(spark, data):
    rows = [
        (m, BASE + dt.timedelta(days=s), BASE + dt.timedelta(days=s + d))
        for m, ivs in data.items()
        for s, d in ivs
    ]
    df = spark.createDataFrame(rows, "memnum string, begindt date, enddt date")
    got: dict[str, set] = {}
    for r in collapse_intervals(df, "memnum").collect():
        got.setdefault(r.memnum, set()).add((r.eligeff_coll, r.eligend_coll))
    expected = {
        m: python_collapse([(BASE + dt.timedelta(days=s), BASE + dt.timedelta(days=s + d)) for s, d in ivs])
        for m, ivs in data.items()
    }
    assert got == expected
