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


# --- overlap_self_join vs brute-force pair oracle (r8) -------------------

selfjoin_interval = st.tuples(
    st.integers(min_value=0, max_value=90),   # start offset days
    st.integers(min_value=0, max_value=40),   # duration days
)
selfjoin_dataset = st.dictionaries(
    st.sampled_from(["k1", "k2", "k3"]),
    st.lists(selfjoin_interval, min_size=1, max_size=10),
    min_size=1,
    max_size=3,
)


def python_overlap_pairs(rows, gap_days):
    """Brute-force: ALL ordered pairs (incl. self-pairs) of same-key
    intervals with l.start <= r.end + gap AND r.start <= l.end + gap."""
    pairs = set()
    for i, (ki, bi, ei) in rows:
        for j, (kj, bj, ej) in rows:
            if ki == kj and bi <= ej + dt.timedelta(days=gap_days) \
                    and bj <= ei + dt.timedelta(days=gap_days):
                pairs.add((i, j))
    return pairs


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(selfjoin_dataset, st.sampled_from([0, 3]))
def test_overlap_self_join_matches_pair_oracle(spark, data, gap):
    from data_pipelines_examples_spark.operators.intervals import (
        overlap_self_join,
    )

    flat = [
        (k, BASE + dt.timedelta(days=s), BASE + dt.timedelta(days=s + d))
        for k, ivs in data.items()
        for s, d in ivs
    ]
    rows = list(enumerate(flat))
    df = spark.createDataFrame(
        [(i, k, b, e) for i, (k, b, e) in rows],
        "id bigint, k string, s date, e date",
    )
    expected = python_overlap_pairs(rows, gap)
    for binned in (False, True):
        out = overlap_self_join(
            df, "k", "s", "e", gap_days=gap, binned=binned, bin_days=17
        )
        got = {(r["id"], r["id_r"]) for r in out.select("id", "id_r").collect()}
        assert got == expected
