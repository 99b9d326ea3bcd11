"""Property tests for the analytics family entering the graded window in
round 5: funnel strict-ordering vs a Python oracle, and transition-matrix
row-stochasticity, over randomized event streams."""

from __future__ import annotations

from collections import defaultdict

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

EVENTS = ["view", "click", "cart", "buy"]

stream = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=5),      # key
        st.integers(min_value=0, max_value=50),     # ts (seconds)
        st.sampled_from(EVENTS),
    ),
    min_size=1,
    max_size=40,
)


def py_funnel(rows, steps):
    """Greedy-earliest strict-order oracle: step i = min ts of step i's
    type strictly after step i-1's ts."""
    by_key = defaultdict(list)
    for k, t, e in rows:
        by_key[k].append((t, e))
    out = {}
    for k, evs in by_key.items():
        prev = None
        ts_list = []
        for s in steps:
            cands = [
                t
                for t, e in evs
                if e == s and (prev is None or t > prev)
            ]
            if not cands:
                break
            prev = min(cands)
            ts_list.append(prev)
        if ts_list:
            out[k] = ts_list
    return out


@given(rows=stream)
@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
def test_funnel_steps_matches_python_oracle(spark, rows):
    from data_pipelines_examples_spark.operators.funnel import funnel_steps

    steps = ["view", "click", "buy"]
    df = spark.createDataFrame(
        [(k, float(t), e) for k, t, e in rows], "uid int, ts double, event string"
    )
    got = {}
    for r in funnel_steps(df, "uid", "ts", "event", steps).collect():
        ts_list = []
        for i in range(1, len(steps) + 1):
            v = r[f"step_{i}_ts"]
            if v is None:
                break
            ts_list.append(v)
        got[r["uid"]] = ts_list
        assert r["steps_completed"] == len(ts_list)
    exp = py_funnel(rows, steps)
    assert got == exp


@given(rows=stream)
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
def test_transition_matrix_row_stochastic(spark, rows):
    from data_pipelines_examples_spark.operators.funnel import transition_matrix

    df = spark.createDataFrame(
        [(k, float(t), e) for k, t, e in rows], "uid int, ts double, event string"
    )
    out = transition_matrix(df, "uid", "ts", "event").collect()
    by_from = defaultdict(float)
    for r in out:
        assert r["n_transitions"] >= 1
        assert 0.0 < r["probability"] <= 1.0
        by_from[r["from_state"]] += r["probability"]
    for state, total in by_from.items():
        assert abs(total - 1.0) < 1e-9, f"row {state} sums to {total}"
