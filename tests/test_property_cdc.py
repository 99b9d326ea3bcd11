"""Property tests: apply_cdc vs a dict-replay model and temporal_join
vs brute-force interval containment, over randomized inputs."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

KEYS = [1, 2, 3, 4]
VALS = ["a", "b", "c"]

change = st.tuples(
    st.sampled_from(KEYS),
    st.sampled_from(VALS),
    st.sampled_from(["I", "U", "D"]),
)
changes_strategy = st.lists(change, min_size=0, max_size=12)
base_strategy = st.dictionaries(st.sampled_from(KEYS), st.sampled_from(VALS), max_size=4)


@given(base=base_strategy, changes=changes_strategy)
@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
def test_apply_cdc_matches_dict_replay(spark, base, changes):
    from data_pipelines_examples_spark.operators.dedup import apply_cdc

    base_rows = [(k, v) for k, v in base.items()]
    change_rows = [
        (k, v, op, i) for i, (k, v, op) in enumerate(changes)
    ]  # version = arrival order, unique
    # dict replay: the LATEST change per key wins outright
    latest: dict[int, tuple[str, str]] = {}
    for k, v, op, ver in change_rows:
        latest[k] = (v, op)
    expected = dict(base)
    for k, (v, op) in latest.items():
        if op == "D":
            expected.pop(k, None)
        else:
            expected[k] = v

    base_df = spark.createDataFrame(base_rows, "k int, v string") if base_rows else (
        spark.createDataFrame([], "k int, v string")
    )
    ch_df = spark.createDataFrame(
        change_rows, "k int, v string, op string, ver int"
    ) if change_rows else spark.createDataFrame([], "k int, v string, op string, ver int")
    got = {
        r["k"]: r["v"]
        for r in apply_cdc(base_df, ch_df, "k", "op", "ver").collect()
    }
    assert got == expected


interval_set = st.lists(
    st.tuples(st.integers(0, 20), st.sampled_from(VALS)), min_size=1, max_size=6
)


@given(
    history=st.dictionaries(st.sampled_from(KEYS), interval_set, min_size=1, max_size=3),
    facts=st.lists(
        st.tuples(st.sampled_from(KEYS), st.integers(-5, 25)), min_size=1, max_size=10
    ),
)
@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
def test_temporal_join_matches_bruteforce_containment(spark, history, facts):
    import datetime as dt

    from data_pipelines_examples_spark.operators.dedup import scd2_history
    from data_pipelines_examples_spark.operators.relational import temporal_join

    def ts(h):
        return dt.datetime(2024, 1, 1) + dt.timedelta(hours=h)

    hist_rows = [
        (k, ts(h), v) for k, ivs in history.items() for h, v in ivs
    ]
    hist_df = spark.createDataFrame(hist_rows, "k int, t timestamp, v string")
    hist = scd2_history(hist_df, "k", "t", ["v"])
    intervals = [
        (r["k"], r["valid_from"], r["valid_to"], r["v"])
        for r in hist.collect()
    ]
    fact_rows = [(i, k, ts(h)) for i, (k, h) in enumerate(facts)]
    facts_df = spark.createDataFrame(fact_rows, "fid int, k int, t timestamp")
    got = {
        r["fid"]: r["v"]
        for r in temporal_join(facts_df, hist.drop("is_current"), "k", "t").collect()
    }
    for fid, k, t in fact_rows:
        match = [
            v
            for hk, vf, vt, v in intervals
            if hk == k and vf <= t and (vt is None or t < vt)
        ]
        assert len(match) <= 1  # SCD2 non-overlap invariant
        assert got[fid] == (match[0] if match else None), (fid, k, t)
