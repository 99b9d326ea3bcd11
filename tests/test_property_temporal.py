"""Property tests: the point-in-time family vs pure-Python models.

`test_property_cdc.py` checks temporal_join against intervals that
scd2_history itself produced; these tests close the loop by checking
each operator against an independent brute-force model — asof_join vs
per-row max-scan, scd2_history vs a replay collapse (including NULL
transitions), snapshot_diff vs a dict compare, resample_asof vs an
explicit grid fill.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

KEYS = [1, 2, 3]
VALS = ["a", "b", "c"]


def ts(h: float) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(hours=h)


# unique (key, ts) on the right side: the documented tie rule for
# duplicate right timestamps is "last in sort order wins", which is
# nondeterministic in the value — pre-dedup is the caller contract.
right_side = st.dictionaries(
    st.tuples(st.sampled_from(KEYS), st.integers(0, 20)),
    st.sampled_from(VALS),
    max_size=12,
)
left_side = st.lists(
    st.tuples(st.sampled_from(KEYS), st.integers(-2, 22)), min_size=1, max_size=10
)


@given(left=left_side, right=right_side, strict=st.booleans())
@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
def test_asof_join_matches_bruteforce(spark, left, right, strict):
    from data_pipelines_examples_spark.operators.relational import asof_join

    left_rows = [(i, k, ts(h)) for i, (k, h) in enumerate(left)]
    right_rows = [(k, ts(h), v) for (k, h), v in right.items()]
    left_df = spark.createDataFrame(left_rows, "lid int, k int, t timestamp")
    right_df = (
        spark.createDataFrame(right_rows, "k int, rt timestamp, v string")
        if right_rows
        else spark.createDataFrame([], "k int, rt timestamp, v string")
    )
    got = {
        r["lid"]: (r["asof_ts"], r["v"])
        for r in asof_join(left_df, right_df, "k", "t", "rt", strict=strict).collect()
    }
    assert set(got) == {lid for lid, _, _ in left_rows}  # left-preserving
    for lid, k, t in left_rows:
        cands = [
            (rt, v)
            for rk, rt, v in right_rows
            if rk == k and (rt < t if strict else rt <= t)
        ]
        expected = max(cands) if cands else (None, None)
        assert got[lid] == expected, (lid, k, t, strict)


# per-key observation stream with unique timestamps; None values make
# the null-safe change detection load-bearing
obs_stream = st.dictionaries(
    st.tuples(st.sampled_from(KEYS), st.integers(0, 15)),
    st.sampled_from(VALS + [None]),
    min_size=1,
    max_size=14,
)


@given(obs=obs_stream)
@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
def test_scd2_history_matches_replay_model(spark, obs):
    from data_pipelines_examples_spark.operators.dedup import scd2_history

    rows = [(k, ts(h), v) for (k, h), v in obs.items()]
    df = spark.createDataFrame(rows, "k int, t timestamp, v string")
    got = {
        (r["k"], r["valid_from"]): (r["valid_to"], r["v"], r["is_current"])
        for r in scd2_history(df, "k", "t", ["v"]).collect()
    }

    expected: dict[tuple[int, dt.datetime], tuple[dt.datetime | None, str | None, bool]] = {}
    for k in {k for k, _, _ in rows}:
        series = sorted((t, v) for kk, t, v in rows if kk == k)
        kept = [
            (t, v)
            for i, (t, v) in enumerate(series)
            if i == 0 or v != series[i - 1][1]  # null-safe: None != "a" etc.
        ]
        for i, (t, v) in enumerate(kept):
            nxt = kept[i + 1][0] if i + 1 < len(kept) else None
            expected[(k, t)] = (nxt, v, nxt is None)
    assert got == expected


snapshot = st.dictionaries(
    st.sampled_from(KEYS + [4, 5]),
    st.tuples(st.sampled_from([0, 1, None]), st.sampled_from(VALS + [None])),
    max_size=5,
)


@given(old=snapshot, new=snapshot)
@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
def test_snapshot_diff_matches_dict_model(spark, old, new):
    from data_pipelines_examples_spark.operators.relational import snapshot_diff

    schema = "k int, c1 int, c2 string"

    def mk(d):
        rows = [(k, a, b) for k, (a, b) in d.items()]
        return (
            spark.createDataFrame(rows, schema)
            if rows
            else spark.createDataFrame([], schema)
        )

    got = {
        r["k"]: (r["diff_status"], sorted(r["changed_cols"]))
        for r in snapshot_diff(
            mk(old), mk(new), "k", include_unchanged=True
        ).collect()
    }
    expected = {}
    for k in set(old) | set(new):
        if k not in old:
            expected[k] = ("added", [])
        elif k not in new:
            expected[k] = ("removed", [])
        else:
            changed = sorted(
                name
                for name, o, n in (
                    ("c1", old[k][0], new[k][0]),
                    ("c2", old[k][1], new[k][1]),
                )
                if o != n
            )
            expected[k] = ("changed" if changed else "unchanged", changed)
    assert got == expected
    # default mode drops only the unchanged rows
    got_delta = {
        r["k"]
        for r in snapshot_diff(mk(old), mk(new), "k").collect()
    }
    assert got_delta == {k for k, (s, _) in expected.items() if s != "unchanged"}


# minute-offset observations so grid ticks don't coincide with
# observations; unique (key, minute) keeps the as-of value deterministic
minute_obs = st.dictionaries(
    st.tuples(st.sampled_from(KEYS), st.integers(0, 360)),
    st.sampled_from(VALS),
    min_size=1,
    max_size=12,
)


@given(obs=minute_obs)
@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
def test_resample_asof_matches_fill_model(spark, obs):
    from data_pipelines_examples_spark.operators.windows import resample_asof

    base = dt.datetime(2024, 1, 1)
    rows = [
        (k, base + dt.timedelta(minutes=m), v) for (k, m), v in obs.items()
    ]
    df = spark.createDataFrame(rows, "k int, t timestamp, v string")
    got = {
        (r["k"], r["grid_ts"]): r["v"]
        for r in resample_asof(df, "k", "t", ["v"], "1 hour", "hour").collect()
    }
    expected = {}
    for k in {k for k, _, _ in rows}:
        series = sorted((t, v) for kk, t, v in rows if kk == k)
        t0 = series[0][0].replace(minute=0, second=0, microsecond=0)
        t1 = series[-1][0]
        tick = t0
        while tick <= t1:
            fills = [(t, v) for t, v in series if t <= tick]
            expected[(k, tick)] = max(fills)[1] if fills else None
            tick += dt.timedelta(hours=1)
    assert got == expected
