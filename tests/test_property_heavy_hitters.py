"""Property test: heavy_hitters_sketch (batch Misra-Gries candidate
pass) must be row-identical to the exact heavy_hitters for every input,
partitioning, and capacity >= the guarantee bound.

The batch MG step (decrement-all by the min residual, drop zeroed
counters, insert the remainder) amortizes the classic per-item
decrement; its guarantee — every key with local count > local_n/capacity
retains a counter — is exactly what makes pass-2 exact. Random skewed
streams across random partition counts are the adversarial surface the
fixed test can't cover.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# skewed alphabet: a few hot keys + a long tail
KEYS = ["hot1"] * 6 + ["hot2"] * 3 + [f"cold{i}" for i in range(12)]

stream_strategy = st.lists(st.sampled_from(KEYS), min_size=1, max_size=60)


@given(
    stream=stream_strategy,
    k=st.sampled_from([2, 3, 5]),
    n_parts=st.sampled_from([1, 3, 7]),
    cap_mult=st.sampled_from([2, 4]),
)
@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
def test_heavy_hitters_sketch_equals_exact_randomized(
    spark, stream, k, n_parts, cap_mult
):
    from data_pipelines_examples_spark.operators.profiling import (
        heavy_hitters,
        heavy_hitters_sketch,
    )

    df = spark.createDataFrame([(s,) for s in stream], "k string").repartition(
        n_parts
    )
    exact = {
        (r["k"], r["cnt"], r["frac"]) for r in heavy_hitters(df, "k", k=k).collect()
    }
    sketch = {
        (r["k"], r["cnt"], r["frac"])
        for r in heavy_hitters_sketch(
            df, "k", k=k, capacity=cap_mult * k
        ).collect()
    }
    assert sketch == exact
    # exactness of the definition itself: cnt*k > n
    n = len(stream)
    expected = {
        key: cnt
        for key in set(stream)
        if (cnt := stream.count(key)) * k > n
    }
    assert {key: cnt for key, cnt, _ in exact} == expected
