"""Property-based tests for the corpus-shaping samplers: the salted
two-stage cap equals the single-window definition for ARBITRARY group
shapes (hot groups, singletons, cap larger than every group, salt
factors that don't divide the data), and batch assembly conserves rows.
Example tests can't sweep the cap==group-size and one-row-group edges."""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

groups_strategy = st.lists(
    st.integers(min_value=0, max_value=4),  # group id per row → skew
    min_size=1,
    max_size=60,
)


def _portable_hash(seed: int, v: int) -> int:
    h = hashlib.md5(f"{seed}:{v}".encode()).hexdigest()
    return int(h[:15], 16)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    gids=groups_strategy,
    cap=st.sampled_from([1, 2, 7]),
    salt_n=st.sampled_from([1, 3, 16]),
)
def test_cap_per_group_equals_definition(spark, gids, cap, salt_n):
    from data_pipelines_examples_spark.operators.sampling import cap_per_group

    rows = [(i, f"g{g}") for i, g in enumerate(gids)]
    df = spark.createDataFrame(rows, "id bigint, g string")
    got = sorted(
        (r["g"], r["id"])
        for r in cap_per_group(
            df, "g", "id", cap=cap, seed=3, hash_how="portable", salt_n=salt_n
        ).collect()
    )

    # independent Python definition: per group, the cap smallest by
    # (portable seeded hash of str(id), id)
    by_group: dict[str, list[tuple[int, int]]] = {}
    for i, g in rows:
        by_group.setdefault(g, []).append((_portable_hash(3, i), i))
    want = sorted(
        (g, i)
        for g, hs in by_group.items()
        for _, i in sorted(hs)[:cap]
    )
    assert got == want
