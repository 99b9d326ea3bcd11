"""Property-based tests: the packing manifest's conservation laws hold
for arbitrary token-count distributions — every token lands exactly once,
every non-final sequence is filled to exactly the budget, offsets stay in
range. These are the invariants a training loader depends on; row-example
tests can't sweep the straddle edge cases (docs exactly at a boundary,
docs larger than the whole budget, runs of tiny docs)."""

from __future__ import annotations

from collections import defaultdict

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_pipelines_examples_spark.operators.packing import pack_offsets

sizes_strategy = st.lists(
    st.integers(min_value=1, max_value=700), min_size=1, max_size=40
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(sizes=sizes_strategy, budget=st.sampled_from([64, 256, 257]))
def test_pack_offsets_conservation_laws(spark, sizes, budget):
    rows = [(i, n) for i, n in enumerate(sizes)]
    df = spark.createDataFrame(rows, "doc_id long, n_tok long")
    out = pack_offsets(
        df, budget=budget, shards=3, token_count_col="n_tok", text_col=None
    ).collect()

    # 1. every token assigned exactly once, per doc
    per_doc = defaultdict(int)
    for r in out:
        per_doc[r.doc_id] += r.tokens_in_seq
    assert per_doc == {i: n for i, n in rows}

    # 2. per (shard, seq): all but the LAST sequence filled to exactly budget
    fills = defaultdict(int)
    for r in out:
        fills[(r.shard, r.seq_id)] += r.tokens_in_seq
    last = {}
    for shard, seq in fills:
        last[shard] = max(last.get(shard, -1), seq)
    for (shard, seq), f in fills.items():
        assert f == budget or seq == last[shard], (shard, seq, f)

    # 3. offsets in range, chunks non-empty, straddle pieces contiguous
    for r in out:
        assert 0 <= r.offset_in_seq < budget
        assert 1 <= r.tokens_in_seq <= budget
    by_doc = defaultdict(list)
    for r in out:
        by_doc[r.doc_id].append(r)
    for doc, rs in by_doc.items():
        rs = sorted(rs, key=lambda r: r.seq_id)
        for prev, nxt in zip(rs, rs[1:]):
            assert nxt.seq_id == prev.seq_id + 1  # consecutive sequences
            assert prev.offset_in_seq + prev.tokens_in_seq == budget
            assert nxt.offset_in_seq == 0
