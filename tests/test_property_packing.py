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


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    n=st.integers(min_value=1, max_value=300),
    max_tokens=st.integers(min_value=2, max_value=64),
    overlap_frac=st.floats(min_value=0.0, max_value=0.9),
)
def test_chunk_documents_total_coverage(spark, n, max_tokens, overlap_frac):
    """For any (doc length, window, overlap): the chunk windows cover
    every token index exactly from 0..n, consecutive windows start
    stride apart, and no window is fully contained in the previous."""
    from data_pipelines_examples_spark.operators.packing import chunk_documents

    overlap = min(int(max_tokens * overlap_frac), max_tokens - 1)
    stride = max_tokens - overlap
    df = spark.createDataFrame(
        [(1, " ".join(f"w{j}" for j in range(n)))], "doc_id long, text string"
    )
    rows = sorted(
        chunk_documents(df, max_tokens, overlap).collect(), key=lambda r: r.chunk_id
    )
    # windows: [cid*stride, cid*stride + n_chunk_tokens)
    covered_to = 0
    for r in rows:
        start = r.chunk_id * stride
        assert start <= covered_to  # no gap
        covered_to = max(covered_to, start + r.n_chunk_tokens)
        assert r.n_chunk_tokens <= max_tokens
    assert covered_to == n  # every token reached, none past the end
    # the final window genuinely adds tokens (no fully-redundant tail)
    if len(rows) > 1:
        last = rows[-1]
        prev_end = rows[-2].chunk_id * stride + rows[-2].n_chunk_tokens
        assert last.chunk_id * stride + last.n_chunk_tokens > prev_end


lens_strategy = st.lists(st.integers(min_value=0, max_value=120), min_size=1, max_size=60)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(lens=lens_strategy, bucket_width=st.sampled_from([8, 16]), batch_size=st.sampled_from([2, 4]))
def test_length_bucketed_batches_invariants(spark, lens, bucket_width, batch_size):
    """Loader-contract invariants for arbitrary length distributions:
    every doc appears exactly once; a batch never mixes buckets or
    shards; padding waste inside a batch is bounded by bucket_width;
    batch positions are a dense 0..n-1 run; only the LAST batch of a
    (bucket, shard) may be short."""
    from data_pipelines_examples_spark.operators.packing import (
        length_bucketed_batches,
    )

    rows = [(i, n) for i, n in enumerate(lens)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    out = length_bucketed_batches(
        df, bucket_width=bucket_width, batch_size=batch_size, shards=4
    ).collect()
    assert sorted(r["doc_id"] for r in out) == sorted(i for i, _ in rows)

    batches = defaultdict(list)
    for r in out:
        assert r["bucket"] == r["n_tokens"] // bucket_width
        assert r["shard"] == r["doc_id"] % 4
        batches[(r["bucket"], r["shard"], r["batch_id"])].append(r)
    for (bucket, shard, _bid), members in batches.items():
        assert len(members) <= batch_size
        toks = [m["n_tokens"] for m in members]
        assert max(toks) - min(toks) < bucket_width  # padding bound
        poss = sorted(m["pos"] for m in members)
        assert poss == list(range(len(members)))     # dense positions
    # short batches only at the tail of their (bucket, shard)
    for (bucket, shard) in {(b, s) for b, s, _ in batches}:
        bids = sorted(bid for bb, ss, bid in batches if (bb, ss) == (bucket, shard))
        assert bids == list(range(len(bids)))
        for bid in bids[:-1]:
            assert len(batches[(bucket, shard, bid)]) == batch_size
