"""Chunking and sequence-packing invariants: total coverage, budget
respect, determinism, straddle bookkeeping, greedy no-split semantics."""

from __future__ import annotations

from collections import defaultdict

from data_pipelines_examples_spark.operators.packing import (
    chunk_documents,
    pack_greedy,
    pack_offsets,
)


def _docs(spark, sizes: dict[int, int]):
    rows = [(i, " ".join(f"t{i}w{j}" for j in range(n))) for i, n in sizes.items()]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_chunk_documents_covers_every_token_once_no_overlap(spark):
    df = _docs(spark, {1: 10, 2: 32, 3: 33, 4: 100, 5: 1})
    out = chunk_documents(df, max_tokens=32, overlap=0).collect()
    by_doc = defaultdict(list)
    for r in out:
        by_doc[r.doc_id].append(r)
    # chunk counts: ceil(n/32)
    assert {d: len(v) for d, v in by_doc.items()} == {1: 1, 2: 1, 3: 2, 4: 4, 5: 1}
    for d, chunks in by_doc.items():
        toks = []
        for r in sorted(chunks, key=lambda r: r.chunk_id):
            assert r.n_chunk_tokens <= 32
            toks.extend(r.chunk_text.split(" "))
        # exact reconstruction of the document's token stream
        n = {1: 10, 2: 32, 3: 33, 4: 100, 5: 1}[d]
        assert toks == [f"t{d}w{j}" for j in range(n)]


def test_chunk_documents_overlap_windows(spark):
    df = _docs(spark, {7: 50})
    out = sorted(
        chunk_documents(df, max_tokens=32, overlap=8).collect(),
        key=lambda r: r.chunk_id,
    )
    # stride 24 → starts at 0 and 24 (start 48 not needed: 24+32 >= 50)
    assert [r.chunk_id for r in out] == [0, 1]
    assert out[0].chunk_text.split(" ")[-8:] == out[1].chunk_text.split(" ")[:8]
    assert out[1].n_chunk_tokens == 50 - 24
    # last token reached
    assert out[1].chunk_text.split(" ")[-1] == "t7w49"


def test_pack_offsets_exact_layout(spark):
    sizes = {i: s for i, s in enumerate([100, 120, 90, 300, 40, 256, 10, 5])}
    df = _docs(spark, sizes)
    out = pack_offsets(df, budget=256, shards=1).collect()
    # every token assigned exactly once
    assert sum(r.tokens_in_seq for r in out) == sum(sizes.values())
    per_doc = defaultdict(int)
    fills = defaultdict(int)
    for r in out:
        per_doc[r.doc_id] += r.tokens_in_seq
        fills[r.seq_id] += r.tokens_in_seq
        assert 0 <= r.offset_in_seq < 256
        assert r.tokens_in_seq >= 0
    assert per_doc == sizes
    # every sequence except the last is filled to EXACTLY the budget
    last = max(fills)
    for s, f in fills.items():
        assert f == 256 or s == last
    # doc 2 (tokens 220..309 in the concat stream) straddles seq 0/1:
    # 36 tokens fill seq 0 to its 256 cap, the remaining 54 open seq 1
    d2 = sorted((r for r in out if r.doc_id == 2), key=lambda r: r.seq_id)
    assert [(r.seq_id, r.offset_in_seq, r.tokens_in_seq) for r in d2] == [
        (0, 220, 36),
        (1, 0, 54),
    ]


def test_pack_offsets_deterministic_across_runs(spark):
    df = _docs(spark, {i: (i * 37) % 90 + 1 for i in range(60)})
    a = sorted(map(tuple, pack_offsets(df, budget=128, shards=4).collect()))
    b = sorted(
        map(tuple, pack_offsets(df.repartition(7), budget=128, shards=4).collect())
    )
    assert a == b  # layout independent of input partitioning


def test_pack_greedy_no_split_budget(spark):
    sizes = {i: s for i, s in enumerate([100, 120, 90, 300, 40, 200, 10, 5])}
    df = _docs(spark, sizes)
    out = pack_greedy(df, budget=256, shards=1).collect()
    assert {r.doc_id: r.n_tokens for r in out} == sizes
    fills = defaultdict(list)
    for r in out:
        fills[r.seq_id].append(r)
    for s, rows in fills.items():
        total = sum(r.n_tokens for r in rows)
        # budget respected unless a single over-budget doc owns the seq
        assert total <= 256 or len(rows) == 1
    # id-order greedy: [100,120]=220 | [90]=90 (300 won't fit after it? no:
    # 90+300>256 → 300 alone) | [300] | [40,200,10,5]=255
    got = {s: sorted(r.doc_id for r in rows) for s, rows in fills.items()}
    assert got == {0: [0, 1], 1: [2], 2: [3], 3: [4, 5, 6, 7]}


def test_pack_greedy_precomputed_counts(spark):
    rows = [(1, 10), (2, 10), (3, 10)]
    df = spark.createDataFrame(rows, "doc_id long, n_tok long")
    out = pack_greedy(
        df, budget=25, shards=1, token_count_col="n_tok", text_col=None
    ).collect()
    by_seq = defaultdict(list)
    for r in out:
        by_seq[r.seq_id].append(r.doc_id)
    assert {s: sorted(v) for s, v in by_seq.items()} == {0: [1, 2], 1: [3]}


def test_chunk_documents_empty_and_whitespace_text(spark):
    """The whitespace tokenizer maps "" -> [""] (one empty token), so
    every doc yields at least one chunk and the manifest stays total —
    same convention as text.py / the DuckDB oracles."""
    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "one")], "doc_id long, text string"
    )
    out = {(r.doc_id, r.chunk_id): r for r in chunk_documents(df, 8).collect()}
    assert set(out) == {(1, 0), (2, 0), (3, 0)}
    assert out[(1, 0)].chunk_text == "" and out[(1, 0)].n_chunk_tokens == 1
    assert out[(2, 0)].chunk_text == "" and out[(3, 0)].chunk_text == "one"


def test_materialize_sequences_roundtrip(spark):
    """End-to-end: manifest + docs -> sequences whose concatenation per
    shard reproduces the docs' token streams in id order, with every
    non-final sequence exactly at the budget."""
    from data_pipelines_examples_spark.operators.packing import (
        materialize_sequences,
    )

    sizes = {i: s for i, s in enumerate([100, 120, 90, 300, 40, 256, 10, 5])}
    df = _docs(spark, sizes)
    manifest = pack_offsets(df, budget=256, shards=1)
    seqs = sorted(
        materialize_sequences(df, manifest).collect(), key=lambda r: r.seq_id
    )
    # all but the last sequence are budget-exact
    for r in seqs[:-1]:
        assert r.n_tokens == 256 and len(r.seq_text.split(" ")) == 256
    # concatenating every sequence reproduces the id-ordered token stream
    stream = []
    for r in seqs:
        stream.extend(r.seq_text.split(" "))
    expected = []
    for i in sorted(sizes):
        expected.extend(f"t{i}w{j}" for j in range(sizes[i]))
    assert stream == expected
