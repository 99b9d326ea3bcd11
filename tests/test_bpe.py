"""BPE tokenizer training/application vs an independent pure-Python
reference implementation (Sennrich-style, same deterministic tie-break)."""

from __future__ import annotations

from collections import Counter

import pytest


def _ref_train(texts: list[str], n_merges: int, min_count: int = 2):
    """Independent reference BPE trainer: word-freq table, weighted
    adjacent-pair counts, argmax with (count desc, pair asc) tie-break,
    greedy left-to-right merge."""
    vocab = Counter()
    for t in texts:
        for w in t.strip().lower().split():
            vocab[w] += 1
    sym = {w: list(w) for w in vocab}
    merges = []
    for _ in range(n_merges):
        counts = Counter()
        for w, f in vocab.items():
            s = sym[w]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] += f
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_count:
            break
        (a, b), _ = best
        merges.append((a, b))
        for w in sym:
            s, out, i = sym[w], [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            sym[w] = out
    return merges, sym


_CORPUS = [
    "low lower lowest low low",
    "new newer newest new",
    "wide wider widest wide wide wide",
    "low newer low wide lowest",
]


def test_bpe_train_matches_reference(spark, tmp_path):
    from data_pipelines_examples_spark.operators.bpe import bpe_train

    df = spark.createDataFrame([(t,) for t in _CORPUS], "text string")
    got = bpe_train(df, n_merges=12, state_path=str(tmp_path / "bpe"))
    want, _ = _ref_train(_CORPUS, 12)
    assert got == want
    assert len(got) == 12  # corpus is rich enough to sustain 12 merges


def test_bpe_apply_matches_reference(spark, tmp_path):
    from data_pipelines_examples_spark.operators.bpe import bpe_apply, bpe_train

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(_CORPUS)], "doc_id bigint, text string"
    )
    merges = bpe_train(df, n_merges=10, state_path=str(tmp_path / "bpe"))
    _, ref_sym = _ref_train(_CORPUS, 10)
    out = {r["doc_id"]: r["bpe_tokens"] for r in bpe_apply(df, merges).collect()}
    for i, t in enumerate(_CORPUS):
        want = [tok for w in t.strip().lower().split() for tok in ref_sym[w]]
        assert out[i] == want, f"doc {i}: {out[i]} != {want}"


def test_bpe_apply_handles_null_and_empty(spark):
    from data_pipelines_examples_spark.operators.bpe import bpe_apply

    df = spark.createDataFrame(
        [(0, None), (1, ""), (2, "   ")], "doc_id bigint, text string"
    )
    out = {r["doc_id"]: r["bpe_tokens"] for r in bpe_apply(df, [("a", "b")]).collect()}
    assert out == {0: [], 1: [], 2: []}


def test_bpe_train_min_count_stops_early(spark, tmp_path):
    from data_pipelines_examples_spark.operators.bpe import bpe_train

    df = spark.createDataFrame([("x y z w",)], "text string")
    # every pair is intra-word only; all words are single chars → no pairs
    assert bpe_train(df, n_merges=5, state_path=str(tmp_path / "b")) == []
