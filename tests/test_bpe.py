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


# ---------------------------------------------------------------------------
# Round-6: batched merges must be bit-identical to sequential training
# ---------------------------------------------------------------------------


def _random_corpus(seed: int, alphabet: str, n_docs: int = 12) -> list[str]:
    """Seeded corpus; a TINY alphabet forces heavy symbol sharing among
    top pairs — the adversarial case for batch acceptance (conflicts and
    count ties everywhere)."""
    import random

    rng = random.Random(seed)
    docs = []
    for _ in range(n_docs):
        words = [
            "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 7)))
            for _ in range(rng.randint(3, 10))
        ]
        docs.append(" ".join(words))
    return docs


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("alphabet", ["ab", "abc", "abcdefgh"])
def test_bpe_batched_equals_sequential_reference(spark, tmp_path, seed, alphabet):
    """Exactness property: whatever the interaction structure (2-symbol
    alphabets make every top pair collide; wide alphabets make near-full
    batches), the batched trainer returns the sequential reference's
    merge list in the same order."""
    from data_pipelines_examples_spark.operators.bpe import bpe_train

    corpus = _random_corpus(seed * 31 + len(alphabet), alphabet)
    df = spark.createDataFrame([(t,) for t in corpus], "text string")
    got = bpe_train(
        df, n_merges=15, state_path=str(tmp_path / f"b{seed}"), batch_cap=8
    )
    want, _ = _ref_train(corpus, 15)
    assert got == want, f"seed={seed} alphabet={alphabet}"


def test_bpe_batching_actually_batches(spark, tmp_path, monkeypatch):
    """The scale point of round 6: a diverse corpus must commit MULTIPLE
    merges per pair-count job (fewer rounds than merges), not fall back
    to one-per-job."""
    from data_pipelines_examples_spark.operators import bpe as bpe_mod

    sizes: list[int] = []
    real = bpe_mod._accept_batch

    def spy(rows, **kw):
        out = real(rows, **kw)
        if out:
            sizes.append(len(out))
        return out

    monkeypatch.setattr(bpe_mod, "_accept_batch", spy)
    # disjoint-alphabet words: top pairs share no symbols → big batches
    corpus = ["ab ab ab", "cd cd cd", "ef ef ef", "gh gh gh", "ij ij ij"]
    df = spark.createDataFrame([(t,) for t in corpus], "text string")
    got = bpe_mod.bpe_train(
        df, n_merges=5, min_count=2, state_path=str(tmp_path / "b")
    )
    want, _ = _ref_train(corpus, 5)
    assert got == want
    assert sum(sizes) == len(got)
    assert len(sizes) < len(got), f"no batching happened: {sizes}"


def test_accept_batch_truncates_at_conflict_count_tie():
    """Unit pin of the strict-inequality rule: an accepted pair whose
    count EQUALS the first conflict's count must be dropped (a created
    or decayed pair could tie it and win the lexicographic tie-break);
    the first pair always survives (it is the argmax regardless)."""
    from data_pipelines_examples_spark.operators.bpe import _accept_batch

    class R(dict):
        def __getitem__(self, k):
            return dict.__getitem__(self, k)

    def row(a, b, cnt):
        return R(a=a, b=b, cnt=cnt)

    # (c,d) ties the conflict (a,x) at 5 → dropped; (e,f) at 6 survives
    rows = [row("a", "b", 9), row("e", "f", 6), row("c", "d", 5), row("a", "x", 5)]
    got = _accept_batch(rows, remaining=10, min_count=2, batch_cap=8, exhaustive=True)
    assert got == [("a", "b"), ("e", "f")]
    # no conflict + exhaustive view → accept everything eligible
    rows = [row("a", "b", 9), row("c", "d", 5), row("e", "f", 5)]
    got = _accept_batch(rows, remaining=10, min_count=2, batch_cap=8, exhaustive=True)
    assert got == [("a", "b"), ("c", "d"), ("e", "f")]
    # non-exhaustive view: unseen pairs could conflict at the horizon
    # count → everything at the last seen count except the head drops
    got = _accept_batch(rows, remaining=10, min_count=2, batch_cap=8, exhaustive=False)
    assert got == [("a", "b")]
    # output-collision conflict: (a,b) produces "ab"; a pair consuming
    # the pre-existing symbol "ab" interacts and must stop the batch
    rows = [row("a", "b", 9), row("ab", "z", 7), row("c", "d", 3)]
    got = _accept_batch(rows, remaining=10, min_count=2, batch_cap=8, exhaustive=True)
    assert got == [("a", "b")]
    # cap break: the first UN-WALKED row sets the horizon like a seen
    # conflict — an accepted pair tying it must drop
    rows = [row("a", "b", 9), row("c", "d", 5), row("e", "f", 5), row("g", "h", 5)]
    got = _accept_batch(rows, remaining=10, min_count=2, batch_cap=2, exhaustive=True)
    assert got == [("a", "b")]
    rows = [row("a", "b", 9), row("c", "d", 6), row("e", "f", 5), row("g", "h", 5)]
    got = _accept_batch(rows, remaining=10, min_count=2, batch_cap=2, exhaustive=True)
    assert got == [("a", "b"), ("c", "d")]


@pytest.mark.parametrize("batch_cap", [1, 3])
def test_bpe_batched_equals_sequential_under_tight_caps(spark, tmp_path, batch_cap):
    """Cap-break exactness: tiny caps exercise the stopped-without-
    examining horizon rule on every round."""
    from data_pipelines_examples_spark.operators.bpe import bpe_train

    corpus = _random_corpus(99, "abcd")
    df = spark.createDataFrame([(t,) for t in corpus], "text string")
    got = bpe_train(
        df, n_merges=12, state_path=str(tmp_path / "b"), batch_cap=batch_cap
    )
    want, _ = _ref_train(corpus, 12)
    assert got == want
