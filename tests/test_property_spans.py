"""Property test: duplicate_spans vs a brute-force Python oracle over
randomized small corpora — maximal-island merging, min_docs thresholds,
and short-doc exclusion must match exactly for any input shape."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_pipelines_examples_spark.operators.dedup import duplicate_spans

VOCAB = ["a", "b", "c", "d"]

doc_words = st.lists(st.sampled_from(VOCAB), min_size=1, max_size=10)
corpus = st.lists(doc_words, min_size=1, max_size=5)


def py_duplicate_spans(docs: list[tuple[int, str]], k: int, min_docs: int):
    owners: dict[str, set[int]] = {}
    per_doc: dict[int, list[tuple[int, str]]] = {}
    for d, text in docs:
        ws = text.lower().split()
        if len(ws) < k:
            continue
        for i in range(len(ws) - k + 1):
            g = " ".join(ws[i : i + k])
            owners.setdefault(g, set()).add(d)
            per_doc.setdefault(d, []).append((i + 1, g))
    dup = {g for g, s in owners.items() if len(s) >= min_docs}
    out = set()
    for d, lst in per_doc.items():
        starts = sorted(i for i, g in lst if g in dup)
        if not starts:
            continue
        island = [starts[0]]
        for s in starts[1:]:
            if s - island[-1] <= k:
                island.append(s)
            else:
                out.add((d, island[0], island[-1] + k - 1, island[-1] - island[0] + k, len(island)))
                island = [s]
        out.add((d, island[0], island[-1] + k - 1, island[-1] - island[0] + k, len(island)))
    return out


@given(corpus=corpus, k=st.integers(min_value=2, max_value=4), min_docs=st.integers(min_value=2, max_value=3))
@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
def test_duplicate_spans_matches_bruteforce(spark, corpus, k, min_docs):
    docs = [(i, " ".join(ws)) for i, ws in enumerate(corpus)]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    got = {
        (r["doc_id"], r["span_start"], r["span_end"], r["span_tokens"], r["n_windows"])
        for r in duplicate_spans(df, k=k, min_docs=min_docs).collect()
    }
    assert got == py_duplicate_spans(docs, k, min_docs)


# ---------------------------------------------------------------------------
# strip_duplicate_spans properties (round 5): token conservation + a
# Python keep-one oracle over randomized corpora
# ---------------------------------------------------------------------------

def py_strip(docs: list[tuple[int, str]], k: int, min_docs: int):
    """Keep-one semantics oracle: for every duplicated k-window, the
    min-id owner keeps its copy; other owners kill the window's token
    positions. Docs reassemble from surviving tokens."""
    owners: dict[str, set[int]] = {}
    grams: dict[int, list[tuple[int, str]]] = {}
    words: dict[int, list[str]] = {}
    for d, text in docs:
        ws = text.lower().split()
        words[d] = ws
        for i in range(max(len(ws) - k + 1, 0)):
            g = " ".join(ws[i : i + k])
            owners.setdefault(g, set()).add(d)
            grams.setdefault(d, []).append((i, g))
    out = {}
    for d, ws in words.items():
        kill = set()
        for i, g in grams.get(d, []):
            os_ = owners[g]
            if len(os_) >= min_docs and d != min(os_):
                kill.update(range(i, i + k))
        kept = [w for j, w in enumerate(ws) if j not in kill]
        if kept:
            out[d] = (" ".join(kept), len(kept))
    return out


@given(
    corpus=corpus,
    k=st.integers(min_value=2, max_value=4),
    min_docs=st.integers(min_value=2, max_value=3),
)
@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
def test_strip_duplicate_spans_matches_keep_one_oracle(spark, corpus, k, min_docs):
    from data_pipelines_examples_spark.operators.dedup import strip_duplicate_spans

    docs = [(i, " ".join(ws)) for i, ws in enumerate(corpus)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["text"], r["n_tokens_kept"])
        for r in strip_duplicate_spans(
            df, k=k, min_docs=min_docs
        ).collect()
    }
    # normalize case: operator lowercases tokens during windowing but
    # must preserve original tokens; our vocab is already lowercase
    assert got == py_strip(docs, k, min_docs)


@given(
    corpus=corpus,
    k=st.integers(min_value=2, max_value=4),
)
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
def test_strip_never_increases_tokens_and_canonical_survives(spark, corpus, k):
    from data_pipelines_examples_spark.operators.dedup import strip_duplicate_spans

    docs = [(i, " ".join(ws)) for i, ws in enumerate(corpus)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    res = strip_duplicate_spans(df, k=k, min_docs=2).collect()
    n_orig = {i: len(ws) for i, ws in enumerate(corpus)}
    for r in res:
        assert 1 <= r["n_tokens_kept"] <= n_orig[r["doc_id"]]
        assert len(r["text"].split()) == r["n_tokens_kept"]
    # the minimum doc id sharing any duplicated window never loses it:
    # doc 0 is the global min id, so doc 0 must survive INTACT whenever
    # it appears (any window it shares is canonical in doc 0 or unique)
    if 0 in {r["doc_id"] for r in res}:
        kept0 = next(r for r in res if r["doc_id"] == 0)
        assert kept0["n_tokens_kept"] == n_orig[0]


# ---------------------------------------------------------------------------
# winnowing path equality (round 5): the materialized-array path and the
# exploded RANGE-window path must select identical fingerprints for any
# string shape (short, repeated, boundary lengths)
# ---------------------------------------------------------------------------

text_strategy = st.text(
    alphabet="abc x", min_size=0, max_size=40
).map(lambda s: s.strip() or "x")


@given(texts=st.lists(text_strategy, min_size=1, max_size=6),
       k=st.integers(min_value=2, max_value=8),
       w=st.integers(min_value=2, max_value=5))
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
def test_winnowing_array_and_exploded_paths_identical(spark, texts, k, w):
    from data_pipelines_examples_spark.operators.text import (
        winnowing_fingerprints,
        winnowing_fingerprints_exploded,
    )

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    a = {(r["doc_id"], r["fp"]) for r in winnowing_fingerprints(df, k=k, w=w).collect()}
    b = {
        (r["doc_id"], r["fp"])
        for r in winnowing_fingerprints_exploded(df, k=k, w=w).collect()
    }
    assert a == b
