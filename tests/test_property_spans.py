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
