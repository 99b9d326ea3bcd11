"""Property tests: ngram_jaccard_pairs vs brute-force all-pairs Jaccard,
and the hard guarantees of the probabilistic dedup family.

ngram_jaccard_pairs claims exactness despite two pruning optimizations
(prefix filtering, size-ratio cut) — the brute-force model makes that
claim falsifiable on randomized corpora, including degenerate docs
(empty, shorter than the shingle width, exact duplicates).

MinHash/SimHash are probabilistic by design so no exact model exists,
but both carry one deterministic guarantee worth pinning: documents with
IDENTICAL shingle sets produce identical signatures/fingerprints and are
therefore ALWAYS emitted as a pair, for every banding configuration.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

WORDS = ["x", "y", "z", "w"]

text_strategy = st.lists(st.sampled_from(WORDS), min_size=0, max_size=8).map(
    " ".join
)
corpus_strategy = st.lists(text_strategy, min_size=2, max_size=6)


def _model_grams(text: str, n: int) -> frozenset[str]:
    # mirror shingle_rows: lowercase, split on \s+, grams at 0..max(len-n,0),
    # slice truncates short docs to one partial gram; "" splits to [""]
    words = text.lower().split(" ") if text else [""]
    upper = max(len(words) - n, 0)
    return frozenset(" ".join(words[i : i + n]) for i in range(upper + 1))


@given(
    corpus=corpus_strategy,
    n=st.sampled_from([1, 2, 3]),
    threshold=st.sampled_from([0.3, 0.5, 0.8]),
)
@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
def test_ngram_jaccard_pairs_matches_bruteforce(spark, corpus, n, threshold):
    from data_pipelines_examples_spark.operators.dedup import ngram_jaccard_pairs

    rows = [(i, t) for i, t in enumerate(corpus)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(
            df, "doc_id", "text", shingle_n=n, threshold=threshold
        ).collect()
    }
    expected = {}
    for i, ta in rows:
        ga = _model_grams(ta, n)
        for j, tb in rows:
            if j <= i:
                continue
            gb = _model_grams(tb, n)
            inter = len(ga & gb)
            # same arithmetic shape as the Spark expression: |A∩B| / (na+nb-|A∩B|)
            jac = inter / (len(ga) + len(gb) - inter)
            if jac >= threshold:
                expected[(i, j)] = jac
    assert got == expected


dup_corpus = st.lists(text_strategy.filter(lambda t: t.strip()), min_size=1, max_size=4)


@given(corpus=dup_corpus, bands=st.sampled_from([4, 8]))
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
def test_minhash_always_pairs_identical_shingle_sets(spark, corpus, bands):
    from data_pipelines_examples_spark.operators.dedup import minhash_lsh_pairs

    # duplicate every distinct doc once: ids (2k, 2k+1) share a shingle set
    distinct = sorted(set(corpus))
    rows = [(2 * k + off, t) for k, t in enumerate(distinct) for off in (0, 1)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(
            df, "doc_id", "text", num_hashes=16, bands=bands, shingle_n=2
        ).collect()
    }
    for k in range(len(distinct)):
        assert (2 * k, 2 * k + 1) in got, distinct[k]


@given(corpus=dup_corpus, bands=st.sampled_from([2, 4]))
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
def test_simhash_always_pairs_identical_shingle_sets(spark, corpus, bands):
    from data_pipelines_examples_spark.operators.dedup import simhash_pairs

    distinct = sorted(set(corpus))
    rows = [(2 * k + off, t) for k, t in enumerate(distinct) for off in (0, 1)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = simhash_pairs(df, "doc_id", "text", max_hamming=0, bands=bands).collect()
    got = {(r["id_a"], r["id_b"]) for r in out}
    for k in range(len(distinct)):
        assert (2 * k, 2 * k + 1) in got, distinct[k]
    # hamming==0 pairs are exact fingerprint matches by definition
    assert all(r["hamming"] == 0 for r in out)


def test_ngram_jaccard_duplicate_docid_rows_count_once(spark):
    # r14 single-pass posting aggregation: collect_set(id) per gram must
    # keep the r13 distinct-(id, gram) semantics — a doc_id spanning
    # multiple input rows (re-crawled corpus, replayed batch) contributes
    # its gram SET once: document frequencies don't double, |A| is the
    # union size, and jaccard matches the set model.
    from data_pipelines_examples_spark.operators.dedup import ngram_jaccard_pairs

    rows = [
        (1, "a b c d e"),
        (1, "a b c d e"),          # exact replay of doc 1
        (2, "a b c"),
        (2, "c d e"),              # doc 2 split across two rows
        (3, "a b c d e"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {
        (r["id_a"], r["id_b"]): round(r["jaccard"], 6)
        for r in ngram_jaccard_pairs(df, shingle_n=2, threshold=0.5).collect()
    }
    # doc1 grams = doc3 grams = {a b, b c, c d, d e}; doc2 = {a b, b c, c d, d e}
    # (union of "a b c" -> {a b, b c} and "c d e" -> {c d, d e}) — all three
    # docs share the identical 4-gram set, J = 1.0 for every pair.
    assert got == {(1, 2): 1.0, (1, 3): 1.0, (2, 3): 1.0}
