"""Tests for dedup (exact, SCD, minhash/simhash/jaccard) and text operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipelines_examples_spark.operators.dedup import (
    dedup_exact,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    scd_latest,
    simhash_pairs,
)
from data_pipelines_examples_spark.operators.text import (
    lang_id,
    quality_score,
    token_count,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog again and again today"),
    (2, "the quick brown fox jumps over the lazy dog again and again today"),  # exact dup of 1
    (3, "the quick brown fox jumps over the lazy dog again and again tomorrow"),  # near dup
    (4, "completely different content about spark query engines and shuffles"),
]


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id int, text string")


def test_dedup_exact(spark):
    out = dedup_exact(_docs(spark), "text", id_col="doc_id")
    assert sorted(r.doc_id for r in out.collect()) == [1, 3, 4]


def test_scd_latest(spark):
    df = spark.createDataFrame(
        [(1, "2020-01-01", "old"), (1, "2020-01-02", "new"), (2, "2020-01-01", "only")],
        "k int, v string, payload string",
    )
    out = scd_latest(df, "k", "v")
    assert {(r.k, r.payload) for r in out.collect()} == {(1, "new"), (2, "only")}


def test_minhash_finds_near_dup(spark):
    pairs = minhash_lsh_pairs(_docs(spark), num_hashes=32, bands=16, shingle_n=2)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert (1, 2) in got  # exact dup always collides
    assert (1, 3) in got or (2, 3) in got  # near dup should band-collide
    est = {(r.id_a, r.id_b): r.est_jaccard for r in pairs.collect()}
    assert est[(1, 2)] == 1.0


def test_ngram_jaccard_exact(spark):
    pairs = ngram_jaccard_pairs(_docs(spark), shingle_n=2, threshold=0.5)
    got = {(r.id_a, r.id_b): r.jaccard for r in pairs.collect()}
    assert got[(1, 2)] == 1.0
    assert any(k in got for k in [(1, 3), (2, 3)])
    assert all(v >= 0.5 for v in got.values())


def test_simhash_pairs(spark):
    pairs = simhash_pairs(_docs(spark), max_hamming=6)
    got = {(r.id_a, r.id_b): r.hamming for r in pairs.collect()}
    assert got[(1, 2)] == 0  # identical text → identical fingerprint
    assert (1, 4) not in got and (2, 4) not in got and (3, 4) not in got


def test_simhash_swar_matches_naive_votes(spark):
    """The SWAR packed-counter aggregation (r13) must be bit-identical to
    the naive one-±1-sum-per-bit formulation on BOTH hash paths,
    including odd num_bits (one unpaired lane) and the empty-text
    single-""-gram case."""
    from data_pipelines_examples_spark.functions.hashing import hash64
    from data_pipelines_examples_spark.operators.dedup import (
        shingle_rows,
        simhash_fingerprints,
    )

    docs = spark.createDataFrame(
        DOCS + [(5, ""), (6, "one"), (7, "a b a b a b a")],
        "doc_id int, text string",
    )

    def naive(df, num_bits, hash_how):
        exploded = shingle_rows(df, "doc_id", "text", 2).withColumn(
            "__h", hash64(F.col("__g"), how=hash_how)
        )
        votes = exploded.groupBy("doc_id").agg(
            *[
                F.sum(
                    F.when(F.col("__h").isNull(), 0)
                    .when(
                        F.shiftright(F.col("__h"), i).bitwiseAND(F.lit(1)) == 1, 1
                    )
                    .otherwise(-1)
                ).alias(f"__v{i}")
                for i in range(num_bits)
            ]
        )
        fp = F.lit(0).cast("long")
        for i in range(num_bits):
            fp = F.shiftleft(fp, 1) + (F.col(f"__v{i}") > 0).cast("long")
        return votes.select("doc_id", fp.alias("__fp"))

    for hash_how, num_bits in (("xxhash64", 64), ("portable", 60), ("xxhash64", 7)):
        want = {r["doc_id"]: r["__fp"] for r in naive(docs, num_bits, hash_how).collect()}
        got = {
            r["doc_id"]: r["__fp"]
            for r in simhash_fingerprints(
                docs, num_bits=num_bits, shingle_n=2, hash_how=hash_how
            ).collect()
        }
        assert got == want, (hash_how, num_bits)


def test_token_count(spark):
    df = spark.createDataFrame([("a b  c",), ("single",)], "text string")
    got = [r[0] for r in df.select(token_count("text")).collect()]
    assert got == [3, 1]


def test_quality_score_range(spark):
    out = quality_score(_docs(spark), "text")
    for r in out.select("quality").collect():
        assert 0.0 <= r.quality <= 1.0


def test_lang_id(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat is in the house and the dog is not"),
            (2, "der hund ist nicht in das haus und die katze"),
            (3, "xyzzy plugh qwerty"),
        ],
        "doc_id int, text string",
    )
    got = {r.doc_id: r.lang_pred for r in lang_id(df).collect()}
    assert got == {1: "en", 2: "de", 3: "und"}


def test_redact_pii(spark):
    from data_pipelines_examples_spark.operators.text import redact_pii

    df = spark.createDataFrame(
        [
            (1, "mail me at jane.doe+x@corp.example.com or call 415-555-1234"),
            (2, "server 10.0.42.7 and ssn 123-45-6789 stay private"),
            (3, "no pii here"),
        ],
        "doc_id int, text string",
    )
    got = {r.doc_id: r.text for r in redact_pii(df).collect()}
    assert got[1] == "mail me at <EMAIL> or call <PHONE>"
    assert got[2] == "server <IP> and ssn <SSN> stay private"
    assert got[3] == "no pii here"


def test_repetition_ratios(spark):
    from data_pipelines_examples_spark.operators.text import repetition_ratios

    df = spark.createDataFrame(
        [
            (1, "buy now\nbuy now\nbuy now\nbuy now"),  # 3 of 4 lines duplicate
            (2, "all lines\nare unique\nhere"),
        ],
        "doc_id int, text string",
    )
    got = {r.doc_id: (r.dup_line_ratio, r.dup_ngram_ratio) for r in repetition_ratios(df).collect()}
    assert got[1][0] == 0.75 and got[1][1] > 0.5
    assert got[2][0] == 0.0


def test_decontaminate(spark):
    from data_pipelines_examples_spark.operators.dedup import decontaminate

    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id int, text string",
    )
    train = spark.createDataFrame(
        [
            (1, "prefix words then the quick brown fox jumps over the lazy dog and more"),
            (2, "completely unrelated text about spark partitions and shuffles"),
        ],
        "doc_id int, text string",
    )
    kept = decontaminate(train, bench, shingle_n=9)
    assert [r.doc_id for r in kept.collect()] == [2]
    # with n larger than the overlap, nothing is contaminated
    assert decontaminate(train, bench, shingle_n=13).count() == 2


def test_ensure_parallelism_rebalances_single_file(spark, tmp_path):
    """A one-file scan under the cluster's parallelism rebalances; an
    in-memory relation (no input files) is left untouched — and neither
    path touches the RDD API's eager planning."""
    from data_pipelines_examples_spark.operators.balance import ensure_parallelism

    path = str(tmp_path / "one")
    spark.range(1000).coalesce(1).write.parquet(path)
    scan = spark.read.parquet(path)
    par = spark.sparkContext.defaultParallelism
    out = ensure_parallelism(scan)
    assert out.rdd.getNumPartitions() == par  # rdd use is test-side only
    local = spark.createDataFrame([(1,), (2,)], "v int")
    assert ensure_parallelism(local) is local


def test_minhash_signature_variants_identical(spark):
    """The per-row expression variant and the explode+groupBy variant must
    produce identical signatures (documented contract), on both hash paths."""
    from pyspark.sql import functions as F

    from data_pipelines_examples_spark.operators.dedup import (
        minhash_signature,
        minhash_signatures,
        shingle_rows,
    )

    docs = _docs(spark)
    for how in ("xxhash64", "portable"):
        agg = {
            r.doc_id: list(r["__sig"])
            for r in minhash_signatures(
                docs, num_hashes=8, shingle_n=2, hash_how=how
            ).collect()
        }
        per_row = {
            r.doc_id: list(r.sig)
            for r in shingle_rows(docs, "doc_id", "text", 2)
            .groupBy("doc_id")
            .agg(F.collect_list("__g").alias("gs"))
            .select(
                "doc_id",
                minhash_signature(F.col("gs"), num_hashes=8, hash_how=how).alias("sig"),
            )
            .collect()
        }
        assert agg == per_row, f"variant divergence on {how}"


def test_duplicate_components_and_canonical(spark):
    """Hand-built pair graph: {1-2, 2-3} and {10-11} → components labeled
    by min id; canonical dedup keeps min ids + untouched docs."""
    from data_pipelines_examples_spark.operators.dedup import (
        dedup_keep_canonical,
        duplicate_components,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a bigint, id_b bigint"
    )
    comp = {r.id: r.component for r in duplicate_components(pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}
    docs = spark.createDataFrame(
        [(i, f"d{i}") for i in (1, 2, 3, 5, 10, 11)], "doc_id bigint, text string"
    )
    kept = {r.doc_id for r in dedup_keep_canonical(docs, pairs).collect()}
    assert kept == {1, 5, 10}, "min-id reps + unpaired docs survive"


def test_duplicate_components_long_chain(spark):
    """A path graph 0-1-2-...-7 (diameter 7) converges to a single
    component within the iteration budget."""
    from data_pipelines_examples_spark.operators.dedup import duplicate_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(7)], "id_a bigint, id_b bigint"
    )
    comp = {r.id: r.component for r in duplicate_components(pairs).collect()}
    assert comp == {i: 0 for i in range(8)}


def test_dedup_against_corpus_cross_side_only(spark):
    """Delta-vs-corpus dedup: new docs duplicating the EXISTING corpus are
    dropped; new-vs-new duplicates survive (deliberately); unrelated new
    docs survive."""
    from data_pipelines_examples_spark.operators.dedup import (
        dedup_against_corpus,
        minhash_lsh_pairs,
    )

    corpus_text = "the quick brown fox jumps over the lazy dog again and again"
    near_dup = "the quick brown fox jumps over the lazy dog again and again!"
    fresh = "completely different content about spark partitions and shuffles"
    existing = spark.createDataFrame(
        [(1, corpus_text), (2, "another unrelated existing document entirely")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(10, near_dup), (11, fresh), (12, fresh)],  # 11/12: new-vs-new dup
        "doc_id long, text string",
    )
    kept = sorted(
        r.doc_id
        for r in dedup_against_corpus(new, existing, shingle_n=2).collect()
    )
    assert kept == [11, 12]  # 10 killed by corpus, new-new pair kept

    # consistency: the cross-match implies the full pair list would pair them
    both = existing.union(new)
    pair_ids = {
        (r.id_a, r.id_b) for r in minhash_lsh_pairs(both, shingle_n=2).collect()
    }
    assert (1, 10) in pair_ids

    # threshold gate: an impossibly high bar keeps everything
    all_kept = sorted(
        r.doc_id
        for r in dedup_against_corpus(
            new, existing, shingle_n=2, min_est_jaccard=1.01
        ).collect()
    )
    assert all_kept == [10, 11, 12]


def test_unigram_surprisal_orders_quality(spark):
    """Rare-token documents score higher surprisal than common-token
    documents; analytic check on a tiny corpus."""
    import math

    from data_pipelines_examples_spark.operators.text import unigram_surprisal

    # 'the' appears 8x, 'zyx' once; doc 3 is all-common, doc 4 all-rare
    docs = [
        (1, "the the the the"),
        (2, "the the the the"),
        (3, "the the"),
        (4, "zyx"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r.doc_id: r for r in unigram_surprisal(df).collect()}
    assert out[4].mean_surprisal > out[3].mean_surprisal
    # exact: corpus N=11, V=2, add-1: p(the)=(10+1)/(11+2), p(zyx)=(1+1)/13
    p_the, p_zyx = 11 / 13, 2 / 13
    assert math.isclose(out[3].mean_surprisal, -math.log2(p_the), rel_tol=1e-12)
    assert math.isclose(out[4].mean_surprisal, -math.log2(p_zyx), rel_tol=1e-12)
    assert out[1].n_tokens == 4 and out[4].n_tokens == 1


def test_duplicate_components_long_chain_log_rounds(spark, tmp_path):
    """A 64-node path graph (diameter 63) must fully converge — pure
    neighbor propagation would need 63 rounds and silently time out at
    the 20-iteration cap; path halving closes it in O(log n) rounds."""
    from data_pipelines_examples_spark.operators.dedup import duplicate_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(63)], "id_a long, id_b long"
    )
    out = duplicate_components(
        pairs, max_iterations=12, state_path=str(tmp_path / "cc")
    )
    comp = {r.id: r.component for r in out.collect()}
    assert set(comp) == set(range(64))
    assert set(comp.values()) == {0}  # ONE component, fully converged


def test_dedup_corpus_lines(spark):
    from data_pipelines_examples_spark.operators.dedup import dedup_corpus_lines

    rows = [
        (1, "unique one\nSHARED BANNER\nunique two"),
        (2, "SHARED BANNER\nother content"),
        (3, "SHARED BANNER"),            # nothing survives → dropped
        (4, "solo document line"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r["doc_id"]: r for r in dedup_corpus_lines(df).collect()}
    assert set(out) == {1, 2, 4}
    assert out[1]["text"] == "unique one\nunique two"
    assert out[1]["n_lines_kept"] == 2
    assert out[2]["text"] == "other content"
    assert out[4]["text"] == "solo document line"


def test_dedup_corpus_lines_max_docs(spark):
    from data_pipelines_examples_spark.operators.dedup import dedup_corpus_lines

    rows = [(1, "twice"), (2, "twice"), (3, "thrice"), (4, "thrice"), (5, "thrice")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = dedup_corpus_lines(df, max_docs=2)
    assert sorted(r["doc_id"] for r in out.collect()) == [1, 2]


def test_contamination_report_counts_shared_grams(spark):
    from data_pipelines_examples_spark.operators.dedup import contamination_report

    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta")], "doc_id int, text string"
    )
    train = spark.createDataFrame(
        [
            (1, "x alpha beta gamma delta epsilon zeta y"),  # shares 3 4-grams... see below
            (2, "nothing in common at all here"),
        ],
        "doc_id int, text string",
    )
    out = contamination_report(train, bench, shingle_n=4)
    rows = out.collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["train_id"], r["bench_id"]) == (1, 100)
    # bench has 3 distinct 4-grams; all appear verbatim in train doc 1
    assert r["n_shared_grams"] == 3
