"""Verbatim duplicated-span detection and removal (Lee et al. 2022,
arXiv:2107.06499 — the suffix-array dedup pass, re-expressed as a
hash-groupBy over k-token windows)."""

from __future__ import annotations

from data_pipelines_examples_spark.operators.dedup import (
    duplicate_spans,
    strip_duplicate_spans,
)

# A 10-token verbatim sentence shared by docs 1 and 2, embedded at
# different offsets, plus unique prefixes/suffixes. Doc 3 is unrelated,
# doc 4 is shorter than k and must never appear.
SHARED = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
DOCS = [
    (1, f"unique one prefix {SHARED} unique one suffix"),
    (2, f"two {SHARED} trailing words here two"),
    (3, "totally different text with no overlap at all whatsoever in it"),
    (4, "short doc"),
]


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id int, text string")


def test_duplicate_spans_maximal_merge(spark):
    # k=8 over a 10-token shared run -> 3 duplicated windows per doc,
    # overlapping, merging into ONE maximal span of exactly 10 tokens.
    out = duplicate_spans(_docs(spark), k=8).collect()
    by_doc = {r["doc_id"]: r for r in out}
    assert set(by_doc) == {1, 2}
    # doc 1: prefix "unique one prefix" = 3 tokens, span covers tokens 4..13
    r1 = by_doc[1]
    assert (r1["span_start"], r1["span_end"]) == (4, 13)
    assert r1["span_tokens"] == 10
    assert r1["n_windows"] == 3
    # doc 2: prefix "two" = 1 token, span covers tokens 2..11
    r2 = by_doc[2]
    assert (r2["span_start"], r2["span_end"]) == (2, 11)
    assert r2["span_tokens"] == 10


def test_duplicate_spans_min_docs_threshold(spark):
    # min_docs=3: the sentence is only in 2 docs -> nothing flagged.
    assert duplicate_spans(_docs(spark), k=8, min_docs=3).count() == 0


def test_duplicate_spans_disjoint_islands(spark):
    # Two separate shared runs inside one doc stay two spans when the
    # gap between them exceeds k.
    a = "one two three four five six seven eight"  # 8 tokens
    b = "red orange yellow green blue indigo violet ultraviolet"  # 8 tokens
    gap = "g1 g2 g3 g4 g5 g6 g7 g8 g9"  # 9 unique tokens > k=8
    docs = spark.createDataFrame(
        [(1, f"{a} {gap} {b}"), (2, a), (3, b)], "doc_id int, text string"
    )
    out = duplicate_spans(docs, k=8).filter("doc_id = 1").collect()
    spans = sorted((r["span_start"], r["span_end"]) for r in out)
    assert spans == [(1, 8), (18, 25)]


def test_strip_keeps_canonical_occurrence(spark):
    out = {r["doc_id"]: r for r in strip_duplicate_spans(_docs(spark), k=8).collect()}
    # doc 1 is canonical (min id) -> keeps full text verbatim (lowercased
    # whitespace-normalized form).
    assert out[1]["text"] == f"unique one prefix {SHARED} unique one suffix"
    assert out[1]["n_tokens_kept"] == 16
    # doc 2 loses exactly the 10 shared tokens.
    assert out[2]["text"] == "two trailing words here two"
    assert out[2]["n_tokens_kept"] == 5
    # untouched docs survive verbatim.
    assert out[3]["n_tokens_kept"] == 11
    assert out[4]["text"] == "short doc"


def test_strip_drops_fully_covered_doc(spark):
    docs = spark.createDataFrame(
        [(1, SHARED), (2, SHARED)], "doc_id int, text string"
    )
    out = {r["doc_id"]: r for r in strip_duplicate_spans(docs, k=8).collect()}
    assert set(out) == {1}  # doc 2 entirely duplicated -> dropped
    assert out[1]["n_tokens_kept"] == 10


def test_scd2_history_intervals(spark):
    from data_pipelines_examples_spark.operators.dedup import scd2_history

    rows = [
        (1, 10, "a"),
        (1, 20, "a"),   # unchanged -> collapses into the t=10 interval
        (1, 30, "b"),   # change
        (1, 40, None),  # value -> NULL opens a new interval
        (1, 50, None),  # unchanged NULL collapses
        (1, 60, "a"),   # NULL -> value opens a new interval
        (2, 15, "x"),   # single-row key: one current interval
    ]
    df = spark.createDataFrame(rows, "k int, t int, v string")
    out = sorted(
        scd2_history(df, "k", "t", ["v"]).collect(),
        key=lambda r: (r["k"], r["valid_from"]),
    )
    got = [(r["k"], r["v"], r["valid_from"], r["valid_to"], r["is_current"]) for r in out]
    assert got == [
        (1, "a", 10, 30, False),
        (1, "b", 30, 40, False),
        (1, None, 40, 60, False),
        (1, "a", 60, None, True),
        (2, "x", 15, None, True),
    ]


def test_apply_cdc_upsert_delete_supersede(spark):
    from data_pipelines_examples_spark.operators.dedup import apply_cdc

    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k int, v string"
    )
    changes = spark.createDataFrame(
        [
            (2, "b2", "U", 10),   # update key 2
            (3, "c1", "U", 10),   # superseded by the later delete
            (3, "c2", "D", 20),   # delete key 3
            (4, "d", "I", 10),    # insert new key 4
            (5, "e1", "D", 10),   # superseded by the later re-insert
            (5, "e2", "I", 20),   # delete-then-insert -> present
        ],
        "k int, v string, op string, ver int",
    )
    out = apply_cdc(base, changes, "k", "op", "ver")
    got = sorted((r["k"], r["v"]) for r in out.collect())
    assert got == [(1, "a"), (2, "b2"), (4, "d"), (5, "e2")]
    assert out.columns == base.columns
    # idempotent: re-applying the same log is a no-op
    again = apply_cdc(out, changes, "k", "op", "ver")
    assert sorted((r["k"], r["v"]) for r in again.collect()) == got


def test_apply_cdc_rejects_schema_mismatch(spark):
    import pytest

    from data_pipelines_examples_spark.operators.dedup import apply_cdc

    base = spark.createDataFrame([(1, "a")], "k int, v string")
    bad = spark.createDataFrame([(1, "U", 1)], "k int, op string, ver int")
    with pytest.raises(ValueError, match="missing base columns"):
        apply_cdc(base, bad, "k", "op", "ver")


def test_temporal_join_point_in_time(spark):
    from data_pipelines_examples_spark.operators.dedup import scd2_history
    from data_pipelines_examples_spark.operators.relational import temporal_join

    hist_src = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", "bronze"),
            (1, "2024-02-01 00:00:00", "silver"),
            (1, "2024-03-01 00:00:00", "gold"),
            (2, "2024-01-15 00:00:00", "bronze"),
        ],
        "k int, t string, tier string",
    ).selectExpr("k", "cast(t as timestamp) as t", "tier")
    hist = scd2_history(hist_src, "k", "t", ["tier"])
    facts = spark.createDataFrame(
        [
            (100, 1, "2024-01-20 12:00:00"),  # inside bronze
            (101, 1, "2024-02-01 00:00:00"),  # boundary -> silver (from-inclusive)
            (102, 1, "2024-12-31 00:00:00"),  # open current -> gold
            (103, 1, "2023-06-01 00:00:00"),  # before first version -> NULL
            (104, 2, "2024-02-02 00:00:00"),  # key 2 current
        ],
        "fact_id int, k int, ts string",
    ).selectExpr("fact_id", "k", "cast(ts as timestamp) as ts")
    out = {r["fact_id"]: r for r in temporal_join(facts, hist, "k", "ts").collect()}
    assert out[100]["tier"] == "bronze" and out[100]["valid_to"] is not None
    assert out[101]["tier"] == "silver"
    assert out[102]["tier"] == "gold" and out[102]["valid_to"] is None
    assert out[103]["tier"] is None and out[103]["valid_from"] is None
    assert out[104]["tier"] == "bronze"
    assert len(out) == 5


def test_temporal_join_gapped_history_no_misattribution(spark):
    from data_pipelines_examples_spark.operators.relational import temporal_join

    # Hand-built gapped history: key 1's only version is CLOSED at Feb 1
    # with no successor; a March fact must get NULL, not the stale row.
    hist = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", "2024-02-01 00:00:00", "x")],
        "k int, valid_from string, valid_to string, v string",
    ).selectExpr(
        "k",
        "cast(valid_from as timestamp) as valid_from",
        "cast(valid_to as timestamp) as valid_to",
        "v",
    )
    facts = spark.createDataFrame(
        [(1, 1, "2024-01-10 00:00:00"), (2, 1, "2024-03-10 00:00:00")],
        "fact_id int, k int, ts string",
    ).selectExpr("fact_id", "k", "cast(ts as timestamp) as ts")
    out = {r["fact_id"]: r for r in temporal_join(facts, hist, "k", "ts").collect()}
    assert out[1]["v"] == "x"
    assert out[2]["v"] is None and out[2]["valid_from"] is None


def test_winnowing_guarantee_and_selectivity(spark):
    from data_pipelines_examples_spark.operators.text import winnowing_fingerprints

    k, w = 8, 4
    shared = "the-exact-shared-run-of-characters"  # 34 chars >= w+k-1=11
    docs = spark.createDataFrame(
        [
            (1, f"prefix one {shared} suffix one"),
            (2, f"totally different opening {shared} and closing text"),
            (3, "no overlap with the others at all, nothing in common here!"),
        ],
        "doc_id int, text string",
    )
    fps = winnowing_fingerprints(docs, k=k, w=w)
    by_doc = {}
    for r in fps.collect():
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    # guarantee: docs 1 and 2 share the >= w+k-1 run -> >=1 common fp
    assert by_doc[1] & by_doc[2]
    # selectivity: doc 3 shares nothing with either
    assert not (by_doc[3] & by_doc[1]) and not (by_doc[3] & by_doc[2])


def test_winnowing_short_doc_single_fingerprint(spark):
    from data_pipelines_examples_spark.operators.text import winnowing_fingerprints

    docs = spark.createDataFrame([(1, "tiny")], "doc_id int, text string")
    rows = winnowing_fingerprints(docs, k=8, w=4).collect()
    assert len(rows) == 1  # one truncated gram, one window


def test_normalize_text_nfc_controls_whitespace(spark):
    from data_pipelines_examples_spark.operators.text import normalize_text

    decomposed = "café"        # e + combining acute
    composed = "café"
    docs = spark.createDataFrame(
        [
            (1, f"  {decomposed}\tand\x00junk\n\nhere "),
            (2, composed),
        ],
        "doc_id int, text string",
    )
    out = {r["doc_id"]: r["text"] for r in normalize_text(docs).collect()}
    assert out[1] == f"{composed} andjunk here"  # NUL strips, no space injected
    assert out[2] == composed
    # post-normalization, hash-based dedup sees the two forms as equal
    assert out[1].split(" ")[0] == out[2]


def test_normalize_text_nfkc_folds_compatibility(spark):
    from data_pipelines_examples_spark.operators.text import normalize_text

    docs = spark.createDataFrame([(1, "ﬁle ①")], "doc_id int, text string")
    out = normalize_text(docs, form="NFKC").first()["text"]
    assert out == "file 1"  # fi ligature and circled-one fold under NFKC


def test_pseudonymize_referential_integrity_and_unlinkability(spark):
    from data_pipelines_examples_spark.functions.udfs import pseudonymize

    a = spark.createDataFrame([(1, "x"), (2, "y"), (None, "z")], "k int, v string")
    b = spark.createDataFrame([(1, 10.0), (1, 20.0), (3, 30.0)], "k int, amt double")
    pa = pseudonymize(a, ["k"], seed=5)
    pb = pseudonymize(b, ["k"], seed=5)
    # same seed -> same tokens: the join works and matches raw-key semantics
    joined = pa.join(pb, "k")
    assert joined.count() == 2  # key 1 matches twice; 2/3 unmatched; NULL stays out
    # tokens are not the raw keys
    toks = {r["k"] for r in pa.collect() if r["k"] is not None}
    assert toks.isdisjoint({1, 2})
    # NULL stays NULL
    assert any(r["k"] is None for r in pa.collect())
    # a different seed is a different pseudonym universe
    pa9 = pseudonymize(a, ["k"], seed=9)
    assert {r["k"] for r in pa9.collect()} != {r["k"] for r in pa.collect()}


def test_pseudonymize_suffix_drops_raw_column(spark):
    from data_pipelines_examples_spark.functions.udfs import pseudonymize

    df = spark.createDataFrame([(1, "x")], "k int, v string")
    out = pseudonymize(df, ["k"], seed=5, suffix="_token")
    assert set(out.columns) == {"k_token", "v"}  # raw k gone


def test_duplicate_spans_hot_window_bounded_state(spark):
    # r14 guard: a window hash shared by MANY docs must not concentrate
    # its occurrences in one aggregation buffer (the r13 collect_list
    # form built a D-element array in a single agg buffer that no spill
    # path can split). The window formulation keeps per-group state in
    # WindowExec's spillable row buffer. Functional pin: a 2000-doc
    # hot window — plus a repeated-within-doc window and a sub-min_docs
    # window — must match the naive countDistinct-then-join-back form.
    from pyspark.sql import functions as F

    shared = "w1 w2 w3 w4 w5 w6 w7 w8"
    rows = [(i, f"doc{i}a doc{i}b {shared} doc{i}c") for i in range(2000)]
    # doc 9001 repeats the shared run twice (two occurrences, one doc)
    rows.append((9001, f"{shared} mid{shared.replace('w', 'x')} {shared}"))
    # docs 9002/9003 share a DIFFERENT window seen by only those two
    rows.append((9002, "p1 p2 p3 p4 p5 p6 p7 p8 tail9002"))
    rows.append((9003, "head9003 p1 p2 p3 p4 p5 p6 p7 p8"))
    df = spark.createDataFrame(rows, "doc_id int, text string")
    k, min_docs = 8, 3

    got = duplicate_spans(df, k=k, min_docs=min_docs)

    # naive reference: window hashes -> countDistinct(doc) -> join back
    ws = df.select(
        F.col("doc_id"),
        F.split(F.lower(F.trim(F.col("text"))), r"\s+").alias("__ws"),
    ).filter(F.size("__ws") >= k)
    wins = ws.select(
        "doc_id",
        F.explode(F.sequence(F.lit(1), F.size("__ws") - (k - 1))).alias("__i"),
        F.col("__ws"),
    ).select(
        "doc_id",
        "__i",
        F.xxhash64(F.array_join(F.slice("__ws", F.col("__i"), k), " ")).alias("__h"),
    )
    freq = (
        wins.groupBy("__h")
        .agg(F.countDistinct("doc_id").alias("__nd"))
        .filter(F.col("__nd") >= min_docs)
        .select("__h")
    )
    hits = wins.join(freq, "__h").select("doc_id", "__i")
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy("__i")
    isl = hits.withColumn(
        "__brk",
        F.when(F.col("__i") - F.lag("__i").over(w) <= k, F.lit(0)).otherwise(F.lit(1)),
    ).withColumn("__island", F.sum("__brk").over(w))
    expected = isl.groupBy("doc_id", "__island").agg(
        F.min("__i").alias("span_start"),
        (F.max("__i") + (k - 1)).alias("span_end"),
        (F.max("__i") - F.min("__i") + k).alias("span_tokens"),
        F.count("*").alias("n_windows"),
    ).drop("__island")

    got_rows = sorted(map(tuple, got.collect()))
    exp_rows = sorted(map(tuple, expected.collect()))
    assert got_rows == exp_rows
    assert len(got_rows) == 2002  # 2000 hot docs + 2 spans in doc 9001
    # the 9002/9003 pair is below min_docs=3 and must not appear
    assert not any(r[0] in (9002, 9003) for r in got_rows)
    # plan pin: discovery is window-based, no per-hash collect_list buffer
    plan = got._sc._jvm.PythonSQLUtils.explainString(
        got._jdf.queryExecution(), "formatted"
    )
    assert "collect_list" not in plan
    assert "dense_rank" in plan
