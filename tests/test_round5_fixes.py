"""Round-5 regression pins: the winnowing quadratic fix, the simhash
filter-before-dedup reorder, and all five ADVICE r4 findings
(association denominators, checksum NULL encoding, rollup swap
ordering, recall_at_k input validation, oracle-SQL quote escaping)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import assert_df_equal


# ---------------------------------------------------------------------------
# winnowing: array path materializes hashes; exploded path agrees
# ---------------------------------------------------------------------------

def test_winnowing_paths_agree_on_edge_docs(spark):
    from data_pipelines_examples_spark.operators.text import (
        winnowing_fingerprints,
        winnowing_fingerprints_exploded,
    )

    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "short"),                    # < k chars: single clamped gram
        (3, "exactly8"),                 # == k chars: one gram
        (4, "ninechars"),                # k+1 chars: two grams, < w windows
        (5, "aaaaaaaaaaaaaaaaaaaa"),     # repeated grams: distinct collapses
        (6, "the quick brown fox jumps over the lazy dog"),  # dup of 1
        (7, "abcdefghijk"),              # n_grams == w: exactly one window
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    a = winnowing_fingerprints(df, k=8, w=4)
    b = winnowing_fingerprints_exploded(df, k=8, w=4)
    assert_df_equal(a, b)
    # winnowing guarantee: identical docs share every fingerprint
    fp1 = {r["fp"] for r in a.filter("doc_id = 1").collect()}
    fp6 = {r["fp"] for r in a.filter("doc_id = 6").collect()}
    assert fp1 == fp6 and fp1


def test_winnowing_array_path_materializes_hashes(spark):
    """The O(len²·w) regression guard: the gram-hash array MUST be
    materialized into a column (`__winnow_h`) before the window-min
    lambda references it — interpreted HOF lambdas do not CSE, so an
    inline reference recomputes the full array per window position
    (measured 125× slower at sf0.01)."""
    from data_pipelines_examples_spark.operators.text import winnowing_fingerprints

    df = spark.createDataFrame([(1, "abcdefghijklmnop")], "doc_id int, text string")
    plan = winnowing_fingerprints(df)._jdf.queryExecution().analyzed().toString()
    assert "__winnow_h" in plan


# ---------------------------------------------------------------------------
# association_metrics: denominators see the SAME basket population
# ---------------------------------------------------------------------------

def test_association_metrics_basket_guard_consistent(spark):
    from data_pipelines_examples_spark.operators.itemsets import association_metrics

    # basket 9 exceeds max_basket_size=3 and must vanish from BOTH the
    # pair counts AND the confidence/lift denominators.
    rows = [
        (1, "a"), (1, "b"),
        (2, "a"), (2, "b"),
        (3, "a"),
        (9, "a"), (9, "b"), (9, "c"), (9, "d"),
    ]
    df = spark.createDataFrame(rows, "basket int, item string")
    out = {
        (r["antecedent"], r["consequent"]): r
        for r in association_metrics(
            df, "basket", "item", min_support=2, max_basket_size=3
        ).collect()
    }
    ab = out[("a", "b")]
    # with basket 9 excluded: a in 3 baskets, b in 2, both in 2, 3 baskets
    assert ab["n_both"] == 2
    assert ab["n_antecedent"] == 3, (
        "denominator leaked the over-sized basket back in"
    )
    assert abs(ab["confidence"] - 2 / 3) < 1e-12
    assert abs(ab["lift"] - (2 / 3) / (2 / 3)) < 1e-12


# ---------------------------------------------------------------------------
# corpus_checksum portable path: NULL placement and separators distinguish
# ---------------------------------------------------------------------------

def test_corpus_checksum_portable_null_placement(spark):
    from data_pipelines_examples_spark.reporting import corpus_checksum

    t1 = spark.createDataFrame([("a", None)], "x string, y string")
    t2 = spark.createDataFrame([(None, "a")], "x string, y string")
    assert corpus_checksum(t1, hash_how="portable") != corpus_checksum(
        t2, hash_how="portable"
    )


def test_corpus_checksum_portable_separator_and_empty(spark):
    from data_pipelines_examples_spark.reporting import corpus_checksum

    # a value CONTAINING the separator must not alias a column boundary
    t1 = spark.createDataFrame([("x\x1f1y", "z")], "a string, b string")
    t2 = spark.createDataFrame([("x", "1y\x1fz")], "a string, b string")
    assert corpus_checksum(t1, hash_how="portable") != corpus_checksum(
        t2, hash_how="portable"
    )
    # NULL vs empty string must differ
    t3 = spark.createDataFrame([("", "z")], "a string, b string")
    t4 = spark.createDataFrame([(None, "z")], "a string, b string")
    assert corpus_checksum(t3, hash_how="portable") != corpus_checksum(
        t4, hash_how="portable"
    )


def test_corpus_checksum_order_independent(spark):
    from data_pipelines_examples_spark.reporting import corpus_checksum

    rows = [("a", 1), ("b", 2), ("c", 3)]
    t1 = spark.createDataFrame(rows, "x string, y int")
    t2 = spark.createDataFrame(list(reversed(rows)), "x string, y int").repartition(3)
    for how in ("portable", "xxhash64"):
        assert corpus_checksum(t1, hash_how=how) == corpus_checksum(t2, hash_how=how)


# ---------------------------------------------------------------------------
# recall_at_k: rank-less input with k raises; duplicates don't inflate
# ---------------------------------------------------------------------------

def test_recall_at_k_rankless_with_k_raises(spark):
    from data_pipelines_examples_spark.operators.similarity import recall_at_k

    approx = spark.createDataFrame([(1, 10)], "query_id int, vec_id int")
    exact = spark.createDataFrame([(1, 10)], "query_id int, vec_id int")
    with pytest.raises(ValueError, match="rank"):
        recall_at_k(approx, exact, k=5)
    # rank-less without k works
    row = recall_at_k(approx, exact).collect()[0]
    assert row["recall"] == 1.0


def test_recall_at_k_duplicates_do_not_skew(spark):
    from data_pipelines_examples_spark.operators.similarity import recall_at_k

    # (1,10) duplicated on the exact side: n_exact must be 2, not 3
    exact = spark.createDataFrame(
        [(1, 10), (1, 10), (1, 20)], "query_id int, vec_id int"
    )
    approx = spark.createDataFrame([(1, 10), (1, 10)], "query_id int, vec_id int")
    row = recall_at_k(approx, exact).collect()[0]
    assert row["n_exact"] == 2 and row["n_hit"] == 1
    assert abs(row["recall"] - 0.5) < 1e-12


# ---------------------------------------------------------------------------
# oracle SQL quoting: apostrophes in query text / step names
# ---------------------------------------------------------------------------

def test_bm25_batch_sql_escapes_quotes():
    import duckdb

    from data_pipelines_examples_spark.oracles import bm25_batch_sql

    sql = bm25_batch_sql([(1, "o'brien's query")], table="d", id_col="doc_id")
    con = duckdb.connect()
    con.execute("CREATE TABLE d AS SELECT 1 AS doc_id, 'o''brien''s query text' AS text")
    out = con.execute(sql).fetchall()
    assert out  # parses and scores — the apostrophe did not break the literal


def test_funnel_counts_step_name_with_quote(spark):
    from data_pipelines_examples_spark.operators.funnel import funnel_counts

    rows = [(1, "2024-01-01 00:00:00", "o'clock"), (1, "2024-01-01 01:00:00", "buy")]
    df = spark.createDataFrame(rows, "uid int, ts string, event string").withColumn(
        "ts", F.to_timestamp("ts")
    )
    out = {r["event_type"]: r["n_keys"] for r in funnel_counts(
        df, "uid", "ts", "event", ["o'clock", "buy"]
    ).collect()}
    assert out == {"o'clock": 1, "buy": 1}


def test_funnel_counts_step_name_with_backslash_and_newline(spark):
    """Step names are data, not SQL text: the spliced stack() selectExpr
    broke on a trailing backslash (escaped the closing quote) and
    silently rewrote '\\n' into a newline. Typed literals round-trip
    both verbatim."""
    from data_pipelines_examples_spark.operators.funnel import funnel_counts

    weird = ["a\\", "b\\nlit", "buy"]
    rows = [
        (1, "2024-01-01 00:00:00", weird[0]),
        (1, "2024-01-01 01:00:00", weird[1]),
        (1, "2024-01-01 02:00:00", weird[2]),
    ]
    df = spark.createDataFrame(rows, "uid int, ts string, event string").withColumn(
        "ts", F.to_timestamp("ts")
    )
    out = {r["event_type"]: r["n_keys"] for r in funnel_counts(
        df, "uid", "ts", "event", weird
    ).collect()}
    assert out == {w: 1 for w in weird}


# ---------------------------------------------------------------------------
# simhash_pairs: reorder kept semantics (filter before dedup)
# ---------------------------------------------------------------------------

def test_simhash_pairs_filter_before_dedup_same_answer(spark):
    from data_pipelines_examples_spark.operators.dedup import simhash_pairs

    rows = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "the quick brown fox jumps over the lazy dog again and again!"),
        (3, "completely different text with nothing shared at all here ok"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    pairs = simhash_pairs(df, max_hamming=10).collect()
    ids = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (1, 2) in ids
    assert all(r["hamming"] <= 10 for r in pairs)
    assert len(pairs) == len(ids)  # deduped


# ---------------------------------------------------------------------------
# empty-input robustness (found by the empty-table differential sweep)
# ---------------------------------------------------------------------------


def test_unigram_surprisal_empty_corpus_yields_empty(spark):
    from data_pipelines_examples_spark.operators.text import unigram_surprisal

    empty = spark.createDataFrame([], "doc_id long, text string")
    assert unigram_surprisal(empty).count() == 0


def test_zorder_minmax_empty_input_yields_empty(spark):
    from data_pipelines_examples_spark.operators.zorder import zorder_key

    empty = spark.createDataFrame([], "a long, b long")
    assert zorder_key(empty, ["a", "b"], how="minmax").count() == 0


def test_kmeans_centroids_empty_raises_clear_error(spark):
    import pytest

    from data_pipelines_examples_spark.operators.similarity import (
        kmeans_centroids,
    )

    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="empty training set"):
        kmeans_centroids(empty, k=2)


# ---------------------------------------------------------------------------
# strict-JSON contract (found by the string-injection differential axis:
# default Jackson parses single-quoted pseudo-JSON that json_valid rejects)
# ---------------------------------------------------------------------------


def test_shred_json_strict_nulls_lenient_only_blobs(spark):
    from data_pipelines_examples_spark.operators.json_ops import shred_json

    df = spark.createDataFrame(
        [(1, '{"k": 5}'), (2, "{'k': 99}"), (3, "not json"), (4, None)],
        "id int, props string",
    )
    strict = shred_json(df, "props", {"k": ("$.k", "bigint")}, keep=["id"], strict=True)
    got = {r["id"]: r["k"] for r in strict.collect()}
    assert got == {1: 5, 2: None, 3: None, 4: None}
    # default mode keeps get_json_object's leniency (reference TRY_CAST shape)
    lenient = shred_json(df, "props", {"k": ("$.k", "bigint")}, keep=["id"])
    assert {r["id"]: r["k"] for r in lenient.collect()}[2] == 99


def test_json_to_map_strict_rejects_single_quotes(spark):
    from data_pipelines_examples_spark.operators.json_ops import json_to_map

    df = spark.createDataFrame([(1, "{'k': 9}"), (2, '{"k": 9}')], "id int, props string")
    out = {r["id"]: r["props"] for r in json_to_map(df, "props", strict=True).collect()}
    assert out[1] is None and out[2] == {"k": "9"}


# ---------------------------------------------------------------------------
# packing dedup key: (doc_id, text) — full-row dropDuplicates would keep
# two rows differing only in lang and violate the unique-id contract
# ---------------------------------------------------------------------------


def test_pack_entries_dedup_on_id_text_only(spark, tmp_path):
    docs = spark.createDataFrame(
        [(1, "a b c", "en"), (1, "a b c", "de"), (2, "d e", "en")],
        "doc_id long, text string, lang string",
    )
    deduped = docs.select("doc_id", "text").dropDuplicates()
    from data_pipelines_examples_spark.operators.packing import pack_offsets

    m = pack_offsets(deduped, budget=4, shards=2)
    # every doc appears once per sequence it touches; doc 1 not doubled
    assert m.filter("doc_id = 1").count() == m.filter("doc_id = 1").select("seq_id").distinct().count()
    assert deduped.count() == 2


def test_shred_json_strict_nested_path(spark):
    from data_pipelines_examples_spark.operators.json_ops import shred_json

    df = spark.createDataFrame(
        [(1, '{"a": {"b": 3}}'), (2, "{'a': {'b': 4}}")], "id int, props string"
    )
    out = shred_json(df, "props", {"b": ("$.a.b", "bigint")}, keep=["id"], strict=True)
    got = {r["id"]: r["b"] for r in out.collect()}
    assert got == {1: 3, 2: None}
