"""Round-5 operators: TF-IDF / BM25 ranking, per-group caps,
leakage-free splits, semantic dedup, length-bucketed batches."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from tests.conftest import assert_df_equal


def _docs(spark):
    rows = [
        (1, "apple banana apple cherry"),
        (2, "banana banana banana"),
        (3, "apple cherry durian durian durian durian"),
        (4, "elderberry"),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


# ---------------------------------------------------------------- TF-IDF

def test_tfidf_analytic_values(spark):
    from data_pipelines_examples_spark.operators.ranking import tfidf_top_terms

    out = tfidf_top_terms(_docs(spark), k=2).collect()
    by_doc = {}
    for r in by_doc_rows(out):
        by_doc.setdefault(r["doc_id"], []).append(r)

    # doc 2: only 'banana' (tf=3, df=2 of N=4) → rank 1, no rank 2
    d2 = by_doc[2]
    assert len(d2) == 1 and d2[0]["term"] == "banana"
    expected = 3 * (math.log((4 + 1) / (2 + 1)) + 1)
    assert abs(d2[0]["score"] - round(expected, 6)) < 1e-9

    # doc 3: durian tf=4 df=1 dominates apple/cherry (tf=1)
    d3 = by_doc[3]
    assert d3[0]["term"] == "durian" and d3[0]["rank"] == 1
    # tie between apple (df=2) and cherry (df=2)? cherry df=2, apple df=2,
    # same tf=1 → equal score → tie broken by term text: apple first
    assert d3[1]["term"] == "apple" and d3[1]["rank"] == 2


def by_doc_rows(rows):
    return [r.asDict() for r in rows]


def test_tfidf_rank_is_dense_per_doc(spark):
    from data_pipelines_examples_spark.operators.ranking import tfidf_top_terms

    out = tfidf_top_terms(_docs(spark), k=3)
    ranks = (
        out.groupBy("doc_id")
        .agg(F.collect_list("rank").alias("rs"))
        .collect()
    )
    for r in ranks:
        assert sorted(r["rs"]) == list(range(1, len(r["rs"]) + 1))


# ----------------------------------------------------------------- BM25

def test_bm25_prefers_matching_docs(spark):
    from data_pipelines_examples_spark.operators.ranking import bm25_topk

    out = bm25_topk(_docs(spark), ["durian"], k=10).collect()
    # only doc 3 contains 'durian'
    assert [r["doc_id"] for r in out] == [3]
    assert out[0]["rank"] == 1

    out2 = bm25_topk(_docs(spark), ["apple", "banana"], k=10).collect()
    ids = [r["doc_id"] for r in out2]
    assert set(ids) == {1, 2, 3}
    # doc 1 matches both terms → highest score
    assert ids[0] == 1


def test_bm25_analytic_single_term(spark):
    from data_pipelines_examples_spark.operators.ranking import bm25_topk

    out = bm25_topk(_docs(spark), ["elderberry"], k=1).collect()
    assert len(out) == 1 and out[0]["doc_id"] == 4
    # N=4, df=1, tf=1, dl=1, avgdl=(4+3+6+1)/4=3.5
    idf = math.log(1 + (4 - 1 + 0.5) / (1 + 0.5))
    tf_part = (1 * 2.2) / (1 + 1.2 * (0.25 + (0.75 * 1) / 3.5))
    assert abs(out[0]["score"] - round(idf * tf_part, 6)) < 1e-9


def test_bm25_empty_terms_raises(spark):
    from data_pipelines_examples_spark.operators.ranking import bm25_topk

    with pytest.raises(ValueError):
        bm25_topk(_docs(spark), [])


# ---------------------------------------------------------- cap_per_group

def _grouped(spark, n=200, groups=("a", "b", "hot")):
    rows = [(i, groups[min(i % 10, 2)]) for i in range(n)]
    # group 'hot' gets 8/10 of rows — the skew case
    return spark.createDataFrame(rows, "id bigint, g string")


def test_cap_matches_single_window_reference(spark):
    from data_pipelines_examples_spark.functions.hashing import hash64
    from data_pipelines_examples_spark.operators.sampling import cap_per_group

    df = _grouped(spark)
    out = cap_per_group(df, "g", "id", cap=7, seed=2, salt_n=4)

    hashed = df.withColumn("__hk", hash64(F.col("id"), seed=2, how="xxhash64"))
    w = Window.partitionBy("g").orderBy("__hk", "id")
    ref = (
        hashed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 7)
        .select("id", "g")
    )
    assert_df_equal(out, ref)


def test_cap_keeps_small_groups_whole(spark):
    from data_pipelines_examples_spark.operators.sampling import cap_per_group

    df = _grouped(spark, n=50)
    out = cap_per_group(df, "g", "id", cap=1000)
    assert out.count() == 50


def test_cap_deterministic_under_repartition(spark):
    from data_pipelines_examples_spark.operators.sampling import cap_per_group

    df = _grouped(spark)
    a = set(r["id"] for r in cap_per_group(df, "g", "id", cap=5, seed=9).collect())
    b = set(
        r["id"]
        for r in cap_per_group(df.repartition(13), "g", "id", cap=5, seed=9).collect()
    )
    assert a == b and len(a) == 15


# ------------------------------------------------------ semantic dedup

def _emb(spark):
    import random

    rng = random.Random(0)
    rows = []
    for i in range(40):
        base = [rng.gauss(0, 1) for _ in range(8)]
        rows.append((2 * i, [float(x) for x in base]))
        # a noisy near-duplicate of every even id
        rows.append(
            (2 * i + 1, [float(x + rng.gauss(0, 0.01)) for x in base])
        )
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")


def test_semantic_dedup_one_centroid_equals_all_pairs(spark):
    from data_pipelines_examples_spark.operators.similarity import (
        embedding_dedup_pairs,
        semantic_dedup_pairs,
    )

    emb = _emb(spark)
    allp = embedding_dedup_pairs(emb, threshold=0.9)
    one = semantic_dedup_pairs(emb, [[0.0] * 8], threshold=0.9).drop("cluster")
    assert_df_equal(one, allp)


def test_semantic_dedup_subset_of_all_pairs_with_exact_cosines(spark):
    from data_pipelines_examples_spark.operators.similarity import (
        embedding_dedup_pairs,
        kmeans_centroids,
        semantic_dedup_pairs,
    )

    emb = _emb(spark)
    cents = kmeans_centroids(emb, k=4, seed=7)
    got = semantic_dedup_pairs(emb, cents, threshold=0.9)
    exact = {
        (r["id_a"], r["id_b"]): r["cosine_sim"]
        for r in embedding_dedup_pairs(emb, threshold=0.9).collect()
    }
    rows = got.collect()
    assert rows, "trained centroids should keep near-twins co-clustered"
    for r in rows:
        assert (r["id_a"], r["id_b"]) in exact
        assert abs(r["cosine_sim"] - exact[(r["id_a"], r["id_b"])]) < 1e-12
    # near-twins (2i, 2i+1) are ~identical vectors → same cluster → found
    found = {(r["id_a"], r["id_b"]) for r in rows}
    twin_recall = sum((2 * i, 2 * i + 1) in found for i in range(40)) / 40
    assert twin_recall > 0.9


# ---------------------------------------------------- leakage-free split

def test_leakage_free_split_never_splits_components(spark):
    from data_pipelines_examples_spark.curation import leakage_free_split

    docs = spark.createDataFrame([(i,) for i in range(100)], "doc_id bigint")
    # chain 0-1-2 plus pair (10, 11): components {0,1,2}, {10,11}
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (10, 11)], "id_a bigint, id_b bigint"
    )
    out = leakage_free_split(docs, pairs, val_pct=50, seed=1)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert len(rows) == 100
    assert rows[0]["split"] == rows[1]["split"] == rows[2]["split"]
    assert rows[0]["root"] == rows[1]["root"] == rows[2]["root"] == 0
    assert rows[10]["split"] == rows[11]["split"]
    assert rows[10]["root"] == 10
    # singletons are their own root
    assert rows[50]["root"] == 50
    # both sides populated at 50%
    splits = {r["split"] for r in rows.values()}
    assert splits == {"train", "val"}


def test_leakage_free_split_deterministic(spark):
    from data_pipelines_examples_spark.curation import leakage_free_split

    docs = spark.createDataFrame([(i,) for i in range(50)], "doc_id bigint")
    pairs = spark.createDataFrame([(3, 4)], "id_a bigint, id_b bigint")
    a = sorted(map(tuple, leakage_free_split(docs, pairs, seed=2).collect()))
    b = sorted(
        map(tuple, leakage_free_split(docs.repartition(7), pairs, seed=2).collect())
    )
    assert a == b


# ----------------------------------------------- length-bucketed batches

def test_length_bucketed_batches_shape(spark):
    from data_pipelines_examples_spark.operators.packing import (
        length_bucketed_batches,
    )

    rows = [(i, 5 + (i * 37) % 100) for i in range(300)]
    df = spark.createDataFrame(rows, "id bigint, n bigint")
    out = length_bucketed_batches(
        df, id_col="id", len_col="n", bucket_width=16, batch_size=4, shards=4
    )
    pdf = out.toPandas()
    assert len(pdf) == 300
    # bucket is the length bucket
    assert (pdf["bucket"] == pdf["n"] // 16).all()
    assert (pdf["shard"] == pdf["id"] % 4).all()
    assert (pdf["pos"] < 4).all()
    # within each (bucket, shard): batch sizes are 4 except at most one tail
    g = pdf.groupby(["bucket", "shard", "batch_id"]).size()
    for (bk, sh), sizes in g.groupby(level=[0, 1]):
        assert (sizes[:-1] == 4).all()
        assert 1 <= sizes.iloc[-1] <= 4
        # batch ids are contiguous from 0
        ids = sorted(sizes.index.get_level_values("batch_id"))
        assert ids == list(range(len(ids)))


def test_length_bucketed_batches_deterministic(spark):
    from data_pipelines_examples_spark.operators.packing import (
        length_bucketed_batches,
    )

    rows = [(i, (i * 13) % 64) for i in range(200)]
    df = spark.createDataFrame(rows, "id bigint, n bigint")
    kw = dict(id_col="id", len_col="n", bucket_width=8, batch_size=4, seed=5)
    a = sorted(map(tuple, length_bucketed_batches(df, **kw).collect()))
    b = sorted(map(tuple, length_bucketed_batches(df.repartition(11), **kw).collect()))
    assert a == b


# -------------------------------------------------------- heavy hitters

def test_heavy_hitters_sketch_equals_exact(spark):
    from data_pipelines_examples_spark.operators.profiling import (
        heavy_hitters,
        heavy_hitters_sketch,
    )

    # zipf-ish skew: key i repeated 200//(i+1) times
    rows = [(f"k{i}",) for i in range(50) for _ in range(200 // (i + 1))]
    df = spark.createDataFrame(rows, "k string").repartition(8)
    exact = heavy_hitters(df, "k", k=20)
    sketch = heavy_hitters_sketch(df, "k", k=20, capacity=40)
    assert_df_equal(sketch, exact)
    assert exact.count() > 0


def test_heavy_hitters_exact_threshold(spark):
    from data_pipelines_examples_spark.operators.profiling import heavy_hitters

    rows = [("hot",)] * 60 + [(f"c{i}",) for i in range(40)]
    df = spark.createDataFrame(rows, "k string")
    out = heavy_hitters(df, "k", k=10).collect()  # threshold: >10 of 100
    assert [r["k"] for r in out] == ["hot"]
    assert out[0]["cnt"] == 60 and abs(out[0]["frac"] - 0.6) < 1e-12


# ------------------------------------------------------ bigram surprisal

def test_bigram_surprisal_analytic(spark):
    """Tiny corpus with hand-computable bigram stats."""
    import math

    from data_pipelines_examples_spark.operators.text import bigram_surprisal

    rows = [(1, "a b a b"), (2, "a b"), (3, "x")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r["doc_id"]: r for r in bigram_surprisal(df).collect()}

    # bigrams: doc1: (a,b),(b,a),(a,b); doc2: (a,b) → c2[(a,b)]=3,
    # c2[(b,a)]=1; c1[a]=3, c1[b]=1; vocab (cur values) = {a, b} → V=2
    assert set(out) == {1, 2}  # doc 3 has no bigrams
    s_ab = -math.log2((3 + 1) / (3 + 2))
    s_ba = -math.log2((1 + 1) / (1 + 2))
    assert out[2]["n_bigrams"] == 1
    assert abs(out[2]["mean_surprisal"] - s_ab) < 1e-9
    assert out[1]["n_bigrams"] == 3
    assert abs(out[1]["mean_surprisal"] - (2 * s_ab + s_ba) / 3) < 1e-9


def test_bm25_batch_matches_single_query(spark):
    """Each query's batch result must equal running bm25_topk alone with
    that query's terms."""
    from conftest import SF_SMOKE

    from data_pipelines_examples_spark.operators.ranking import (
        bm25_topk,
        bm25_topk_batch,
    )

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    queries = spark.createDataFrame(
        [(1, "hash merge table"), (2, "window scan")],
        "query_id int, query_text string",
    )
    batch = bm25_topk_batch(docs, queries, k=5)
    for qid, terms in [(1, ["hash", "merge", "table"]), (2, ["window", "scan"])]:
        single = {
            (r["doc_id"], r["score"], r["rank"])
            for r in bm25_topk(docs, terms, k=5).collect()
        }
        got = {
            (r["doc_id"], r["score"], r["rank"])
            for r in batch.filter(F.col("query_id") == qid).collect()
        }
        assert got == single, qid


def test_mine_hard_negatives_excludes_positives(spark):
    from data_pipelines_examples_spark.operators.ranking import mine_hard_negatives

    candidates = spark.createDataFrame(
        [(1, 10, 0.9, 1), (1, 11, 0.8, 2), (1, 12, 0.7, 3), (1, 13, 0.6, 4),
         (2, 20, 0.5, 1), (2, 21, 0.4, 2)],
        "query_id int, doc_id int, score double, rank int",
    )
    positives = spark.createDataFrame([(1, 10), (2, 21)], "query_id int, doc_id int")
    out = mine_hard_negatives(candidates, positives, k=2)
    got = {(r["query_id"], r["doc_id"], r["neg_rank"]) for r in out.collect()}
    # positives gone, ranks recomputed contiguously
    assert got == {(1, 11, 1), (1, 12, 2), (2, 20, 1)}


def test_inverted_index_postings(spark):
    from data_pipelines_examples_spark.operators.ranking import build_inverted_index

    docs = spark.createDataFrame(
        [(1, "red blue red"), (2, "blue green"), (3, "red")],
        "doc_id int, text string",
    )
    idx = {r["term"]: r for r in build_inverted_index(docs).collect()}
    assert idx["red"]["df"] == 2
    assert [(p["doc"], p["tf"]) for p in idx["red"]["postings"]] == [(1, 2), (3, 1)]
    assert [(p["doc"], p["tf"]) for p in idx["blue"]["postings"]] == [(1, 1), (2, 1)]
    assert idx["green"]["df"] == 1
    # min_df prunes hapax terms
    pruned = {r["term"] for r in build_inverted_index(docs, min_df=2).collect()}
    assert pruned == {"red", "blue"}
