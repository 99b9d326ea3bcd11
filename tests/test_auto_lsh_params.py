"""Occupancy-scaled LSH parameters (r11, verdict item 3).

The r10 ladder proved fixed LSH parameters are not scale-invariant
(candidate pairs ~ n²/2^P); these tests pin the auto derivations that
make occupancy-scaled parameters the default API path while explicit
values stay available for oracle replication.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipelines_examples_spark.operators.dedup import (
    derive_bands,
    minhash_lsh_pairs,
)
from data_pipelines_examples_spark.operators.similarity import (
    LSH_TARGET_OCCUPANCY,
    auto_plane_tables,
    derive_n_planes,
    embedding_dedup_pairs_lsh,
    embedding_dedup_pairs,
)


def test_derive_n_planes_matches_ladder_cells():
    # the manual bench_lsh_ladder cells: ~2k vectors → P=6, ~20k → 9,
    # ~200k → 13 (expected occupancy n/2^P held in the 24–39 band)
    assert derive_n_planes(2_000) == 6
    assert derive_n_planes(20_000) == 9
    assert derive_n_planes(200_000) == 13
    # another decade keeps scaling by ~log2(10) ≈ 3.3 planes
    assert derive_n_planes(2_000_000) == 16
    # degenerate corpora never derive a zero/negative plane count
    assert derive_n_planes(1) == 1
    assert derive_n_planes(LSH_TARGET_OCCUPANCY) == 1


def test_derive_n_planes_holds_occupancy_band():
    for n in (2_000, 20_000, 200_000, 2_000_000):
        p = derive_n_planes(n)
        occ = n / (1 << p)
        assert 16 <= occ <= 64, (n, p, occ)


def test_derive_bands_reference_parametrization():
    # num_hashes=32, target 0.5 → the reference's b=8 (s* ≈ 0.59)
    assert derive_bands(32, 0.5) == 8
    # exact threshold hit: b=16, r=4 → s* = (1/16)^(1/4) = 0.5
    assert derive_bands(64, 0.5) == 16
    # aggressive target → more bands (lower threshold)
    assert derive_bands(32, 0.25) == 16
    # result always divides num_hashes (bands split the signature evenly)
    for nh in (16, 32, 48, 64):
        for t in (0.3, 0.5, 0.7):
            assert nh % derive_bands(nh, t) == 0


def test_auto_plane_tables_derives_from_corpus(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    n = emb.count()
    tables = auto_plane_tables(emb)
    assert len(tables) == 8
    assert len(tables[0]) == derive_n_planes(n)
    assert len(tables[0][0]) == 64  # corpus embedding dim


def test_embedding_dedup_auto_is_subset_of_exact(spark):
    """Auto-parameter LSH keeps the zero-false-positive contract: every
    emitted pair must appear in the exact all-pairs baseline."""
    emb = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
        .limit(300)
    )
    lsh = embedding_dedup_pairs_lsh(emb, "auto", threshold=0.4)
    exact = embedding_dedup_pairs(emb, threshold=0.4)
    lsh_pairs = {(r["id_a"], r["id_b"]) for r in lsh.collect()}
    exact_pairs = {(r["id_a"], r["id_b"]) for r in exact.collect()}
    assert lsh_pairs <= exact_pairs
    spark.catalog.clearCache()


def test_minhash_auto_bands_matches_explicit_default(spark):
    """bands='auto' at the default target resolves to the reference b=8 —
    byte-identical output to the explicit parametrization."""
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .limit(200)
    )
    auto = minhash_lsh_pairs(docs, num_hashes=32, shingle_n=3)
    explicit = minhash_lsh_pairs(docs, num_hashes=32, bands=8, shingle_n=3)
    assert sorted(map(tuple, auto.collect())) == sorted(map(tuple, explicit.collect()))
    spark.catalog.clearCache()


def test_auto_plane_tables_rejects_mixed_and_degenerate_dims(spark):
    """r13 ADVICE: the one-job dimension probe must raise on mixed
    vector dimensions (silently folded short vectors before), on
    all-null, and on all-empty corpora."""
    import pytest

    mixed = spark.createDataFrame(
        [(1, [0.1] * 4), (2, [0.2] * 3)], "vec_id int, embedding array<double>"
    )
    with pytest.raises(ValueError, match="mixed"):
        auto_plane_tables(mixed)

    allnull = spark.createDataFrame(
        [(1, None), (2, None)], "vec_id int, embedding array<double>"
    )
    with pytest.raises(ValueError, match="null"):
        auto_plane_tables(allnull)

    empty_vecs = spark.createDataFrame(
        [(1, []), (2, [])], "vec_id int, embedding array<double>"
    )
    with pytest.raises(ValueError, match="empty"):
        auto_plane_tables(empty_vecs)
