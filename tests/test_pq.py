"""Product quantization: codebook training, encoding invariants,
asymmetric-distance search quality vs exact search."""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F

from data_pipelines_examples_spark.operators.similarity import (
    pq_adc_topk,
    pq_encode,
    pq_train,
)

DIM, M, K = 16, 4, 8


def _clustered(spark, n_clusters=6, per_cluster=30, seed=11):
    rng = random.Random(seed)
    centers = [
        [rng.uniform(-1, 1) for _ in range(DIM)] for _ in range(n_clusters)
    ]
    rows = []
    i = 0
    for cid, c in enumerate(centers):
        for _ in range(per_cluster):
            rows.append(
                (i, cid, [x + rng.gauss(0, 0.05) for x in c])
            )
            i += 1
    return (
        spark.createDataFrame(rows, "vec_id long, cluster int, embedding array<float>"),
        centers,
    )


def test_pq_encode_and_adc_search(spark):
    df, centers = _clustered(spark)
    books = pq_train(df, m=M, k=K, seed=5)
    assert len(books) == M and all(len(b) == K for b in books)
    assert all(len(c) == DIM // M for b in books for c in b)

    enc = pq_encode(df, books).cache()
    codes = enc.select("vec_id", "cluster", "pq_code").collect()
    assert all(0 <= c < K for r in codes for c in r.pq_code)
    assert all(len(r.pq_code) == M for r in codes)
    # the property that matters: reconstructing each vector from its
    # codebook centroids must have FAR lower squared error than random
    # code assignment (the quantizer actually learned the distribution)
    vecs = {r.vec_id: r.embedding for r in df.collect()}
    dsub = DIM // M
    rng = random.Random(3)

    def recon_err(code_of):
        tot = 0.0
        for r in codes:
            v = vecs[r.vec_id]
            for s in range(M):
                c = books[s][code_of(r, s)]
                tot += sum(
                    (float(v[s * dsub + j]) - c[j]) ** 2 for j in range(dsub)
                )
        return tot / len(codes)

    err_pq = recon_err(lambda r, s: r.pq_code[s])
    err_rand = recon_err(lambda r, s: rng.randrange(K))
    assert err_pq < err_rand / 5, (err_pq, err_rand)

    # ADC search: querying a cluster center must return members of that
    # cluster as the nearest codes
    q = [float(x) for x in centers[0]]
    top = pq_adc_topk(enc, q, books, k=10)
    got = top.join(df.select("vec_id", "cluster"), "vec_id").collect()
    assert all(r.cluster == 0 for r in got)
    # distances ascend with rank
    ranked = sorted(got, key=lambda r: r.rank)
    dists = [r.approx_dist for r in ranked]
    assert dists == sorted(dists)
    enc.unpersist()


def test_pq_deterministic_rerun(spark):
    """Same input partitioning + seed -> identical codebooks. (MLlib
    k-means init samples BY PARTITION, so cross-partitioning runs differ
    — pin the codebooks as an artifact for reproducible encodings, like
    the IVF centroids; noted in pq_train's docstring.)"""
    df, _ = _clustered(spark)
    b1 = pq_train(df, m=M, k=K, seed=5)
    b2 = pq_train(df, m=M, k=K, seed=5)
    for s in range(M):
        for c1, c2 in zip(sorted(b1[s]), sorted(b2[s])):
            assert all(math.isclose(a, b, rel_tol=1e-9) for a, b in zip(c1, c2))


def test_ivf_pq_full_probe_equals_adc(spark):
    from data_pipelines_examples_spark.operators.similarity import (
        ivf_pq_index,
        ivf_pq_topk,
        kmeans_centroids,
    )

    df, centers = _clustered(spark)
    coarse = kmeans_centroids(df, k=4, seed=9)
    books = pq_train(df, m=M, k=K, seed=5)
    index = ivf_pq_index(df, coarse, books).cache()
    q = [float(x) for x in centers[2]]

    # full probe == plain ADC over all codes (exactness invariant)
    full = ivf_pq_topk(index, q, coarse, books, n_probe=len(coarse), k=8)
    plain = pq_adc_topk(index, q, books, k=8)
    assert [(r.vec_id, r.rank) for r in full.collect()] == [
        (r.vec_id, r.rank) for r in plain.collect()
    ]

    # n_probe=1 still finds the query's own cluster members
    near = ivf_pq_topk(index, q, coarse, books, n_probe=1, k=8)
    got = near.join(df.select("vec_id", "cluster"), "vec_id").collect()
    assert len(got) == 8 and all(r.cluster == 2 for r in got)
    index.unpersist()
