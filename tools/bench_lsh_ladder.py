"""Measure the embedding-dedup LSH ENGINE across replica rungs at constant
bucket occupancy — the 100 TB operating discipline for q42's operator.

Why this exists (r10 verdict item 4): q42's catalog entry bakes FIXED plane
tables (8 tables x 6 planes) into its oracle, which is correct for a hash
gate but not scale-invariant as a benchmark: expected bucket occupancy is
n / 2^P, so at a 100x corpus with P frozen at 6 the per-bucket candidate
blowup is quadratic (sum c*(c-1)/2 over buckets ~ n^2 / 2^P) — a property
of the PARAMETERS, not the plan. Production LSH dedup scales planes with
log2(corpus) to hold occupancy (and per-pair verify work) constant; this
script measures exactly that: P = 6 at 1x, 9 at 10x, 13 at 100x keeps
expected occupancy in the 24-39 band across three decades.

Usage: python tools/bench_lsh_ladder.py SF_DIR N_PLANES [LABEL]
Prints one JSON line: wall (min-of-2), rows out, candidate-pair audit for
the chosen P (exact sum over bucket occupancies — computed BEFORE the
timed run so the audit job never pollutes the measurement's cache state).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1]
    planes_arg = sys.argv[2]  # an int, or "auto" (r11: the default API path)
    label = sys.argv[3] if len(sys.argv) > 3 else os.path.basename(sf_dir.rstrip("/"))

    from pyspark.sql import functions as F

    from data_pipelines_examples_spark.operators.similarity import (
        derive_n_planes,
        embedding_dedup_pairs_lsh,
        hyperplane_buckets_arrow,
    )
    from data_pipelines_examples_spark.oracles import gauss_plane_tables
    from data_pipelines_examples_spark.queries_ext2 import _EMB_DIM
    from data_pipelines_examples_spark.session import get_session

    spark = get_session("bench-lsh-ladder")

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    n_vec = emb.count()  # also warms the parquet footer / JVM
    # "auto" = the occupancy-scaled derivation the operator itself uses by
    # default; an explicit int replicates a manual cell. Same plane seed
    # either way, so auto-vs-manual cells with equal P are identical runs.
    n_planes = derive_n_planes(n_vec) if planes_arg == "auto" else int(planes_arg)
    planes = gauss_plane_tables(n_tables=8, n_planes=n_planes, dim=_EMB_DIM, seed=7)

    # Candidate-pair audit: exact sum of c*(c-1)/2 over (table, bucket)
    # occupancies for this P — the work the verify stage would face.
    bucketer = hyperplane_buckets_arrow(planes)
    occ = (
        emb.select(F.posexplode(bucketer(F.col("embedding"))).alias("t", "bkt"))
        .groupBy("t", "bkt")
        .count()
    )
    audit = occ.agg(
        F.sum(F.col("count") * (F.col("count") - 1) / 2).alias("pairs"),
        F.max("count").alias("max_bucket"),
        F.count("*").alias("n_buckets"),
    ).first()

    def consume(df) -> int:
        row = df.agg(
            F.count("*").alias("n"),
            F.sum(F.xxhash64(F.struct(*df.columns))).alias("h"),
        ).first()
        return row["n"]

    walls, rows = [], 0
    for _ in range(2):
        spark.catalog.clearCache()
        t0 = time.time()
        rows = consume(embedding_dedup_pairs_lsh(emb, planes, threshold=0.4))
        walls.append(round(time.time() - t0, 3))
    print(
        json.dumps(
            {
                "label": label,
                "n_vectors": n_vec,
                "n_planes": n_planes,
                "planes_arg": planes_arg,
                "expected_occupancy": round(n_vec / (2**n_planes), 1),
                "candidate_pairs": int(audit["pairs"]),
                "max_bucket": int(audit["max_bucket"]),
                "wall_sec": min(walls),
                "rows_out": rows,
            }
        )
    )


if __name__ == "__main__":
    main()
