"""Continuous crawl ingestion with incremental near-dup dedup.

The streaming twin of ``operators.dedup.dedup_against_corpus``: new
documents arrive as a stream; each micro-batch is deduped WITHIN itself
(canonical-per-cluster) and AGAINST everything previously ingested, then
survivors append to the corpus and their LSH band buckets append to a
persistent band-table artifact — exactly the "materialize-once band
table" contract that operator's docstring prescribes for the 100 TB
incremental path. Old-corpus signatures are NEVER recomputed: each batch
joins the stored (band, bh) rows only.

Exactly-once on replay: Structured Streaming re-runs a micro-batch after
failure, so both sinks partition by ``__batch_id`` and write with
dynamic partition OVERWRITE — replaying batch N rewrites partition N
instead of duplicating it (idempotency pinned by test).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import (
    _band_buckets,
    dedup_keep_canonical,
    minhash_lsh_pairs,
    minhash_signatures,
)
from ..sources.writers import _path_exists


def ingest_batch(
    spark: SparkSession,
    batch: DataFrame,
    batch_id: int,
    out_path: str,
    bands_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    hash_how: str = "xxhash64",
) -> None:
    """One micro-batch of the ingest-dedup pipeline (public so replay
    semantics are directly testable; the foreachBatch closure below is a
    thin wrapper).

    Steps: (1) within-batch near-dup clusters → keep canonical ids;
    (2) anti-join the survivors' band buckets against the PERSISTED band
    table (ids only cross the join); (3) append survivors to the corpus
    and their buckets to the band table, both into partition
    ``__batch_id = batch_id`` with dynamic overwrite so a replayed batch
    rewrites instead of duplicating.

    TERMINAL pipeline (everything is consumed by the two writes before
    return), so the internal persists armed by minhash_lsh_pairs /
    dedup_keep_canonical are scope-drained on exit — without this, a
    long-running stream leaks one set of cached frames PER MICRO-BATCH
    (the r7-verdict drain-audit's one real gap).

    ``bands`` is deliberately a FIXED int (no "auto"): every batch's
    band buckets must be comparable with the PERSISTED band table at
    ``bands_path``, whose band count was baked in by the first batch —
    a corpus-derived band count would drift as the stream grows and
    silently stop matching the artifact. Re-band the corpus offline to
    change it (same contract as ``dedup_against_corpus``)."""
    from ..cache import internal_persist_scope

    with internal_persist_scope():
        _ingest_batch_inner(
            spark, batch, batch_id, out_path, bands_path,
            id_col, text_col, num_hashes, bands, shingle_n, hash_how,
        )


def _ingest_batch_inner(
    spark: SparkSession,
    batch: DataFrame,
    batch_id: int,
    out_path: str,
    bands_path: str,
    id_col: str,
    text_col: str,
    num_hashes: int,
    bands: int,
    shingle_n: int,
    hash_how: str,
) -> None:
    batch = batch.dropDuplicates([id_col])
    pairs = minhash_lsh_pairs(
        batch, id_col, text_col, num_hashes, bands, shingle_n, hash_how
    )
    batch_dd = dedup_keep_canonical(batch, pairs, id_col)

    nb = _band_buckets(
        minhash_signatures(
            batch_dd, id_col, text_col, num_hashes, shingle_n, hash_how
        ),
        id_col,
        num_hashes,
        bands,
        hash_how,
    )
    if _path_exists(spark, bands_path):
        existing = spark.read.parquet(bands_path).select("band", "bh").distinct()
        kill = (
            nb.join(existing, ["band", "bh"], "left_semi")
            .select(id_col)
            .distinct()
        )
        survivors = batch_dd.join(kill, id_col, "left_anti")
    else:
        survivors = batch_dd

    out = survivors.withColumn("__batch_id", F.lit(batch_id))
    out.write.mode("overwrite").partitionBy("__batch_id").option(
        "partitionOverwriteMode", "dynamic"
    ).parquet(out_path)

    surv_bands = (
        nb.join(survivors.select(id_col), id_col, "left_semi")
        .select(id_col, "band", "bh")
        .withColumn("__batch_id", F.lit(batch_id))
    )
    surv_bands.write.mode("overwrite").partitionBy("__batch_id").option(
        "partitionOverwriteMode", "dynamic"
    ).parquet(bands_path)


def stream_ingest_dedup(
    stream: DataFrame,
    out_path: str,
    bands_path: str,
    checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    hash_how: str = "xxhash64",
):
    """Wire ``ingest_batch`` behind foreachBatch. Returns the started
    StreamingQuery; drive with ``processAllAvailable()`` (no stateful
    timers here, so the drain is livelock-safe)."""

    def _process(batch: DataFrame, batch_id: int) -> None:
        ingest_batch(
            batch.sparkSession,
            batch,
            batch_id,
            out_path,
            bands_path,
            id_col=id_col,
            text_col=text_col,
            num_hashes=num_hashes,
            bands=bands,
            shingle_n=shingle_n,
            hash_how=hash_how,
        )

    return (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
