"""Document chunking and sequence packing for training-data pipelines
(BASELINE.json north star: LLM-data operators beyond the reference's
surface — the reference has no pretraining-prep stage at all; its closest
shape is the scatter/gather batching in
notebooks/databricks/python/servicenow_extract.py's table loop, which is
driver-side orchestration, not data-plane packing).

Three operators, all shard-parallel and shuffle-light:

- ``chunk_documents``: split each document into fixed-token windows with
  optional overlap — the context-window preprocessing step. Pure
  per-row array expressions + one explode; zero shuffles, so chunking
  100 TB costs one scan.
- ``pack_offsets``: "concat-and-chunk" packing — the standard LLM
  pretraining layout where the corpus is concatenated in a deterministic
  order and cut into exact ``budget``-token sequences, documents
  straddling boundaries. Computes each document's (sequence, offset,
  length) assignments analytically with one window cumsum per shard and
  an explode over straddled sequences — no stateful loop, fully
  cross-engine auditable (the DuckDB oracle replicates it exactly).
- ``pack_greedy``: no-split bin packing (each document wholly inside one
  sequence; a new sequence opens when the budget would overflow) via
  ``applyInPandas`` per shard — the variant used when documents must not
  be cut (SFT examples). Sequential state per shard, parallel across
  shards; shard count bounds the serial work.

Tokenization matches ``operators/text.py``: whitespace split of
lower(trim(text)), so token budgets agree with ``token_count``.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
)

def _toks(text_col: str) -> F.Column:
    return F.split(F.lower(F.trim(F.col(text_col))), r"\s+")

def chunk_documents(
    df: DataFrame,
    max_tokens: int,
    overlap: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split each document into windows of ``max_tokens`` whitespace
    tokens, consecutive windows sharing ``overlap`` tokens. Windows start
    at multiples of ``stride = max_tokens - overlap``; the last window
    starts at the smallest multiple that still reaches the document's end
    (``n_chunks = ceil((n - overlap) / stride)``, min 1), so every token
    is covered and no fully-redundant trailing window is emitted.

    Per-row ``sequence``/``transform`` + one ``explode`` — narrow, no
    shuffle; Catalyst fuses the whole thing into the scan projection.
    Output: (id, chunk_id, chunk_text, n_chunk_tokens).
    """
    if overlap >= max_tokens:
        raise ValueError(f"overlap={overlap} must be < max_tokens={max_tokens}")
    stride = max_tokens - overlap
    toks = _toks(text_col)
    n = F.size(toks)
    n_chunks = F.greatest(F.ceil((n - F.lit(overlap)) / F.lit(stride)), F.lit(1))
    chunked = df.select(
        F.col(id_col),
        toks.alias("_toks"),
        F.explode(F.sequence(F.lit(0), (n_chunks - 1).cast("int"))).alias("chunk_id"),
    )
    piece = F.slice(F.col("_toks"), F.col("chunk_id") * stride + 1, max_tokens)
    return chunked.select(
        id_col,
        "chunk_id",
        F.array_join(piece, " ").alias("chunk_text"),
        F.size(piece).alias("n_chunk_tokens"),
    )

def pack_offsets(
    df: DataFrame,
    budget: int,
    shards: int = 32,
    id_col: str = "doc_id",
    token_count_col: str | None = None,
    text_col: str = "text",
) -> DataFrame:
    """Concat-and-chunk sequence packing: within each shard
    (``id % shards``), documents are concatenated in id order and the
    stream is cut into exact ``budget``-token sequences. CONTRACT:
    ``id_col`` must be unique — the concat order is ``ORDER BY id``, and
    duplicate ids have no deterministic order in any engine, so the
    layout (and every downstream sequence) would be arbitrary; run exact
    dedup first (any real pipeline does). Returns one row
    per (document, sequence) assignment — a document longer than the
    remaining space straddles into the following sequence(s):

      shard, seq_id      which training sequence (per shard)
      doc_id             the document
      offset_in_seq      where the doc's tokens land inside the sequence
      tokens_in_seq      how many of the doc's tokens land there

    Wholly analytic: one window cumsum per shard (a single shuffle on
    ``shard``) + an explode over straddled sequences. No stateful loop,
    so any engine can replicate the layout — deterministic, re-runnable,
    auditable, which is exactly what reproducible pretraining needs.
    At 100 TB the shuffle carries (id, token_count) pairs only — never
    text bodies; the actual token materialization joins back by doc_id.

    ``token_count_col`` lets callers pass a precomputed count; otherwise
    tokens are counted from ``text_col`` with the standard whitespace
    split (zero-width docs still get a (seq, offset, 0) row so the
    corpus manifest stays complete).
    """
    from pyspark.sql.window import Window

    if token_count_col is None:
        counted = df.select(
            F.col(id_col), F.size(_toks(text_col)).cast("long").alias("_n_tok")
        )
    else:
        counted = df.select(
            F.col(id_col), F.col(token_count_col).cast("long").alias("_n_tok")
        )
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    bounds = (
        counted.withColumn("shard", F.pmod(F.col(id_col), F.lit(shards)).cast("int"))
        .withColumn("_end", F.sum("_n_tok").over(w))
        .withColumn("_start", F.col("_end") - F.col("_n_tok"))
    )
    first_seq = F.expr(f"_start DIV {budget}")
    last_seq = F.expr(f"greatest(_end - 1, _start) DIV {budget}")
    exploded = bounds.withColumn(
        "seq_id", F.explode(F.sequence(first_seq, last_seq))
    )
    seq_lo = F.col("seq_id") * budget
    return exploded.select(
        "shard",
        "seq_id",
        id_col,
        F.greatest(F.col("_start") - seq_lo, F.lit(0))
        .cast("long")
        .alias("offset_in_seq"),
        (
            F.least(F.col("_end"), seq_lo + budget)
            - F.greatest(F.col("_start"), seq_lo)
        )
        .cast("long")
        .alias("tokens_in_seq"),
    )

_GREEDY_SCHEMA = StructType(
    [
        StructField("shard", IntegerType()),
        StructField("seq_id", LongType()),
        StructField("doc_id", LongType()),
        StructField("n_tokens", LongType()),
    ]
)

def pack_greedy(
    df: DataFrame,
    budget: int,
    shards: int = 32,
    id_col: str = "doc_id",
    token_count_col: str | None = None,
    text_col: str = "text",
) -> DataFrame:
    """No-split greedy packing: documents (in id order per shard) go
    wholly into the current sequence; when the next doc would overflow
    ``budget`` a new sequence opens. A single doc longer than ``budget``
    gets its own (overflowing) sequence — callers chunk those first with
    ``chunk_documents`` if hard caps matter.

    The per-shard scan is inherently sequential state, so it runs as an
    Arrow-batched ``applyInPandas`` over shards — parallel across shards,
    vectorized inside (one cumsum-style pass in numpy-backed pandas).
    Shuffles only (id, token_count); never text. Returns
    (shard, seq_id, doc_id, n_tokens).
    """
    if token_count_col is None:
        counted = df.select(
            F.col(id_col).cast("long").alias("doc_id"),
            F.size(_toks(text_col)).cast("long").alias("_n_tok"),
        )
    else:
        counted = df.select(
            F.col(id_col).cast("long").alias("doc_id"),
            F.col(token_count_col).cast("long").alias("_n_tok"),
        )
    sharded = counted.withColumn(
        "shard", F.pmod(F.col("doc_id"), F.lit(shards)).cast("int")
    )

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id", kind="mergesort").reset_index(drop=True)
        seq_ids = []
        seq, used = 0, 0
        for n in pdf["_n_tok"]:
            if used > 0 and used + n > budget:
                seq += 1
                used = 0
            seq_ids.append(seq)
            used += int(n)
        return pd.DataFrame(
            {
                "shard": pdf["shard"],
                "seq_id": pd.Series(seq_ids, dtype="int64"),
                "doc_id": pdf["doc_id"],
                "n_tokens": pdf["_n_tok"],
            }
        )

    return sharded.groupBy("shard").applyInPandas(_pack, _GREEDY_SCHEMA)

def materialize_sequences(
    docs: DataFrame,
    manifest: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Turn a ``pack_offsets`` manifest into the actual training
    sequences: one row per (shard, seq_id) with the concatenated token
    text, exactly ``budget`` tokens except each shard's final sequence.

    Each manifest row's slice WITHIN its document is recovered as the
    running sum of that document's earlier pieces (window over the doc,
    ordered by seq_id) — no doc-start bookkeeping needs to survive the
    manifest. Then one join carries each document's token array to its
    pieces (text crosses the wire ONCE), and a groupBy(shard, seq_id)
    assembles pieces in offset order via sorted struct collection.

    Plan: 3 exchanges (manifest re-key by doc, docs join by doc,
    sequence assembly by (shard, seq_id)); only the join shuffles text.
    """
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy(manifest[id_col])
        .orderBy("seq_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    pieces = manifest.withColumn(
        "__doc_off", F.coalesce(F.sum("tokens_in_seq").over(w), F.lit(0))
    )
    toks = docs.select(F.col(id_col), _toks(text_col).alias("__toks"))
    sliced = pieces.join(toks, id_col).select(
        "shard",
        "seq_id",
        "offset_in_seq",
        "tokens_in_seq",
        F.slice(
            F.col("__toks"), F.col("__doc_off") + 1, F.col("tokens_in_seq")
        ).alias("__piece"),
    )
    assembled = (
        sliced.groupBy("shard", "seq_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("offset_in_seq", "__piece"))
            ).alias("__ps")
        )
        .select(
            "shard",
            "seq_id",
            F.array_join(
                F.flatten(F.transform(F.col("__ps"), lambda s: s["__piece"])), " "
            ).alias("seq_text"),
            F.aggregate(
                F.col("__ps"),
                F.lit(0),
                lambda acc, s: acc + F.size(s["__piece"]),
            ).alias("n_tokens"),
        )
    )
    return assembled


def length_bucketed_batches(
    df: DataFrame,
    id_col: str = "doc_id",
    len_col: str = "n_tokens",
    bucket_width: int = 16,
    batch_size: int = 4,
    shards: int = 8,
    seed: int = 3,
    hash_how: str = "xxhash64",
) -> DataFrame:
    """Length-bucketed training-batch assembly: sequences are grouped
    into length buckets (``floor(len / bucket_width)``) so each batch
    pads to its bucket's ceiling instead of the corpus maximum — the
    standard throughput fix for variable-length training (padding waste
    is bounded by bucket_width·batch_size instead of max_len·batch_size).

    Within each (bucket, shard) — shard = id % ``shards`` — rows are
    ordered by a seeded hash (deterministic shuffle, same property as
    ``epoch_shuffle``) and cut into consecutive ``batch_size`` batches:
    ``batch_id = rank // batch_size``, ``pos = rank % batch_size``.

    Returns (id, len, bucket, shard, batch_id, pos). Deterministic and
    engine-independent with ``hash_how='portable'``.

    Scale shape: bucket count is small (max_len / width) so a bare
    per-bucket window would single-reducer each bucket at corpus scale —
    the shard axis is the fix: windows partition on (bucket, shard),
    bounding every window's input to ~1/shards of a bucket, and batches
    are local to a shard (training consumers read shards independently,
    exactly like ``pack_offsets``). Tail batches (fewer than batch_size
    rows) sit at the max batch_id of their (bucket, shard).
    """
    from pyspark.sql import Window

    from ..functions.hashing import hash64

    key = F.col(id_col).cast("string") if hash_how == "portable" else F.col(id_col)
    b = df.select(
        F.col(id_col),
        F.col(len_col).cast("bigint").alias(len_col),
        F.expr(f"CAST(CAST({len_col} AS BIGINT) DIV {bucket_width} AS BIGINT)").alias(
            "bucket"
        ),
        F.pmod(F.col(id_col), F.lit(shards)).cast("int").alias("shard"),
        hash64(key, seed=seed, how=hash_how).alias("__hk"),
    )
    # len_col closes the order: duplicate ids tie on (hash, id), and
    # copies can differ in length yet share a bucket (sf1-density gate —
    # string-injected bootstrap copies), which left batch positions
    # order-ambiguous. Identical (id, len) rows commute.
    w = Window.partitionBy("bucket", "shard").orderBy(
        F.col("__hk"), F.col(id_col), F.col(len_col)
    )
    rn = F.row_number().over(w) - F.lit(1)
    return b.withColumn(
        "batch_id", (rn / F.lit(batch_size)).cast("bigint")
    ).withColumn("pos", F.pmod(rn, F.lit(batch_size)).cast("bigint")).drop("__hk")
