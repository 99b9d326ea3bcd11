"""Query catalog, part 5: pretraining-prep operators — context-window
chunking and concat-and-chunk sequence packing over the documents table.

These are LLM-data operators beyond the reference's surface (its closest
shape is driver-side batching loops, e.g. the scatter/gather table loop
in notebooks/databricks/python/servicenow_extract.py — orchestration,
not data-plane packing). Both are fully analytic (array exprs + window
cumsum + explode), so DuckDB replicates them exactly and the driver's
hash gate applies: the packed-corpus layout is cross-engine auditable,
which is the property a reproducible pretraining mix actually needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.hashing import sql_hash64_seeded
from .operators.packing import chunk_documents, pack_offsets
from .queries import _t, query


@query(
    "q63_chunk_documents",
    r"""
    WITH t AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
      FROM documents
    ),
    c AS (
      SELECT doc_id, toks,
             greatest(CAST(ceil((len(toks) - 8) / CAST(24 AS DOUBLE)) AS BIGINT), 1)
               AS n_chunks
      FROM t
    ),
    e AS (
      SELECT doc_id, toks, unnest(generate_series(0, n_chunks - 1)) AS chunk_id
      FROM c
    )
    SELECT doc_id, chunk_id,
           array_to_string(toks[chunk_id*24+1 : chunk_id*24+32], ' ') AS chunk_text,
           len(toks[chunk_id*24+1 : chunk_id*24+32]) AS n_chunk_tokens
    FROM e
    """,
)
def q63_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking: every document split into 32-token
    windows with 8-token overlap (stride 24). Per-row sequence/transform
    + one explode — narrow, zero shuffles, fuses into the scan; chunking
    100 TB costs one pass. Window starts stop at the last stride multiple
    that reaches the document end, so coverage is total with no
    fully-redundant tail window."""
    d = _t(spark, sf_dir, "documents")
    return chunk_documents(d, max_tokens=32, overlap=8)


@query(
    "q64_pack_offsets",
    r"""
    WITH docs AS (
      -- ONE canonical row per doc_id: packing orders by doc_id, so ANY
      -- duplicate id (even with differing text — an id collision the
      -- sf1-density composed gate manufactures by bootstrapping a row
      -- and then string-injecting one copy) must resolve before the
      -- cumsum or the layout is order-ambiguous. MIN(text) is engine-
      -- independent (both engines compare UTF-8 bytes); a no-op on
      -- unique ids. Mirrored on the Spark side.
      SELECT doc_id, MIN(text) AS text FROM documents GROUP BY doc_id
    ),
    counted AS (
      SELECT doc_id,
             CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS BIGINT) AS n_tok,
             CAST(doc_id % 8 AS INTEGER) AS shard
      FROM docs
    ),
    b AS (
      SELECT shard, doc_id, n_tok,
             CAST(SUM(n_tok) OVER (
               PARTITION BY shard ORDER BY doc_id
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS e
      FROM counted
    ),
    s AS (
      SELECT shard, doc_id, e, e - n_tok AS st,
             unnest(generate_series(
               (e - n_tok) // 256, greatest(e - 1, e - n_tok) // 256)) AS seq_id
      FROM b
    )
    SELECT shard, seq_id, doc_id,
           CAST(greatest(st - seq_id*256, 0) AS BIGINT) AS offset_in_seq,
           CAST(least(e, (seq_id+1)*256) - greatest(st, seq_id*256) AS BIGINT)
             AS tokens_in_seq
    FROM s
    """,
)
def q64_pack_offsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing manifest: per shard (doc_id % 8)
    the corpus is concatenated in id order and cut into exact 256-token
    sequences; one row per (document, sequence) assignment, documents
    straddling sequence boundaries. One window cumsum (single shuffle on
    shard, carrying only id+count — never text) + an explode over
    straddled sequences. Deterministic and engine-independent, so the
    training-data layout is re-derivable and auditable months later."""
    # one canonical row per doc_id (MIN(text), matching the oracle's
    # GROUP BY): (doc_id, text) dedup alone still leaves an id COLLISION
    # ambiguous when two texts share an id, violating pack_offsets'
    # unique-id contract
    d = (
        _t(spark, sf_dir, "documents")
        .groupBy("doc_id")
        .agg(F.min("text").alias("text"))
    )
    return pack_offsets(d, budget=256, shards=8)


@query(
    "q65_epoch_shuffle",
    f"""
    SELECT doc_id,
           {sql_hash64_seeded("CAST(doc_id AS VARCHAR)", 7)} AS shuffle_key
    FROM documents
    """,
)
def q65_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic epoch-shuffle manifest: every document gets a seeded
    portable-hash shuffle key; sorting by the key IS the epoch's global
    shuffled order (writers repartitionByRange + sortWithinPartitions on
    it — no global rank, no single-partition sort). The oracle recomputes
    the same keys in DuckDB, proving the epoch order is engine-independent
    and re-derivable — the auditability a reproducible pretraining run
    needs. xxhash64 is the production default (operators/sampling.py)."""
    from .operators.sampling import epoch_shuffle

    d = _t(spark, sf_dir, "documents").select("doc_id")
    return epoch_shuffle(d, "doc_id", seed=7, hash_how="portable")


@query(
    "q66_quality_floor_filter",
    """
    WITH thr AS (
      SELECT lang, quantile_cont(n_chars, 0.5) AS med
      FROM documents GROUP BY lang
    )
    SELECT d.lang, COUNT(*) AS n_kept,
           CAST(MIN(d.n_chars) AS BIGINT) AS min_chars,
           CAST(MAX(t.med) AS DOUBLE) AS med_chars
    FROM documents d JOIN thr t ON d.lang = t.lang
    WHERE d.n_chars >= t.med
    GROUP BY d.lang ORDER BY d.lang
    """,
)
def q66_quality_floor_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group quality floor: keep each language's top half by length
    (stand-in for any quality score) — the curation step that stops one
    noisy source flooding the mix. Exact percentile here for oracle
    parity (DuckDB quantile_cont, pinned); percentile_approx is the
    documented 100 TB path (operators/sampling.py::filter_by_group_quantile)."""
    from .operators.sampling import filter_by_group_quantile

    d = _t(spark, sf_dir, "documents")
    # return_threshold reuses the operator's own quantile table instead
    # of re-aggregating the source a third time
    kept, thr = filter_by_group_quantile(
        d, "lang", "n_chars", 0.5, how="exact", return_threshold=True
    )
    return (
        kept.join(F.broadcast(thr), "lang")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_kept"),
            F.min("n_chars").cast("bigint").alias("min_chars"),
            F.max("__thr").cast("double").alias("med_chars"),
        )
        .orderBy("lang")
    )


@query(
    "q67_unigram_surprisal",
    r"""
    WITH toks AS (
      SELECT doc_id,
             unnest(string_split_regex(lower(trim(text)), '\s+')) AS t
      FROM documents
    ),
    vocab AS (SELECT t, COUNT(*) AS c FROM toks GROUP BY t),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n, COUNT(*) AS v FROM vocab)
    SELECT doc_id, COUNT(*) AS n_tokens,
           CAST(CAST(AVG(-log2((c + 1.0) / (n + 1.0 * v))) AS DECIMAL(18,6))
                AS DOUBLE) AS mean_surprisal
    FROM toks JOIN vocab USING (t) CROSS JOIN tot
    GROUP BY doc_id
    """,
)
def q67_unigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-unigram mean surprisal per document — the public simplified
    form of the perplexity quality filters run before training (high =
    garbled/unusual, low = boilerplate). Two shuffle-light passes (vocab
    agg with map-side combine; token→vocab join AQE-broadcast when the
    vocab fits). Rounded through DECIMAL(18,6) on BOTH sides: log2 is
    not correctly-rounded identically across engines, and the mean's
    addition order is partition-dependent — 6-decimal rounding absorbs
    those last-ulp effects (q42's cosine pattern)."""
    from .operators.text import unigram_surprisal

    d = _t(spark, sf_dir, "documents")
    out = unigram_surprisal(d)
    return out.select(
        "doc_id",
        "n_tokens",
        F.col("mean_surprisal").cast("decimal(18,6)").cast("double").alias(
            "mean_surprisal"
        ),
    )


@query(
    "q68_materialized_sequences",
    r"""
    WITH docs AS (
      -- one canonical row per doc_id (see q64): id collisions would
      -- make the pack cumsum order-ambiguous
      SELECT doc_id, MIN(text) AS text FROM documents GROUP BY doc_id
    ),
    counted AS (
      SELECT doc_id,
             string_split_regex(lower(trim(text)), '\s+') AS toks,
             CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS BIGINT)
               AS n_tok,
             CAST(doc_id % 8 AS INTEGER) AS shard
      FROM docs
    ),
    b AS (
      SELECT shard, doc_id, toks, n_tok,
             CAST(SUM(n_tok) OVER (
               PARTITION BY shard ORDER BY doc_id
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS e
      FROM counted
    ),
    s AS (
      SELECT shard, doc_id, toks, e, e - n_tok AS st,
             unnest(generate_series(
               (e - n_tok) // 256, greatest(e - 1, e - n_tok) // 256)) AS seq_id
      FROM b
    ),
    pieces AS (
      SELECT shard, seq_id,
             CAST(greatest(st - seq_id*256, 0) AS BIGINT) AS offset_in_seq,
             CAST(greatest(seq_id*256 - st, 0) AS BIGINT) AS doc_off,
             CAST(least(e, (seq_id+1)*256) - greatest(st, seq_id*256) AS BIGINT)
               AS tokens_in_seq,
             toks
      FROM s
    )
    SELECT shard, seq_id,
           array_to_string(
             flatten(array_agg(toks[doc_off+1 : doc_off+tokens_in_seq]
                               ORDER BY offset_in_seq)), ' ') AS seq_text,
           CAST(SUM(tokens_in_seq) AS BIGINT) AS n_tokens
    FROM pieces
    GROUP BY shard, seq_id
    """,
)
def q68_materialized_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end packed TRAINING SEQUENCES (q64's manifest joined back to
    text and assembled): the strongest verification of the packing family
    — the oracle independently rebuilds every sequence's exact token
    string, so manifest arithmetic, doc-side slicing, and offset-ordered
    assembly are all hash-checked together. Text crosses one shuffle."""
    from .operators.packing import materialize_sequences, pack_offsets

    # one canonical row per doc_id (MIN(text)) — same contract as q64
    d = (
        _t(spark, sf_dir, "documents")
        .groupBy("doc_id")
        .agg(F.min("text").alias("text"))
    )
    manifest = pack_offsets(d, budget=256, shards=8)
    out = materialize_sequences(d, manifest)
    return out.select(
        "shard", "seq_id", "seq_text", F.col("n_tokens").cast("bigint").alias("n_tokens")
    )


@query(
    "q69_dedup_against_corpus",
    __import__(
        "data_pipelines_examples_spark.oracles",
        fromlist=["dedup_against_corpus_sql"],
    ).dedup_against_corpus_sql(),
)
def q69_dedup_against_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental cross-corpus dedup, fully oracle-replicated: the
    odd-id half of documents (the 'crawl delta') deduped against the
    even-id half (the 'existing corpus') — cross-side LSH band join
    only, portable hashing so DuckDB rebuilds identical signatures,
    bands, and survivors."""
    from .operators.dedup import dedup_against_corpus

    d = _t(spark, sf_dir, "documents")
    new = d.filter(F.col("doc_id") % 2 == 1)
    existing = d.filter(F.col("doc_id") % 2 == 0)
    kept = dedup_against_corpus(new, existing, hash_how="portable")
    return kept.select("doc_id", "n_chars")


def _zorder_oracle_sql(bits: int = 8) -> str:
    """DuckDB replication of zorder_key(how='minmax', bits=8) over
    (o_custkey, o_totalprice). floor() before the BIGINT cast matches
    Spark's truncating double→long cast (operands are non-negative);
    DuckDB's bare double→BIGINT cast ROUNDS and would diverge. TRY_CAST
    because the cell index can be NaN even with the finite guard (a
    finite span like max_double - (-1e308) overflows to inf, and
    inf/inf = NaN): Spark's non-ANSI long cast yields NULL there, and
    least(NULL, scale) keys the row at the curve top on both sides."""
    scale = (1 << bits) - 1
    interleave = " | ".join(
        f"(((nx >> {b}) & 1) << {2 * b}) | (((ny >> {b}) & 1) << {2 * b + 1})"
        for b in range(bits)
    )
    return f"""
    WITH fin AS (
      -- non-finite prices behave exactly like NULL: out of the bounds,
      -- keyed at the curve top (mirrors zorder_key's guard)
      SELECT o_orderkey, o_custkey,
             CASE WHEN isfinite(o_totalprice) THEN o_totalprice END AS fin_price
      FROM orders
    ),
    bounds AS (
      SELECT MIN(o_custkey) AS lo_x, MAX(o_custkey) AS hi_x,
             MIN(fin_price) AS lo_y, MAX(fin_price) AS hi_y
      FROM fin
    ),
    norm AS (
      SELECT o_orderkey,
             least(TRY_CAST(floor((o_custkey - lo_x) / CAST(hi_x - lo_x AS DOUBLE)
                              * {scale}) AS BIGINT), {scale}) AS nx,
             least(TRY_CAST(floor((fin_price - lo_y) / (hi_y - lo_y)
                              * {scale}) AS BIGINT), {scale}) AS ny
      FROM fin CROSS JOIN bounds
    )
    SELECT o_orderkey, CAST({interleave} AS BIGINT) AS zkey
    FROM norm
    """


@query("q70_zorder_keys", _zorder_oracle_sql())
def q70_zorder_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order curve keys over (customer, price) for every order —
    the clustered-write sort key, hash-pinned cross-engine: minmax
    normalization is one aggregate + IEEE-identical arithmetic, and the
    Morton interleave is exact integer bit math, so DuckDB rebuilds the
    identical curve. (The rank-normalization tier is Spark-only — its
    percent_rank sort has no cheap SQL twin and isn't the scale path.)"""
    from .operators.zorder import zorder_key

    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    keyed = zorder_key(o, ["o_custkey", "o_totalprice"], bits=8, how="minmax")
    return keyed.select("o_orderkey", F.col("__z").alias("zkey"))
