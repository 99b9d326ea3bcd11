"""Term-weighting / retrieval-ranking operators: TF-IDF and BM25.

LLM-pipeline extension (BASELINE.json north star) — corpus curation and
retrieval both need term statistics: TF-IDF surfaces each document's
characteristic vocabulary (topic tagging, keyword-based filtering), BM25
is the standard lexical retriever for dedup-by-query and eval-set
construction. The reference's closest shape is its word-count /
token-frequency SQL (hive_to_hive_cte.py) — these generalize it with
corpus-level document frequencies.

Scale shape (100 TB):

- Tokenization is a narrow projection that fuses into the scan; the
  explode shuffles (id, token) pairs — never document bodies.
- The vocabulary table (token, df) is corpus-vocabulary-sized (millions
  of rows, not billions) and joins back via AQE auto-broadcast.
- Corpus totals (N, avgdl) are 1-row aggregates cross-joined in —
  broadcast by construction, no ``collect()``.
- BM25 filters the exploded tokens to the query's terms BEFORE any
  shuffle, so the per-doc aggregation sees at most |query| rows per
  document.

Cross-engine determinism: token parity with DuckDB is pinned corpus-wide
(see oracles.py header); scores pass through DECIMAL(18,6) before
ranking so non-correctly-rounded ``ln`` and sum-order effects can't flip
an ordering the oracle disagrees with (q67's pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..cache import persist_internal


def _token_rows(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, token) rows — whitespace tokens of the lowercased text
    (split parity with DuckDB string_split_regex is gate-pinned)."""
    return df.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("__t"),
    )


def tfidf_top_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Top-``k`` characteristic terms per document by smoothed TF-IDF.

    ``score = tf * (ln((N + 1) / (df + 1)) + 1)`` (sklearn's smooth-idf —
    public formula; never zero, never divides by zero). Returns
    (id, term, tf, df, score, rank) with ``rank`` 1..k per document,
    ties broken by term text so the ranking is total and
    engine-independent.

    Plan: one token explode → (id, token) groupBy for tf; vocabulary df
    and the doc count both derive FROM the tf table; tf⋈vocab on token
    (AQE-broadcast); one per-doc window for the top-k. Nothing after the
    explode ever carries text bodies.

    tf feeds three consumers (vocab, doc-count, the scoring join), and
    Spark's exchange reuse does NOT collapse them (measured: 6 corpus
    scans in the final adaptive plan without the persist) — so tf
    persists MEMORY_AND_DISK, the multi-consumer pattern of
    ``ngram_jaccard_pairs``: tokenization runs once, and at corpus
    scale the (id, token, tf) table spills instead of silently
    recomputing. Past single-machine scale, stage tf to parquet once
    and derive everything from the artifact.
    """
    toks = _token_rows(df, id_col, text_col)
    tf = (
        toks.groupBy(id_col, "__t")
        .agg(F.count("*").alias("tf"))
        .transform(persist_internal)
    )
    vocab = tf.groupBy("__t").agg(F.count("*").alias("df"))
    totals = tf.select(id_col).agg(F.countDistinct(id_col).alias("__n"))
    score = (
        F.col("tf")
        * (F.log((F.col("__n") + F.lit(1.0)) / (F.col("df") + F.lit(1.0))) + F.lit(1.0))
    ).cast("decimal(18,6)").cast("double")
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        tf.join(vocab, "__t")
        .crossJoin(F.broadcast(totals))
        .select(
            F.col(id_col),
            F.col("__t").alias("term"),
            "tf",
            "df",
            score.alias("score"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-``k`` documents for a bag-of-terms query under BM25
    (Robertson/Sparck-Jones; the public Okapi formula).

    ``idf(t) = ln(1 + (N - df + 0.5) / (df + 0.5))``,
    ``score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·|d|/avgdl))``.

    Returns (id, score, rank), rank 1..k by score desc then id — a total,
    engine-independent order (score rounds through DECIMAL(18,6) first).

    Plan: doc lengths are a narrow projection (no explode survives — a
    ``size(split(...))`` per row); the exploded token stream is filtered
    to the query's terms BEFORE the tf shuffle, so downstream carries at
    most |query| rows per matching doc; N and avgdl ride one broadcast
    1-row aggregate; df per term is a |query|-row broadcast.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = sorted(set(query_terms))
    # lens feeds the avgdl total AND the scoring join; persisting the
    # narrow (id, len) projection keeps tokenization at one pass per
    # branch instead of re-reading bodies (same measured-no-reuse
    # rationale as tfidf_top_terms).
    lens = df.select(
        F.col(id_col),
        F.size(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("__dl"),
    ).transform(persist_internal)
    totals = lens.agg(
        F.count("*").alias("__n"), F.sum("__dl").alias("__sumdl")
    )
    tf = (
        _token_rows(df, id_col, text_col)
        .filter(F.col("__t").isin(terms))
        .groupBy(id_col, "__t")
        .agg(F.count("*").alias("__tf"))
    )
    dfreq = tf.groupBy("__t").agg(F.count("*").alias("__df"))
    avgdl = F.col("__sumdl") / F.col("__n")
    idf = F.log(
        F.lit(1.0)
        + (F.col("__n") - F.col("__df") + F.lit(0.5)) / (F.col("__df") + F.lit(0.5))
    )
    tf_part = (
        F.col("__tf")
        * F.lit(k1 + 1.0)
        / (F.col("__tf") + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("__dl") / avgdl))
    )
    scored = (
        tf.join(F.broadcast(dfreq), "__t")
        .join(lens, id_col)
        .crossJoin(F.broadcast(totals))
        .groupBy(id_col)
        .agg(
            F.sum(idf * tf_part).cast("decimal(18,6)").cast("double").alias("score")
        )
    )
    # Global top-k WITHOUT a global window (which would single-partition
    # every scored doc): orderBy+limit compiles to TakeOrderedAndProject —
    # per-partition heaps merged on the driver, k rows total — and only
    # those k rows see the row_number window.
    top = scored.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(k)
    w = Window.orderBy(F.col("score").desc(), F.col(id_col).asc())
    return top.withColumn("rank", F.row_number().over(w))


def bm25_topk_batch(
    df: DataFrame,
    queries: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 retrieval for a whole TABLE of queries at once — eval-set and
    hard-negative construction run thousands of queries, and one pass
    per query would rescan the corpus per query. Same Okapi formula and
    determinism discipline as ``bm25_topk`` (DECIMAL(18,6)-rounded
    scores, id tiebreak); returns (query_id, id, score, rank), rank
    1..k per query.

    Plan: the corpus token stream filters to the UNION of all query
    terms via a broadcast semi join BEFORE the tf shuffle (one corpus
    pass for any number of queries); per-term df and corpus totals are
    broadcast-sized; candidate scoring joins tf to the (query, term)
    pairs on the term key; the top-k window partitions per QUERY — no
    global single-reducer, each query's candidates rank independently.
    """
    qterms = (
        queries.select(
            F.col(query_id_col),
            F.explode(
                F.array_distinct(
                    F.split(F.lower(F.trim(F.col(query_text_col))), r"\s+")
                )
            ).alias("__t"),
        )
    )
    lens = df.select(
        F.col(id_col),
        F.size(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("__dl"),
    ).transform(persist_internal)
    totals = lens.agg(F.count("*").alias("__n"), F.sum("__dl").alias("__sumdl"))
    term_set = qterms.select("__t").distinct()
    tf = (
        _token_rows(df, id_col, text_col)
        .join(F.broadcast(term_set), "__t", "left_semi")
        .groupBy(id_col, "__t")
        .agg(F.count("*").alias("__tf"))
    )
    dfreq = tf.groupBy("__t").agg(F.count("*").alias("__df"))
    avgdl = F.col("__sumdl") / F.col("__n")
    idf = F.log(
        F.lit(1.0)
        + (F.col("__n") - F.col("__df") + F.lit(0.5)) / (F.col("__df") + F.lit(0.5))
    )
    tf_part = (
        F.col("__tf")
        * F.lit(k1 + 1.0)
        / (F.col("__tf") + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("__dl") / avgdl))
    )
    scored = (
        tf.join(F.broadcast(dfreq), "__t")
        .join(F.broadcast(qterms), "__t")
        .join(lens, id_col)
        .crossJoin(F.broadcast(totals))
        .groupBy(query_id_col, id_col)
        .agg(F.sum(idf * tf_part).cast("decimal(18,6)").cast("double").alias("score"))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def mine_hard_negatives(
    candidates: DataFrame,
    positives: DataFrame,
    k: int,
    query_id_col: str = "query_id",
    id_col: str = "doc_id",
    score_col: str = "score",
) -> DataFrame:
    """Hard negatives for retrieval training: from ANY retriever's
    scored candidate table (BM25, LSH, brute-force cosine — anything
    shaped (query_id, id, score)), drop each query's known positives
    and keep the top-``k`` remaining — the highest-scoring WRONG answers,
    which is what contrastive training wants. Re-ranks after the anti
    join so ranks stay contiguous 1..k.

    Fetch candidates with depth > k + max positives per query, or
    queries whose positives crowd the candidate list come back short.
    Ids-only anti join; candidate tables are (queries × depth)-sized,
    never corpus-sized.
    """
    neg = candidates.join(positives, [query_id_col, id_col], "left_anti")
    w = Window.partitionBy(query_id_col).orderBy(
        F.col(score_col).desc(), F.col(id_col).asc()
    )
    return (
        neg.withColumn("neg_rank", F.row_number().over(w))
        .filter(F.col("neg_rank") <= k)
        .drop("rank")
    )


def build_inverted_index(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 1,
) -> DataFrame:
    """Materialize the corpus's inverted index: one row per term with
    its document frequency and the doc-sorted posting list
    (array<struct<doc, tf>>) — the artifact a lexical search service
    loads, and the staging table that makes repeated BM25/TF-IDF runs
    corpus-scan-free (both derive from postings alone; build once per
    corpus version, query forever).

    Scale shape: one tokenize+explode pass, one (id, term) tf groupBy,
    one term groupBy with an IN-AGGREGATE array sort (sort_array over
    collected structs — no per-term window); ``min_df`` prunes hapax
    noise before the posting arrays materialize. Terms are the natural
    partition key downstream — a posting row's size is bounded by the
    term's df, and stop-word-scale terms are exactly what ``min_df``'s
    dual (a max_df cap) would remove; at web scale add one.
    """
    toks = _token_rows(df, id_col, text_col)
    tf = toks.groupBy(id_col, "__t").agg(F.count("*").alias("tf"))
    return (
        tf.groupBy("__t")
        .agg(
            F.count("*").alias("df"),
            F.sort_array(
                F.collect_list(F.struct(F.col(id_col).alias("doc"), F.col("tf")))
            ).alias("postings"),
        )
        .filter(F.col("df") >= min_df)
        .select(F.col("__t").alias("term"), "df", "postings")
    )
