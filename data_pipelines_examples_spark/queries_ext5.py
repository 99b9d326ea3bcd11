"""Query catalog, part 6 (round 5): term-weighting retrieval (TF-IDF,
BM25), corpus-shaping operators (per-source caps, leakage-free splits),
SemDeDup-style semantic dedup, and length-bucketed batch assembly.

LLM-pipeline extensions (BASELINE.json north star). The reference's
closest shapes are its word-count SQL (hive_to_hive_cte.py) and
driver-side batching loops; these lift them to corpus-level statistics
with full DuckDB oracle replication — every entry below is
hash-verifiable, approximations included (centroid constants and hash
seeds are shared verbatim between the Spark expression trees and the
generated oracle SQL, the q42 pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .functions.hashing import sql_hash64, sql_hash64_seeded
from .oracles import bm25_batch_sql, bm25_sql, gauss_planes, latest_event_per_ts_sql, minhash_components_sql, semantic_dedup_sql, tfidf_sql
from .operators.itemsets import MAX_BASKET_SIZE
from .queries import _t, query

# Pinned constants shared by the Spark plans and their oracle SQL.
_BM25_TERMS = ["hash", "merge", "table"]
_BM25_BATCH_QUERIES = [(1, "hash merge table"), (2, "window scan batch")]
_SEMDEDUP_CENTROIDS = gauss_planes(n_planes=4, dim=64, seed=99)


@query("q71_tfidf_top_terms", tfidf_sql(k=3))
def q71_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 characteristic terms per document by smoothed TF-IDF —
    corpus-level term statistics for topic tagging / keyword filters
    (generalizes the reference's word-count SQL, hive_to_hive_cte.py:
    45-58, with document frequencies). Vocabulary derives from the tf
    table (never a second corpus scan); the doc-count rides a 1-row
    broadcast; scores round through DECIMAL(18,6) before ranking so the
    oracle's ordering can't diverge on a last ulp."""
    from .operators.ranking import tfidf_top_terms

    return tfidf_top_terms(_t(spark, sf_dir, "documents"), k=3)


@query("q72_bm25_topk", bm25_sql(_BM25_TERMS, k=10))
def q72_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-10 documents for a pinned bag-of-terms query — the
    standard lexical retriever for eval-set construction and
    dedup-by-query. The exploded token stream filters to the query's
    terms BEFORE any shuffle; the global top-k is TakeOrdered (no
    single-partition window)."""
    from .operators.ranking import bm25_topk

    return bm25_topk(_t(spark, sf_dir, "documents"), _BM25_TERMS, k=10)


@query(
    "q73_cap_per_source",
    f"""
    SELECT doc_id, source FROM (
      SELECT doc_id, source,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY {sql_hash64_seeded("CAST(doc_id AS VARCHAR)", 11)}, doc_id
             ) AS rn
      FROM documents
    ) WHERE rn <= 40
    """,
)
def q73_cap_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Over-representation cap: at most 40 documents per source, kept by
    smallest seeded portable hash — deterministic, engine-re-derivable,
    and stable under incremental loads. The two-stage salted selection
    (operators/sampling.py::cap_per_group) computes EXACTLY the
    single-window answer the oracle states, without ever giving one
    reducer a whole hot source."""
    from .operators.sampling import cap_per_group

    d = _t(spark, sf_dir, "documents").select("doc_id", "source")
    return cap_per_group(
        d, "source", "doc_id", cap=40, seed=11, hash_how="portable"
    )


@query(
    "q74_leakage_free_split",
    f"""
    WITH comp AS ({minhash_components_sql(num_hashes=32, bands=8, shingle_n=3)}),
    rooted AS (
      SELECT d.doc_id,
             COALESCE(c.component, d.doc_id) AS root
      FROM documents d LEFT JOIN comp c ON c.id = d.doc_id
    )
    SELECT doc_id, root,
           CASE WHEN {sql_hash64_seeded("CAST(root AS VARCHAR)", 5)} % 100 < 10
                THEN 'val' ELSE 'train' END AS split
    FROM rooted
    """,
)
def q74_leakage_free_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/val split with a no-leakage guarantee: near-duplicate
    clusters (q33's minhash pipeline → q62's components) are assigned to
    a side AS A UNIT by a seeded hash of the cluster root, so a document
    and its near-twin can never straddle the eval boundary. The oracle
    replicates everything — signatures, banding, components via
    recursive CTE, and the same seeded split hash."""
    from .curation import leakage_free_split
    from .operators.dedup import minhash_lsh_pairs

    d = _t(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(
        d, num_hashes=32, bands=8, shingle_n=3, hash_how="portable"
    )
    return leakage_free_split(
        d.select("doc_id"), pairs, val_pct=10, seed=5, hash_how="portable"
    )


@query(
    "q75_semantic_dedup_pairs",
    semantic_dedup_sql(_SEMDEDUP_CENTROIDS, threshold=0.4),
)
def q75_semantic_dedup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic near-duplicate pairs: nearest-centroid
    clustering prunes the candidate space, exact cosine verifies within
    clusters (public method: Abbas et al., arXiv:2303.09540). Centroid
    constants are pinned import-time literals shared with the oracle, so
    the approximation itself is hash-verified — production trains them
    with ``kmeans_centroids`` instead (pytest covers that path)."""
    from .operators.similarity import semantic_dedup_pairs

    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    pairs = semantic_dedup_pairs(
        emb, _SEMDEDUP_CENTROIDS, threshold=0.4
    )
    return pairs.select(
        "id_a",
        "id_b",
        "cluster",
        F.col("cosine_sim").cast("decimal(10,6)").cast("double").alias("cosine_sim"),
    )


@query(
    "q76_length_bucketed_batches",
    rf"""
    WITH lens AS (
      SELECT doc_id,
             CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS BIGINT)
               AS n_tokens
      FROM documents
    ),
    b AS (
      SELECT doc_id, n_tokens,
             CAST(n_tokens // 16 AS BIGINT) AS bucket,
             CAST(doc_id % 8 AS INTEGER) AS shard
      FROM lens
    ),
    r AS (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY bucket, shard
        -- n_tokens closes the order (duplicate ids, divergent lengths,
        -- same bucket — sf1-density gate); mirrored in the operator
        ORDER BY {sql_hash64_seeded("CAST(doc_id AS VARCHAR)", 3)}, doc_id, n_tokens
      ) AS rn
      FROM b
    )
    SELECT doc_id, n_tokens, bucket, shard,
           CAST((rn - 1) // 4 AS BIGINT) AS batch_id,
           CAST((rn - 1) % 4 AS BIGINT) AS pos
    FROM r
    """,
)
def q76_length_bucketed_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed training-batch assembly: 16-token-wide length
    buckets, deterministic seeded-hash order within each (bucket, shard),
    consecutive batches of 4 — padding waste bounded by the bucket
    width instead of the corpus max length. Windows partition on
    (bucket, shard) so no bucket ever lands on one reducer; batches are
    shard-local (consumers read shards independently, the pack_offsets
    contract)."""
    from .operators.packing import length_bucketed_batches
    from .operators.text import token_count

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", token_count("text").cast("bigint").alias("n_tokens")
    )
    return length_bucketed_batches(
        d,
        id_col="doc_id",
        len_col="n_tokens",
        bucket_width=16,
        batch_size=4,
        shards=8,
        seed=3,
        hash_how="portable",
    )


@query(
    "q77_token_heavy_hitters",
    r"""
    WITH toks AS (
      SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS token
      FROM documents
    ),
    c AS (SELECT token, COUNT(*) AS cnt FROM toks GROUP BY token),
    t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM c)
    SELECT token, CAST(cnt AS BIGINT) AS cnt, cnt / CAST(n AS DOUBLE) AS frac
    FROM c CROSS JOIN t
    WHERE cnt * 50 > n
    """,
)
def q77_token_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact heavy-hitter tokens (frequency > n/50) — the key-skew
    profile that derives salt factors and cap thresholds from data
    instead of operator lore (the reference pins salt=16 as a constant,
    sas_conversion_with_manual_salt_skewed_join.sql). The bounded-shuffle
    Misra-Gries twin (``heavy_hitters_sketch``) is the 100 TB path for
    web-scale key spaces; its exact-equality invariant is pytest-pinned."""
    from .operators.profiling import heavy_hitters

    toks = _t(spark, sf_dir, "documents").select(
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("token")
    )
    return heavy_hitters(toks, "token", k=50)


@query(
    "q78_bigram_surprisal",
    r"""
    WITH t AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
      FROM documents
    ),
    g AS (
      SELECT doc_id,
             unnest([{'p': w[i], 'c': w[i+1]}
                     FOR i IN generate_series(1, len(w)-1)],
                    recursive := true)
      FROM t WHERE len(w) >= 2
    ),
    c2 AS (SELECT p, c, COUNT(*) AS n2 FROM g GROUP BY p, c),
    c1 AS (SELECT p, CAST(SUM(n2) AS BIGINT) AS n1 FROM c2 GROUP BY p),
    v AS (SELECT COUNT(DISTINCT c) AS vs FROM c2)
    SELECT doc_id, COUNT(*) AS n_bigrams,
           CAST(CAST(AVG(-log2((n2 + 1.0::DOUBLE) / (n1 + 1.0::DOUBLE * vs)))
                AS DECIMAL(18,6)) AS DOUBLE) AS mean_surprisal
    FROM g JOIN c2 USING (p, c) JOIN c1 USING (p) CROSS JOIN v
    GROUP BY doc_id
    """,
)
def q78_bigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM mean surprisal per document — the context-aware rung of
    the perplexity quality ladder (q67 is the unigram rung). Same
    DECIMAL(18,6) rounding: log2 and the mean's addition order are the
    only cross-engine degrees of freedom and rounding absorbs both."""
    from .operators.text import bigram_surprisal

    d = _t(spark, sf_dir, "documents")
    out = bigram_surprisal(d)
    return out.select(
        "doc_id",
        "n_bigrams",
        F.col("mean_surprisal").cast("decimal(18,6)").cast("double").alias(
            "mean_surprisal"
        ),
    )


@query(
    "q79_dedup_corpus_lines",
    r"""
    WITH l AS (
      SELECT doc_id,
             unnest([{'i': i, 'line': s[i]}
                     FOR i IN generate_series(1, len(s))],
                    recursive := true)
      FROM (SELECT doc_id, string_split(text, chr(10)) AS s FROM documents)
    ),
    freq AS (SELECT line, COUNT(DISTINCT doc_id) AS nd FROM l GROUP BY line)
    SELECT doc_id,
           string_agg(line, chr(10) ORDER BY i) AS text,
           COUNT(*) AS n_lines_kept
    FROM l JOIN freq USING (line)
    WHERE nd <= 1
    GROUP BY doc_id
    """,
)
def q79_dedup_corpus_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide line dedup (C4/RefinedWeb boilerplate removal): lines
    appearing in >1 distinct documents are removed everywhere, documents
    reassembled from survivors in original order. Lines shuffle as
    (id, line) rows — documents never travel whole."""
    from .operators.dedup import dedup_corpus_lines

    return dedup_corpus_lines(_t(spark, sf_dir, "documents"), max_docs=1)


@query(
    "q80_duplicate_spans",
    r"""
    WITH t AS (
      -- one canonical row per doc_id (MIN(text), the q64 contract): id
      -- collisions would give one doc_id two token arrays and make
      -- every positional span ambiguous
      SELECT doc_id, string_split_regex(lower(trim(MIN(text))), '\s+') AS w
      FROM documents GROUP BY doc_id
    ),
    wins AS (
      SELECT doc_id,
             unnest([{'i': i, 'g': array_to_string(w[i:i+7], ' ')}
                     FOR i IN generate_series(1, len(w)-7)],
                    recursive := true)
      FROM t WHERE len(w) >= 8
    ),
    dup AS (SELECT g FROM wins GROUP BY g HAVING COUNT(DISTINCT doc_id) >= 2),
    hits AS (SELECT doc_id, i FROM wins JOIN dup USING (g)),
    brk AS (
      SELECT doc_id, i,
             CASE WHEN i - lag(i) OVER (PARTITION BY doc_id ORDER BY i) <= 8
                  THEN 0 ELSE 1 END AS b
      FROM hits
    ),
    isl AS (
      SELECT doc_id, i,
             SUM(b) OVER (PARTITION BY doc_id ORDER BY i) AS island
      FROM brk
    )
    SELECT doc_id,
           CAST(MIN(i) AS BIGINT) AS span_start,
           CAST(MAX(i) + 7 AS BIGINT) AS span_end,
           CAST(MAX(i) - MIN(i) + 8 AS BIGINT) AS span_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_windows
    FROM isl GROUP BY doc_id, island
    """,
)
def q80_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Verbatim duplicated-span detection (Lee et al. 2022, arXiv:
    2107.06499): maximal token spans whose 8-token windows appear in >=2
    distinct documents. The suffix array's global ordered structure is
    replaced by a hash-groupBy over window hashes — the shape that
    distributes; spans merge per-doc with one gaps-and-islands window."""
    from .operators.dedup import duplicate_spans

    # one canonical row per doc_id (MIN(text)) — id collisions would
    # give one doc_id two token arrays and make every span positional
    # claim ambiguous; mirrored in the oracle's GROUP BY
    d = (
        _t(spark, sf_dir, "documents")
        .groupBy("doc_id")
        .agg(F.min("text").alias("text"))
    )
    out = duplicate_spans(d, k=8, min_docs=2)
    return out.select(
        "doc_id",
        F.col("span_start").cast("long").alias("span_start"),
        F.col("span_end").cast("long").alias("span_end"),
        F.col("span_tokens").cast("long").alias("span_tokens"),
        F.col("n_windows").cast("long").alias("n_windows"),
    )


@query(
    "q81_strip_duplicate_spans",
    r"""
    WITH t AS (
      -- one canonical row per doc_id (MIN(text), the q64 contract): id
      -- collisions would give one doc_id two token arrays and make
      -- every positional span ambiguous
      SELECT doc_id, string_split_regex(lower(trim(MIN(text))), '\s+') AS w
      FROM documents GROUP BY doc_id
    ),
    wins AS (
      SELECT doc_id,
             unnest([{'i': i, 'g': array_to_string(w[i:i+7], ' ')}
                     FOR i IN generate_series(1, len(w)-7)],
                    recursive := true)
      FROM t WHERE len(w) >= 8
    ),
    canon AS (
      SELECT g, MIN(doc_id) AS cd
      FROM wins GROUP BY g HAVING COUNT(DISTINCT doc_id) >= 2
    ),
    kill AS (
      SELECT DISTINCT wins.doc_id, wins.i + s.o AS p
      FROM wins JOIN canon USING (g), generate_series(0, 7) s(o)
      WHERE wins.doc_id <> canon.cd
    ),
    toks AS (
      SELECT doc_id,
             unnest([{'p': p, 'tok': w[p]}
                     FOR p IN generate_series(1, len(w))],
                    recursive := true)
      FROM t
    ),
    kept AS (SELECT doc_id, p, tok FROM toks ANTI JOIN kill USING (doc_id, p))
    SELECT doc_id,
           string_agg(tok, ' ' ORDER BY p) AS text,
           CAST(COUNT(*) AS BIGINT) AS n_tokens_kept
    FROM kept GROUP BY doc_id
    """,
)
def q81_strip_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-one removal of verbatim duplicated spans (Lee et al. 2022
    semantics): for each duplicated 8-token window the min-id document
    keeps its copy; every other document drops the covered tokens and
    reassembles from the survivors. The oracle independently rebuilds
    every surviving token string, so the whole mark→kill→reassemble
    pipeline is hash-checked end to end."""
    from .operators.dedup import strip_duplicate_spans

    # canonical row per doc_id — same contract as q80/q64
    d = (
        _t(spark, sf_dir, "documents")
        .groupBy("doc_id")
        .agg(F.min("text").alias("text"))
    )
    return strip_duplicate_spans(d, k=8, min_docs=2)


@query(
    "q82_scd2_event_type_history",
    """
    WITH m AS (
      SELECT user_id, ts, event_type,
             (lag(ts) OVER w IS NULL
              OR event_type IS DISTINCT FROM lag(event_type) OVER w) AS chg
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_type)
    ),
    k AS (SELECT user_id, ts, event_type FROM m WHERE chg)
    SELECT user_id, event_type,
           ts AS valid_from,
           lead(ts) OVER w2 AS valid_to,
           lead(ts) OVER w2 IS NULL AS is_current
    FROM k
    WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_type)
    """,
)
def q82_scd2_event_type_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 history of each user's event_type: consecutive
    unchanged rows collapse, each change opens a validity interval
    [valid_from, valid_to) with NULL valid_to marking the current row —
    the warehouse-standard Type-2 complement of the graded q10
    latest-version collapse. One exchange: both windows share the
    (user_id × ts) sort."""
    from .operators.dedup import scd2_history

    return scd2_history(
        _t(spark, sf_dir, "events"), "user_id", "ts", ["event_type"]
    )


@query(
    "q83_apply_cdc_snapshot",
    """
    WITH ch AS (
      -- +0.0 canonicalizes -0.0; the window below totals the order
      SELECT o_custkey AS c_custkey,
             CAST(o_totalprice AS DOUBLE) + 0.0 AS c_acctbal,
             CASE WHEN o_orderstatus = 'F' THEN 'D' ELSE 'U' END AS op,
             o_orderkey AS ver
      FROM orders
    ),
    latest AS (
      SELECT c_custkey, c_acctbal, op FROM (
        -- ver (an orderkey) duplicates under the sf1-density
        -- bootstrap with float/status-injected copies: op and balance
        -- close the order so rn=1 is deterministic in both engines
        SELECT ch.*, ROW_NUMBER() OVER (
          PARTITION BY c_custkey
          ORDER BY ver DESC, op DESC, c_acctbal DESC NULLS LAST
        ) AS rn FROM ch
      ) WHERE rn = 1
    )
    SELECT c_custkey, CAST(c_acctbal AS DOUBLE) AS c_acctbal
    FROM customer WHERE c_custkey NOT IN (SELECT c_custkey FROM latest)
    UNION ALL
    SELECT c_custkey, c_acctbal FROM latest WHERE op <> 'D'
    """,
)
def q83_apply_cdc_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC-merge: the orders stream as an I/U/D change log applied to the
    customer snapshot (finalized orders delete the key, open orders set
    the balance; latest change per key wins by order key). One window
    collapse of the log + one anti join — the MERGE INTO shape without a
    table format."""
    from .operators.dedup import apply_cdc

    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_acctbal").cast("double").alias("c_acctbal")
    )
    # +0.0 canonicalizes -0.0; the (key, ver) dedup below makes the
    # change stream a total order per key — ver (an orderkey) duplicates
    # under the sf1-density bootstrap with float/status-injected copies,
    # and apply_cdc's latest-by-ver pick was ambiguous among them.
    # Mirrored by the oracle window's `ver DESC, op DESC, c_acctbal
    # DESC NULLS LAST`.
    changes = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey"),
        (F.col("o_totalprice").cast("double") + F.lit(0.0)).alias("c_acctbal"),
        F.when(F.col("o_orderstatus") == "F", "D").otherwise("U").alias("op"),
        F.col("o_orderkey").alias("ver"),
    )
    wv = Window.partitionBy("c_custkey", "ver").orderBy(
        F.col("op").desc(), F.col("c_acctbal").desc_nulls_last()
    )
    changes = (
        changes.withColumn("__rn", F.row_number().over(wv))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    return apply_cdc(cust, changes, "c_custkey", "op", "ver")


@query(
    "q84_temporal_regime_join",
    """
    WITH m AS (
      SELECT user_id, ts, event_type,
             (lag(ts) OVER w IS NULL
              OR event_type IS DISTINCT FROM lag(event_type) OVER w) AS chg
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_type)
    ),
    k AS (SELECT user_id, ts, event_type FROM m WHERE chg),
    h AS (
      SELECT user_id, event_type, ts AS valid_from,
             lead(ts) OVER w2 AS valid_to
      FROM k
      WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_type)
    )
    SELECT e.event_id, e.user_id,
           h.event_type AS regime_type,
           h.valid_from AS regime_start
    FROM events e
    JOIN h ON e.user_id = h.user_id
          AND e.ts >= h.valid_from
          AND (h.valid_to IS NULL OR e.ts < h.valid_to)
    """,
)
def q84_temporal_regime_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join of every event to its containing SCD2 regime
    (the q82 history): the oracle uses the textbook BETWEEN theta join;
    the engine rides the as-of union-window instead — ONE shuffle,
    linear, no per-key cross product — and must produce identical rows."""
    from .operators.dedup import scd2_history
    from .operators.relational import temporal_join

    ev = _t(spark, sf_dir, "events")
    hist = scd2_history(ev, "user_id", "ts", ["event_type"])
    joined = temporal_join(
        ev.select("event_id", "user_id", "ts"),
        hist.drop("is_current"),
        "user_id",
        "ts",
        value_cols=["event_type"],
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("event_type").alias("regime_type"),
        F.col("valid_from").alias("regime_start"),
    )


@query(
    "q85_weighted_sample",
    f"""
    SELECT doc_id, text, lang, source, n_chars FROM (
      SELECT d.*,
             ln(((({sql_hash64_seeded("CAST(doc_id AS VARCHAR)", 42)})
                  % 9007199254740992) + 0.5) / 9007199254740992.0)
               / CAST(n_chars AS DOUBLE) AS k
      FROM documents d
      WHERE n_chars IS NOT NULL AND n_chars > 0
    ) ORDER BY k DESC, doc_id LIMIT 100
    """,
)
def q85_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis-Spirakis A-Res):
    100 documents drawn with probability proportional to length, from a
    seeded portable-hash uniform — bit-reproducible, no RNG state, and
    fully replicated by the oracle (same md5-derived uniform, same
    ln(u)/w order statistic; adjacent top keys are ~1e-5 apart so 1-ulp
    libm divergence cannot flip membership). The engine's top-n is
    TakeOrderedAndProject — per-partition heaps, no global sort."""
    from .operators.sampling import weighted_sample

    return weighted_sample(
        _t(spark, sf_dir, "documents"),
        "doc_id",
        "n_chars",
        100,
        seed=42,
        hash_how="portable",
    )


@query(
    "q86_snapshot_diff_reconcile",
    """
    WITH o AS (
      SELECT c_custkey, CAST(c_acctbal AS DOUBLE) AS c_acctbal FROM customer
    ),
    ch AS (
      -- +0.0 canonicalizes -0.0; the window below totals the order
      SELECT o_custkey AS c_custkey,
             CAST(o_totalprice AS DOUBLE) + 0.0 AS c_acctbal,
             CASE WHEN o_orderstatus = 'F' THEN 'D' ELSE 'U' END AS op,
             o_orderkey AS ver
      FROM orders
    ),
    latest AS (
      SELECT c_custkey, c_acctbal, op FROM (
        -- ver (an orderkey) duplicates under the sf1-density
        -- bootstrap with float/status-injected copies: op and balance
        -- close the order so rn=1 is deterministic in both engines
        SELECT ch.*, ROW_NUMBER() OVER (
          PARTITION BY c_custkey
          ORDER BY ver DESC, op DESC, c_acctbal DESC NULLS LAST
        ) AS rn FROM ch
      ) WHERE rn = 1
    ),
    n AS (
      SELECT c_custkey, c_acctbal FROM o
      WHERE c_custkey NOT IN (SELECT c_custkey FROM latest)
      UNION ALL
      SELECT c_custkey, c_acctbal FROM latest WHERE op <> 'D'
    ),
    j AS (
      SELECT COALESCE(o.c_custkey, n.c_custkey) AS c_custkey,
             o.c_acctbal AS ob, n.c_acctbal AS nb,
             o.c_custkey IS NOT NULL AS in_o,
             n.c_custkey IS NOT NULL AS in_n
      FROM o FULL JOIN n ON o.c_custkey = n.c_custkey
    )
    SELECT c_custkey,
           CASE WHEN NOT in_o THEN 'added'
                WHEN NOT in_n THEN 'removed'
                WHEN ob IS DISTINCT FROM nb THEN 'changed'
                ELSE 'unchanged' END AS diff_status,
           CASE WHEN in_o AND in_n AND (ob IS DISTINCT FROM nb)
                THEN 'c_acctbal' ELSE '' END AS changed_cols
    FROM j
    WHERE NOT (in_o AND in_n AND (ob IS NOT DISTINCT FROM nb))
    """,
)
def q86_snapshot_diff_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation: diff the customer snapshot against its
    CDC-applied successor (q83's merge) — one full-outer join on the
    key, null-safe per-column change detection, per-row changed-column
    list. Output is the delta only (added/removed/changed), the audit
    artifact a rebuild gate consumes."""
    from .operators.dedup import apply_cdc
    from .operators.relational import snapshot_diff

    old = _t(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_acctbal").cast("double").alias("c_acctbal")
    )
    # +0.0 canonicalizes -0.0; the (key, ver) dedup below makes the
    # change stream a total order per key — ver (an orderkey) duplicates
    # under the sf1-density bootstrap with float/status-injected copies,
    # and apply_cdc's latest-by-ver pick was ambiguous among them.
    # Mirrored by the oracle window's `ver DESC, op DESC, c_acctbal
    # DESC NULLS LAST`.
    changes = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey"),
        (F.col("o_totalprice").cast("double") + F.lit(0.0)).alias("c_acctbal"),
        F.when(F.col("o_orderstatus") == "F", "D").otherwise("U").alias("op"),
        F.col("o_orderkey").alias("ver"),
    )
    wv = Window.partitionBy("c_custkey", "ver").orderBy(
        F.col("op").desc(), F.col("c_acctbal").desc_nulls_last()
    )
    changes = (
        changes.withColumn("__rn", F.row_number().over(wv))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    new = apply_cdc(old, changes, "c_custkey", "op", "ver")
    diff = snapshot_diff(old, new, "c_custkey")
    return diff.withColumn("changed_cols", F.array_join("changed_cols", ","))


@query("q87_minhash_fast_path", None)
def q87_minhash_fast_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB fast path of q33: identical MinHash-LSH plan with
    hash_how='xxhash64' (JVM intrinsic) instead of the oracle-portable
    md5 prefix. No SQL oracle CAN exist (DuckDB has no xxhash64) — the
    semantics are hash-verified via the portable twin q33; this entry
    exists so the bench tracks the throughput users actually get."""
    from .operators.dedup import minhash_lsh_pairs

    d = _t(spark, sf_dir, "documents")
    return minhash_lsh_pairs(
        d, num_hashes=32, bands=8, shingle_n=3, hash_how="xxhash64"
    ).select("id_a", "id_b", "est_jaccard")


@query("q88_simhash_fast_path", None)
def q88_simhash_fast_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The xxhash64 twin of q34 (64-bit fingerprints). The bench shows
    what the portable twin can't: simhash is VOTE-bound, not hash-bound
    — 64 conditional bit-sums dominate, so swapping md5 for the JVM
    intrinsic gains almost nothing (unlike minhash's 4x, q87). Kept in
    the bench precisely because that asymmetry is the scaling fact."""
    from .operators.dedup import simhash_pairs

    d = _t(spark, sf_dir, "documents")
    return simhash_pairs(
        d, max_hamming=6, bands=4, num_bits=64, hash_how="xxhash64"
    ).select("id_a", "id_b", F.col("hamming").cast("bigint").alias("hamming"))


@query(
    "q89_quarantine_orders",
    """
    SELECT o_orderkey,
           array_to_string(
             list_filter(
               [CASE WHEN o_totalprice > 300000 THEN 'high_price' END,
                CASE WHEN o_orderstatus = 'F' THEN 'finalized' END,
                CASE WHEN o_orderpriority = '1-URGENT' AND o_orderdate < DATE '1993-01-01'
                     THEN 'stale_urgent' END],
               x -> x IS NOT NULL),
             ',') AS dq_failed_rules
    FROM orders
    WHERE o_totalprice > 300000 OR o_orderstatus = 'F'
       OR (o_orderpriority = '1-URGENT' AND o_orderdate < DATE '1993-01-01')
    """,
)
def q89_quarantine_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dead-letter quarantine: rows violating any DQ rule, tagged with
    ALL failed rule names in one narrow projection (no per-rule jobs).
    The valid side keeps the input schema exactly; this entry grades the
    quarantine side's row-level reason strings."""
    from .dq.rules import DQRule, quarantine_split

    rules = [
        DQRule("high_price", "o_totalprice > 300000"),
        DQRule("finalized", "o_orderstatus = 'F'"),
        DQRule(
            "stale_urgent",
            "o_orderpriority = '1-URGENT' AND o_orderdate < DATE '1993-01-01'",
        ),
    ]
    _, quarantined = quarantine_split(_t(spark, sf_dir, "orders"), rules)
    return quarantined.select("o_orderkey", "dq_failed_rules")


@query(
    "q90_winnowing_fingerprints",
    f"""
    WITH h AS (
      SELECT doc_id,
             [{sql_hash64("substr(text, CAST(i AS INTEGER), 8)")}
              FOR i IN generate_series(1, greatest(length(text) - 7, 1))] AS hs
      FROM documents WHERE doc_id % 5 = 0
    )
    SELECT doc_id,
           unnest(list_distinct(
             [list_min(hs[CAST(j AS INTEGER):CAST(j AS INTEGER)+3])
              FOR j IN generate_series(1, greatest(len(hs) - 3, 1))]
           )) AS fp
    FROM h
    """,
)
def q90_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprint selection (Schleimer et al. 2003) with the
    portable hash so the oracle re-derives every selected fingerprint:
    char 8-gram hashes, min of every 4-window, per-doc distinct. The
    guarantee (any >=11-char verbatim match shares a fingerprint) is
    pytest-pinned; this entry hash-verifies the selection itself over
    a deterministic 1-in-5 document subset (the md5-per-char-gram cost
    is the ORACLE's tax, not the engine's — the xxhash64 path has no
    per-gram md5; subsetting keeps the gate fast without changing what
    is verified)."""
    from .operators.text import winnowing_fingerprints

    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    return winnowing_fingerprints(d, k=8, w=4, hash_how="portable")


@query("q91_bm25_batch_topk", bm25_batch_sql(_BM25_BATCH_QUERIES, k=10))
def q91_bm25_batch_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch BM25: one corpus pass retrieves top-10 for a TABLE of
    queries (per-query windows, no global reducer) — the eval-set /
    hard-negative construction shape. Oracle pins the query table as
    VALUES and replicates the scoring term by term."""
    from .operators.ranking import bm25_topk_batch

    queries = spark.createDataFrame(
        _BM25_BATCH_QUERIES, "query_id int, query_text string"
    )
    return bm25_topk_batch(
        _t(spark, sf_dir, "documents"), queries, k=10
    )



@query(
    "q92_fuzzy_name_pairs",
    """
    SELECT a.n_nationkey AS key_a, b.n_nationkey AS key_b,
           levenshtein(lower(trim(a.n_name)), lower(trim(b.n_name))) AS edit_distance
    FROM nation a JOIN nation b ON a.n_nationkey < b.n_nationkey
    WHERE levenshtein(lower(trim(a.n_name)), lower(trim(b.n_name))) <= 4
    """,
)
def q92_fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy-key pairing: nation names within 4 edits of each other via
    the lossless length-band blocked join (the oracle brute-forces the
    theta join — tiny table; the engine's equi-join blocking produces
    the identical pair set, which is the lossless-ness being graded).
    ASCII keys, so Spark codepoint and DuckDB byte Levenshtein agree."""
    from .operators.relational import fuzzy_join

    n = _t(spark, sf_dir, "nation")
    left = n.select(
        F.col("n_nationkey").alias("key_a"), F.col("n_name").alias("name_a")
    )
    right = n.select(
        F.col("n_nationkey").alias("key_b"), F.col("n_name").alias("name_b")
    )
    out = fuzzy_join(left, right, "name_a", "name_b", max_distance=4)
    return out.filter(F.col("key_a") < F.col("key_b")).select(
        "key_a", "key_b", "edit_distance"
    )


@query(
    "q93_hourly_resample_asof",
    f"""
    WITH w0 AS (
      SELECT * FROM events
      WHERE ts >= TIMESTAMP '2020-01-01' AND ts < TIMESTAMP '2030-01-01'
    ),
    -- one observation per (user_id, ts): ASOF with duplicate right
    -- timestamps picks an engine-dependent row (same max_by NULL trap
    -- as q49); the winner is the max-event_id row's value verbatim
    w AS (
      {latest_event_per_ts_sql("w0")}
    ),
    b AS (
      SELECT user_id, date_trunc('hour', MIN(ts)) AS t0, MAX(ts) AS t1
      FROM w GROUP BY user_id
    ),
    grid AS (
      SELECT user_id, unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS grid_ts
      FROM b
    )
    SELECT g.user_id, g.grid_ts,
           e.ts AS asof_ts, e.value AS value
    FROM grid g
    ASOF LEFT JOIN w e ON g.user_id = e.user_id AND e.ts <= g.grid_ts
    """,
)
def q93_hourly_resample_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly resample of each user's irregular event series with
    forward-fill (as-of) semantics: per-key grid from one min/max
    aggregate + sequence explode, fill via the union-window as-of join
    (one shuffle). Oracle uses DuckDB's native ASOF JOIN over the
    generated grid.

    Both sides resample an EXPLICIT analysis window (2020-2030, the
    production shape — the reference stock pipelines resample bounded
    date ranges): the grid is data-driven, so without the bound one
    corrupt far-past/far-future timestamp inflates some key's grid by
    orders of magnitude (--times axis: a single year-9000 event = 62M
    hourly ticks, JVM OOM). resample_asof's max_grid_points guard
    backstops whatever the window filter lets through.

    Observations dedup to one row per (user_id, ts) — max-event_id
    value, NULL included — BEFORE the resample: asof_join documents
    that duplicate right timestamps need a pre-dedup (the winner is
    otherwise sort-arbitrary), and DuckDB's ASOF has the same
    ambiguity. Same contract as q49."""
    from .operators.windows import resample_asof

    ev = _t(spark, sf_dir, "events").filter(
        (F.col("ts") >= F.lit("2020-01-01").cast("timestamp"))
        & (F.col("ts") < F.lit("2030-01-01").cast("timestamp"))
    )
    obs = ev.groupBy("user_id", "ts").agg(
        # struct comparator + output +0.0: event_id duplicates under the
        # sf1-density bootstrap — see oracles.latest_event_per_ts_sql
        (F.max_by("value", F.struct("event_id", "value")) + F.lit(0.0)).alias(
            "value"
        )
    )
    out = resample_asof(
        obs, "user_id", "ts", ["value"], interval="1 hour", trunc_unit="hour"
    )
    return out.select("user_id", "grid_ts", "asof_ts", "value")


@query(
    "q94_event_feed_gaps",
    """
    WITH g AS (
      SELECT user_id, ts,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
      FROM events
    )
    SELECT user_id, prev AS gap_start, ts AS gap_end,
           CAST(epoch_us(ts) - epoch_us(prev) AS BIGINT) / 1000000.0::DOUBLE
             AS gap_seconds
    FROM g
    WHERE epoch_us(ts) - epoch_us(prev) > 3600 * 1000000::BIGINT
    """,
)
def q94_event_feed_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feed-gap monitoring: every >1h silence per user — the complement
    of the q93 forward-fill (which masks exactly these). Microsecond-
    exact arithmetic on both sides (floor-to-second casts would shift
    sub-second gaps); gap_seconds is the same integer-micros / 1e6
    division in both engines, so the doubles are bit-identical."""
    from .operators.windows import detect_gaps

    ev = _t(spark, sf_dir, "events")
    return detect_gaps(ev, "user_id", "ts", max_gap_seconds=3600)


@query(
    "q95_contamination_report",
    r"""
    WITH t AS (
      SELECT doc_id, string_split_regex(lower(text), '\s+') AS w FROM documents
    ),
    g AS (
      SELECT doc_id,
             unnest(list_distinct([
               array_to_string(w[i:i+12], ' ')
               FOR i IN generate_series(1, greatest(len(w)-12, 1))
             ])) AS g
      FROM t
    )
    SELECT a.doc_id AS train_id, b.doc_id AS bench_id,
           CAST(COUNT(*) AS BIGINT) AS n_shared_grams
    FROM (SELECT * FROM g WHERE doc_id % 50 <> 0) a
    JOIN (SELECT * FROM g WHERE doc_id % 50 = 0) b USING (g)
    GROUP BY a.doc_id, b.doc_id
    """,
)
def q95_contamination_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination evidence sheet: per (train doc, benchmark doc)
    pair, the count of shared 13-grams — what q-style kill decisions
    get reviewed on. 1-in-50 docs stand in as the benchmark side; the
    oracle replicates gram construction and the pair aggregation on
    gram text (the engine joins 8-byte hashes — same pairs)."""
    from .operators.dedup import contamination_report

    d = _t(spark, sf_dir, "documents")
    train = d.filter(F.col("doc_id") % 50 != 0)
    bench = d.filter(F.col("doc_id") % 50 == 0)
    return contamination_report(train, bench, shingle_n=13)


@query(
    "q96_budget_selection",
    r"""
    SELECT doc_id, quality, n_tokens FROM (
      SELECT doc_id,
             CAST(n_chars AS DOUBLE) AS quality,
             CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS BIGINT)
               AS n_tokens,
             SUM(CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS BIGINT))
               OVER (ORDER BY CAST(n_chars AS DOUBLE) DESC, doc_id ASC) AS cum
      FROM documents
    ) WHERE cum <= 15000
    """,
)
def q96_budget_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy corpus selection under a 15k-token budget (quality proxy:
    document length). The oracle states the semantics as ONE global
    window cumsum; the engine's two-phase level-table selection must be
    row-identical while bounding any reducer to a single quality level
    — the graded equivalence IS the scale claim."""
    from .operators.sampling import select_within_token_budget

    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.col("n_chars").cast("double").alias("quality"),
        F.size(F.split(F.lower(F.trim(F.col("text"))), r"\s+"))
        .cast("long")
        .alias("n_tokens"),
    )
    return select_within_token_budget(d, "quality", "n_tokens", 15000)


@query(
    "q97_copurchase_pairs",
    f"""
    WITH items0 AS (
      SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem
    ),
    -- max_basket_size mirror: cooccurrence_pairs drops baskets over
    -- the MAX_BASKET_SIZE fuse (a degenerate basket is a k² task
    -- bomb); the guard is part of the operator contract, so the
    -- oracle must apply the SAME population cut
    ok AS (SELECT b FROM items0 GROUP BY b HAVING COUNT(*) <= {MAX_BASKET_SIZE}),
    items AS (SELECT i0.b, i0.i FROM items0 i0 JOIN ok USING (b)),
    freq AS (SELECT i FROM items GROUP BY i HAVING COUNT(*) >= 2),
    p AS (SELECT * FROM items WHERE i IN (SELECT i FROM freq))
    SELECT a.i AS item_a, b.i AS item_b, CAST(COUNT(*) AS BIGINT) AS n_baskets
    FROM p a JOIN p b ON a.b = b.b AND a.i < b.i
    GROUP BY a.i, b.i
    HAVING COUNT(*) >= 2
    """,
)
def q97_copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket pairs: parts co-ordered in >=2 orders — the exact,
    a-priori-pruned tier of the frequent-itemset family (items below
    the support floor never enter the pair join; FP-Growth covers
    higher-order sets and is pinned to agree with this at size 2).
    The max_basket_size=10k degenerate-basket guard is part of the
    contract and mirrored in the oracle — found by the sf0.1 composed
    soak, where the skew axis builds an ~18k-item hot basket that
    trips the guard for the first time."""
    from .operators.itemsets import cooccurrence_pairs

    li = _t(spark, sf_dir, "lineitem")
    return cooccurrence_pairs(
        li, "l_orderkey", "l_partkey", min_support=2,
        max_basket_size=MAX_BASKET_SIZE,
    )


@query(
    "q98_normalize_text",
    r"""
    SELECT doc_id,
           trim(regexp_replace(
             regexp_replace(
               nfc_normalize('cafe' || chr(769) || ' ' || text),
               '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]', '', 'g'),
             '\s+', ' ', 'g')) AS text
    FROM documents
    """,
)
def q98_normalize_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode NFC normalization + control strip + whitespace squeeze,
    with an accent-carrying prefix on every row (decomposed via
    chr(769) on the oracle side) so the engines must agree on real
    composition work, not just ASCII identity. The Spark side runs the Arrow pandas UDF (one of
    the engine's few justified Python hops — no JVM UNICODE_NORM
    exists); the oracle is DuckDB's INDEPENDENT C nfc_normalize — two
    implementations of the Unicode tables agreeing byte-for-byte."""
    from .operators.text import normalize_text

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.concat(F.lit("café "), F.col("text")).alias("text")
    )
    return normalize_text(d, form="NFC")


def _checksum_enc(col_expr: str) -> str:
    """DuckDB mirror of corpus_checksum_frame's null-safe length-prefixed
    column encoding: 'N' for NULL, else '<char_length>:<value>'."""
    return (
        f"CASE WHEN ({col_expr}) IS NULL THEN 'N' "
        f"ELSE concat(CAST(length({col_expr}) AS VARCHAR), ':', {col_expr}) END"
    )


@query(
    "q99_corpus_checksum",
    f"""
    SELECT CAST(bit_xor({sql_hash64("concat_ws(chr(31), " + ", ".join(_checksum_enc(c) for c in ["CAST(doc_id AS VARCHAR)", "text", "lang", "source", "CAST(n_chars AS VARCHAR)"]) + ")")}) AS BIGINT)
             AS checksum_xor,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM documents
    """,
)
def q99_corpus_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent corpus checksum (XOR of portable row hashes +
    row count): equal values across engines, partitionings, and row
    orders certify the same multiset of rows — the artifact-equality
    check behind compaction/migration sign-off. The md5-derived hash
    makes the checksum re-derivable by ANY engine, which is the point
    of a checksum you hand to someone else."""
    from .reporting import corpus_checksum_frame

    return corpus_checksum_frame(
        _t(spark, sf_dir, "documents"), hash_how="portable"
    )


@query(
    "q100_pseudonymized_order_counts",
    f"""
    WITH c AS (
      SELECT {sql_hash64_seeded("CAST(c_custkey AS VARCHAR)", 17)} AS cust_token
      FROM customer
    ),
    o AS (
      SELECT {sql_hash64_seeded("CAST(o_custkey AS VARCHAR)", 17)} AS cust_token
      FROM orders
    )
    SELECT c.cust_token, CAST(COUNT(o.cust_token) AS BIGINT) AS n_orders
    FROM c LEFT JOIN o USING (cust_token)
    GROUP BY c.cust_token
    """,
)
def q100_pseudonymized_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic pseudonymization with referential integrity: both
    tables tokenize custkey under the same seed, then join and count ON
    THE TOKENS — raw identifiers never appear in the output, yet every
    per-customer aggregate is intact. The oracle re-derives the same
    tokens from the same md5 scheme, proving the pseudonym universe is
    engine-independent (auditable by a third party without Spark)."""
    from .functions.udfs import pseudonymize

    cust = pseudonymize(
        _t(spark, sf_dir, "customer").select("c_custkey"),
        ["c_custkey"], seed=17, hash_how="portable",
    ).select(F.col("c_custkey").alias("cust_token"))
    orders = pseudonymize(
        _t(spark, sf_dir, "orders").select("o_custkey"),
        ["o_custkey"], seed=17, hash_how="portable",
    ).select(F.col("o_custkey").alias("cust_token"))
    return (
        cust.join(orders, "cust_token", "left")
        .groupBy(cust["cust_token"])
        .agg(F.count(orders["cust_token"]).alias("n_orders"))
    )


@query(
    "q101_event_funnel",
    """
    WITH s1 AS (
      SELECT user_id, MIN(ts) AS step_1_ts FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, MIN(e.ts) AS step_2_ts
      FROM events e JOIN s1 USING (user_id)
      WHERE e.event_type = 'click' AND e.ts > s1.step_1_ts
      GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id, MIN(e.ts) AS step_3_ts
      FROM events e JOIN s2 USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > s2.step_2_ts
      GROUP BY e.user_id
    )
    SELECT s1.user_id, s1.step_1_ts, s2.step_2_ts, s3.step_3_ts,
           CAST(CASE WHEN s3.step_3_ts IS NOT NULL THEN 3
                     WHEN s2.step_2_ts IS NOT NULL THEN 2
                     ELSE 1 END AS INTEGER) AS steps_completed
    FROM s1
    LEFT JOIN s2 USING (user_id)
    LEFT JOIN s3 USING (user_id)
    """,
)
def q101_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view → click → purchase funnel per user: each step's timestamp is
    the earliest occurrence STRICTLY after the previous step — the
    product-analytics pattern query, built from one per-step aggregate +
    key-equi-join (never a per-user sort of the whole event stream)."""
    from .operators.funnel import funnel_steps

    ev = _t(spark, sf_dir, "events")
    return funnel_steps(ev, "user_id", "ts", "event_type", ["view", "click", "purchase"])


@query(
    "q102_retention_cohorts",
    """
    WITH first AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS c0 FROM events GROUP BY user_id
    ),
    act AS (
      SELECT DISTINCT e.user_id, first.c0 AS cohort_start,
             CAST(FLOOR(date_diff('day', first.c0, CAST(e.ts AS DATE)) / 7)
                  AS INTEGER) AS periods_since
      FROM events e JOIN first USING (user_id)
    )
    SELECT cohort_start, periods_since,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_active
    FROM act GROUP BY cohort_start, periods_since
    """,
)
def q102_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly-grid cohort retention over events: day-based period
    arithmetic on both sides (calendar weeks vary by engine; a day grid
    is exact), distinct-activity per (cohort, period), distinct-user
    counts per cell."""
    from .operators.funnel import retention_cohorts

    return retention_cohorts(_t(spark, sf_dir, "events"), "user_id", "ts", period_days=7)


@query(
    "q103_ab_test_purchase_rate",
    """
    WITH exposed AS (
      SELECT user_id, user_id % 2 AS arm,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS ok
      FROM events GROUP BY user_id
    ),
    agg AS (
      SELECT COUNT(CASE WHEN arm = 0 THEN 1 END) AS n_control,
             CAST(SUM(CASE WHEN arm = 0 THEN ok END) AS DOUBLE) AS x_control,
             COUNT(CASE WHEN arm = 1 THEN 1 END) AS n_treatment,
             CAST(SUM(CASE WHEN arm = 1 THEN ok END) AS DOUBLE) AS x_treatment
      FROM exposed
    )
    SELECT n_control, x_control, n_treatment, x_treatment,
           x_control / n_control AS rate_control,
           x_treatment / n_treatment AS rate_treatment,
           x_treatment / n_treatment - x_control / n_control AS lift,
           CAST(CAST(
             (x_treatment / n_treatment - x_control / n_control)
             / sqrt(((x_control + x_treatment) / (n_control + n_treatment))
                    * (1.0::DOUBLE - (x_control + x_treatment) / (n_control + n_treatment))
                    * (1.0::DOUBLE / n_control + 1.0::DOUBLE / n_treatment))
           AS DECIMAL(18,8)) AS DOUBLE) AS z
    FROM agg
    """,
)
def q103_ab_test_purchase_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z on a synthetic assignment (user parity as the
    arm, ever-purchased as the success): both engines run the identical
    exact-division + correctly-rounded-sqrt arithmetic, z rounds through
    DECIMAL(18,8). By construction the arms don't differ — the pipeline
    is what's graded, and a |z| near 0 is the expected reading."""
    from .operators.funnel import ab_test_summary

    ev = _t(spark, sf_dir, "events")
    exposed = ev.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("ok")
    ).withColumn("arm", (F.col("user_id") % 2).cast("string"))
    return ab_test_summary(exposed, "arm", "ok", control="0", treatment="1")


@query(
    "q104_inverted_index",
    r"""
    WITH toks AS (
      SELECT doc_id,
             unnest(string_split_regex(lower(trim(text)), '\s+')) AS t
      FROM documents
    ),
    tf AS (SELECT doc_id, t, COUNT(*) AS tf FROM toks GROUP BY doc_id, t)
    SELECT t AS term, CAST(COUNT(*) AS BIGINT) AS df,
           string_agg(doc_id || ':' || tf, ' ' ORDER BY doc_id) AS postings
    FROM tf GROUP BY t HAVING COUNT(*) >= 2
    """,
)
def q104_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus inverted index (min_df=2), posting lists serialized as
    'doc:tf' strings so both clients hash the same scalar (nested-struct
    stringification differs across drivers; the array form is the
    operator's real output and is pytest-pinned)."""
    from .operators.ranking import build_inverted_index

    idx = build_inverted_index(_t(spark, sf_dir, "documents"), min_df=2)
    return idx.select(
        "term",
        "df",
        F.array_join(
            F.transform(
                F.col("postings"),
                lambda p: F.concat_ws(":", p["doc"].cast("string"), p["tf"].cast("string")),
            ),
            " ",
        ).alias("postings"),
    )


@query(
    "q105_revenue_share_of_region",
    """
    WITH rev AS (
      SELECT r.r_name AS region, n.n_name AS nation,
             CAST(SUM(TRY_CAST(nullif(o.o_totalprice, CAST('NaN' AS DOUBLE)) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      GROUP BY r.r_name, n.n_name
    )
    SELECT region, nation, revenue,
           CAST(CAST(revenue / SUM(revenue) OVER (PARTITION BY region)
                AS DECIMAL(18,8)) AS DOUBLE) AS region_share
    FROM rev
    """,
)
def q105_revenue_share_of_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report: each nation's share of its region's revenue —
    the percent-of-total window over an already-aggregated dimension
    (the window sees nations, never order rows). Decimal-exact sums,
    share rounded through DECIMAL(18,8) on both sides."""
    from .queries import _dsum

    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    rev = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(n, c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy(r["r_name"].alias("region"), n["n_name"].alias("nation"))
        .agg(_dsum("o_totalprice").alias("revenue"))
    )
    w = Window.partitionBy("region")
    return rev.withColumn(
        "region_share",
        (F.col("revenue") / F.sum("revenue").over(w))
        .cast("decimal(18,8)")
        .cast("double"),
    )


@query(
    "q106_abc_customer_classes",
    """
    WITH rev AS (
      SELECT o_custkey AS c_custkey,
             CAST(SUM(TRY_CAST(nullif(o_totalprice, CAST('NaN' AS DOUBLE)) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
             SUM(TRY_CAST(nullif(o_totalprice, CAST('NaN' AS DOUBLE)) AS DECIMAL(18,4))) AS rev_dec
      FROM orders GROUP BY o_custkey
    ),
    ranked AS (
      SELECT c_custkey, revenue,
             CAST(SUM(rev_dec) OVER (ORDER BY revenue DESC, c_custkey) AS DOUBLE)
               / CAST(SUM(rev_dec) OVER () AS DOUBLE) AS cum_share
      FROM rev
    )
    SELECT c_custkey, revenue,
           CASE WHEN cum_share <= 0.8 THEN 'A'
                WHEN cum_share <= 0.95 THEN 'B'
                ELSE 'C' END AS abc_class
    FROM ranked
    """,
)
def q106_abc_customer_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC / Pareto classification: customers by cumulative revenue
    share (A = first 80%, B = to 95%, C = tail) — the merchandising
    segmentation. A customer dimension is NOT bounded at 100 TB, so the
    global running total goes through ``global_cumulative_sum``
    (range-partitioned distributed prefix sum — every core works, no
    single-partition window over the dimension) and the grand total
    through an aggregate broadcast, not an empty window. Both the cum
    and the total accumulate DECIMAL (exact, associative — the
    distributed re-association is value-identical, and the oracle's
    sequential window sum of the same decimals matches bit-for-bit
    after the shared cast to double)."""
    o = _t(spark, sf_dir, "orders")
    from .operators.windows import global_cumulative_sum
    from .queries import _dec_sum, _dsum

    # rev_dec stays at Spark's widened DECIMAL(28,4) — no downcast back
    # to (18,4): at 100 TB a per-customer sum can overflow the element
    # type, and a non-ANSI downcast would silently NULL it while the
    # DuckDB oracle keeps DECIMAL(38,4) full precision.
    rev = o.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        _dsum("o_totalprice").alias("revenue"),
        _dec_sum("o_totalprice").alias("rev_dec"),
    )
    cum = global_cumulative_sum(
        rev, "rev_dec", [F.col("revenue").desc(), F.col("c_custkey")], out_col="__cum"
    )
    total = rev.agg(F.sum("rev_dec").alias("__total"))
    out = cum.join(F.broadcast(total))
    cum_share = F.col("__cum").cast("double") / F.col("__total").cast("double")
    return out.select(
        "c_custkey",
        "revenue",
        F.when(cum_share <= 0.8, "A")
        .when(cum_share <= 0.95, "B")
        .otherwise("C")
        .alias("abc_class"),
    )


@query(
    "q107_copurchase_rules",
    f"""
    WITH items0 AS (
      SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem
    ),
    -- max_basket_size mirror (same contract as q97): numerators AND
    -- the confidence/lift denominators below all derive from the
    -- guarded population, exactly like association_metrics
    ok AS (SELECT b FROM items0 GROUP BY b HAVING COUNT(*) <= {MAX_BASKET_SIZE}),
    items AS (SELECT i0.b, i0.i FROM items0 i0 JOIN ok USING (b)),
    freq AS (SELECT i FROM items GROUP BY i HAVING COUNT(*) >= 2),
    p AS (SELECT * FROM items WHERE i IN (SELECT i FROM freq)),
    pairs AS (
      SELECT a.i AS ia, b.i AS ib, COUNT(*) AS nb
      FROM p a JOIN p b ON a.b = b.b AND a.i < b.i
      GROUP BY a.i, b.i HAVING COUNT(*) >= 2
    ),
    directed AS (
      SELECT ia AS antecedent, ib AS consequent, nb AS n_both FROM pairs
      UNION ALL
      SELECT ib, ia, nb FROM pairs
    ),
    itemn AS (SELECT i, COUNT(*) AS n FROM items GROUP BY i),
    tot AS (SELECT COUNT(DISTINCT b) AS nbask FROM items)
    SELECT d.antecedent, d.consequent,
           CAST(d.n_both AS BIGINT) AS n_both,
           CAST(na.n AS BIGINT) AS n_antecedent,
           CAST(d.n_both AS DOUBLE) / na.n AS confidence,
           (CAST(d.n_both AS DOUBLE) / na.n)
             / (CAST(nc.n AS DOUBLE) / tot.nbask) AS lift
    FROM directed d
    JOIN itemn na ON na.i = d.antecedent
    JOIN itemn nc ON nc.i = d.consequent
    CROSS JOIN tot
    """,
)
def q107_copurchase_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directional association rules over the q97 pair tier: confidence
    and lift from exact integer counts (bit-identical division in both
    engines) — lift separates genuine affinity from two independently
    popular parts."""
    from .operators.itemsets import association_metrics

    li = _t(spark, sf_dir, "lineitem")
    return association_metrics(
        li, "l_orderkey", "l_partkey", min_support=2,
        max_basket_size=MAX_BASKET_SIZE,
    )


@query(
    "q108_event_transition_matrix",
    """
    WITH pairs AS (
      SELECT event_type AS from_state,
             lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS to_state
      FROM events
    ),
    counts AS (
      SELECT from_state, to_state, COUNT(*) AS n_transitions
      FROM pairs WHERE to_state IS NOT NULL
      GROUP BY from_state, to_state
    )
    SELECT from_state, to_state,
           CAST(n_transitions AS BIGINT) AS n_transitions,
           CAST(n_transitions AS DOUBLE)
             / SUM(n_transitions) OVER (PARTITION BY from_state)
             AS probability
    FROM counts
    """,
)
def q108_event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-type transition matrix with row-normalized
    probabilities — next-action statistics from one window sort + a
    states²-sized aggregation; exact-integer ratio divisions are
    bit-identical cross-engine. event_id tiebreaks duplicate
    timestamps on BOTH sides — without a total order the transition
    counts are engine-dependent (composed differential axes)."""
    from .operators.funnel import transition_matrix

    return transition_matrix(
        _t(spark, sf_dir, "events"), "user_id", "ts", "event_type",
        tiebreak_cols=["event_id"],
    )


@query(
    "q109_overlap_join_binned",
    """
    WITH iv AS (
      SELECT o_custkey AS memnum, o_orderkey,
             CAST(o_orderdate AS DATE) AS begindt,
             CAST(o_orderdate AS DATE) + 30 AS enddt
      FROM orders
    )
    SELECT a.memnum, COUNT(*) AS n_overlapping_pairs
    FROM iv a JOIN iv b
      ON a.memnum = b.memnum AND a.o_orderkey < b.o_orderkey
     AND a.begindt <= b.enddt AND b.begindt <= a.enddt
    GROUP BY a.memnum
    """,
)
def q109_overlap_join_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SCALE PATH for interval-overlap joins (q23's theta join,
    reference: overlap_query_no_recursive_cte_needed.sql:7-17), promoted
    to its own hash-graded entry: intervals explode into 30-day time
    bins and the join equi-matches on (key, bin), so a hot key's K²
    per-reducer comparisons become co-binned pairs spread across the
    time axis — at 100× data volume this IS the join users run. The
    oracle is the plain theta join: identical answers is the claim.
    Exactly-once without a dedup shuffle: each overlapping pair is
    emitted only in the canonical bin of greatest(start_a, start_b)."""
    from .operators.intervals import overlap_self_join

    o = _t(spark, sf_dir, "orders")
    iv = o.select(
        F.col("o_custkey").alias("memnum"),
        "o_orderkey",
        F.to_date("o_orderdate").alias("begindt"),
        F.date_add(F.to_date("o_orderdate"), 30).alias("enddt"),
    )
    # self-join form: the hot-key guard aggregates the key population
    # ONCE (shared by both join branches via ReuseExchange) instead of
    # once per side
    joined = overlap_self_join(
        iv, "memnum", "begindt", "enddt", suffix="2", binned=True, bin_days=30
    ).filter(F.col("o_orderkey") < F.col("o_orderkey2"))
    return joined.groupBy("memnum").agg(
        F.count("*").alias("n_overlapping_pairs")
    )
