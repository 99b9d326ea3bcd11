"""DuckDB oracle-SQL builders for the hash-structured operators.

The catalog's correctness gate runs each Spark query against an ANSI-SQL
oracle on DuckDB. For minhash/simhash/hyperplane-LSH operators the oracle
must reproduce the FULL algorithm — candidate generation included — so
these builders emit SQL that recomputes the same signatures DuckDB-side
from the same portable md5-prefix hash (functions/hashing.py) and the
same driver-side hyperplane constants. Since both engines hash identical
UTF-8 bytes and fold identical IEEE doubles, the oracle output matches
the Spark output exactly, approximation and all — no "rows-only" checks.

Text parity notes (pinned by the gate at sf0.01):
- word tokens: Spark ``split(lower(text), '\\s+')`` == DuckDB
  ``string_split_regex(lower(text), '\\s+')``;
- word n-grams: Spark ``slice(ws, i+1, n)`` over i in 0..max(size-n, 0)
  == DuckDB ``w[i:i+n-1]`` over generate_series(1, greatest(len-n+1, 1))
  (both truncate the last grams of short docs the same way);
- 60-bit hash: ``conv(substr(md5(s),1,15),16,10)`` ==
  ``('0x'||substr(md5(s),1,15))::BIGINT``.
"""

from __future__ import annotations

import random

from .functions.hashing import sql_hash64, sql_hash64_seeded


def gauss_planes(n_planes: int, dim: int, seed: int) -> list[list[float]]:
    """Seeded random hyperplanes — driver-side constants shared verbatim by
    the Spark expression tree and the oracle SQL text."""
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def gauss_plane_tables(
    n_tables: int, n_planes: int, dim: int, seed: int
) -> list[list[list[float]]]:
    return [gauss_planes(n_planes, dim, seed + 1000 * t) for t in range(n_tables)]


def _sql_plane(plane: list[float]) -> str:
    return "[" + ", ".join(repr(float(x)) for x in plane) + "]::DOUBLE[]"


def sql_bucket_expr(vec_expr: str, planes: list[list[float]]) -> str:
    """Bucket id from sign bits: plane 0 is the MSB, matching the Spark
    ``hyperplane_bucket`` shiftleft fold."""
    n = len(planes)
    terms = [
        f"(CASE WHEN list_dot_product({vec_expr}, {_sql_plane(p)}) > 0"
        f" THEN {1 << (n - 1 - i)} ELSE 0 END)"
        for i, p in enumerate(planes)
    ]
    return "(" + " + ".join(terms) + ")"


def latest_event_per_ts_sql(src: str = "events") -> str:
    """One observation per (user_id, ts): the max-event_id row's value
    VERBATIM, NULL included — the shared dedup CTE body for the as-of
    entries (q49/q93). row_number, NOT DuckDB max_by: max_by SKIPS rows
    whose value argument is NULL while Spark's max_by RETURNS the NULL,
    so the same SQL shape answers differently per engine on a duplicate
    (user_id, ts) whose max-event_id row carries a NULL (composed
    differential axes; pinned by test_oracle_contracts).

    ``value DESC NULLS LAST`` is the final tiebreak (sf1-density gate):
    event_id itself duplicates under a bootstrap and the float/null axes
    differentiate the copies, so event_id alone is no longer a total
    order — among event_id ties the greatest value wins, NULL losing to
    any non-null, exactly Spark's ``max_by(value, struct(event_id,
    value))`` struct comparison (verified: null field loses at equal
    event_id, wins at higher event_id; NaN sorts greatest in both
    engines). ``+ 0.0`` canonicalizes the one residual tie, −0.0/+0.0
    (equal sort keys, different hash bits)."""
    return f"""SELECT user_id, ts, value + 0.0 AS value FROM (
        SELECT user_id, ts, value,
               row_number() OVER (PARTITION BY user_id, ts
                                  ORDER BY event_id DESC, value DESC NULLS LAST) AS rn
        FROM {src})
      WHERE rn = 1"""


def _grams_cte(table: str, id_col: str, text_col: str, n: int) -> str:
    """CTE producing (id, g) distinct word n-gram rows, matching
    ``operators.dedup.shingle_rows``."""
    return f"""
    toks AS (
      SELECT {id_col}, string_split_regex(lower({text_col}), '\\s+') AS w FROM {table}
    ),
    grams AS (
      SELECT {id_col},
             unnest(list_distinct([
               array_to_string(w[i:i+{n - 1}], ' ')
               FOR i IN generate_series(1, greatest(len(w)-{n - 1}, 1))
             ])) AS g
      FROM toks
    )"""


def minhash_lsh_pairs_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
) -> str:
    """Full MinHash+banded-LSH replication: signatures, band hashes,
    bucket join, est_jaccard — mirrors ``minhash_lsh_pairs(hash_how='portable')``.

    Signatures use the same double-hashing derivation as the Spark side
    (``dedup.MINHASH_P``): h_k = (h1 + k*h2) mod P from two seeded base
    hashes — 2 md5 calls per gram, identical BIGINT arithmetic in both
    engines (P < 2^56 so k*h2 never overflows)."""
    from .operators.dedup import MINHASH_P

    rpb = num_hashes // bands
    mins = ",\n             ".join(
        f"MIN((h1 + {k} * h2) % {MINHASH_P}) AS m{k}" for k in range(num_hashes)
    )
    band_structs = ", ".join(
        "{'band': %d, 'bh': %s}"
        % (b, sql_hash64("concat_ws(','," + ",".join(f"m{b * rpb + j}" for j in range(rpb)) + ")"))
        for b in range(bands)
    )
    matches = " + ".join(
        f"(CASE WHEN sa.m{k} = sb.m{k} THEN 1 ELSE 0 END)" for k in range(num_hashes)
    )
    return f"""
    WITH {_grams_cte(table, id_col, "text", shingle_n)},
    based AS (
      SELECT {id_col},
             {sql_hash64_seeded('g', 0)} % {MINHASH_P} AS h1,
             {sql_hash64_seeded('g', 1)} % {MINHASH_P} AS h2
      FROM grams
    ),
    sigs AS (
      SELECT {id_col}, {mins}
      FROM based GROUP BY {id_col}
    ),
    banded AS (
      SELECT {id_col}, unnest([{band_structs}], recursive := true) FROM sigs
    ),
    cand AS (
      SELECT DISTINCT a.{id_col} AS id_a, b.{id_col} AS id_b
      FROM banded a JOIN banded b ON a.band = b.band AND a.bh = b.bh
                                  AND a.{id_col} < b.{id_col}
    )
    SELECT cand.id_a, cand.id_b,
           CAST({matches} AS DOUBLE) / CAST({num_hashes} AS DOUBLE) AS est_jaccard
    FROM cand
    JOIN sigs sa ON sa.{id_col} = cand.id_a
    JOIN sigs sb ON sb.{id_col} = cand.id_b
    """


def minhash_components_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
) -> str:
    """Duplicate-cluster replication: the full minhash+LSH candidate
    pipeline, then connected components as min-reachable-id via a
    recursive CTE — mirrors ``duplicate_components(minhash_lsh_pairs(...,
    hash_how='portable'))``."""
    from .operators.dedup import MINHASH_P

    rpb = num_hashes // bands
    mins = ",\n             ".join(
        f"MIN((h1 + {k} * h2) % {MINHASH_P}) AS m{k}" for k in range(num_hashes)
    )
    band_structs = ", ".join(
        "{'band': %d, 'bh': %s}"
        % (b, sql_hash64("concat_ws(','," + ",".join(f"m{b * rpb + j}" for j in range(rpb)) + ")"))
        for b in range(bands)
    )
    return f"""
    WITH RECURSIVE {_grams_cte(table, id_col, "text", shingle_n)},
    based AS (
      SELECT {id_col},
             {sql_hash64_seeded('g', 0)} % {MINHASH_P} AS h1,
             {sql_hash64_seeded('g', 1)} % {MINHASH_P} AS h2
      FROM grams
    ),
    sigs AS (
      SELECT {id_col}, {mins}
      FROM based GROUP BY {id_col}
    ),
    banded AS (
      SELECT {id_col}, unnest([{band_structs}], recursive := true) FROM sigs
    ),
    cand AS (
      SELECT DISTINCT a.{id_col} AS id_a, b.{id_col} AS id_b
      FROM banded a JOIN banded b ON a.band = b.band AND a.bh = b.bh
                                  AND a.{id_col} < b.{id_col}
    ),
    edges AS (
      SELECT id_a AS id, id_b AS nbr FROM cand
      UNION ALL
      SELECT id_b AS id, id_a AS nbr FROM cand
    ),
    reach(id, r) AS (
      SELECT DISTINCT id, id FROM edges
      UNION
      SELECT e.nbr, reach.r FROM reach JOIN edges e ON e.id = reach.id
    )
    SELECT id, MIN(r) AS component FROM reach GROUP BY id
    """


def simhash_pairs_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    num_bits: int = 60,
    bands: int = 4,
    max_hamming: int = 6,
    shingle_n: int = 2,
) -> str:
    """Full SimHash replication: per-gram hash, ±1 bit votes, sign-folded
    fingerprint, pigeonhole banding, exact hamming — mirrors
    ``simhash_pairs(num_bits=60, hash_how='portable')``."""
    width = num_bits // bands
    votes = ",\n             ".join(
        f"SUM(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS v{i}"
        for i in range(num_bits)
    )
    fp = " + ".join(
        f"(CASE WHEN v{i} > 0 THEN (1::BIGINT << {num_bits - 1 - i}) ELSE 0::BIGINT END)"
        for i in range(num_bits)
    )
    chunk_structs = ", ".join(
        "{'band': %d, 'chunk': (fp >> %d) & %d}" % (b, b * width, (1 << width) - 1)
        for b in range(bands)
    )
    return f"""
    WITH {_grams_cte(table, id_col, "text", shingle_n)},
    hs AS (SELECT {id_col}, {sql_hash64("g")} AS h FROM grams),
    votes AS (
      SELECT {id_col}, {votes}
      FROM hs GROUP BY {id_col}
    ),
    fps AS (SELECT {id_col}, ({fp}) AS fp FROM votes),
    banded AS (
      SELECT {id_col}, fp, unnest([{chunk_structs}], recursive := true) FROM fps
    )
    SELECT DISTINCT a.{id_col} AS id_a, b.{id_col} AS id_b,
           CAST(bit_count(xor(a.fp, b.fp)) AS BIGINT) AS hamming
    FROM banded a JOIN banded b ON a.band = b.band AND a.chunk = b.chunk
                                AND a.{id_col} < b.{id_col}
    WHERE bit_count(xor(a.fp, b.fp)) <= {max_hamming}
    """


def lsh_topk_sql(planes: list[list[float]], k: int = 10, query_max_id: int = 5) -> str:
    """Hyperplane-LSH top-k replication over the embeddings table."""
    bucket = sql_bucket_expr("v", planes)
    return f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    b AS (SELECT vec_id, v, {bucket} AS bkt FROM e),
    q AS (SELECT vec_id AS query_id, v AS qv, bkt AS qbkt FROM b WHERE vec_id < {query_max_id}),
    scored AS (
      SELECT q.query_id, b.vec_id,
             list_dot_product(b.v, q.qv) /
             (sqrt(list_dot_product(b.v, b.v)) * sqrt(list_dot_product(q.qv, q.qv))) AS sim
      FROM b JOIN q ON b.bkt = q.qbkt
      WHERE b.vec_id <> q.query_id
    )
    SELECT query_id, vec_id, CAST(CAST(sim AS DECIMAL(10,6)) AS DOUBLE) AS cosine_sim, rank
    FROM (
      SELECT query_id, vec_id, sim,
             ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rank
      FROM scored
    ) WHERE rank <= {k}
    """


def embedding_dedup_lsh_sql(
    planes_tables: list[list[list[float]]], threshold: float
) -> str:
    """Multi-table hyperplane-LSH dedup replication: per-table buckets,
    candidate union, exact cosine verification at ``threshold``."""
    tb_structs = ", ".join(
        "{'t': %d, 'bkt': %s}" % (t, sql_bucket_expr("v", planes))
        for t, planes in enumerate(planes_tables)
    )
    return f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    tb AS (SELECT vec_id, unnest([{tb_structs}], recursive := true) FROM e),
    cand AS (
      SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
      FROM tb a JOIN tb b ON a.t = b.t AND a.bkt = b.bkt AND a.vec_id < b.vec_id
    ),
    verified AS (
      SELECT cand.id_a, cand.id_b,
             list_dot_product(ea.v, eb.v) /
             (sqrt(list_dot_product(ea.v, ea.v)) * sqrt(list_dot_product(eb.v, eb.v))) AS sim
      FROM cand JOIN e ea ON ea.vec_id = cand.id_a
                JOIN e eb ON eb.vec_id = cand.id_b
    )
    SELECT id_a, id_b, CAST(CAST(sim AS DECIMAL(10,6)) AS DOUBLE) AS cosine_sim
    FROM verified WHERE sim >= {threshold!r}
    """


def dedup_against_corpus_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    new_pred: str = "doc_id % 2 = 1",
    existing_pred: str = "doc_id % 2 = 0",
) -> str:
    """Cross-corpus dedup replication: same signatures/bands as
    ``minhash_lsh_pairs_sql`` (per-doc computation is side-independent),
    then NEW docs sharing any band bucket with an EXISTING doc are
    dropped — mirrors ``dedup.dedup_against_corpus(hash_how='portable')``."""
    from .operators.dedup import MINHASH_P

    rpb = num_hashes // bands
    mins = ",\n             ".join(
        f"MIN((h1 + {k} * h2) % {MINHASH_P}) AS m{k}" for k in range(num_hashes)
    )
    band_structs = ", ".join(
        "{'band': %d, 'bh': %s}"
        % (b, sql_hash64("concat_ws(','," + ",".join(f"m{b * rpb + j}" for j in range(rpb)) + ")"))
        for b in range(bands)
    )
    return f"""
    WITH {_grams_cte(table, id_col, "text", shingle_n)},
    based AS (
      SELECT {id_col},
             {sql_hash64_seeded('g', 0)} % {MINHASH_P} AS h1,
             {sql_hash64_seeded('g', 1)} % {MINHASH_P} AS h2
      FROM grams
    ),
    sigs AS (
      SELECT {id_col}, {mins}
      FROM based GROUP BY {id_col}
    ),
    banded AS (
      SELECT {id_col}, unnest([{band_structs}], recursive := true) FROM sigs
    ),
    matched AS (
      SELECT DISTINCT n.{id_col}
      FROM banded n JOIN banded e ON n.band = e.band AND n.bh = e.bh
      WHERE n.{id_col} IN (SELECT {id_col} FROM {table} WHERE {new_pred})
        AND e.{id_col} IN (SELECT {id_col} FROM {table} WHERE {existing_pred})
    )
    SELECT d.{id_col}, d.n_chars
    FROM {table} d
    WHERE {new_pred}
      AND d.{id_col} NOT IN (SELECT {id_col} FROM matched)
    """


def tfidf_sql(table: str = "documents", id_col: str = "doc_id", k: int = 3) -> str:
    """TF-IDF top-terms replication: same tokens, smooth-idf formula and
    DECIMAL(18,6)-rounded score as ``ranking.tfidf_top_terms``."""
    return rf"""
    WITH toks AS (
      SELECT {id_col},
             unnest(string_split_regex(lower(trim(text)), '\s+')) AS t
      FROM {table}
    ),
    tf AS (SELECT {id_col}, t, COUNT(*) AS tf FROM toks GROUP BY {id_col}, t),
    vocab AS (SELECT t, COUNT(*) AS df FROM tf GROUP BY t),
    tot AS (SELECT COUNT(DISTINCT {id_col}) AS n FROM tf),
    scored AS (
      SELECT {id_col}, t AS term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
             CAST(CAST(tf * (ln((n + 1.0::DOUBLE) / (df + 1.0::DOUBLE)) + 1.0::DOUBLE)
                  AS DECIMAL(18,6)) AS DOUBLE) AS score
      FROM tf JOIN vocab USING (t) CROSS JOIN tot
    )
    SELECT {id_col}, term, tf, df, score, CAST(rank AS INTEGER) AS rank
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY {id_col} ORDER BY score DESC, term ASC) AS rank
      FROM scored
    ) WHERE rank <= {k}
    """


def bm25_sql(
    query_terms: list[str],
    table: str = "documents",
    id_col: str = "doc_id",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """BM25 top-k replication: mirrors ``ranking.bm25_topk`` term by term
    — identical operation order inside the score expression, sum rounded
    through DECIMAL(18,6) before ranking."""
    terms = ", ".join(f"'{t}'" for t in sorted(set(query_terms)))
    c_k1p1 = f"({k1 + 1.0!r}::DOUBLE)"
    c_k1 = f"({k1!r}::DOUBLE)"
    c_1mb = f"({1.0 - b!r}::DOUBLE)"
    c_b = f"({b!r}::DOUBLE)"
    return rf"""
    WITH lens AS (
      SELECT {id_col},
             len(string_split_regex(lower(trim(text)), '\s+')) AS dl
      FROM {table}
    ),
    tot AS (SELECT COUNT(*) AS n, CAST(SUM(dl) AS BIGINT) AS sumdl FROM lens),
    toks AS (
      SELECT {id_col},
             unnest(string_split_regex(lower(trim(text)), '\s+')) AS t
      FROM {table}
    ),
    tf AS (
      SELECT {id_col}, t, COUNT(*) AS tf FROM toks
      WHERE t IN ({terms}) GROUP BY {id_col}, t
    ),
    dfq AS (SELECT t, COUNT(*) AS df FROM tf GROUP BY t),
    scored AS (
      SELECT tf.{id_col} AS {id_col},
             CAST(CAST(SUM(
               ln(1.0::DOUBLE + (n - df + 0.5::DOUBLE) / (df + 0.5::DOUBLE))
               * ((tf * {c_k1p1})
                  / (tf + {c_k1} * ({c_1mb} + ({c_b} * dl) / (sumdl / CAST(n AS DOUBLE)))))
             ) AS DECIMAL(18,6)) AS DOUBLE) AS score
      FROM tf JOIN dfq USING (t) JOIN lens USING ({id_col}) CROSS JOIN tot
      GROUP BY tf.{id_col}
    )
    SELECT {id_col}, score, CAST(rank AS INTEGER) AS rank
    FROM (
      SELECT *, ROW_NUMBER() OVER (ORDER BY score DESC, {id_col} ASC) AS rank
      FROM scored
    ) WHERE rank <= {k}
    """


def _sq_l2_chain(vec_expr: str, centroid: list[float]) -> str:
    """Explicit left-associated squared-L2 chain — identical fp addition
    order to the Spark ``F.aggregate`` fold in ``_nearest_centroids``."""
    terms = [
        f"(({vec_expr}[{i + 1}] - ({x!r}::DOUBLE)) * ({vec_expr}[{i + 1}] - ({x!r}::DOUBLE)))"
        for i, x in enumerate(centroid)
    ]
    return "(" + " + ".join(terms) + ")"


def semantic_dedup_sql(
    centroids: list[list[float]], threshold: float, table: str = "embeddings"
) -> str:
    """SemDeDup replication: nearest-centroid assignment (squared L2,
    ties to the lowest centroid id — the Spark array_sort tie-break),
    in-cluster pairs, exact cosine at ``threshold``."""
    k = len(centroids)
    dist_cols = ",\n             ".join(
        f"{_sq_l2_chain('v', c)} AS d{i}" for i, c in enumerate(centroids)
    )
    # argmin with lowest-index tie-break: centroid i wins iff d_i <= d_j
    # for every j > i and d_i < d_j for no earlier j (CASE order handles it)
    branches = []
    for i in range(k - 1):
        conds = " AND ".join(f"d{i} <= d{j}" for j in range(i + 1, k))
        branches.append(f"WHEN {conds} THEN {i}")
    case = "CASE " + " ".join(branches) + f" ELSE {k - 1} END"
    return f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM {table}),
    d AS (
      SELECT vec_id, v,
             {dist_cols}
      FROM e
    ),
    assigned AS (SELECT vec_id, v, {case} AS cluster FROM d),
    pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.cluster AS cluster,
             list_dot_product(a.v, b.v) /
             (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) AS sim
      FROM assigned a JOIN assigned b
        ON a.cluster = b.cluster AND a.vec_id < b.vec_id
    )
    SELECT id_a, id_b, cluster,
           CAST(CAST(sim AS DECIMAL(10,6)) AS DOUBLE) AS cosine_sim
    FROM pairs WHERE sim >= {threshold!r}
    """


def bm25_batch_sql(
    queries: list[tuple[int, str]],
    table: str = "documents",
    id_col: str = "doc_id",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """Batch-BM25 replication: ``ranking.bm25_topk_batch`` with the query
    table pinned as VALUES — same score expression and DECIMAL rounding
    as ``bm25_sql``, ranked per query."""
    # Escape embedded single quotes: a query containing an apostrophe
    # must not break the generated VALUES literal.
    values = ", ".join(
        "({}, '{}')".format(qid, text.replace("'", "''")) for qid, text in queries
    )
    c_k1p1 = f"({k1 + 1.0!r}::DOUBLE)"
    c_k1 = f"({k1!r}::DOUBLE)"
    c_1mb = f"({1.0 - b!r}::DOUBLE)"
    c_b = f"({b!r}::DOUBLE)"
    return rf"""
    WITH q(query_id, query_text) AS (VALUES {values}),
    qt AS (
      SELECT query_id,
             unnest(list_distinct(string_split_regex(lower(trim(query_text)), '\s+'))) AS t
      FROM q
    ),
    lens AS (
      SELECT {id_col},
             len(string_split_regex(lower(trim(text)), '\s+')) AS dl
      FROM {table}
    ),
    tot AS (SELECT COUNT(*) AS n, CAST(SUM(dl) AS BIGINT) AS sumdl FROM lens),
    toks AS (
      SELECT {id_col},
             unnest(string_split_regex(lower(trim(text)), '\s+')) AS t
      FROM {table}
    ),
    tf AS (
      SELECT {id_col}, t, COUNT(*) AS tf FROM toks
      WHERE t IN (SELECT t FROM qt) GROUP BY {id_col}, t
    ),
    dfq AS (SELECT t, COUNT(*) AS df FROM tf GROUP BY t),
    scored AS (
      SELECT qt.query_id AS query_id, tf.{id_col} AS {id_col},
             CAST(CAST(SUM(
               ln(1.0::DOUBLE + (n - df + 0.5::DOUBLE) / (df + 0.5::DOUBLE))
               * ((tf * {c_k1p1})
                  / (tf + {c_k1} * ({c_1mb} + ({c_b} * dl) / (sumdl / CAST(n AS DOUBLE)))))
             ) AS DECIMAL(18,6)) AS DOUBLE) AS score
      FROM tf JOIN dfq USING (t) JOIN qt USING (t)
           JOIN lens USING ({id_col}) CROSS JOIN tot
      GROUP BY qt.query_id, tf.{id_col}
    )
    SELECT query_id, {id_col}, score, CAST(rank AS INTEGER) AS rank
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY score DESC, {id_col} ASC
      ) AS rank
      FROM scored
    ) WHERE rank <= {k}
    """
