"""Text-analysis operators for training-data pipelines: token counting,
quality scoring, language ID, document fingerprinting.

LLM-pipeline extension (BASELINE.json north star). Everything is built-in
``pyspark.sql.functions`` expressions — regex, split, aggregate — so the
whole module is narrow projections that fuse into the scan stage; zero
shuffles, zero Python UDFs.
"""

from __future__ import annotations

import pandas as pd  # module scope: pandas_udf type hints resolve at def time

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..cache import persist_internal

from ..functions.hashing import hash64

# A small multilingual stopword sample per language for the n-gram/stopword
# language heuristic. Public knowledge lists (top function words).
_LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "a"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit", "für", "auf"],
    "fr": ["le", "la", "les", "et", "des", "est", "pas", "pour", "dans", "une"],
    "es": ["el", "la", "los", "que", "de", "es", "por", "con", "para", "una"],
}

# BPE-ish tokenizer regex: words, numbers, or single non-space symbols —
# a public approximation of GPT-style pre-tokenization.
TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]"


def token_count(text_col: str | Column) -> Column:
    """Whitespace token count (size of split)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.size(F.split(F.trim(c), r"\s+"))


def bpe_token_count(text_col: str | Column) -> Column:
    """BPE-ish token count: number of TOKEN_REGEX matches."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.size(F.regexp_extract_all(c, F.lit(TOKEN_REGEX), 0))


def quality_features(
    df: DataFrame, text_col: str = "text", round_digits: int | None = 6
) -> DataFrame:
    """Add standard quality-score features: length, token count, mean word
    length, punctuation ratio, stopword ratio, uppercase ratio.

    ``round_digits=None`` leaves ratios unrounded — required when an oracle
    recomputes them (both engines produce identical IEEE doubles from the
    same integer divisions, whereas round() implementations may differ in
    the last ulp)."""
    c = F.col(text_col)

    def _r(col: Column) -> Column:
        return F.round(col, round_digits) if round_digits is not None else col

    n_chars = F.length(c)
    tokens = F.split(F.lower(F.trim(c)), r"\s+")
    n_tokens = F.size(tokens)
    stop = F.array(*[F.lit(w) for w in _LANG_MARKERS["en"]])
    n_stop = F.size(F.filter(tokens, lambda t: F.array_contains(stop, t)))
    n_punct = F.length(F.regexp_replace(c, r"[^\.,;:!\?'\"]", ""))
    n_upper = F.length(F.regexp_replace(c, r"[^A-Z]", ""))
    return (
        df.withColumn("n_chars_calc", n_chars)
        .withColumn("n_tokens", n_tokens)
        .withColumn("mean_word_len", (n_chars - n_tokens + 1) / n_tokens)
        .withColumn("punct_ratio", _r(n_punct / F.nullif(n_chars, F.lit(0))))
        .withColumn("stopword_ratio", _r(n_stop / F.nullif(n_tokens, F.lit(0))))
        .withColumn("upper_ratio", _r(n_upper / F.nullif(n_chars, F.lit(0))))
    )


def quality_score(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "quality",
    round_digits: int | None = 6,
) -> DataFrame:
    """Composite heuristic quality score in [0,1]: rewards stopword presence
    and moderate length; penalizes punctuation soup and shouting."""
    feats = quality_features(df, text_col, round_digits)
    score = (
        F.least(F.col("n_tokens") / 50.0, F.lit(1.0)) * 0.4
        + F.least(F.col("stopword_ratio") * 5.0, F.lit(1.0)) * 0.3
        + (1.0 - F.least(F.col("punct_ratio") * 5.0, F.lit(1.0))) * 0.2
        + (1.0 - F.least(F.col("upper_ratio") * 5.0, F.lit(1.0))) * 0.1
    )
    return feats.withColumn(
        out_col, F.round(score, round_digits) if round_digits is not None else score
    )


def lang_id(df: DataFrame, text_col: str = "text", out_col: str = "lang_pred") -> DataFrame:
    """Heuristic language ID: count marker-stopword hits per language, pick
    the argmax (ties → 'und'). Pure array expressions, no UDF."""
    tokens = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    scores = []
    for lang, markers in _LANG_MARKERS.items():
        arr = F.array(*[F.lit(w) for w in markers])
        scores.append(
            F.struct(
                F.size(F.filter(tokens, lambda t: F.array_contains(arr, t))).alias("hits"),
                F.lit(lang).alias("lang"),
            )
        )
    best = F.array_max(F.array(*scores))
    return df.withColumn(
        out_col, F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))
    )


# PII patterns (public-knowledge regexes; conservative by design — a
# training-data scrubber prefers false positives over leaked PII).
_PII_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b(?:\+?\d{1,3}[-. ])?(?:\(\d{3}\)|\d{3})[-. ]\d{3}[-. ]\d{4}\b", "<PHONE>"),
    (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
]


def redact_pii(df: DataFrame, text_col: str = "text", out_col: str | None = None) -> DataFrame:
    """Replace emails / phone numbers / IPv4s / SSN-shaped tokens with
    typed placeholders — the standard scrub pass before a corpus becomes
    training data. A chain of JVM-side ``regexp_replace`` projections:
    fuses into the scan, zero shuffles, order fixed so overlapping
    matches resolve deterministically (emails before phones so the
    digits inside an address never half-match)."""
    c = F.col(text_col)
    for pattern, placeholder in _PII_PATTERNS:
        c = F.regexp_replace(c, pattern, placeholder)
    return df.withColumn(out_col or text_col, c)


def repetition_ratios(
    df: DataFrame, text_col: str = "text", ngram: int = 2
) -> DataFrame:
    """Repetition quality signals (public Gopher-style rules): fraction of
    duplicate lines and fraction of tokens inside duplicate word n-grams.
    High values flag boilerplate/spam for filtering before training.

    Pure array expressions per row — size(arr) − size(array_distinct(arr))
    counts duplicates without any explode/shuffle."""
    lines = F.split(F.col(text_col), r"\n")
    dup_lines = F.size(lines) - F.size(F.array_distinct(lines))
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - ngram, F.lit(0))),
        lambda i: F.array_join(F.slice(toks, i + 1, ngram), " "),
    )
    dup_grams = F.size(grams) - F.size(F.array_distinct(grams))
    return df.withColumn(
        "dup_line_ratio", dup_lines / F.nullif(F.size(lines), F.lit(0))
    ).withColumn("dup_ngram_ratio", dup_grams / F.nullif(F.size(grams), F.lit(0)))


def doc_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "fingerprint",
    window: int = 8,
    hash_how: str = "xxhash64",
) -> DataFrame:
    """Rolling-hash document fingerprint: min hash over character
    ``window``-grams (winnowing-style robust fingerprint). Identical up to
    small edits far from the minimizing gram."""
    c = F.col(text_col)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(c) - window + 1, F.lit(1))),
        lambda i: hash64(c.substr(i, F.lit(window)), how=hash_how),
    )
    return df.withColumn(out_col, F.array_min(grams))


def unigram_surprisal(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    smoothing: float = 1.0,
) -> DataFrame:
    """Unigram-LM quality signal: each document's mean surprisal
    (−log2 p(token)) under the CORPUS unigram distribution, add-k
    smoothed — the simplified public form of the perplexity filters
    (KenLM-style) that corpus curation runs before training. High values
    flag garbled/unusual token streams; unusually low values flag
    boilerplate.

    Two passes, both shuffle-light at 100 TB: pass 1 aggregates token
    counts (map-side combine → shuffle carries one row per distinct
    token per partition); pass 2 joins the exploded tokens to the vocab
    on the token key (AQE broadcasts the vocab when it fits — typical
    corpus vocabularies do) and averages per doc. Returns
    (id, n_tokens, mean_surprisal).
    """
    from .balance import ensure_parallelism

    df = ensure_parallelism(df)
    # Multi-consumer persists (the ranking.py tf pattern): the exploded
    # token stream feeds the vocab aggregation AND the scoring join, and
    # the vocab feeds the totals action AND the join — without the
    # persists the corpus re-tokenizes per consumer and the vocab
    # aggregation runs twice (4 source scans measured in the plan).
    toks = df.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("__t"),
    ).transform(persist_internal)
    vocab = (
        toks.groupBy("__t")
        .agg(F.count("*").alias("__c"))
        .transform(persist_internal)
    )
    # totals ride a broadcast 1-row aggregate (the tfidf pattern), NOT a
    # driver-side .first(): the eager form ran a full tokenize+vocab job
    # at PLAN-BUILD time — a second job round trip per call (measured
    # ~1.2 s of q67's bench wall) — where the lazy crossJoin folds it
    # into the one real job (r14, guide §1.2). The arithmetic sequence
    # is unchanged: double(n) + smoothing·double(v) is exactly the
    # Python float(n_total + smoothing * v_size) the literal computed,
    # and greatest(·, 1.0) mirrors the old max(denom, 1.0) — on an
    # empty corpus SUM is NULL, greatest ignores it, and the join is
    # empty anyway.
    totals = vocab.agg(F.sum("__c").alias("__n"), F.count("*").alias("__v"))
    denom = F.greatest(
        F.col("__n").cast("double")
        + F.lit(float(smoothing)) * F.col("__v").cast("double"),
        F.lit(1.0),
    )
    surprisal = -F.log2((F.col("__c") + F.lit(float(smoothing))) / denom)
    return (
        toks.join(vocab, "__t")
        .crossJoin(F.broadcast(totals))
        .select(F.col(id_col), surprisal.alias("__s"))
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.avg("__s").alias("mean_surprisal"),
        )
    )


def bigram_surprisal(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    smoothing: float = 1.0,
) -> DataFrame:
    """Bigram-LM mean surprisal per document: −log2 p(cur|prev) under
    the corpus bigram distribution, add-k smoothed over the unigram
    vocabulary — one order up from ``unigram_surprisal``, the next rung
    of the KenLM-style perplexity quality ladder (context-aware: catches
    word-salad that unigram statistics score as normal).

    Bigrams build per row (transform over the token array — no
    self-join, zero extra shuffle for construction); the count tables
    (bigram, context) derive from ONE aggregation chain with map-side
    combine, and the context counts derive from the bigram table —
    the corpus explodes once. Documents with fewer than two tokens have
    no bigrams and are absent from the output (their perplexity is
    undefined). Returns (id, n_bigrams, mean_surprisal).
    """
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - 1),
        lambda i: F.struct(
            F.element_at(toks, i).alias("p"),
            F.element_at(toks, i + 1).alias("c"),
        ),
    )
    from .balance import ensure_parallelism

    df = ensure_parallelism(df)
    # ex feeds the bigram-count chain AND the scoring join; c2 feeds
    # c1, v, and the join — persist both or the corpus re-explodes per
    # consumer (4 source scans measured). Same multi-consumer pattern
    # as unigram_surprisal / ranking.py.
    ex = (
        df.filter(F.size(toks) >= 2)
        .select(F.col(id_col), F.explode(grams).alias("g"))
        .select(id_col, F.col("g.p").alias("__p"), F.col("g.c").alias("__c"))
    ).transform(persist_internal)
    c2 = (
        ex.groupBy("__p", "__c")
        .agg(F.count("*").alias("__n2"))
        .transform(persist_internal)
    )
    c1 = c2.groupBy("__p").agg(F.sum("__n2").alias("__n1"))
    v = c2.agg(F.countDistinct("__c").alias("__vs"))
    k = float(smoothing)
    surprisal = -F.log2(
        (F.col("__n2") + F.lit(k))
        / (F.col("__n1") + F.lit(k) * F.col("__vs"))
    )
    return (
        ex.join(c2, ["__p", "__c"])
        .join(c1, "__p")
        .crossJoin(F.broadcast(v))
        .select(F.col(id_col), surprisal.alias("__s"))
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_bigrams"),
            F.avg("__s").alias("mean_surprisal"),
        )
    )


def winnowing_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    w: int = 4,
    hash_how: str = "xxhash64",
) -> DataFrame:
    """Full winnowing fingerprint selection (Schleimer, Wilkerson, Aiken,
    SIGMOD 2003 — the MOSS algorithm): hash every character ``k``-gram,
    then keep the minimum hash of every ``w``-length window of
    consecutive gram hashes. The selected set carries winnowing's
    GUARANTEE: any verbatim match of length >= w + k - 1 characters
    between two documents shares at least one fingerprint — the
    coverage property ``doc_fingerprints``'s single global min (a
    whole-document robust id) does not have. Shared fingerprints are
    near-dup/plagiarism candidates via a plain groupBy on the value.

    Returns exploded (id, fp) rows, deduplicated per document.

    Scale shape: gram hashing and window minima are narrow column
    expressions per document — zero shuffles until the caller groups by
    fingerprint, and that shuffle carries (8-byte fp, id) pairs.
    CRITICAL: the gram-hash array is MATERIALIZED into a column before
    the window-min pass. Interpreted higher-order-function lambdas do
    not common-subexpression-eliminate, so referencing the hash
    expression inside the window lambda recomputes the FULL array at
    every window position — O(len²·w) per doc, measured 125× slower
    (62.7 s vs 0.5 s at sf0.01) for identical output. With the
    materialization the pass is O(len·w) interpreted ops per doc,
    matching the MOSS paper's amortized-linear bound. For book-length
    documents use ``winnowing_fingerprints_exploded`` (gram rows + a
    pos-RANGE window min), which never builds a per-doc array at all.
    """
    from ..functions.hashing import hash64
    from .balance import ensure_parallelism

    df = ensure_parallelism(df)
    c = F.col(text_col)
    hashes = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(c) - (k - 1), F.lit(1))),
        lambda i: hash64(c.substr(i, F.lit(k)), how=hash_how),
    )
    # Materialize once per row; the window-min lambda below must only
    # reference the materialized column, never the `hashes` expression.
    h = F.col("__winnow_h")
    fps = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(h) - (w - 1), F.lit(1))),
            lambda j: F.array_min(F.slice(h, j, w)),
        )
    )
    return (
        df.select(F.col(id_col), hashes.alias("__winnow_h"))
        .select(F.col(id_col), F.explode(fps).alias("fp"))
    )


def winnowing_fingerprints_exploded(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    w: int = 4,
    hash_how: str = "xxhash64",
) -> DataFrame:
    """Winnowing via exploded gram rows + a positional RANGE-window min —
    the book-length-document path. Identical output to
    ``winnowing_fingerprints`` (property-tested equal); trades the
    per-row array build for an explode + per-doc window sort, so a
    single 10 MB document never materializes a multi-million-element
    array in one row. The window is ``partitionBy(id).orderBy(pos)
    .rowsBetween(0, w-1)`` — one sort per partition keyed by (id, pos),
    streaming min over a w-row frame, no shuffle beyond the explode's
    natural partitioning (the window repartitions by id once).
    """
    from pyspark.sql import Window

    from ..functions.hashing import hash64
    from .balance import ensure_parallelism

    df = ensure_parallelism(df)
    c = F.col(text_col)
    grams = df.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.greatest(F.length(c) - (k - 1), F.lit(1))),
                lambda i: hash64(c.substr(i, F.lit(k)), how=hash_how),
            )
        ).alias("__pos", "__gh"),
    )
    win = Window.partitionBy(id_col).orderBy("__pos").rowsBetween(0, w - 1)
    n_win = Window.partitionBy(id_col)
    return (
        grams.withColumn("__fp", F.min("__gh").over(win))
        .withColumn("__n", F.count("*").over(n_win))
        # posexplode positions are 0-based: valid w-length window starts
        # are 0..n-w; when the doc has fewer than w grams the single
        # clamped frame at pos 0 keeps the global min (matching the
        # array path's clamped slice).
        .filter(F.col("__pos") <= F.greatest(F.col("__n") - w, F.lit(0)))
        .select(F.col(id_col), F.col("__fp").alias("fp"))
        .distinct()
    )


def normalize_text(
    df: DataFrame,
    text_col: str = "text",
    out_col: str | None = None,
    form: str = "NFC",
    strip_controls: bool = True,
    squeeze_whitespace: bool = True,
) -> DataFrame:
    """Unicode-normalize a text column: canonical/compatibility
    normalization (``form`` in NFC/NFKC/NFD/NFKD) plus optional control-
    character stripping and whitespace squeezing — the first pass of any
    web-corpus pipeline (mixed composed/decomposed accents, zero-width
    junk, and tab/newline soup otherwise defeat every downstream
    hash-based dedup: 'café' ≠ 'café' to xxhash64 unless both sides
    normalized first).

    The normalization itself is a Pandas UDF — one of the few JUSTIFIED
    Python hops in this engine: Spark has no built-in UNICODE_NORM
    expression, and the Arrow-batched ``Series.str.normalize`` applies
    the same Unicode tables C-side per batch. Cross-validated against
    DuckDB's independent ``nfc_normalize`` implementation (oracle q98).
    Control stripping and whitespace squeezing stay JVM-side
    (``regexp_replace``) and fuse into the scan.
    """
    from pyspark.sql.functions import pandas_udf

    if form not in ("NFC", "NFKC", "NFD", "NFKD"):
        raise ValueError(f"unknown normalization form: {form!r}")

    @pandas_udf("string")
    def _norm(s: pd.Series) -> pd.Series:
        return s.str.normalize(form)

    c = _norm(F.col(text_col))
    if strip_controls:
        c = F.regexp_replace(c, r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]", "")
    if squeeze_whitespace:
        c = F.trim(F.regexp_replace(c, r"\s+", " "))
    return df.withColumn(out_col or text_col, c)


def compression_ratio(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "compression_ratio",
    level: int = 6,
) -> DataFrame:
    """Per-document zlib compression ratio (compressed/raw bytes) — the
    classic cheap proxy for templated or degenerate text: boilerplate
    and repeated spans compress far below natural prose, keyboard-mash
    entropy compresses barely at all, so both tails of the ratio are
    removal candidates (used alongside the Gopher repetition ratios,
    which see only exact line/n-gram repeats — zlib sees long-range and
    approximate structure too).

    Arrow-batched pandas UDF (a justified Python hop: Spark exposes no
    compression expression); empty/NULL texts get ratio NULL rather
    than a fake number. The ``level`` is pinned per corpus — ratios are
    only comparable within one level.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _ratio(s: pd.Series) -> pd.Series:
        import zlib

        def one(t):
            if t is None or len(t) == 0:
                return None
            raw = t.encode("utf-8")
            return len(zlib.compress(raw, level)) / len(raw)

        return s.map(one)

    return df.withColumn(out_col, _ratio(F.col(text_col)))
