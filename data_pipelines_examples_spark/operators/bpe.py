"""Distributed BPE tokenizer training and application.

LLM-pipeline extension (BASELINE.json north star): the byte-pair-
encoding loop (Sennrich et al. 2016, arXiv:1508.07909 — the public
algorithm behind GPT-style tokenizers) expressed Spark-first.

The classic formulation is a driver loop, and that's what it stays —
each merge decision is a GLOBAL argmax, inherently sequential — but
every step runs on the right table: pair counting and merging operate
on the WORD VOCABULARY (distinct words × frequency), never the corpus.
The corpus is scanned exactly once (word counts); after that, each of
the n_merges iterations is one shuffle over the vocab table, which is
orders of magnitude smaller than the corpus at any scale (the standard
trick every public BPE trainer uses). State materializes to parquet per
iteration to truncate lineage — the ``iterate_until_fixpoint`` rule.

Application (``bpe_apply``) is an Arrow-batched pandas UDF with a
per-batch word memo — tokenizing is per-row Python (real tokenizers are
native code; a 100-deep nested fold expression would be Janino poison),
but the memo makes it O(distinct words) per batch and the UDF is a
narrow projection: zero shuffles, scales with executors.
"""

from __future__ import annotations

import os
import tempfile

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TOKENIZE = r"\s+"


def _word_vocab(df: DataFrame, text_col: str) -> DataFrame:
    """(word, freq) over the whitespace-lowercased corpus — the single
    corpus-wide scan of the whole training run."""
    return (
        df.select(
            F.explode(
                F.split(F.lower(F.trim(F.col(text_col))), _TOKENIZE)
            ).alias("w")
        )
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
    )


def _merge_pair_expr(symbols: Column, a: str, b: str) -> Column:
    """Greedy left-to-right merge of adjacent (a, b) into a+b — a single
    array fold, no UDF. Overlaps resolve like the reference algorithm:
    'aaa' under merge (a,a) → ['aa','a'] (a merged element can't start a
    new match because its text differs from ``a``)."""
    merged = F.lit(a + b)
    return F.aggregate(
        symbols,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (s == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(merged)
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 50,
    min_count: int = 2,
    state_path: str | None = None,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus; returns the merge
    list in priority order (the model artifact, like
    ``kmeans_centroids`` returns plain Python lists).

    Per iteration: adjacent symbol pairs of every vocab word, weighted
    by word frequency, are aggregated (one shuffle over the vocab); the
    argmax pair — ties broken (count desc, pair asc) so training is
    deterministic and engine-independent — is merged into every word's
    symbol array by a pure fold expression. Stops early when no pair
    reaches ``min_count``.
    """
    spark = df.sparkSession
    base = state_path or tempfile.mkdtemp(prefix="dpe_bpe_")
    state = _word_vocab(df, text_col).withColumn(
        "sym", F.split(F.col("w"), "")
    )
    merges: list[tuple[str, str]] = []
    for i in range(n_merges):
        slot = os.path.join(base, f"iter_{i % 2}")
        state.write.mode("overwrite").parquet(slot)
        state = spark.read.parquet(slot)
        pairs = (
            state.filter(F.size("sym") >= 2)
            .select(
                "freq",
                F.explode(
                    F.transform(
                        F.sequence(F.lit(1), F.size("sym") - 1),
                        lambda j: F.struct(
                            F.element_at(F.col("sym"), j).alias("a"),
                            F.element_at(F.col("sym"), j + 1).alias("b"),
                        ),
                    )
                ).alias("p"),
            )
            .groupBy("p.a", "p.b")
            .agg(F.sum("freq").alias("cnt"))
        )
        best = (
            pairs.orderBy(F.col("cnt").desc(), F.col("a"), F.col("b"))
            .limit(1)
            .collect()
        )
        if not best or best[0]["cnt"] < min_count:
            break
        a, b = best[0]["a"], best[0]["b"]
        merges.append((a, b))
        state = state.withColumn("sym", _merge_pair_expr(F.col("sym"), a, b))
    return merges


def bpe_apply(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Tokenize the corpus with a trained merge list: whitespace
    pre-tokenization, then merges applied in priority order per word.
    Arrow-batched pandas UDF with a per-batch word memo (repeated words
    tokenize once); a narrow projection — zero shuffles, fuses into the
    scan."""
    merge_list = [(a, b) for a, b in merges]

    @F.pandas_udf("array<string>")
    def _tok(texts: pd.Series) -> pd.Series:
        memo: dict[str, list[str]] = {}

        def word_tokens(w: str) -> list[str]:
            got = memo.get(w)
            if got is None:
                sym = list(w)
                for a, b in merge_list:
                    out, i, ab = [], 0, a + b
                    while i < len(sym):
                        if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                            out.append(ab)
                            i += 2
                        else:
                            out.append(sym[i])
                            i += 1
                    sym = out
                got = memo[w] = sym
            return got

        def doc_tokens(t) -> list[str]:
            if t is None:
                return []
            toks: list[str] = []
            for w in t.strip().lower().split():
                toks.extend(word_tokens(w))
            return toks

        return texts.map(doc_tokens)

    return df.withColumn(out_col, _tok(F.col(text_col)))
