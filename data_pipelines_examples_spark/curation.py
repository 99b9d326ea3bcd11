"""End-to-end corpus curation: the published pretraining-data recipe as
one composable pipeline over the operator library.

The stages are the public, standard sequence (quality filter →
deduplicate → decontaminate → mix → shuffle), each implemented by the
scale-shaped operator documented in its own module — this function only
composes and records counts, so everything stays a single lazy DataFrame
program until the caller materializes it. Every stage is individually
hash-verified by catalog oracles (q13/q33/q58/q59/q62/q65/q66); this
module's tests pin the composition: stage counts are monotone
non-increasing, the output is deterministic across reruns and input
repartitioning, and each intermediate invariant (no exact dups, no
benchmark overlap) holds on the result.

100 TB notes: counts() are per-stage actions — pass ``collect_stats=
False`` to skip them and keep the whole pipeline one job; every stage's
shuffle carries ids/hashes/keys, never more than one pass of document
bodies (the final projection).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def curate_corpus(
    docs: DataFrame,
    benchmark: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str | None = None,
    quality_quantile: float = 0.2,
    source_col: str | None = None,
    source_cap: int | None = None,
    mix_rates: dict[str, int] | None = None,
    mix_alpha: float | None = None,
    shuffle_seed: int = 7,
    minhash_bands: int | str = "auto",
    collect_stats: bool = True,
) -> tuple[DataFrame, dict]:
    """Run the standard curation recipe; returns (curated_df, stats).

    1. quality: heuristic score per doc, drop the bottom
       ``quality_quantile`` per language (per-group floor so one noisy
       language can't be wiped out by another's distribution)
    2. per-source over-representation cap (``source_cap`` rows max per
       ``source_col``, skew-proof salted selection), if given
    3. exact dedup (hash-groupBy, min id wins)
    4. near dedup: MinHash-LSH pairs → connected components → keep each
       cluster's canonical doc. ``minhash_bands="auto"`` (default since
       r12, matching the underlying ``minhash_lsh_pairs`` discipline)
       derives the band count from the signature width and target
       Jaccard — at the defaults it resolves to the reference's b=8, so
       this is safe here because a one-shot composition persists no
       band-table artifact across runs (contrast ``dedup_against_corpus``
       / streaming ingest, where bands must stay FIXED across deltas)
    5. decontamination vs ``benchmark`` (13-gram overlap), if given
    6. mixing: explicit ``mix_rates`` (deterministic stratified modulo
       sampling) or ``mix_alpha`` (temperature mixing, kept shares ∝
       n^alpha over ``source_col`` or language) — mutually exclusive
    7. epoch-shuffle key (seeded hash — sort by it to stream the epoch)

    The returned frame has the original columns plus ``lang_pred``,
    ``quality``, and ``shuffle_key``.

    Cache lifecycle: this composition leaves NO library-internal
    persists behind (pinned by tests/test_round7_fixes.py) —
    ``duplicate_components`` parquet-materializes its state and releases
    its edge cache before returning, and the near-dedup stage runs under
    ``internal_persist_scope`` so the minhash signature persist drains
    once the components are materialized. Callers who
    FURTHER compose the lazy result with persisting operators
    (``ngram_jaccard_pairs``, ``select_within_token_budget``, …) own the
    release: call ``data_pipelines_examples_spark.release_cached()``
    after materializing; see cache.py and SCALING.md.
    """
    if mix_rates is not None and mix_alpha is not None:
        raise ValueError("pass mix_rates or mix_alpha, not both")
    from .operators.dedup import (
        decontaminate,
        dedup_exact,
        dedup_keep_canonical,
        minhash_lsh_pairs,
    )
    from .operators.sampling import (
        cap_per_group,
        epoch_shuffle,
        filter_by_group_quantile,
        stratified_mod_sample,
        temperature_mix,
    )
    from .operators.text import lang_id, quality_score

    stats: dict = {}

    def _n(stage: str, df: DataFrame) -> DataFrame:
        if collect_stats:
            stats[stage] = df.count()
        return df

    _n("input", docs)

    scored = quality_score(lang_id(docs, text_col), text_col)
    group = lang_col or "lang_pred"
    floored = _n(
        "quality_floor",
        filter_by_group_quantile(scored, group, "quality", quality_quantile),
    )

    if source_cap is not None:
        floored = _n(
            "source_cap",
            cap_per_group(
                floored, source_col or group, id_col, source_cap
            ),
        )

    exact = _n("exact_dedup", dedup_exact(floored, text_col, id_col=id_col))

    # Scoped drain around the near-dedup stage: minhash_lsh_pairs arms a
    # lazy signature persist (r9 — both sides of its band self-join
    # consume it), and dedup_keep_canonical's fixpoint EXECUTES here,
    # parquet-materializing the components. After that nothing in the
    # returned lazy frame references the signature cache (near = docs
    # anti-join parquet state), so the scope exit can release it —
    # keeping this composition's no-leftover-persists contract.
    from .cache import internal_persist_scope

    with internal_persist_scope():
        pairs = minhash_lsh_pairs(
            exact, id_col, text_col, bands=minhash_bands
        )
        near = _n("near_dedup", dedup_keep_canonical(exact, pairs, id_col))

    if benchmark is not None:
        near = _n(
            "decontaminated",
            decontaminate(near, benchmark, id_col=id_col, text_col=text_col),
        )

    if mix_rates is not None:
        near = _n(
            "mixed",
            stratified_mod_sample(near, group, mix_rates, id_col=id_col),
        )
    elif mix_alpha is not None:
        near = _n(
            "mixed",
            temperature_mix(near, source_col or group, id_col, mix_alpha),
        )

    out = epoch_shuffle(near, id_col, seed=shuffle_seed)
    stats["output"] = stats.get("mixed", stats.get("decontaminated", stats.get("near_dedup"))) if collect_stats else None
    return out, stats


def leakage_free_split(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    val_pct: int = 10,
    seed: int = 5,
    hash_how: str = "xxhash64",
    buckets: int = 100,
) -> DataFrame:
    """Train/validation split that can never leak a near-duplicate across
    the boundary: documents are first clustered into duplicate components
    (``pairs`` = any near-dup pair list — minhash/simhash/embedding LSH),
    then the WHOLE component is assigned to one side by a seeded hash of
    its canonical (minimum) id. A doc and its near-twin always share a
    component, hence a side — the property a naive per-doc random split
    silently violates, inflating eval scores.

    Returns docs + (root, split) with split ∈ {'train', 'val'};
    ``val_pct`` of hash buckets go to 'val'. Deterministic and
    re-runnable: adding new documents never flips existing assignments
    (new members of an existing component inherit its root).

    Scale shape: components carry ids only (see ``duplicate_components``);
    the docs⋈components join is on the id key; the split itself is a
    narrow hash projection. ``hash_how='portable'`` makes the assignment
    re-derivable in any engine with md5 — the audit answer to "was this
    eval document ever trained on?".
    """
    from .functions.hashing import hash64
    from .operators.dedup import duplicate_components

    comp = duplicate_components(pairs)
    rooted = docs.join(
        comp.select(F.col("id").alias(id_col), "component"), id_col, "left"
    ).withColumn("root", F.coalesce(F.col("component"), F.col(id_col)))
    key = (
        F.col("root").cast("string") if hash_how == "portable" else F.col("root")
    )
    bucket = F.pmod(hash64(key, seed=seed, how=hash_how), F.lit(buckets))
    return rooted.withColumn(
        "split", F.when(bucket < val_pct, F.lit("val")).otherwise(F.lit("train"))
    ).drop("component")
