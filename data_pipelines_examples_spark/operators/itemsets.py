"""Frequent-itemset / co-occurrence mining — the market-basket family
(which parts ship together, which event types co-fire in a session).

Two tiers, verified against each other:

- ``cooccurrence_pairs``: EXACT pairwise co-occurrence counts with a
  support floor — the explainable workhorse (almost every production
  "frequently bought together" is pairs). Per-basket combination
  explode restricted to frequent items; fully SQL-replicable (oracle
  q97 — the oracle keeps the equivalent self-join form).
- ``frequent_itemsets``: MLlib FP-Growth for itemsets of any size —
  tree-based, no candidate explosion (Han et al., SIGMOD 2000). Its
  size-2 output must agree exactly with ``cooccurrence_pairs`` at the
  same support, which is pytest-pinned.

Scale notes: pair generation prunes to frequent items FIRST (classic
a-priori monotonicity — an infrequent item cannot be in a frequent
pair), so the combination explode fans out only over items that
already passed the floor; hot baskets bound the per-basket pair
fan-out quadratically, so ``max_basket_size`` guards against
degenerate baskets (a basket with a million items is a data bug, not a
signal).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..cache import persist_internal

# Default degenerate-basket fuse, shared with the q97/q107 oracle SQL
# (the guard is part of the operator contract, so the oracles must
# apply the same population cut — one constant keeps them in sync).
MAX_BASKET_SIZE = 10_000


def _filtered_items(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    max_basket_size: int | None,
) -> DataFrame:
    """Distinct (basket, item) rows with over-sized baskets dropped —
    the ONE basket population every downstream count must share.
    ``association_metrics``'s confidence/lift denominators and
    ``cooccurrence_pairs``'s numerators both derive from this
    projection; computing them from different populations silently
    understates both ratios whenever the size guard fires."""
    items = df.select(
        F.col(basket_col).alias("__b"), F.col(item_col).alias("__i")
    )
    if max_basket_size is not None:
        # Window count instead of a sizes-aggregate + semi join: one
        # exchange on __b replaces an agg exchange AND a two-sided join
        # exchange, and the persisted frame comes out hash-partitioned
        # by __b — which the downstream per-basket collect_list reuses
        # without re-shuffling. The null-basket filter preserves the
        # semi-join form's semantics exactly (a null equi-key never
        # matched, so guarded runs always dropped null baskets — and the
        # q97/q107 oracles' JOIN USING(b) does the same).
        # The explicit repartition("__b") BEFORE the distinct (r14,
        # guide §2.4) makes the (basket, item) set-dedup ride the SAME
        # basket-keyed exchange the window needs anyway: hash(__b)
        # clusters every (__b, __i) group, so the distinct aggregate and
        # the window both run exchange-free on top of it — one exchange
        # where the distinct-first form paid two ((__b, __i) for the
        # dedup, then __b for the window). The bytes are the q22 trade
        # in reverse and it wins here: the raw (basket, item) stream is
        # near-unique per pair (a basket rarely repeats an item), so
        # the map-side partial dedup the old first exchange bought
        # removed almost nothing, while the second exchange re-shipped
        # the whole deduped table.
        items = (
            items.filter(F.col("__b").isNotNull())
            .repartition("__b")
            .distinct()
            .withColumn("__n", F.count("*").over(Window.partitionBy("__b")))
            .filter(F.col("__n") <= max_basket_size)
            .drop("__n")
        )
    else:
        items = items.distinct()
    # Multi-consumer pattern (same as ranking.py's tf table): the
    # frequency floor, the pair self-join's two sides, and (in
    # association_metrics) the denominators all consume this projection,
    # and Spark's exchange reuse does NOT collapse them — measured 8
    # full source scans in q97's adaptive plan without the persist.
    # (basket, item) pairs only — MEMORY_AND_DISK is scale-honest.
    return items.transform(persist_internal)


def cooccurrence_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
    max_basket_size: int | None = MAX_BASKET_SIZE,
) -> DataFrame:
    """Exact (item_a, item_b, n_baskets) for unordered item pairs
    appearing together in at least ``min_support`` baskets. Items
    deduplicate within a basket; pairs are emitted once with
    item_a < item_b.
    """
    items = _filtered_items(df, basket_col, item_col, max_basket_size)
    return _pairs_from_items(items, min_support)


def _pairs_from_items(items: DataFrame, min_support: int) -> DataFrame:
    """Pair counting over an already-filtered (__b, __i) projection —
    shared by ``cooccurrence_pairs`` and ``association_metrics`` so the
    latter persists ONE items frame for both pair counts and
    denominators."""
    freq = (
        items.groupBy("__i")
        .agg(F.count("*").alias("__c"))
        .filter(F.col("__c") >= min_support)
        .select("__i")
    )
    # Null baskets must not pair even when the size guard is off
    # (max_basket_size=None skips _filtered_items' isNotNull filter):
    # the a⋈b self-join this explode replaces never matched a null
    # equi-key, but groupBy("__b") groups NULL as a real basket and
    # would emit pairs from it. The filter sits here, not in
    # _filtered_items, so the unguarded path's confidence/lift
    # denominators keep counting null-basket (basket, item) rows —
    # exactly the old self-join form's semantics.
    pruned = items.filter(F.col("__b").isNotNull()).join(
        freq, "__i", "left_semi"
    )
    # Pair generation by per-basket combination explode, not an a⋈b
    # self-join on the basket key: the sorted item array emits each
    # unordered pair ONCE (k·(k−1)/2 structs) instead of the join's k²
    # rows filtered to half, and it costs one exchange (groupBy __b)
    # where the join costs two (both sides hash by __b). Items are
    # distinct within a basket and null items never survive the
    # frequency semi join (null equi-keys don't match), so array_sort +
    # adjacent slices reproduce exactly the join's item_a < item_b
    # pairs. Per-basket fan-out is bounded by the max_basket_size guard.
    baskets = pruned.groupBy("__b").agg(
        F.array_sort(F.collect_list("__i")).alias("__xs")
    )
    # Two chained explodes, NOT explode(flatten(transform(...))): the
    # flatten form materializes the whole k(k-1)/2 pair array for one
    # row before exploding — ~1.6 GB transient for a basket at the 10k
    # guard cap. posexplode → suffix slice → explode streams pairs
    # row-by-row inside one codegen stage with per-row memory bounded
    # by the basket array itself.
    pairs = (
        baskets.select(
            F.posexplode("__xs").alias("__i", "item_a"), F.col("__xs")
        )
        .select(
            "item_a",
            F.explode(
                F.slice("__xs", F.col("__i") + F.lit(2), F.size("__xs"))
            ).alias("item_b"),
        )
    )
    return (
        pairs.groupBy("item_a", "item_b")
        .agg(F.count("*").alias("n_baskets"))
        .filter(F.col("n_baskets") >= min_support)
    )


def frequent_itemsets(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: float = 0.01,
    min_confidence: float = 0.5,
):
    """FP-Growth frequent itemsets + association rules over (basket,
    item) rows. Returns (itemsets DataFrame with ``items`` array +
    ``freq``, rules DataFrame). ``min_support`` is a FRACTION of
    baskets (MLlib convention), unlike ``cooccurrence_pairs``'s
    absolute count."""
    from pyspark.ml.fpm import FPGrowth

    baskets = (
        df.select(F.col(basket_col).alias("__b"), F.col(item_col).alias("__i"))
        .distinct()
        .groupBy("__b")
        .agg(F.collect_list("__i").alias("items"))
    )
    model = FPGrowth(
        itemsCol="items", minSupport=min_support, minConfidence=min_confidence
    ).fit(baskets)
    return model.freqItemsets, model.associationRules


def association_metrics(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
    max_basket_size: int | None = MAX_BASKET_SIZE,
) -> DataFrame:
    """Directional association rules from the exact pair tier:
    (antecedent, consequent, n_both, n_antecedent, confidence, lift) for
    both directions of every supported pair. confidence = P(c|a);
    lift = confidence / P(c) — lift > 1 is genuine affinity, which raw
    co-occurrence counts can't distinguish from two independently
    popular items (the reason this operator exists).

    Ratios divide exact integer counts, so both engines produce
    bit-identical doubles; n_baskets rides a 1-row broadcast.
    """
    # ONE persisted projection feeds the pair counts AND the
    # denominators — both for shared-scan efficiency and because the
    # denominators MUST see the same size-guarded basket population as
    # n_both (mixing populations silently understates confidence/lift).
    items = _filtered_items(df, basket_col, item_col, max_basket_size)
    pairs = _pairs_from_items(items, min_support)
    item_n = items.groupBy("__i").agg(F.count("*").alias("__n"))
    totals = items.select("__b").distinct().agg(F.count("*").alias("__nb"))
    directed = pairs.selectExpr(
        "item_a as antecedent", "item_b as consequent", "n_baskets as n_both"
    ).unionByName(
        pairs.selectExpr(
            "item_b as antecedent", "item_a as consequent", "n_baskets as n_both"
        )
    )
    out = (
        directed.join(
            F.broadcast(item_n.selectExpr("__i as antecedent", "__n as n_antecedent")),
            "antecedent",
        )
        .join(
            F.broadcast(item_n.selectExpr("__i as consequent", "__n as __nc")),
            "consequent",
        )
        .crossJoin(F.broadcast(totals))
    )
    conf = F.col("n_both") / F.col("n_antecedent")
    return out.select(
        "antecedent",
        "consequent",
        "n_both",
        "n_antecedent",
        conf.alias("confidence"),
        (conf / (F.col("__nc") / F.col("__nb"))).alias("lift"),
    )
