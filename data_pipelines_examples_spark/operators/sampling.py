"""Deterministic sampling / data-mixing operators for training-data
pipelines (BASELINE.json north star: LLM-data operators beyond the
reference's surface; the reference's own sampling is driver-side Python
``random`` over schema metadata, notebooks/zeppelin/bof_30_migrate.scala:857-877).

Two families:

- **Modulo sampling** (``hash_mod_sample`` / ``stratified_mod_sample``):
  membership decided by ``id % buckets < rate``. Fully deterministic,
  re-runnable, and expressible in ANY engine — which is exactly what a
  training-data pipeline wants: the same mix can be recomputed months
  later, audited in SQL, and incrementally extended (new rows join the
  sample iff their id lands in the window; existing rows never flip).
  For ids with correlated low bits, pass a multiplicative ``spread``
  (odd constant) — still deterministic.

- **Seeded random sampling** (``sample_by``): thin wrapper over Spark's
  ``sampleBy`` — per-stratum Bernoulli with a seed. Statistically
  cleaner (no id-structure sensitivity) but reproducible only within
  Spark: partition-order dependent engines can't replicate it, so use
  the modulo family when a cross-engine audit trail matters.

Both are narrow, zero-shuffle filters: sampling 100 TB costs one scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..cache import persist_internal


def hash_mod_sample(
    df: DataFrame,
    id_col: str,
    rate: int,
    buckets: int = 100,
    spread: int | None = None,
) -> DataFrame:
    """Keep rows whose ``id % buckets`` falls in [0, rate). ``rate=5,
    buckets=100`` ≈ a deterministic 5% sample. ``spread`` (odd constant,
    e.g. 2654435761) decorrelates sequential ids before the modulo."""
    key = F.col(id_col)
    if spread is not None:
        key = key * F.lit(spread)
    return df.filter(F.pmod(key, F.lit(buckets)) < rate)


def stratified_mod_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, int],
    id_col: str,
    buckets: int = 100,
    default_rate: int = 0,
) -> DataFrame:
    """Per-stratum deterministic sampling — the training-mix operator:
    ``rates`` maps stratum value → kept buckets out of ``buckets``
    (e.g. {"en": 100, "zh": 25} keeps all English, a quarter of Chinese).
    Unlisted strata get ``default_rate``. One narrow filter, no shuffle."""
    rate = F.lit(default_rate)
    for value, r in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == value, F.lit(r)).otherwise(rate)
    return df.filter(F.pmod(F.col(id_col), F.lit(buckets)) < rate)


def epoch_shuffle(
    df: DataFrame,
    id_col: str,
    seed: int,
    hash_how: str = "xxhash64",
    out_col: str = "shuffle_key",
) -> DataFrame:
    """Deterministic global shuffle order for one training epoch:
    ``shuffle_key = hash(seed + ':' + id)``. Sorting by the key IS the
    shuffled order — no global rank is ever materialized, so there is no
    single-partition bottleneck: the writer runs
    ``repartitionByRange(N, shuffle_key).sortWithinPartitions(shuffle_key)``
    and the epoch lands totally ordered across files with one range
    shuffle. Different seeds give independent epoch orders; the same
    seed reproduces the epoch bit-for-bit months later (``hash_how=
    'portable'`` makes the order re-derivable in any engine with md5 —
    the auditable variant; xxhash64 is the 100 TB default).
    """
    from ..functions.hashing import hash64

    # portable (md5) hashing is defined over strings; the xxhash64 path
    # hashes the raw column (no per-row string materialization)
    key = F.col(id_col).cast("string") if hash_how == "portable" else F.col(id_col)
    return df.withColumn(out_col, hash64(key, seed=seed, how=hash_how))


def filter_by_group_quantile(
    df: DataFrame,
    group_col: str,
    value_col: str,
    q: float,
    how: str = "approx",
    accuracy: int = 10000,
    return_threshold: bool = False,
):
    """Keep rows at or above their group's ``q``-quantile of
    ``value_col`` — the per-source quality-floor step of corpus curation
    (e.g. keep each language's top half by quality score, so one noisy
    source can't flood the mix).

    Two jobs: a per-group quantile aggregate (groups are few by
    construction — languages, sources), broadcast back, one narrow
    filter. ``how='approx'`` (default) uses ``percentile_approx`` —
    sketch-mergeable, one pass, the 100 TB path; ``how='exact'`` uses
    ``percentile`` — per-group sort, only for oracle-checked parity
    (DuckDB ``quantile_cont`` matches it bit-for-bit on integer inputs,
    pinned by q52/q66).

    ``return_threshold=True`` additionally returns the per-group
    threshold table (group, __thr) so callers needing the thresholds
    (reports, audit joins) don't recompute the quantile aggregate —
    a second full source scan otherwise.
    """
    fn = "percentile" if how == "exact" else "percentile_approx"
    extra = "" if how == "exact" else f", {accuracy}"
    thr = df.groupBy(group_col).agg(
        F.expr(f"{fn}({value_col}, {q}{extra})").alias("__thr")
    )
    kept = (
        df.join(F.broadcast(thr), group_col)
        .filter(F.col(value_col) >= F.col("__thr"))
        .drop("__thr")
    )
    return (kept, thr) if return_threshold else kept


def cap_per_group(
    df: DataFrame,
    group_col: str,
    id_col: str,
    cap: int,
    seed: int = 0,
    hash_how: str = "xxhash64",
    salt_n: int = 16,
) -> DataFrame:
    """Keep at most ``cap`` rows per group — the over-representation cap
    of corpus curation (e.g. at most N documents per source/domain, so
    one crawl host can't dominate the mix). The kept rows are the
    ``cap`` smallest by a seeded hash of the id: a deterministic uniform
    "random" subset that any engine can re-derive (``hash_how=
    'portable'``) and that never flips on re-runs or incremental loads
    of unrelated groups.

    Skew-proof by construction — a hot group (the common case: one
    mega-domain) never lands on one reducer. Two stages:

    1. Per ``(group, salt)`` subpartition (salt = hash % salt_n), keep
       the local ``cap`` smallest — a bounded window over ~1/salt_n of
       the hot group. Any row outside its subpartition's top-``cap``
       cannot be in the group's global top-``cap``, so this prunes
       without changing the answer.
    2. Per group, keep the global ``cap`` smallest of the ≤ salt_n·cap
       survivors — a window whose per-group input is bounded by
       salt_n·cap regardless of corpus size.

    Result is EXACTLY "the cap smallest (hash, id) per group" — what a
    single-stage window would compute, minus the single-reducer risk.
    Ties are impossible in practice (64/60-bit hash) and broken by id.
    """
    from pyspark.sql import Window

    from ..functions.hashing import hash64

    key = F.col(id_col).cast("string") if hash_how == "portable" else F.col(id_col)
    hashed = df.withColumn("__hk", hash64(key, seed=seed, how=hash_how))
    w_local = Window.partitionBy(
        group_col, F.pmod(F.col("__hk"), F.lit(salt_n))
    ).orderBy(F.col("__hk"), F.col(id_col))
    w_group = Window.partitionBy(group_col).orderBy(F.col("__hk"), F.col(id_col))
    return (
        hashed.withColumn("__r1", F.row_number().over(w_local))
        .filter(F.col("__r1") <= cap)
        .withColumn("__r2", F.row_number().over(w_group))
        .filter(F.col("__r2") <= cap)
        .drop("__hk", "__r1", "__r2")
    )


def sample_by(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    seed: int = 42,
) -> DataFrame:
    """Seeded per-stratum Bernoulli sampling (Spark-native ``sampleBy``).
    Reproducible for a fixed seed + partitioning WITHIN Spark; use the
    modulo family when other engines must reproduce the sample."""
    return df.sampleBy(strata_col, fractions, seed)


def temperature_mix_rates(
    df: DataFrame,
    strata_col: str,
    alpha: float,
    buckets: int = 1000,
) -> dict[str, int]:
    """Derive per-stratum sampling rates for temperature-based mixing:
    kept counts target shares ∝ n_i^alpha (alpha=1 keeps natural
    proportions, alpha→0 flattens toward uniform — the standard
    multilingual/multi-source reweighting, e.g. the multinomial
    p_i ∝ n_i^alpha of public multilingual-pretraining recipes).

    Downsampling only (no duplication): keep-fraction
    ``r_i = (n_min / n_i)^(1-alpha)`` — the smallest stratum keeps
    everything and every larger stratum is cut toward it, giving
    kept_i = n_i^alpha · n_min^(1-alpha) ∝ n_i^alpha exactly.

    The per-stratum counts are one aggregation collected to the driver —
    strata are sources/languages, dimension-table-sized by construction.
    Returns {stratum: kept-buckets-of-``buckets``} for
    ``stratified_mod_sample``, which applies it as a zero-shuffle filter;
    the rates dict is a plain, auditable artifact (log it with the run).
    """
    counts = {
        r[strata_col]: r["__n"]
        for r in df.groupBy(strata_col).agg(F.count("*").alias("__n")).collect()
    }
    if not counts:
        return {}
    n_min = min(n for n in counts.values() if n) or 1
    rates: dict[str, int] = {}
    for s, n in counts.items():
        if not n:
            rates[s] = 0
            continue
        keep = (n_min / n) ** (1.0 - alpha)
        rates[s] = max(1, min(buckets, round(keep * buckets)))
    return rates


def temperature_mix(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    alpha: float,
    buckets: int = 1000,
) -> DataFrame:
    """Apply temperature-``alpha`` mixing in one pass: derive the rates
    (one small aggregate) and filter with ``stratified_mod_sample``
    (narrow, zero shuffles, deterministic / re-runnable)."""
    rates = temperature_mix_rates(df, strata_col, alpha, buckets)
    return stratified_mod_sample(
        df, strata_col, rates, id_col, buckets=buckets, default_rate=0
    )


# 2^53: the largest power of two whose reciprocals are exact doubles —
# (h mod M + 0.5)/M lands every uniform strictly inside (0,1) with
# identical bits in any IEEE-754 engine.
_ARES_M = 1 << 53


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    n: int,
    seed: int = 0,
    hash_how: str = "xxhash64",
    key_out: str | None = None,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement via the Efraimidis-Spirakis
    A-Res order statistic: each row draws a deterministic uniform
    u = (hash(seed:id) mod 2^53 + 0.5) / 2^53 and ranks by
    ``ln(u) / weight`` descending; the global top-``n`` is the sample.
    Inclusion probability is proportional to weight, the draw is
    reproducible bit-for-bit per seed (audit requirement — no RNG
    state), and rows with NULL or non-positive weight are excluded.

    Scale shape: the key is a narrow per-row projection; the top-n
    compiles to TakeOrderedAndProject (per-partition heaps + one
    driver-side merge of n·partitions candidates — no global sort, no
    single-reducer window). ``hash_how='portable'`` makes the draw
    re-derivable in any engine with md5 (the oracle path); xxhash64 is
    the 100 TB default.

    With ``key_out`` the selection key is exposed (rounded use only —
    see q85's DECIMAL guard for cross-engine ranking).
    """
    from ..functions.hashing import hash64

    u = (
        F.pmod(hash64(F.col(id_col).cast("string"), seed=seed, how=hash_how), F.lit(_ARES_M))
        + F.lit(0.5)
    ) / F.lit(float(_ARES_M))
    key = F.log(u) / F.col(weight_col).cast("double")
    out = (
        df.filter(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
        .withColumn("__ares_key", key)
        .orderBy(F.col("__ares_key").desc(), F.col(id_col))
        .limit(n)
    )
    if key_out is not None:
        return out.withColumnRenamed("__ares_key", key_out)
    return out.drop("__ares_key")


def select_within_token_budget(
    df: DataFrame,
    quality_col: str,
    token_col: str,
    budget: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Greedy corpus selection under a total token budget: take documents
    in (quality DESC, id) order while the running token total stays
    within ``budget`` — the standard "best data that fits the compute"
    primitive behind budgeted pretraining mixes.

    NOT a single global window: a corpus-wide cumulative sum would sort
    every row through one reducer. Instead, exact two-phase selection —
    (1) aggregate token totals per DISTINCT QUALITY LEVEL and cumsum
    over the level table (level-cardinality-sized, tiny relative to the
    corpus); every level that fits entirely is taken wholesale with a
    broadcast threshold comparison (no per-row window at all); (2) only
    the single BOUNDARY level — the first that doesn't fit — gets a
    per-row cumulative window, partitioned to that level's rows. The
    result is row-identical to the global-window definition (the
    oracle-graded equivalence) with reducer load bounded by the largest
    single quality level, not the corpus.
    """
    # lv feeds the level aggregation, the wholesale semi-join, and the
    # boundary window; lev_cum feeds fits and boundary — persist both
    # (lv is (id, quality, tokens) triples; lev_cum is level-cardinality
    # rows) or the source re-scans per consumer (4 scans measured).
    lv = df.select(
        F.col(id_col), F.col(quality_col).alias("__q"), F.col(token_col).alias("__t")
    ).transform(persist_internal)
    levels = lv.groupBy("__q").agg(F.sum("__t").alias("__lt"))
    wlev = Window.orderBy(F.col("__q").desc())
    lev_cum = (
        levels.withColumn("__cum", F.sum("__lt").over(wlev))
        .withColumn("__prev_cum", F.col("__cum") - F.col("__lt"))
        .transform(persist_internal)
    )
    fits = lev_cum.filter(F.col("__cum") <= budget).select("__q")
    boundary = (
        lev_cum.filter((F.col("__cum") > budget) & (F.col("__prev_cum") <= budget))
        .select("__q", "__prev_cum")
    )
    whole = lv.join(F.broadcast(fits), "__q", "left_semi")
    wb = Window.partitionBy("__q").orderBy(F.col(id_col).asc())
    partial = (
        lv.join(F.broadcast(boundary), "__q")
        .withColumn("__rcum", F.sum("__t").over(wb) + F.col("__prev_cum"))
        .filter(F.col("__rcum") <= budget)
        .select(id_col, "__q", "__t")
    )
    return (
        whole.unionByName(partial)
        .select(
            F.col(id_col),
            F.col("__q").alias(quality_col),
            F.col("__t").alias(token_col),
        )
    )
