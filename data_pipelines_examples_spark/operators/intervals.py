"""Interval (gaps-and-islands) operators.

Capability parity: the reference solves "collapse overlapping/adjacent
eligibility intervals" twice — once with window functions
(reference: notebooks/databricks/sql/overlap_query_no_recursive_cte_needed.sql:36-107)
and once with an iterative recursive-CTE emulation
(reference: notebooks/databricks/python/slow_temp_table_write_in_palce_of_recursive_cte.py:61-198).

Spark-first design: a single shuffle on the partition key, then all work
happens inside per-key window frames (no self-joins, no iteration). At
100 TB this is one exchange + one sort per key — the optimal shape for this
problem; the window functions run inside WholeStageCodegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def collapse_intervals(
    df: DataFrame,
    key: str | list[str],
    start: str = "begindt",
    end: str = "enddt",
    gap_days: int = 1,
    out_start: str = "eligeff_coll",
    out_end: str = "eligend_coll",
) -> DataFrame:
    """Merge intervals per key when they overlap, touch, or are within
    ``gap_days`` days of each other (containment included).

    Algorithm (standard gaps-and-islands, one pass):
      1. per key ordered by (start, end), compute the running max of ``end``
         over all *previous* rows,
      2. a row starts a new island iff its start exceeds that running max
         plus ``gap_days``,
      3. island id = running sum of the new-island flags,
      4. group by (key, island) → min(start), max(end).

    Unlike the reference's +1/−1 event-count formulation, the running-max
    formulation is duplicate-tolerant — a duplicate row can never open an
    island, so no pre-``distinct`` is needed. That saves a full-width
    shuffle: the whole operator is ONE exchange on the key (the final
    group-by reuses the window's hash partitioning, and duplicates
    collapse in the same island's min/max).
    """
    keys = [key] if isinstance(key, str) else list(key)
    w = Window.partitionBy(*keys).orderBy(start, end)
    prev_max_end = F.max(end).over(w.rowsBetween(Window.unboundedPreceding, -1))
    new_island = F.when(
        prev_max_end.isNull()
        | (F.col(start) > F.date_add(prev_max_end, gap_days)),
        1,
    ).otherwise(0)
    islands = df.select(*keys, start, end).withColumn(
        "__island", F.sum(new_island).over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        islands.groupBy(*keys, "__island")
        .agg(F.min(start).alias(out_start), F.max(end).alias(out_end))
        .drop("__island")
    )


def cap_intervals_per_key(
    df: DataFrame,
    keys: list[str],
    max_intervals_per_key: int,
    mode: str = "cut",
    what: str = "overlap_join",
) -> DataFrame:
    """Hot-key population guard for interval joins: a key holding K
    intervals costs K² comparisons (and up to K² output pairs) in ANY
    overlap formulation — binning spreads the work but cannot shrink the
    output. The sf1-density composed gate measured the shape directly: a
    skew-hot customer with 450k orders implies ~10⁹ overlapping pairs,
    unrunnable on any engine. ``mode='cut'`` drops over-cap keys before
    the join (the ``max_basket_size`` population-cut idiom — mirror the
    cut in any oracle); ``mode='error'`` fails loudly with the offending
    key and count. One aggregate over (keys) + a broadcast-eligible semi
    join; skip entirely by passing ``max_intervals_per_key=None`` to the
    callers."""
    # A mode typo must never demote a refusal into a silent cut — with
    # the guard armed by default, falling through to the cut path would
    # silently delete every row of a hot key.
    if mode not in ("cut", "error"):
        raise ValueError(
            f"cap_intervals_per_key: unknown mode {mode!r} (use 'cut' or 'error')"
        )
    # NULL-key rows bypass the guard untouched: the equi-join predicate
    # rejects NULLs, so a NULL-key population can never pair-explode —
    # cutting them would silently drop outer-join rows, and error mode
    # would refuse a job that cannot blow up.
    cols = list(df.columns)  # name-list joins hoist keys first; restore
    nonnull = None
    for k in keys:
        c = F.col(k).isNotNull()
        nonnull = c if nonnull is None else (nonnull & c)
    null_rows = df.filter(~nonnull)
    df = df.filter(nonnull)
    counts = df.groupBy(*keys).agg(F.count("*").alias("__k_n"))
    if mode == "error":
        checked = counts.withColumn(
            "__k_n",
            F.when(
                F.col("__k_n") > max_intervals_per_key,
                F.raise_error(
                    F.concat(
                        F.lit(f"{what}: key ("),
                        F.concat_ws(
                            ",", *[F.col(k).cast("string") for k in keys]
                        ),
                        F.lit(") holds "),
                        F.col("__k_n").cast("string"),
                        F.lit(
                            f" intervals, over max_intervals_per_key="
                            f"{max_intervals_per_key} — a hot key this size "
                            "implies a quadratic pair explosion; pre-filter, "
                            "cut (mode='cut'), or raise the cap explicitly"
                        ),
                    )
                ).cast("long"),
            ).otherwise(F.col("__k_n")),
        )
        # the filter REFERENCES the checked column so column pruning can
        # never elide the raise_error branch (a bare drop would let
        # Catalyst prune the count — and the check with it)
        guarded = df.join(
            checked.filter(F.col("__k_n") >= 0).drop("__k_n"), keys, "left_semi"
        )
        return guarded.unionByName(null_rows).select(*cols)
    ok = counts.filter(F.col("__k_n") <= max_intervals_per_key).drop("__k_n")
    return df.join(ok, keys, "left_semi").unionByName(null_rows).select(*cols)


def _bin_explode(
    df: DataFrame,
    start: str,
    end: str,
    gap_days: int,
    bin_days: int,
    max_bins_per_interval: int,
) -> DataFrame:
    """Explode each interval into the ``bin_days``-wide epoch-day time
    bins it covers (end extended by ``gap_days`` so a gap-tolerant
    overlap still shares a bin), adding the bin as ``__bin``.

    ``max_bins_per_interval`` is the corrupt-data fuse: the fan-out is
    data-driven (span / bin_days), so one row whose end column carries
    a corrupt far-future date would otherwise fan out into millions of
    bin rows inside ONE task. Checked inline per row (``raise_error``
    under a ``when`` — no extra pass, the branch is codegen'd)."""
    s_day = F.datediff(F.col(start), F.lit("1970-01-01"))
    e_day = F.datediff(F.date_add(F.col(end), gap_days), F.lit("1970-01-01"))
    s_bin = F.floor(s_day / bin_days)
    e_bin = F.floor(e_day / bin_days)
    # abs(): sequence(start, stop) DESCENDS when start > stop (an
    # inverted interval — corrupt start — covers the same bin SET,
    # preserving theta parity), so a signed check would let a
    # corrupt far-future START explode ungated
    guarded_e = F.when(
        F.abs(e_bin - s_bin) >= max_bins_per_interval,
        F.raise_error(
            F.concat(
                F.lit(
                    f"overlap_join_binned: interval [{start}, {end}] spans "
                ),
                (F.abs(e_bin - s_bin) + 1).cast("string"),
                F.lit(
                    f" bins at bin_days={bin_days}, over the "
                    f"max_bins_per_interval={max_bins_per_interval} fuse — "
                    "usually a corrupt end date; filter the input range, "
                    "widen bin_days, or raise the fuse explicitly (row "
                    "start day "
                ),
                s_day.cast("string"),
                F.lit(", end day "),
                e_day.cast("string"),
                F.lit(")"),
            )
        ).cast("long"),
    ).otherwise(e_bin)
    return df.withColumn("__bin", F.explode(F.sequence(s_bin, guarded_e)))


def _pin_cell_parallelism(df: DataFrame, keys: list[str]) -> DataFrame:
    """Force the exploded frame into a (keys, __bin) hash distribution
    at the session's full shuffle parallelism — the binned join's
    compute is QUADRATIC in each cell's row count while its bytes stay
    tiny, and every byte-based planner decision gets that wrong: the
    composed sf1-density gate measured a 20 MB orders table whose
    binned self-join broadcast the exploded side and ran the ~10¹⁰
    pair iterations of the hot key inside the ONE map task of a 20 MB
    scan (hours, 2 cores busy); AQE's partition coalescing makes the
    same mistake on the reduce side, merging cheap-bytes/expensive-
    compute cells into a handful of reducers. An explicit numbered
    repartition is the idiomatic escape hatch: its shuffle origin is
    user-specified, so AQE neither coalesces it away nor converts the
    join under it to a single-probe-task broadcast, and the join
    reuses the distribution (same keys), so at scale this is the
    exchange the join would have run anyway — hot cells spread across
    the full reducer fleet."""
    try:
        n = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        # managed platforms set this to the literal "auto" (auto-
        # optimized shuffle); fall back to the cluster's core-level
        # parallelism rather than crashing the scale path at plan time
        n = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n, *keys, "__bin")


def _cap_cobinned(
    exploded: DataFrame,
    keys: list[str],
    cap: int,
    mode: str,
    what: str,
    bin_days: int,
) -> DataFrame:
    """Hot-CELL population guard for the BINNED overlap join — the
    bin-aware counterpart of :func:`cap_intervals_per_key`, applied
    AFTER the bin explode. Binning exists precisely to make a hot key
    runnable by spreading its pairs across (key, bin) reducers, so a
    per-key pre-bin cap would refuse exactly the jobs the binned path
    was built to survive; what actually bounds a binned reducer (and
    its pair output) is the CO-BINNED population, counted here per
    (key, bin) cell over the exploded frame.

    ``mode='error'`` is parity-safe: identical rows or a loud refusal
    naming the hot key, its bin, and the co-binned count — it only
    fires on a cluster that genuinely lands ``cap`` intervals in ONE
    ``bin_days``-wide cell. Callers must PIN the frame by
    (keys, __bin) before an error-mode guard — the window count then
    rides the pin's exchange and preserves its partitioning.
    ``mode='cut'`` drops every interval of any KEY owning an
    over-dense cell (whole keys, never partial bins — cutting
    individual cells would silently drop some of a key's pairs while
    keeping others, an output no oracle can mirror); its anti-join
    output carries no partitioning, so callers pin AFTER a cut.
    NULL-key rows bypass the guard untouched, as in the per-key
    guard: the equi-join rejects them, so they can never pair-explode.
    """
    if mode not in ("cut", "error"):
        raise ValueError(
            f"_cap_cobinned: unknown mode {mode!r} (use 'cut' or 'error')"
        )
    cols = list(exploded.columns)
    nonnull = None
    for k in keys:
        c = F.col(k).isNotNull()
        nonnull = c if nonnull is None else (nonnull & c)
    if mode == "error":
        # Window count over the (keys, __bin) cell instead of a
        # cells-aggregate + semi join (r14, guide §2.4): callers pin
        # the exploded frame by (keys, __bin) FIRST, so this count is
        # one sort inside the pin's exchange — the guard's aggregate
        # exchange AND the join-back exchange are gone, rows flow
        # through in place (no null split / union), and the pin's
        # partitioning survives for the join to reuse. The filter on
        # the guard column keeps the raise_error branch alive under
        # column pruning (same trick as the per-key guard); null-key
        # rows never satisfy ``nonnull``, so they bypass untouched.
        kb_n = F.count("*").over(Window.partitionBy(*keys, "__bin"))
        guard = F.when(
            nonnull & (kb_n > cap),
            F.raise_error(
                F.concat(
                    F.lit(f"{what}: key ("),
                    F.concat_ws(
                        ",", *[F.col(k).cast("string") for k in keys]
                    ),
                    F.lit(") holds "),
                    kb_n.cast("string"),
                    F.lit(" intervals co-binned in bin "),
                    F.col("__bin").cast("string"),
                    F.lit(
                        f" (bin_days={bin_days}), over "
                        f"max_intervals_per_key={cap} — a co-binned "
                        "cluster this size lands quadratic pairs on one "
                        "(key, bin) reducer, which binning cannot "
                        "spread; shrink bin_days, pre-filter, cut "
                        "(cap_mode='cut'), or raise the cap explicitly"
                    ),
                )
            ).cast("long"),
        ).otherwise(F.lit(0).cast("long"))
        return (
            exploded.withColumn("__kb_guard", guard)
            .filter(F.col("__kb_guard") >= 0)
            .select(*cols)
        )
    null_rows = exploded.filter(~nonnull)
    ex = exploded.filter(nonnull)
    cells = ex.groupBy(*keys, "__bin").agg(F.count("*").alias("__kb_n"))
    hot = cells.filter(F.col("__kb_n") > cap).select(*keys).distinct()
    return ex.join(hot, keys, "left_anti").unionByName(null_rows).select(*cols)


DEFAULT_MAX_INTERVALS_PER_KEY = 100_000
"""Default hot-key ceiling for the overlap joins. A key holding K
intervals implies up to K² comparisons AND output pairs in any overlap
formulation — at 100k that is 10¹⁰ pairs from ONE key, a runaway stage
on any engine (the sf1-density gate measured the shape: one skew-hot
customer with ~450k orders ⇒ ~10⁹ pairs, unrunnable). The default
``cap_mode='error'`` is parity-safe — it never changes rows, it either
runs identically or fails loudly naming the hot key — so the guided
default is ON; pass ``max_intervals_per_key=None`` to run unguarded
(exact-parity archaeology on data you know is sane)."""


def overlap_join(
    left: DataFrame,
    right: DataFrame,
    key: str | list[str],
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    gap_days: int = 0,
    how: str = "inner",
    max_intervals_per_key: int | None = DEFAULT_MAX_INTERVALS_PER_KEY,
    cap_mode: str = "error",
) -> DataFrame:
    """Theta/range self-join on interval overlap within a key.

    Capability parity with the reference's date-range self-join
    (reference: notebooks/databricks/sql/overlap_query_no_recursive_cte_needed.sql:7-17):
    ``l.start <= r.end + gap AND r.start <= l.end + gap`` with equi-keys.

    Scale note: the equi-key conjunct makes this a shuffled sort-merge join
    on the key; the range predicate is evaluated inside the join, so the
    cross-product is bounded per key, never global. That bound is still
    QUADRATIC in one key's interval count — so the hot-key guard
    (see ``cap_intervals_per_key``) is ON BY DEFAULT in error mode
    (``DEFAULT_MAX_INTERVALS_PER_KEY``), which never changes output:
    it either runs identically or refuses the job naming the hot key.
    Pass ``cap_mode='cut'`` to drop over-cap keys instead (mirror the
    cut in any oracle), or ``max_intervals_per_key=None`` to run
    unguarded. At production density prefer ``overlap_join_binned`` —
    same rows (inner), but hot keys spread across their time axis
    instead of landing on one reducer.
    """
    keys = [key] if isinstance(key, str) else list(key)
    if max_intervals_per_key is not None:
        left = cap_intervals_per_key(
            left, keys, max_intervals_per_key, cap_mode, "overlap_join"
        )
        right = cap_intervals_per_key(
            right, keys, max_intervals_per_key, cap_mode, "overlap_join"
        )
    cond: Column | None = None
    for k in keys:
        c = left[k] == right[k]
        cond = c if cond is None else (cond & c)
    cond = (
        cond
        & (left[left_start] <= F.date_add(right[right_end], gap_days))
        & (right[right_start] <= F.date_add(left[left_end], gap_days))
    )
    return left.join(right, cond, how)


def overlap_self_join(
    df: DataFrame,
    key: str | list[str],
    start: str,
    end: str,
    *,
    gap_days: int = 0,
    suffix: str = "_r",
    binned: bool = False,
    bin_days: int = 30,
    max_bins_per_interval: int = 100_000,
    max_intervals_per_key: int | None = DEFAULT_MAX_INTERVALS_PER_KEY,
    cap_mode: str = "error",
) -> DataFrame:
    """Interval-overlap SELF-join: every pair of intervals of the same
    key that overlap (within ``gap_days``), including a row with itself.
    Output = ``df``'s columns plus the partner row's non-key columns
    renamed ``<col><suffix>`` (key columns appear once). This is the
    shape of the reference's date-range self-join (reference:
    notebooks/databricks/sql/overlap_query_no_recursive_cte_needed.sql:7-17
    — `iv a JOIN iv b` on equi-key + range predicates), packaged so the
    caller doesn't hand-build the renamed right side.

    Exists to halve the hot-key-guard cost of the two-sided form: a
    self-join's two sides are BY CONSTRUCTION the same population, so
    the per-key interval count is computed ONCE on the shared guarded
    plan — both join branches then reference the same aggregate /
    broadcast subtree and Spark's ReuseExchange builds it once (the
    two-sided ``overlap_join`` must guard each side separately because
    it cannot know the sides are the same set; guarding only one side
    there would silently drop the other side's unmatched keys).
    Guard semantics are unchanged: ``cap_mode='error'`` (default) never
    alters rows — identical output or a loud refusal naming the hot key.

    ``binned=True`` is the time-binned scale path — row-identical for
    inner joins, hot keys spread across their time axis. There the
    guard is BIN-AWARE: intervals explode into bins FIRST (one shared
    explode feeds both join branches) and the cap applies per
    (key, bin) CELL, not per key — a per-key pre-bin cap would refuse
    exactly the hot keys binning exists to spread, while what actually
    bounds a binned reducer is the co-binned population (see
    ``_cap_cobinned``; ``overlap_join_binned`` documents ``bin_days``
    and the ``max_bins_per_interval`` corrupt-data fuse). A genuinely
    pathological cluster — ``max_intervals_per_key`` intervals landing
    in ONE ``bin_days``-wide cell — still refuses loudly.
    """
    keys = [key] if isinstance(key, str) else list(key)
    others = [c for c in df.columns if c not in keys]
    clash = [c for c in others if c + suffix in df.columns]
    if clash:
        raise ValueError(
            f"overlap_self_join: suffix {suffix!r} collides with existing "
            f"column(s) {[c + suffix for c in clash]}; pick another suffix"
        )
    # the positional-drop bookkeeping below deletes every output column
    # in the reserved namespace; a name landing there — directly, or a
    # non-key column whose SUFFIXED form lands there (c='__self_join',
    # suffix='_dup_x') — would be silently dropped with the right
    # side's duplicate keys. Fail loudly instead.
    reserved = [c for c in df.columns if c.startswith("__self_join_dup_")] + [
        c + suffix
        for c in others
        if (c + suffix).startswith("__self_join_dup_")
    ]
    if reserved:
        raise ValueError(
            f"overlap_self_join: column(s) {sorted(set(reserved))} land in "
            "the reserved '__self_join_dup_' namespace; rename the column "
            "or pick another suffix"
        )
    # keys (and, in the binned branch, every column) are RE-ALIASED on
    # the right side, not passed through: an alias mints a fresh exprId,
    # so `left[k] == right[k]` in the join is a genuine cross-plan
    # equality — a pass-through key keeps the left plan's exprId and the
    # predicate silently collapses to trivially-true (cross-key pairs),
    # which Spark only warns about
    if binned:
        if "__bin" in df.columns:
            raise ValueError(
                "overlap_self_join: input already has a '__bin' column — "
                "it would be clobbered by the internal bin explode; "
                "rename it first"
            )
        # ONE shared explode + ONE bin-aware guard feed both join
        # branches (the self-join's whole point). Error mode (the
        # default): pin FIRST, then guard — the guard is a window
        # count that rides the pin's exchange and preserves its
        # partitioning, so the plan has exactly one exchange under the
        # join (r14; the old cells-aggregate + semi-join guard cost two
        # more). Cut mode: guard first (its anti-join output carries no
        # partitioning guarantee), then pin directly under the join —
        # a pin above the cut would leave the join to insert its own
        # AQE-coalescible exchange, the exact failure the pin exists
        # to prevent.
        base = _bin_explode(
            df, start, end, gap_days, bin_days, max_bins_per_interval
        )
        if max_intervals_per_key is not None and cap_mode == "cut":
            base = _cap_cobinned(
                base, keys, max_intervals_per_key, cap_mode,
                "overlap_self_join", bin_days,
            )
        base = _pin_cell_parallelism(base, keys)
        if max_intervals_per_key is not None and cap_mode != "cut":
            base = _cap_cobinned(
                base, keys, max_intervals_per_key, cap_mode,
                "overlap_self_join", bin_days,
            )
        lb = base
        rb = base.select(
            *[F.col(k).alias(k) for k in keys],
            *[F.col(c).alias(c + suffix) for c in others],
            F.col("__bin").alias("__bin" + suffix),
        )
        cond: Column | None = None
        for k in keys:
            c = lb[k] == rb[k]
            cond = c if cond is None else (cond & c)
        canonical_day = F.datediff(
            F.greatest(lb[start], rb[start + suffix]), F.lit("1970-01-01")
        )
        cond = (
            cond
            & (lb["__bin"] == rb["__bin" + suffix])
            & (lb[start] <= F.date_add(rb[end + suffix], gap_days))
            & (rb[start + suffix] <= F.date_add(lb[end], gap_days))
            & (lb["__bin"] == F.floor(canonical_day / bin_days))
        )
        out = lb.join(rb, cond, "inner")
        names = (
            list(df.columns)
            + ["__self_join_dup___bin_l"]
            + ["__self_join_dup_" + k for k in keys]
            + [c + suffix for c in others]
            + ["__self_join_dup___bin_r"]
        )
    else:
        if max_intervals_per_key is not None:
            df = cap_intervals_per_key(
                df, keys, max_intervals_per_key, cap_mode, "overlap_self_join"
            )
        right = df.select(
            *[F.col(k).alias(k) for k in keys],
            *[F.col(c).alias(c + suffix) for c in others],
        )
        out = overlap_join(
            df,
            right,
            keys,
            start,
            end,
            start + suffix,
            end + suffix,
            gap_days=gap_days,
            max_intervals_per_key=None,
        )
        names = list(df.columns) + [
            ("__self_join_dup_" + c) if c in keys else c for c in right.columns
        ]
    # drop the right side's (equal-valued) key columns — and the binned
    # branch's two internal bin columns — POSITIONALLY: in a self-join,
    # `right[k]` can resolve to the left branch after Spark's ambiguity
    # rewrite, silently dropping the wrong column — a positional toDF
    # rename is unambiguous (join output is left.columns + right.columns)
    return out.toDF(*names).drop(
        *[n for n in names if n.startswith("__self_join_dup_")]
    )


def overlap_join_binned(
    left: DataFrame,
    right: DataFrame,
    key: str | list[str],
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bin_days: int = 30,
    gap_days: int = 0,
    max_bins_per_interval: int = 100_000,
    max_intervals_per_key: int | None = DEFAULT_MAX_INTERVALS_PER_KEY,
    cap_mode: str = "error",
) -> DataFrame:
    """Interval-overlap join via time binning — the scale path for
    ``overlap_join`` (inner only). Row-identical output (pinned by
    test), different shape: ``overlap_join`` evaluates the range
    predicate inside a per-key sort-merge join, so one hot key with K
    intervals costs K² comparisons on one reducer; here each interval
    explodes into the ``bin_days``-wide time bins it covers and the join
    equi-matches on (key, bin), so comparisons are bounded by
    co-binned-pairs — hot keys spread across their time axis.

    Dedup-free by construction: a pair overlapping many shared bins is
    emitted ONLY in the canonical bin containing ``greatest(l_start,
    r_start)`` (that bin is covered by both sides whenever the pair
    truly overlaps, so exactly-once needs no distinct shuffle).

    ``bin_days`` trades explode fan-out (long intervals cover many
    bins) against join selectivity (wide bins co-locate non-overlapping
    pairs for the predicate to reject); set it near the median interval
    length.

    ``max_bins_per_interval`` is the corrupt-data fuse: the explode
    fan-out is data-driven (span / bin_days), so a single row whose end
    column carries a corrupt far-future date against a sane start would
    otherwise fan out into millions of bin rows inside ONE task — the
    same failure shape as an unguarded data-driven resample grid, except
    hidden inside a join build. Checked inline per row (``raise_error``
    under a ``when`` — no extra pass, branch is codegen'd), erroring the
    job with the offending span instead of silently stalling an
    executor. The default (100k bins ≈ 8,200 years at the default
    30-day bin) only ever fires on corrupt data.

    ``max_intervals_per_key`` guards the OTHER data-driven explosion —
    the quadratic pair output — at the granularity binning actually
    works at: CO-BINNED intervals per (key, bin) cell, counted AFTER
    the explode (a per-key pre-bin cap would refuse exactly the hot
    keys the binned path exists to spread across their time axis; a
    hot key is only unrunnable here when one ``bin_days``-wide cell
    genuinely holds a quadratic cluster). ON by default in error mode
    (``DEFAULT_MAX_INTERVALS_PER_KEY`` — parity-safe: identical rows
    or a loud refusal naming the hot key, bin, and co-binned count);
    ``cap_mode='cut'`` drops every interval of any KEY owning an
    over-dense cell (whole keys, so the cut is oracle-mirrorable —
    note the trigger differs from the unbinned per-key cut: a key
    spread thinly over years survives here at any total count);
    ``None`` disables. See ``_cap_cobinned``.
    """
    keys = [key] if isinstance(key, str) else list(key)
    for side, df in (("left", left), ("right", right)):
        if "__bin" in df.columns:
            raise ValueError(
                f"overlap_join_binned: {side} input already has a '__bin' "
                "column — it would be clobbered by the internal bin "
                "explode; rename it first"
            )
    lb = _bin_explode(
        left, left_start, left_end, gap_days, bin_days, max_bins_per_interval
    )
    rb = _bin_explode(
        right, right_start, right_end, gap_days, bin_days, max_bins_per_interval
    )
    # Error mode (the default): pin FIRST, then guard — the window-
    # count guard rides the pin's exchange and preserves its
    # partitioning (one exchange per side under the join; the old
    # cells-aggregate + semi-join guard cost two more each). Cut mode:
    # guard first (its anti-join output carries no partitioning
    # guarantee), then pin directly under the join — a pin above the
    # cut would leave the join to insert its own AQE-coalescible
    # exchange, the exact failure the pin exists to prevent.
    if max_intervals_per_key is not None and cap_mode == "cut":
        lb = _cap_cobinned(
            lb, keys, max_intervals_per_key, cap_mode,
            "overlap_join_binned", bin_days,
        )
        rb = _cap_cobinned(
            rb, keys, max_intervals_per_key, cap_mode,
            "overlap_join_binned", bin_days,
        )
    lb = _pin_cell_parallelism(lb, keys)
    rb = _pin_cell_parallelism(rb, keys)
    if max_intervals_per_key is not None and cap_mode != "cut":
        lb = _cap_cobinned(
            lb, keys, max_intervals_per_key, cap_mode,
            "overlap_join_binned", bin_days,
        )
        rb = _cap_cobinned(
            rb, keys, max_intervals_per_key, cap_mode,
            "overlap_join_binned", bin_days,
        )
    cond: Column | None = None
    for k in keys:
        c = lb[k] == rb[k]
        cond = c if cond is None else (cond & c)
    canonical_day = F.datediff(
        F.greatest(lb[left_start], rb[right_start]), F.lit("1970-01-01")
    )
    cond = (
        cond
        & (lb["__bin"] == rb["__bin"])
        & (lb[left_start] <= F.date_add(rb[right_end], gap_days))
        & (rb[right_start] <= F.date_add(lb[left_end], gap_days))
        & (lb["__bin"] == F.floor(canonical_day / bin_days))
    )
    out = lb.join(rb, cond, "inner")
    return out.drop(lb["__bin"]).drop(rb["__bin"])
