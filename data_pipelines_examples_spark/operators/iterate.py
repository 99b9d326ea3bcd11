"""Iterative fixpoint operator — the engine's recursive-CTE replacement.

Reference: notebooks/databricks/python/slow_temp_table_write_in_palce_of_recursive_cte.py:96-183
emulates a recursive CTE by looping { read Delta state → union/join step →
overwrite Delta → count } until the count stops changing. Spark has no
recursive CTE (design note cited at :1-12), so the engine ships a proper
iteration operator.

Spark-first design notes:
- State is materialized per iteration (parquet path or localCheckpoint) to
  TRUNCATE THE LINEAGE — without this the plan doubles every iteration and
  the driver OOMs on plan size long before data size matters.
- Convergence check is a count (cheap aggregate) or any caller-provided
  metric; each iteration is an independent Spark job, so AQE re-plans every
  step with fresh statistics.
- At 100 TB the parquet-state variant is the right default: state is
  re-read with full parallelism and survives executor loss; checkpointing
  to memory would pin the cluster.
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame


class FixpointNotReached(RuntimeError):
    """The iteration cap was hit while the convergence metric was still
    moving — the returned state would be silently stale."""


def iterate_until_fixpoint(
    initial: DataFrame,
    step: Callable[[DataFrame, int], DataFrame],
    max_iterations: int = 50,
    state_path: str | None = None,
    metric: Callable[[DataFrame], object] | None = None,
    on_max: str = "warn",
) -> DataFrame:
    """Apply ``step(state, i)`` until the metric (default: row count) stops
    changing, or ``max_iterations`` is hit.

    ``state_path``: directory for loop-carried parquet state (pluggable —
    the reference hard-codes a Delta path). If None, a temp dir is used and
    alternating subdirs a/b hold current/next state.

    ``on_max`` controls what happens when the cap is hit with the metric
    STILL CHANGING (i.e. the result is not a fixpoint): ``"warn"`` logs
    and returns the last state (default — matches the reference loop's
    behavior), ``"raise"`` throws :class:`FixpointNotReached` (use for
    correctness-critical consumers like connected components, where a
    stale label set silently under-merges clusters), ``"return"`` stays
    silent.
    """
    spark = initial.sparkSession
    base = state_path or tempfile.mkdtemp(prefix="dpe_fixpoint_")
    cur_metric = None
    state = initial
    converged = False
    for i in range(max_iterations):
        slot = os.path.join(base, f"iter_{i % 2}")
        nxt = step(state, i)
        nxt.write.mode("overwrite").parquet(slot)
        state = spark.read.parquet(slot)
        m = metric(state) if metric else state.count()
        if m == cur_metric:
            converged = True
            break
        cur_metric = m
    if not converged and on_max != "return":
        msg = (
            f"fixpoint not reached after {max_iterations} iterations "
            f"(metric still changing: {cur_metric!r})"
        )
        if on_max == "raise":
            raise FixpointNotReached(msg)
        import logging

        logging.getLogger(__name__).warning(msg)
    return state


def transitive_reachability(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 20,
    state_path: str | None = None,
) -> DataFrame:
    """Transitive closure of an edge list via the fixpoint operator — the
    canonical recursive-CTE workload, used to validate ``iterate_until_fixpoint``
    against a DuckDB ``WITH RECURSIVE`` oracle.

    Each step doubles path length: paths ∪ (paths ⋈ paths) → distinct, so
    convergence takes ⌈log2(diameter)⌉ iterations instead of diameter
    (a diameter-1000 graph closes in ~10 rounds). Each iteration is one
    shuffled self-join + distinct over materialized state.
    """
    paths = edges.select(src, dst).distinct()

    def step(state: DataFrame, _i: int) -> DataFrame:
        hop = state.select(
            state[src].alias("__via_src"), state[dst].alias("__via_dst")
        )
        extended = (
            state.join(hop, state[dst] == hop["__via_src"])
            .select(state[src].alias(src), hop["__via_dst"].alias(dst))
        )
        return state.unionByName(extended).distinct()

    return iterate_until_fixpoint(
        paths, step, max_iterations=max_iterations, state_path=state_path
    )
