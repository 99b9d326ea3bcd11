"""Round-9 fixes, pinned.

1. The binned overlap join's hot-key guard is BIN-AWARE (the r8 verdict's
   one carried demand): a hot key whose intervals spread across many time
   bins RUNS on the binned path (it used to be refused by the per-key
   pre-bin cap — the exact job binning exists to make runnable), while a
   genuinely pathological CO-BINNED cluster still refuses loudly, naming
   the key, the bin, and the co-binned count.
2. A pre-existing '__bin' input column is rejected instead of silently
   clobbered by the internal bin explode (ADVICE r8).
3. cache.py ADVICE items: equal-plan deferral re-checks the registry
   under the lock right before each unpersist (TOCTOU close), and the
   self-prune threshold resets when the registry drains.
"""

import datetime as dt

import pytest
from pyspark.sql import functions as F


def _spread_hot(spark, n_hot=40, span_days=400):
    """A hot key whose intervals SPREAD across the time axis: 40
    intervals of ~10 days uniformly over ~400 days — over a per-key cap
    of 30, but never more than a handful co-binned at bin_days=30."""
    rows = [
        (
            "hot",
            i,
            dt.date(2023, 1, 1) + dt.timedelta(days=(i * span_days) // n_hot),
            dt.date(2023, 1, 1)
            + dt.timedelta(days=(i * span_days) // n_hot + 10),
        )
        for i in range(n_hot)
    ] + [
        ("cold", 100 + i, dt.date(2023, 3, 1), dt.date(2023, 3, 15))
        for i in range(3)
    ]
    return spark.createDataFrame(rows, "k string, id int, s date, e date")


def test_binned_guard_lets_spread_hot_key_run(spark):
    """The r9 contract: per-key count 40 > cap 30, but no (key, bin)
    cell holds more than ~5 co-binned intervals — the binned self-join
    must RUN (the unbinned guard refuses the same cap) and match the
    unguarded theta join exactly."""
    from data_pipelines_examples_spark.operators.intervals import (
        overlap_self_join,
    )

    df = _spread_hot(spark)
    ran = overlap_self_join(
        df, "k", "s", "e", binned=True, bin_days=30, max_intervals_per_key=30
    )
    truth = overlap_self_join(
        df, "k", "s", "e", binned=False, max_intervals_per_key=None
    )
    got = sorted((r["id"], r["id_r"]) for r in ran.select("id", "id_r").collect())
    want = sorted(
        (r["id"], r["id_r"]) for r in truth.select("id", "id_r").collect()
    )
    assert got == want and len(got) > 50
    # the same cap on the UNBINNED path refuses — pinning that the
    # bin-aware semantics are what made the job runnable
    refused = overlap_self_join(
        df, "k", "s", "e", binned=False, max_intervals_per_key=30
    )
    with pytest.raises(Exception, match=r"key \(hot\) holds 40 intervals"):
        refused.count()


def test_binned_guard_refuses_cobinned_cluster(spark):
    """A pathological cluster — every hot interval in ONE 30-day cell —
    must still refuse loudly, naming key, bin, and co-binned count."""
    from data_pipelines_examples_spark.operators.intervals import (
        overlap_self_join,
    )

    rows = [
        ("hot", i, dt.date(2023, 6, 10), dt.date(2023, 6, 12))
        for i in range(9)
    ] + [("cold", 50, dt.date(2023, 6, 10), dt.date(2023, 6, 12))]
    df = spark.createDataFrame(rows, "k string, id int, s date, e date")
    out = overlap_self_join(
        df, "k", "s", "e", binned=True, bin_days=30, max_intervals_per_key=5
    )
    with pytest.raises(
        Exception, match=r"key \(hot\) holds \d+ intervals co-binned in bin \d+"
    ):
        out.count()


def test_binned_guard_cut_drops_whole_keys_by_cell_trigger(spark):
    """cut mode on the binned path drops WHOLE keys (never partial
    bins), triggered by cell density: the co-binned key goes, the
    spread key — same total count — survives in full."""
    from data_pipelines_examples_spark.operators.intervals import (
        overlap_join_binned,
    )

    rows = [
        # 8 intervals co-binned in one cell
        ("dense", i, dt.date(2023, 6, 10), dt.date(2023, 6, 11))
        for i in range(8)
    ] + [
        # 8 intervals spread over ~16 months
        (
            "spread",
            20 + i,
            dt.date(2023, 1, 1) + dt.timedelta(days=60 * i),
            dt.date(2023, 1, 1) + dt.timedelta(days=60 * i + 5),
        )
        for i in range(8)
    ]
    df = spark.createDataFrame(rows, "k string, id int, s date, e date")
    # alias the key too: a pass-through key keeps the left plan's
    # exprId and the equi-join predicate collapses to trivially-true
    right = df.select(
        F.col("k").alias("k"),
        F.col("id").alias("id2"),
        F.col("s").alias("s2"),
        F.col("e").alias("e2"),
    )
    out = overlap_join_binned(
        df, right, "k", "s", "e", "s2", "e2",
        bin_days=30, max_intervals_per_key=5, cap_mode="cut",
    )
    # k appears on both sides of the join output — access positionally
    rows_out = out.collect()
    assert {r[0] for r in rows_out} == {"spread"}
    # every spread self-pair survives (8 identity pairs at minimum)
    assert sum(1 for r in rows_out if r["id"] == r["id2"]) == 8


@pytest.mark.parametrize("which", ["two_sided", "self"])
def test_binned_rejects_preexisting_bin_column(spark, which):
    """ADVICE r8: an input column named '__bin' was silently clobbered
    by the internal explode; now rejected loudly on every binned entry
    point."""
    from data_pipelines_examples_spark.operators.intervals import (
        overlap_join_binned,
        overlap_self_join,
    )

    df = spark.createDataFrame(
        [("a", 1, dt.date(2023, 1, 1), dt.date(2023, 1, 5), 7)],
        "k string, id int, s date, e date, __bin int",
    )
    if which == "two_sided":
        clean = df.drop("__bin").selectExpr(
            "k", "id as id2", "s as s2", "e as e2"
        )
        with pytest.raises(ValueError, match="__bin"):
            overlap_join_binned(df, clean, "k", "s", "e", "s2", "e2")
        with pytest.raises(ValueError, match="__bin"):
            overlap_join_binned(
                df.drop("__bin"),
                df.selectExpr("k", "s as s2", "e as e2", "__bin"),
                "k", "s", "e", "s2", "e2",
            )
    else:
        with pytest.raises(ValueError, match="__bin"):
            overlap_self_join(df, "k", "s", "e", binned=True)


def test_replicate_preserves_multiplicity(tmp_path):
    """The --replicate scale-up must grow rows K× while keeping per-key
    join multiplicity IDENTICAL (the --scale bootstrap grows fact-fact
    join workload K² — the r8 bench-rung readability caveat), keep every
    FK resolvable, keep unique keys unique, and decorrelate text across
    replicas without breaking the n_chars contract."""
    import os
    import sys

    import duckdb

    sys.path.insert(
        0, os.path.join(os.path.dirname(__file__), os.pardir, "tools")
    )
    from resample_testdata import replicate

    import pytest as _pytest

    with _pytest.raises(ValueError, match=r"\[1, 100\]"):
        # r10 raised the cap from 26 (Caesar wrap) to 100 (two decades)
        # via seeded pairwise-deranged permutations — see
        # test_round10_fixes.py for the 26+ decorrelation pins
        replicate("/root/testdata/sf0.001", str(tmp_path / "x"), 101)

    dst = str(tmp_path / "repl")
    counts = replicate("/root/testdata/sf0.001", dst, 3)
    con = duckdb.connect()
    for tbl in ("orders", "lineitem", "customer", "documents", "events"):
        con.execute(
            f"CREATE VIEW {tbl}_s AS SELECT * FROM "
            f"'/root/testdata/sf0.001/{tbl}.parquet'"
        )
        con.execute(
            f"CREATE VIEW {tbl}_r AS SELECT * FROM '{dst}/{tbl}.parquet'"
        )
    one = lambda q: con.execute(q).fetchone()[0]  # noqa: E731
    # rows grow exactly K× for replicated tables, 1× for nation/region
    assert counts["orders.parquet"] == 3 * one("SELECT count(*) FROM orders_s")
    assert counts["region.parquet"] == 5
    # per-key multiplicity identical on both fact-fact FK sides
    for t, k in (("lineitem", "l_orderkey"), ("orders", "o_custkey"),
                 ("events", "user_id")):
        q = f"SELECT max(n) FROM (SELECT count(*) n FROM {{v}} GROUP BY {k})"
        assert one(q.format(v=t + "_s")) == one(q.format(v=t + "_r"))
    # fact-fact join workload grows LINEARLY (the whole point)
    jq = (
        "SELECT count(*) FROM {l} l JOIN {o} o ON l.l_orderkey = o.o_orderkey"
    )
    assert one(jq.format(l="lineitem_r", o="orders_r")) == 3 * one(
        jq.format(l="lineitem_s", o="orders_s")
    )
    # every FK resolves; unique keys stay unique
    assert 0 == one(
        "SELECT count(*) FROM orders_r o LEFT JOIN customer_r c "
        "ON o.o_custkey = c.c_custkey WHERE c.c_custkey IS NULL"
    )
    n, d = con.execute(
        "SELECT count(*), count(DISTINCT doc_id) FROM documents_r"
    ).fetchone()
    assert n == d
    # texts decorrelated across replicas; n_chars stays consistent
    assert 0 == one(
        "SELECT count(*) FROM (SELECT text FROM documents_r "
        "GROUP BY text HAVING count(*) > "
        "(SELECT max(c) FROM (SELECT count(*) c FROM documents_s GROUP BY text)))"
    )
    assert 0 == one(
        "SELECT count(*) FROM documents_r WHERE n_chars <> length(text)"
    )


def test_release_cached_resets_prune_threshold(spark):
    """ADVICE r8: _PRUNE_AT ratchets up with registry size; a full
    drain must reset it so a long-lived process doesn't accumulate up
    to the old spike's threshold of dead wrappers."""
    from data_pipelines_examples_spark import cache

    df = spark.range(10)
    for _ in range(140):
        cache.persist_internal(df.select((F.col("id") + 1).alias("id")))
    assert cache._PRUNE_AT >= 256  # ratcheted past the floor by the spike
    cache.release_cached()
    assert cache._PRUNE_AT == 128


def test_scope_exit_defers_to_equal_plan_arm_registered_late(spark):
    """ADVICE r8 TOCTOU: an equal-plan frame armed AFTER the scope's
    kept-snapshot but BEFORE the unpersist must still keep the shared
    plan-keyed cache entry alive — the re-check now happens under the
    lock immediately before each unpersist, so a registry state mutated
    at ANY point before the release is honored. Deterministic stand-in
    for the cross-thread interleaving: arm the equal-plan frame inside
    the scope from another thread (registered to a different owner), so
    the exit sees it only via the final locked re-check path."""
    import threading

    from data_pipelines_examples_spark import cache

    cache.release_cached()
    plan = spark.range(50).select((F.col("id") * 3).alias("v"))
    with cache.internal_persist_scope():
        mine = cache.persist_internal(plan.filter("v > 6"))
        mine.count()

        holder = {}

        def other_thread_arm():
            holder["theirs"] = cache.persist_internal(plan.filter("v > 6"))

        t = threading.Thread(target=other_thread_arm)
        t.start()
        t.join()
    # scope exit must NOT have evicted the shared plan-keyed entry:
    # the other thread's arm is still registered and still cached
    assert cache._is_cached(holder["theirs"])
    assert cache.release_cached() >= 1
