"""Regression pins for the round-6 ADVICE fixes on the rename-aside swap
protocol (sources/writers.py).

The scenario that motivated them (ADVICE r5, medium): run A parks the
live state at __old, installs staging, and its VALIDATION read fails
(object-store partial install). Old protocol: run B's recovery saw a
target and did nothing, B merged from the PARTIAL target, and B's swap
then unconditionally deleted __old — the last complete copy. New
protocol: (a) a failed validation deletes the suspect install and
restores __old immediately; (b) recovery validates a target that
coexists with __old by full materialization and discards it when
unreadable; (c) _swap_into_place refuses to run over a pre-existing
__old instead of deleting it.
"""

from __future__ import annotations

import shutil
from pathlib import Path

import pytest

from data_pipelines_examples_spark.sources.writers import (
    WriteValidationError,
    _hadoop_fs,
    _install_and_validate,
    _recover_interrupted_swap,
    _swap_into_place,
    upsert_by_key,
)


def _rows(spark, pairs):
    return spark.createDataFrame(pairs, "k string, v int, ver int")


def _write_state(spark, path, pairs):
    _rows(spark, pairs).write.mode("overwrite").parquet(path)


def _corrupt_one_parquet(path: str) -> None:
    """Truncate one data file so schema inference may still succeed from
    another footer but a full materialization fails."""
    files = sorted(Path(path).glob("*.parquet"))
    assert files, f"no parquet files under {path}"
    files[0].write_bytes(b"PAR1 this is not a parquet file")


def test_recovery_discards_partial_install_and_restores_old(spark, tmp_path):
    """Both target and __old present, target unreadable (the object-store
    partial-install aftermath): recovery must restore __old, and the next
    upsert must merge against the restored COMPLETE history."""
    path = str(tmp_path / "state")
    _write_state(spark, path, [("a", 1, 1), ("b", 2, 1)])
    shutil.copytree(path, path + "__old")
    _corrupt_one_parquet(path)

    n = upsert_by_key(_rows(spark, [("c", 3, 1)]), path, "k", "ver")
    assert n == 3
    got = {r["k"]: r["v"] for r in spark.read.parquet(path).collect()}
    assert got == {"a": 1, "b": 2, "c": 3}  # history survived the partial
    fs, old = _hadoop_fs(spark, path + "__old")
    assert not fs.exists(old)


def test_recovery_keeps_readable_target_and_drops_old(spark, tmp_path):
    """Both present, target fully readable (crash AFTER a good install,
    before the __old delete): the newer target wins; __old is cleared."""
    path = str(tmp_path / "state")
    _write_state(spark, path, [("old", 1, 1)])
    shutil.move(path, path + "__old")
    _write_state(spark, path, [("new", 9, 2)])

    _recover_interrupted_swap(spark, path)
    got = {r["k"] for r in spark.read.parquet(path).collect()}
    assert got == {"new"}
    fs, old = _hadoop_fs(spark, path + "__old")
    assert not fs.exists(old)


def test_swap_refuses_preexisting_old(spark, tmp_path):
    """_swap_into_place must never delete a parked copy it didn't park —
    a pre-existing __old is a protocol violation and raises."""
    path = str(tmp_path / "state")
    staging = path + "__staging"
    _write_state(spark, path, [("a", 1, 1)])
    shutil.copytree(path, path + "__old")
    _write_state(spark, staging, [("b", 2, 1)])

    with pytest.raises(IOError, match="parked copy already present"):
        _swap_into_place(spark, staging, path)
    # nothing was destroyed by the refusal
    fs, old = _hadoop_fs(spark, path + "__old")
    assert fs.exists(old)
    assert {r["k"] for r in spark.read.parquet(path).collect()} == {"a"}


def test_validation_failure_rolls_back_to_parked_copy(spark, tmp_path):
    """_install_and_validate: when validate() raises, the suspect install
    is deleted and the parked complete copy restored, so the NEXT run
    merges from good state (not the partial) without manual repair."""
    path = str(tmp_path / "state")
    staging = path + "__staging"
    _write_state(spark, path, [("good", 1, 1)])
    _write_state(spark, staging, [("suspect", 2, 2)])

    def _failing_validate():
        raise WriteValidationError("simulated partial-install read failure")

    with pytest.raises(WriteValidationError):
        _install_and_validate(spark, staging, path, _failing_validate)
    got = {r["k"] for r in spark.read.parquet(path).collect()}
    assert got == {"good"}
    fs, old = _hadoop_fs(spark, path + "__old")
    assert not fs.exists(old)
    # and the protocol is re-runnable: a fresh staging installs cleanly
    _write_state(spark, staging, [("repaired", 3, 3)])
    n = _install_and_validate(
        spark, staging, path, lambda: spark.read.parquet(path).count()
    )
    assert n == 1
    assert {r["k"] for r in spark.read.parquet(path).collect()} == {"repaired"}


def test_validation_failure_on_first_install_just_raises(spark, tmp_path):
    """No prior state (nothing to roll back to): the failed install stays
    for inspection and the error propagates."""
    path = str(tmp_path / "state")
    staging = path + "__staging"
    _write_state(spark, staging, [("first", 1, 1)])

    with pytest.raises(WriteValidationError):
        _install_and_validate(
            spark,
            staging,
            path,
            lambda: (_ for _ in ()).throw(WriteValidationError("boom")),
        )


# ---------------------------------------------------------------------------
# shred_json extraction-route contract (r5 ADVICE): string-typed outputs
# always come from get_json_object; the map fast path is typed-scalar only
# ---------------------------------------------------------------------------


def test_json_strict_routes_agree(spark):
    """Pin the measured Spark 4.1 agreement between the two parsers on
    the adversarial shapes (nested serialization, duplicate keys,
    escapes, bignum lexical form) — if a future Spark diverges, this
    fails BEFORE a user sees strict/lenient outputs differ."""
    from pyspark.sql import functions as F

    from data_pipelines_examples_spark.operators.json_ops import (
        _STRICT_JSON_OPTS,
    )

    blobs = [
        '{"k": {"a": 1,  "b":[2, 3]}}',
        '{"k": 1, "k": 2}',
        '{"k": "  padded  "}',
        '{"k": 1e2}',
        '{"k": 123456789012345678901234567890}',
        '{"k": "\\u00e9\\n\\t"}',
        '{"k": [1, {"x": "y"}, null]}',
    ]
    df = spark.createDataFrame([(b,) for b in blobs], "j string")
    rows = df.select(
        F.get_json_object("j", "$.k").alias("gjo"),
        F.from_json("j", "map<string,string>", _STRICT_JSON_OPTS)
        .getItem("k")
        .alias("map"),
    ).collect()
    for blob, r in zip(blobs, rows):
        assert r["gjo"] == r["map"], f"route divergence on {blob!r}"


def test_shred_json_string_output_identical_across_modes(spark):
    """Flipping strict must only gate malformed blobs, never change the
    extracted TEXT of a well-formed one — string outputs take the same
    extractor in both modes."""
    from data_pipelines_examples_spark.operators.json_ops import shred_json

    df = spark.createDataFrame(
        [
            (1, '{"k": {"a": 1,  "b":[2, 3]}}'),
            (2, '{"k": 1, "k": 2}'),
            (3, '{"k": "plain"}'),
            (4, "{'k': 'lenient-only'}"),
            (5, None),
        ],
        "id int, props string",
    )
    spec = {"k": "$.k"}
    strict = {r["id"]: r["k"] for r in shred_json(df, "props", spec, keep=["id"], strict=True).collect()}
    lenient = {r["id"]: r["k"] for r in shred_json(df, "props", spec, keep=["id"]).collect()}
    # well-formed rows: byte-identical text either mode
    for i in (1, 2, 3):
        assert strict[i] == lenient[i] is not None
    # malformed row: gated in strict, extracted leniently otherwise
    assert strict[4] is None and lenient[4] == "lenient-only"
    assert strict[5] is None and lenient[5] is None


# ---------------------------------------------------------------------------
# Internal-persist release hook (r5 ADVICE): release_cached() drops exactly
# the library's still-live internal caches, idempotently
# ---------------------------------------------------------------------------


def test_release_cached_releases_internal_persists(spark):
    from pyspark import StorageLevel

    from data_pipelines_examples_spark import release_cached
    from data_pipelines_examples_spark.operators.funnel import funnel_counts

    release_cached()  # clean slate
    df = spark.createDataFrame(
        [(1, 1, "view"), (1, 2, "cart"), (2, 1, "view")],
        "user_id int, ts int, event string",
    )
    out = funnel_counts(df, "user_id", "ts", "event", ["view", "cart"])
    out.collect()  # materialize: the internal frame is now cached
    # a USER cache must survive the release
    user_df = spark.range(5).persist(StorageLevel.MEMORY_AND_DISK)
    user_df.count()
    assert release_cached() >= 1
    assert release_cached() == 0  # idempotent
    assert user_df.storageLevel.useMemory  # untouched
    user_df.unpersist()


def test_persist_internal_transform_chain(spark):
    from data_pipelines_examples_spark.cache import persist_internal, release_cached

    release_cached()
    df = spark.range(10).transform(persist_internal)
    assert df.storageLevel.useDisk  # MEMORY_AND_DISK applied
    assert release_cached() == 1
    assert not df.storageLevel.useMemory and not df.storageLevel.useDisk


# ---------------------------------------------------------------------------
# Hot-key population guard for interval overlap joins (sf1-density gate:
# a skew-hot key's K intervals imply K^2 pairs; binning redistributes but
# cannot shrink the output)
# ---------------------------------------------------------------------------


def _intervals(spark, rows, suffix=""):
    df = spark.createDataFrame(rows, "k int, id int, s date, e date")
    if suffix:
        for c in ("id", "s", "e"):
            df = df.withColumnRenamed(c, c + suffix)
    return df


def test_overlap_join_cap_cut_drops_only_hot_keys(spark):
    import datetime as dt

    from data_pipelines_examples_spark.operators.intervals import overlap_join

    d = dt.date(2024, 1, 1)
    rows = [(1, i, d, d) for i in range(6)] + [(2, 10, d, d), (2, 11, d, d)]
    left, right = _intervals(spark, rows), _intervals(spark, rows, "2")
    full = overlap_join(left, right, "k", "s", "e", "s2", "e2")
    capped = overlap_join(
        left, right, "k", "s", "e", "s2", "e2",
        max_intervals_per_key=5, cap_mode="cut",
    )
    # key 1 (6 intervals) is cut entirely; key 2 survives untouched
    # (k appears on both sides of the theta join — access positionally)
    capped_ks = [r[0] for r in capped.collect()]
    full_ks = [r[0] for r in full.collect()]
    assert capped_ks.count(1) == 0
    assert capped_ks.count(2) == full_ks.count(2) == 4
    # under-cap data: guarded == unguarded
    same = overlap_join(
        left, right, "k", "s", "e", "s2", "e2", max_intervals_per_key=100
    )
    assert same.count() == full.count()


def test_overlap_join_cap_error_mode_raises_with_key(spark):
    import datetime as dt

    from data_pipelines_examples_spark.operators.intervals import overlap_join

    d = dt.date(2024, 1, 1)
    rows = [(7, i, d, d) for i in range(4)]
    out = overlap_join(
        _intervals(spark, rows), _intervals(spark, rows, "2"),
        "k", "s", "e", "s2", "e2",
        max_intervals_per_key=3, cap_mode="error",
    )
    with pytest.raises(Exception, match="max_intervals_per_key"):
        out.count()


def test_overlap_join_binned_cap_matches_theta_cap(spark):
    """Guarded binned join stays row-identical to the guarded theta join
    (the r5 identity, now under the population cut)."""
    import datetime as dt

    from data_pipelines_examples_spark.operators.intervals import (
        overlap_join,
        overlap_join_binned,
    )

    d = dt.date(2024, 1, 1)
    rows = [
        (1, i, d + dt.timedelta(days=i), d + dt.timedelta(days=i + 3))
        for i in range(8)
    ] + [
        (2, 20 + i, d + dt.timedelta(days=2 * i), d + dt.timedelta(days=2 * i + 2))
        for i in range(4)
    ]
    left, right = _intervals(spark, rows), _intervals(spark, rows, "2")
    theta = overlap_join(
        left, right, "k", "s", "e", "s2", "e2",
        max_intervals_per_key=5, cap_mode="cut",
    )
    binned = overlap_join_binned(
        left, right, "k", "s", "e", "s2", "e2",
        bin_days=7, max_intervals_per_key=5, cap_mode="cut",
    )
    t = sorted((r["id"], r["id2"]) for r in theta.select("id", "id2").collect())
    b = sorted((r["id"], r["id2"]) for r in binned.select("id", "id2").collect())
    assert t == b
    # only key 2 (4 intervals, under cap) survives
    assert {r[0] for r in theta.collect()} == {2}


def test_overlap_join_cap_passes_null_keys_through(spark):
    """NULL-key rows can never pair-explode (the equi-join rejects NULLs)
    — the guard must neither cut them nor error on them."""
    import datetime as dt

    from data_pipelines_examples_spark.operators.intervals import (
        cap_intervals_per_key,
    )

    d = dt.date(2024, 1, 1)
    rows = [(None, i, d, d) for i in range(10)] + [(1, 50 + i, d, d) for i in range(6)]
    df = spark.createDataFrame(rows, "k int, id int, s date, e date")
    cut = cap_intervals_per_key(df, ["k"], 5, mode="cut")
    got = [(r["k"], r["id"]) for r in cut.collect()]
    # hot key 1 (6 rows) cut; ALL 10 null-key rows pass through
    assert len(got) == 10
    assert all(k is None for k, _ in got)
    # error mode: >cap NULL population must NOT raise
    err = cap_intervals_per_key(df.filter("k IS NULL"), ["k"], 5, mode="error")
    assert err.count() == 10
