"""Stateful streaming operators: cross-micro-batch dedup and running counts."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from data_pipelines_examples_spark.streaming.stateful import (
    stream_dedup_by_key,
    stream_running_counts,
)

SCHEMA = "k string, v string, seq int"


def _write_batches(path):
    """Two files → two micro-batches (maxFilesPerTrigger=1); key 'a'
    appears in both with different values."""
    path.mkdir(parents=True)
    (path / "b0.json").write_text(
        "\n".join(
            json.dumps(r)
            for r in [
                {"k": "a", "v": "first", "seq": 0},
                {"k": "b", "v": "first", "seq": 1},
            ]
        )
    )
    (path / "b1.json").write_text(
        "\n".join(
            json.dumps(r)
            for r in [
                {"k": "a", "v": "second", "seq": 2},
                {"k": "c", "v": "first", "seq": 3},
            ]
        )
    )


def test_stream_dedup_by_key(spark, tmp_path):
    src = tmp_path / "src"
    _write_batches(src)
    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).json(str(src))
    )
    deduped = stream_dedup_by_key(stream, ["k"])
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = [(r.k, r.v) for r in spark.table("dedup_out").collect()]
    # each key emitted exactly ONCE across micro-batches — key 'a' appears
    # in both batches but only one of its rows survives (which one depends
    # on file pickup order, so assert the dedup property, not the value)
    assert sorted(k for k, _ in rows) == ["a", "b", "c"]


def test_stream_running_counts(spark, tmp_path):
    src = tmp_path / "src"
    _write_batches(src)
    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).json(str(src))
    )
    counts = stream_running_counts(stream, ["k"])
    q = (
        counts.writeStream.format("memory")
        .queryName("counts_out")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # last update per key reflects lifetime count: a=2, b=1, c=1
    latest = {}
    for r in spark.table("counts_out").collect():
        latest[r.k] = r.n_events  # memory sink appends updates in order
    assert latest == {"a": 2, "b": 1, "c": 1}


def test_stream_sessionize(spark, tmp_path):
    """Sessions split on >30min gaps across TWO micro-batches; the still-open
    session is withheld until timeout."""
    import json as _json

    from data_pipelines_examples_spark.streaming.stateful import stream_sessionize

    src = tmp_path / "sess"
    src.mkdir()
    # batch files: user 7 has events at 00:00, 00:10 (one session), then
    # 02:00, 02:05 (a second session, still open at end of input)
    (src / "s0.json").write_text(
        "\n".join(
            _json.dumps(r)
            for r in [
                {"user_id": 7, "ts": "2024-01-01T00:00:00"},
                {"user_id": 7, "ts": "2024-01-01T00:10:00"},
            ]
        )
    )
    (src / "s1.json").write_text(
        "\n".join(
            _json.dumps(r)
            for r in [
                {"user_id": 7, "ts": "2024-01-01T02:00:00"},
                {"user_id": 7, "ts": "2024-01-01T02:05:00"},
            ]
        )
    )
    # FileStreamSource picks files up in modification-time order; pin
    # distinct mtimes so batch order (and thus the watermark progression)
    # is deterministic — if s1 ran first, s0's events would be dropped as
    # late against the advanced watermark.
    import os as _os

    _os.utime(src / "s0.json", (1_700_000_000, 1_700_000_000))
    _os.utime(src / "s1.json", (1_700_000_100, 1_700_000_100))
    stream = (
        spark.readStream.schema("user_id bigint, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = (
        stream_sessionize(stream, gap_seconds=1800)
        .writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck3"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = [
        (r.user_id, r.session_start.isoformat(), r.session_end.isoformat(), r.n_events)
        for r in spark.table("sess_out").collect()
    ]
    # the first (closed) session was emitted when the 02:00 event proved the
    # gap; the open 02:00-02:05 session is withheld (timeout not reached)
    assert rows == [(7, "2024-01-01T00:00:00", "2024-01-01T00:10:00", 2)]


def test_stream_dedup_event_time_ttl(spark, tmp_path):
    """Event-time TTL: a key's marker expires once the watermark passes
    last_seen + TTL, after which the key is emitted again. Event-time
    timers are also drain-safe — processAllAvailable() returns on a
    drained source (a pending PROCESSING-time timer would keep the engine
    scheduling micro-batches: that mode is for never-draining sources
    only, documented on the operator)."""
    import os as _os

    src = tmp_path / "ttlsrc"
    src.mkdir()
    batches = [
        [{"k": "a", "ts": "2024-01-01T00:00:00"}],
        # other key advances the watermark past a's 01:00 expiry
        [{"k": "x", "ts": "2024-01-01T02:00:00"}],
        # a data-free-for-a batch lets a's timer actually fire (a timed-out
        # key is only invoked with hasTimedOut when it has NO data in the
        # batch), clearing a's marker
        [{"k": "y", "ts": "2024-01-01T02:10:00"}],
        # a reappears after expiry -> emitted again
        [{"k": "a", "ts": "2024-01-01T02:30:00"}],
    ]
    for i, rows in enumerate(batches):
        f = src / f"b{i}.json"
        f.write_text("\n".join(json.dumps(r) for r in rows))
        _os.utime(f, (1_700_000_000 + i * 100, 1_700_000_000 + i * 100))
    stream = (
        spark.readStream.schema("k string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    deduped = stream_dedup_by_key(stream, ["k"], state_ttl_seconds=3600, ts_col="ts")
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_ttl_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_ttl"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    ks = sorted(r.k for r in spark.table("dedup_ttl_out").collect())
    assert ks == ["a", "a", "x", "y"]


def test_stream_sessionize_native_batch_equivalence(spark):
    """The JVM session_window path produces the same sessions as the batch
    gaps-and-islands composition (q11) on the real events table — the two
    differ only on exact-gap boundaries, which this data doesn't contain."""
    import __spark_entry__ as mod

    from data_pipelines_examples_spark.streaming.stateful import (
        stream_sessionize_native,
    )

    sf_dir = "/root/testdata/sf0.001"
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    native = stream_sessionize_native(events, gap_seconds=1800)
    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in native.collect()
    }
    q11 = mod.queries()["q11_sessionize_events"](spark, sf_dir)
    want = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in q11.collect()
    }
    assert got == want and len(got) > 100


def test_stream_sessionize_native_streaming(spark, tmp_path):
    """Same two-micro-batch scenario as the stateful variant: the closed
    session emits once the watermark passes its window end; the open
    session is withheld."""
    import json as _json
    import os as _os

    from data_pipelines_examples_spark.streaming.stateful import (
        stream_sessionize_native,
    )

    src = tmp_path / "sessn"
    src.mkdir()
    (src / "s0.json").write_text(
        "\n".join(
            _json.dumps(r)
            for r in [
                {"user_id": 7, "ts": "2024-01-01T00:00:00"},
                {"user_id": 7, "ts": "2024-01-01T00:10:00"},
            ]
        )
    )
    (src / "s1.json").write_text(
        "\n".join(
            _json.dumps(r)
            for r in [
                {"user_id": 7, "ts": "2024-01-01T02:00:00"},
                {"user_id": 7, "ts": "2024-01-01T02:05:00"},
            ]
        )
    )
    _os.utime(src / "s0.json", (1_700_000_000, 1_700_000_000))
    _os.utime(src / "s1.json", (1_700_000_100, 1_700_000_100))
    stream = (
        spark.readStream.schema("user_id bigint, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = (
        stream_sessionize_native(stream, gap_seconds=1800)
        .writeStream.format("memory")
        .queryName("sessn_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckn"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = [
        (r.user_id, r.session_start.isoformat(), r.session_end.isoformat(), r.n_events)
        for r in spark.table("sessn_out").collect()
    ]
    assert rows == [(7, "2024-01-01T00:00:00", "2024-01-01T00:10:00", 2)]


def test_stream_dedup_native(spark, tmp_path):
    """dropDuplicatesWithinWatermark drops a key's repeats across
    micro-batches (within the delay) JVM-side; distinct keys pass."""
    import json as _json
    import os as _os

    from data_pipelines_examples_spark.streaming.stateful import stream_dedup_native

    src = tmp_path / "dedupn"
    src.mkdir()
    (src / "b0.json").write_text(
        "\n".join(
            _json.dumps(r)
            for r in [
                {"k": "a", "ts": "2024-01-01T00:00:00", "v": 1},
                {"k": "b", "ts": "2024-01-01T00:00:05", "v": 2},
            ]
        )
    )
    (src / "b1.json").write_text(
        "\n".join(
            _json.dumps(r)
            for r in [
                {"k": "a", "ts": "2024-01-01T00:00:10", "v": 3},
                {"k": "c", "ts": "2024-01-01T00:00:12", "v": 4},
            ]
        )
    )
    _os.utime(src / "b0.json", (1_700_000_000, 1_700_000_000))
    _os.utime(src / "b1.json", (1_700_000_100, 1_700_000_100))
    stream = (
        spark.readStream.schema("k string, ts timestamp, v int")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = (
        stream_dedup_native(stream, ["k"], watermark_delay="1 hour")
        .writeStream.format("memory")
        .queryName("dedupn_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckd"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {(r.k, r.v) for r in spark.table("dedupn_out").collect()}
    assert got == {("a", 1), ("b", 2), ("c", 4)}, "repeat of key a must be dropped"


def test_rocksdb_state_store_provider_runs(spark, tmp_path):
    """The cluster profile's RocksDB state store actually works in this
    Spark build: a windowed streaming aggregation runs with the provider
    set and produces correct counts (state off-heap on disk, not JVM)."""
    import json

    src = tmp_path / "src"
    src.mkdir()
    rows = [
        {"user_id": i % 3, "timestamp": f"2024-01-01T10:{i:02d}:00"} for i in range(12)
    ]
    (src / "a.json").write_text("\n".join(json.dumps(r) for r in rows))
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = (
            spark.readStream.schema("user_id long, timestamp timestamp")
            .json(str(src))
            .withWatermark("timestamp", "1 hour")
            .groupBy(F.window("timestamp", "1 hour"), "user_id")
            .agg(F.count("*").alias("n"))
        )
        q = (
            stream.writeStream.format("memory")
            .queryName("rocks_counts")
            .outputMode("complete")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        try:
            q.processAllAvailable()
            got = {
                r.user_id: r.n for r in spark.sql("SELECT * FROM rocks_counts").collect()
            }
        finally:
            q.stop()
        assert got == {0: 4, 1: 4, 2: 4}
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)


def test_tws_probe_reports_missing_protobuf():
    """The capability probe names the gap instead of letting the query
    crash mid-stream: in this env protobuf is absent, so the operator
    must refuse with the reason (and the e2e twin below auto-enables
    once the dependency exists)."""
    from data_pipelines_examples_spark.streaming.stateful import tws_available

    avail = tws_available()
    assert avail is True or "protobuf" in avail


def test_tws_operator_fails_fast_when_unavailable(spark):
    import pytest

    from data_pipelines_examples_spark.streaming.stateful import (
        stream_running_counts_tws,
        tws_available,
    )

    if tws_available() is True:
        pytest.skip("transformWithState available — covered by the e2e twin")
    df = spark.readStream.format("rate").load()
    with pytest.raises(RuntimeError, match="unavailable"):
        stream_running_counts_tws(df, ["value"])


def test_stream_running_counts_tws_matches_legacy(spark, tmp_path):
    """transformWithStateInPandas twin: identical lifetime counts to the
    applyInPandasWithState implementation (requires the RocksDB state
    store provider — the production profile's default — and the protobuf
    package for the API's Python state server)."""
    import pytest

    from data_pipelines_examples_spark.streaming.stateful import (
        stream_running_counts_tws,
        tws_available,
    )

    avail = tws_available()
    if avail is not True:
        pytest.skip(f"transformWithStateInPandas env-gated: {avail}")

    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        src = tmp_path / "src"
        _write_batches(src)
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .json(str(src))
        )
        counts = stream_running_counts_tws(stream, ["k"])
        q = (
            counts.writeStream.format("memory")
            .queryName("counts_tws_out")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt_tws"))
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        latest = {}
        for r in spark.table("counts_tws_out").collect():
            latest[r.k] = r.n_events
        assert latest == {"a": 2, "b": 1, "c": 1}
    finally:
        if prev is not None:
            spark.conf.set(key, prev)
        else:
            spark.conf.unset(key)
