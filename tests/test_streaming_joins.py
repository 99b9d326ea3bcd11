"""Stream-stream watermarked join and foreachBatch upsert sink: batch
equivalence, state-bounding band semantics, idempotent merge convergence."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from data_pipelines_examples_spark.streaming.pipeline import (
    read_file_stream,
    stream_stream_join,
    write_stream_upsert,
)

CLICK_SCHEMA = "user_id long, timestamp timestamp, page string"
BUY_SCHEMA = "user_id long, timestamp timestamp, amount double"


def _write_jsonl(path, rows):
    path.mkdir(parents=True, exist_ok=True)
    (path / "part-0.json").write_text("\n".join(json.dumps(r) for r in rows))


def test_stream_stream_join_matches_batch(spark, tmp_path):
    clicks = [
        {"user_id": 1, "timestamp": "2024-01-01T10:00:00", "page": "a"},
        {"user_id": 1, "timestamp": "2024-01-01T10:20:00", "page": "b"},
        {"user_id": 2, "timestamp": "2024-01-01T10:05:00", "page": "c"},
        {"user_id": 3, "timestamp": "2024-01-01T10:30:00", "page": "d"},
    ]
    buys = [
        # 4 min after user 1's first click -> joins click a only
        {"user_id": 1, "timestamp": "2024-01-01T10:04:00", "amount": 5.0},
        # 21 min after click a (outside band), 1 min after click b
        {"user_id": 1, "timestamp": "2024-01-01T10:21:00", "amount": 7.0},
        # user 2, same minute as the click
        {"user_id": 2, "timestamp": "2024-01-01T10:05:00", "amount": 9.0},
        # user 4: no click -> drops (inner join)
    ]
    _write_jsonl(tmp_path / "clicks", clicks)
    _write_jsonl(tmp_path / "buys", buys)

    # NOTE: the left side of the band is the BUY stream here — each buy
    # looks back 10 minutes for the clicks that led to it.
    sbuys = read_file_stream(spark, str(tmp_path / "buys"), BUY_SCHEMA)
    sclicks = read_file_stream(spark, str(tmp_path / "clicks"), CLICK_SCHEMA)
    joined = stream_stream_join(
        sbuys, sclicks, key="user_id", max_delay="10 minutes"
    )
    sink = tmp_path / "joined"
    q = (
        joined.writeStream.format("parquet")
        .option("path", str(sink))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = spark.read.parquet(str(sink))
    got = sorted(
        (r.user_id, r.amount, r.page) for r in out.select("user_id", "amount", "page").collect()
    )
    assert got == [(1, 5.0, "a"), (1, 7.0, "b"), (2, 9.0, "c")]

    # batch twin: same DataFrame condition on static frames
    bbuys = spark.read.schema(BUY_SCHEMA).json(str(tmp_path / "buys"))
    bclicks = spark.read.schema(CLICK_SCHEMA).json(str(tmp_path / "clicks"))
    batch = stream_stream_join(bbuys, bclicks, key="user_id", max_delay="10 minutes")
    bgot = sorted(
        (r.user_id, r.amount, r.page)
        for r in batch.select("user_id", "amount", "page").collect()
    )
    assert bgot == got


def test_write_stream_upsert_latest_version_wins(spark, tmp_path):
    # two source files processed as separate micro-batches (maxFilesPerTrigger=1);
    # key 1 appears in both -> the higher version must win in the target
    batch1 = [
        {"k": 1, "v": "old", "version": 1},
        {"k": 2, "v": "keep", "version": 1},
    ]
    batch2 = [
        {"k": 1, "v": "new", "version": 2},
        {"k": 3, "v": "add", "version": 1},
    ]
    src = tmp_path / "src"
    src.mkdir(parents=True)
    (src / "a.json").write_text("\n".join(json.dumps(r) for r in batch1))
    (src / "b.json").write_text("\n".join(json.dumps(r) for r in batch2))

    stream = read_file_stream(
        spark, str(src), "k long, v string, version long", max_files_per_trigger=1
    )
    target = str(tmp_path / "target")
    q = write_stream_upsert(
        stream, target, keys=["k"], version_col="version",
        checkpoint=str(tmp_path / "ckpt"),
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = {r.k: (r.v, r.version) for r in spark.read.parquet(target).collect()}
    assert out == {1: ("new", 2), 2: ("keep", 1), 3: ("add", 1)}

    # re-running the same upsert with the final state is a no-op (idempotent)
    from data_pipelines_examples_spark.sources.writers import upsert_by_key

    n = upsert_by_key(
        spark.read.parquet(target), target, ["k"], "version"
    )
    assert n == 3
    out2 = {r.k: (r.v, r.version) for r in spark.read.parquet(target).collect()}
    assert out2 == out


def test_stream_stream_left_outer_emits_unmatched(spark, tmp_path):
    """leftOuter with watermark + band: a buy with no click in its window
    emits with nulls once the watermark passes."""
    buys = [
        {"user_id": 1, "timestamp": "2024-01-01T10:04:00", "amount": 5.0},
        {"user_id": 9, "timestamp": "2024-01-01T10:05:00", "amount": 3.0},
        # late sentinel far in the future advances the watermark so the
        # unmatched user-9 row can be finalized and emitted
        {"user_id": 99, "timestamp": "2024-01-01T12:00:00", "amount": 0.0},
    ]
    clicks = [
        {"user_id": 1, "timestamp": "2024-01-01T10:00:00", "page": "a"},
        {"user_id": 99, "timestamp": "2024-01-01T11:59:00", "page": "z"},
    ]
    _write_jsonl(tmp_path / "buys", buys)
    _write_jsonl(tmp_path / "clicks", clicks)
    sbuys = read_file_stream(spark, str(tmp_path / "buys"), BUY_SCHEMA)
    sclicks = read_file_stream(spark, str(tmp_path / "clicks"), CLICK_SCHEMA)
    joined = stream_stream_join(
        sbuys, sclicks, key="user_id", max_delay="10 minutes",
        watermark="1 minutes", how="leftOuter",
    )
    q = (
        joined.writeStream.format("parquet")
        .option("path", str(tmp_path / "sink"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = spark.read.parquet(str(tmp_path / "sink"))
    got = {(r.user_id, r.amount): r.page for r in out.collect()}
    assert got[(1, 5.0)] == "a"
    assert (9, 3.0) in got and got[(9, 3.0)] is None  # unmatched emitted


def test_stream_enrich_scd2_point_in_time(spark, tmp_path):
    """Late events get the attributes true at THEIR event time, current
    events get the open version, pre-history events pass through NULL —
    and the result matches the batch temporal_join on the same inputs."""
    import json

    from data_pipelines_examples_spark.operators.relational import temporal_join
    from data_pipelines_examples_spark.streaming.pipeline import stream_enrich_scd2

    hist = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", "2024-02-01 00:00:00", "bronze"),
            (1, "2024-02-01 00:00:00", None, "gold"),
            (2, "2024-01-15 00:00:00", None, "silver"),
        ],
        "user_id bigint, valid_from string, valid_to string, tier string",
    ).selectExpr(
        "user_id",
        "cast(valid_from as timestamp) as valid_from",
        "cast(valid_to as timestamp) as valid_to",
        "tier",
    )
    src = tmp_path / "facts"
    src.mkdir()
    rows = [
        {"event_id": 1, "user_id": 1, "ts": "2024-01-20 12:00:00"},
        {"event_id": 2, "user_id": 1, "ts": "2024-03-01 00:00:00"},
        {"event_id": 3, "user_id": 2, "ts": "2023-12-01 00:00:00"},
    ]
    (src / "b0.json").write_text("\n".join(json.dumps(r) for r in rows))
    stream = (
        spark.readStream.schema("event_id bigint, user_id bigint, ts string")
        .json(str(src))
        .selectExpr("event_id", "user_id", "cast(ts as timestamp) as ts")
    )
    enriched = stream_enrich_scd2(stream, hist, "user_id", "ts")
    q = (
        enriched.writeStream.format("memory")
        .queryName("enrich_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_enrich"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {r["event_id"]: r["tier"] for r in spark.table("enrich_out").collect()}
    assert got == {1: "bronze", 2: "gold", 3: None}
    # batch twin agreement on the same inputs
    facts = spark.createDataFrame(rows, "event_id bigint, user_id bigint, ts string").selectExpr(
        "event_id", "user_id", "cast(ts as timestamp) as ts"
    )
    batch = {
        r["event_id"]: r["tier"]
        for r in temporal_join(facts, hist, "user_id", "ts").collect()
    }
    assert batch == got
