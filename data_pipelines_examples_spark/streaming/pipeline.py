"""File-source streaming ETL — the CloudTrail shape, generalized.

Reference parity (notebooks/databricks/scala/cloudtrail_etl.scala):
- ST1 file-source stream with maxFilesPerTrigger (:95-98)
- ST2 stream transform: explode nested records + timestamp parse (:110-114)
- ST3 parquet sink, partitionBy(date), processing-time trigger, checkpoint (:128-138)
- ST4 concurrent batch reads over the live sink path (:158-162)
- ST5 + watermarked sliding-window aggregates — the idiomatic upgrade of the
  reference's "reprocess two partition dates per run" late-data pattern
  (windowed_lagN_awskms_postgres_date_partition.py:32-52; SURVEY §2.9 note).

Scale notes: the stream transform is identical DataFrame code to batch —
Catalyst plans it incrementally. State for windowed distinct aggregation is
bounded by the watermark; partitionBy(date) on the sink keeps downstream
batch scans partition-pruned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery


def read_file_stream(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    fmt: str = "json",
    max_files_per_trigger: int = 100,
) -> DataFrame:
    """ST1: rate-limited file-source stream with an explicit schema
    (streams require one — no inference)."""
    return (
        spark.readStream.format(fmt)
        .schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .load(path)
    )


def flatten_records(
    df: DataFrame,
    records_col: str = "Records",
    event_time_col: str = "eventTime",
    ts_format: str = "yyyy-MM-dd'T'HH:mm:ss",
) -> DataFrame:
    """ST2: explode a nested array-of-struct payload into one row per
    record, parse event time, and derive the partition date."""
    exploded = df.select(F.explode(F.col(records_col)).alias("record"))
    flat = exploded.select("record.*")
    return flat.withColumn(
        "timestamp", F.to_timestamp(F.col(event_time_col), ts_format)
    ).withColumn("date", F.to_date("timestamp"))


def write_partitioned_stream(
    df: DataFrame,
    path: str,
    checkpoint: str,
    partition_by: str = "date",
    trigger_seconds: int = 10,
    fmt: str = "parquet",
    output_mode: str = "append",
) -> StreamingQuery:
    """ST3: partitioned file sink with processing-time trigger + checkpoint."""
    return (
        df.writeStream.format(fmt)
        .partitionBy(partition_by)
        .option("checkpointLocation", checkpoint)
        .option("path", path)
        .outputMode(output_mode)
        .trigger(processingTime=f"{trigger_seconds} seconds")
        .start()
    )


def windowed_distinct_users(
    df: DataFrame,
    ts_col: str = "timestamp",
    user_col: str = "user_id",
    window: str = "10 minutes",
    slide: str = "1 minute",
    watermark: str = "15 minutes",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """ST5: sliding-window approx-distinct with a watermark — the streaming
    analog of the batch RANGE-frame distinct (SURVEY §2.9). Late rows beyond
    the watermark are dropped instead of reprocessing whole partition dates."""
    groups = [F.window(F.col(ts_col), window, slide)] + [
        F.col(c) for c in (group_cols or [])
    ]
    return (
        df.withWatermark(ts_col, watermark)
        .groupBy(*groups)
        .agg(F.approx_count_distinct(user_col).alias("approx_users"))
    )


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "timestamp",
    right_ts: str = "timestamp",
    max_delay: str = "10 minutes",
    watermark: str = "15 minutes",
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream equi-join with an event-time band: a left
    row matches right rows with the same ``key`` whose timestamp lies in
    [left_ts − max_delay, left_ts]. The band + both-side watermarks is
    what BOUNDS the join state — without it Spark must buffer both
    streams forever; with it, rows older than watermark + band are
    evicted. This is the streaming upgrade of the reference's
    batch-join-per-partition-date reprocessing loop
    (windowed_lagN_awskms_postgres_date_partition.py:32-52): late data
    within the watermark joins exactly once, instead of re-running whole
    partition dates.

    Outer variants require BOTH the watermark and the time band (Spark
    refuses unbounded-state outer stream-stream joins); pass
    ``how='leftOuter'`` etc. only with event-time columns on both sides.

    Column hygiene: the right side's key/ts are suffixed ``_r`` so the
    joined schema is unambiguous downstream.
    """
    l = left.withWatermark(left_ts, watermark)
    r = right.withWatermark(right_ts, watermark)
    for c in (key, right_ts):
        r = r.withColumnRenamed(c, f"{c}_r")
    cond = (
        (F.col(key) == F.col(f"{key}_r"))
        & (F.col(f"{right_ts}_r") >= F.col(left_ts) - F.expr(f"INTERVAL {max_delay}"))
        & (F.col(f"{right_ts}_r") <= F.col(left_ts))
    )
    return l.join(r, cond, how)


def write_stream_upsert(
    df: DataFrame,
    path: str,
    keys: list[str],
    version_col: str,
    checkpoint: str,
    trigger_seconds: int = 10,
    output_mode: str = "append",
) -> StreamingQuery:
    """MERGE-style streaming sink: each micro-batch upserts into the
    parquet target by ``keys`` via ``sources.writers.upsert_by_key``
    (latest ``version_col`` per key wins) — the
    foreachBatch pattern Delta users run as ``MERGE INTO`` per batch,
    re-expressed over plain parquet since delta-spark is absent from this
    env. foreachBatch gives the batch writer exactly-once-per-epoch
    semantics through the checkpoint: a replayed batch re-upserts the
    same keys idempotently, so the sink converges even across restarts.

    At scale the rewrite cost is the whole target per batch — acceptable
    for dimension-sized tables (the reference's fmaps/hive upserts,
    fmaps_from_hive_insert_mysql.py:136-177); fact-sized streams should
    use the append sink + compaction instead.
    """
    from ..sources.writers import upsert_by_key

    def _upsert(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        upsert_by_key(batch_df, path, keys, version_col)

    return (
        df.writeStream.foreachBatch(_upsert)
        .option("checkpointLocation", checkpoint)
        .outputMode(output_mode)
        .trigger(processingTime=f"{trigger_seconds} seconds")
        .start()
    )


def run_stream_to_completion(
    query: StreamingQuery, timeout_seconds: float = 60.0
) -> None:
    """Drive a file-source stream until all currently-available input is
    processed, then stop — the pattern batch tests use to validate
    streaming pipelines deterministically."""
    import time

    deadline = time.time() + timeout_seconds
    while time.time() < deadline:
        progress = query.lastProgress
        if progress is not None and progress["numInputRows"] == 0 and query.status[
            "isTriggerActive"
        ] is False:
            break
        time.sleep(0.5)
    query.stop()
    query.awaitTermination(10)


def stream_enrich_scd2(
    stream: DataFrame,
    dim_history: DataFrame,
    key: str,
    ts_col: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    value_cols: list[str] | None = None,
) -> DataFrame:
    """Point-in-time enrichment of a stream against an SCD2 dimension
    history (``dedup.scd2_history`` output): each streaming row joins
    the dimension version whose [valid_from, valid_to) interval contains
    its EVENT time — so late-arriving events pick up the attributes that
    were true when they happened, not today's (the classic streaming
    enrichment bug this operator exists to prevent).

    Stream-static join: stateless per micro-batch, and a file-backed
    static side is re-listed each batch, so dimension updates flow in
    without restarting the query. Here the containment condition IS the
    right shape (unlike batch ``temporal_join``): the dim side is
    dimension-sized and broadcasts, so there is no per-key cross product
    at scale — each micro-batch row probes a broadcast hash of its key's
    few versions. SCD2 non-overlap guarantees at most one match per row
    (left join: unmatched rows pass through with NULL attributes).
    """
    if value_cols is None:
        value_cols = [
            c for c in dim_history.columns if c not in (key, valid_from, valid_to)
        ]
    dim = F.broadcast(
        dim_history.select(key, valid_from, valid_to, *value_cols)
    )
    cond = (
        (stream[key] == dim[key])
        & (stream[ts_col] >= dim[valid_from])
        & (dim[valid_to].isNull() | (stream[ts_col] < dim[valid_to]))
    )
    joined = stream.join(dim, cond, "left")
    return joined.select(
        *[stream[c] for c in stream.columns],
        *[dim[c] for c in value_cols],
        dim[valid_from].alias(valid_from),
        dim[valid_to].alias(valid_to),
    )


def attach_progress_collector(spark: SparkSession):
    """Streaming observability: a ``StreamingQueryListener`` that records
    every micro-batch's progress (batch id, input rows, processed rows/s,
    per-operator state rows) into an in-memory list — the hook a real
    deployment points at its metrics sink (StatsD, CloudWatch; the
    reference's usage reports poll the same numbers from the Jobs API
    after the fact, send_email_job_usage_report_html.py).

    Returns the collector; read ``collector.records`` (list of dicts) and
    call ``collector.detach()`` when done — listeners outlive queries,
    and a forgotten one keeps accumulating for every later query on the
    session.
    """
    from pyspark.sql.streaming import StreamingQueryListener

    class _Collector(StreamingQueryListener):
        def __init__(self):
            self.records: list[dict] = []

        def onQueryStarted(self, event):
            pass

        def onQueryProgress(self, event):
            p = event.progress
            self.records.append(
                {
                    "query_id": str(p.id),
                    "batch_id": p.batchId,
                    "num_input_rows": p.numInputRows,
                    "processed_rows_per_second": p.processedRowsPerSecond,
                    "duration_ms": dict(p.durationMs or {}),
                }
            )

        def onQueryTerminated(self, event):
            pass

        def onQueryIdle(self, event):
            pass

        def detach(self):
            spark.streams.removeListener(self)

    collector = _Collector()
    spark.streams.addListener(collector)
    return collector
