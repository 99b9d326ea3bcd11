"""Source readers (SURVEY §2.1 S1-S17), Spark-first.

Every reader returns a DataFrame and keeps options declarative so Catalyst
retains pushdown/pruning. Glob paths, explicit schemas, and delimiter
options mirror the reference's read shapes:

- CSV explicit-schema / inferSchema / delimited —
  notebooks/databricks/python/usage_analysis.py:62-67,
  notebooks/databricks/python/tpcds_automated_population.py:167-177
- glob-pattern multi-account scan — notebooks/databricks/scala/cloudtrail_etl.scala:14,95-98
- parquet-path SQL scan — cloudtrail_etl.scala:158
- JDBC subquery pushdown — windowed_lagN_awskms_postgres_date_partition.py:332-338
- REST API pagination → DataFrame — from_api_call_to_columnar_db.py:99-151
- in-memory rows → DataFrame — from_api_call_to_columnar_db.py:217-299
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_csv(
    spark: SparkSession,
    path: str | list[str],
    schema: T.StructType | str | None = None,
    header: bool = True,
    delimiter: str = ",",
    infer_schema: bool = False,
    escape: str | None = None,
    **options: str,
) -> DataFrame:
    reader = (
        spark.read.option("header", str(header).lower())
        .option("delimiter", delimiter)
    )
    if escape is not None:
        reader = reader.option("escape", escape)
    if schema is not None:
        reader = reader.schema(schema)
    elif infer_schema:
        reader = reader.option("inferSchema", "true")
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.csv(path)


def read_parquet(spark: SparkSession, path: str | list[str]) -> DataFrame:
    return spark.read.parquet(*([path] if isinstance(path, str) else path))


def read_json(
    spark: SparkSession,
    path: str | list[str],
    schema: T.StructType | str | None = None,
    multiline: bool = False,
) -> DataFrame:
    reader = spark.read.option("multiLine", str(multiline).lower())
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_text(spark: SparkSession, path: str | list[str]) -> DataFrame:
    return spark.read.text(path)


def read_mongo(
    spark: SparkSession,
    uri: str,
    database: str,
    collection: str,
    schema: T.StructType | str | None = None,
    read_preference: str = "secondary",
    fetch_fn: Callable[[], list[dict]] | None = None,
    **options: str,
) -> DataFrame:
    """MongoDB collection scan (reference:
    get_latest_mongo_db_insert.py:47-55 — connector format + uri/database/
    collection options, secondary read preference).

    Default path uses the official Spark connector (``format("mongodb")``)
    and needs its jar on the classpath — absent in this sandbox, so the
    seam is injectable: pass ``fetch_fn() -> list[dict]`` (e.g. a pymongo
    cursor materializer) and the rows land via ``createDataFrame``. The
    driver-side fetch is also the honest pattern for small/config
    collections; partitioned reads of big collections need the connector.
    """
    if fetch_fn is not None:
        rows = list(fetch_fn())
        if schema is not None:
            return spark.createDataFrame(rows, schema)
        return spark.createDataFrame(rows)
    reader = (
        spark.read.format("mongodb")
        .option("connection.uri", uri)
        .option("database", database)
        .option("collection", collection)
        .option("readPreference.name", read_preference)
    )
    if schema is not None:
        reader = reader.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def read_table(spark: SparkSession, name: str) -> DataFrame:
    return spark.table(name)


def read_parquet_sql(spark: SparkSession, path: str) -> DataFrame:
    """SQL path-scan: ``SELECT * FROM parquet.`/path``` (reference:
    cloudtrail_etl.scala:158)."""
    return spark.sql(f"SELECT * FROM parquet.`{path}`")


def read_jdbc_pushdown(
    spark: SparkSession,
    url: str,
    query: str,
    properties: dict[str, str] | None = None,
    **options: str,
) -> DataFrame:
    """JDBC scan with subquery pushdown: the whole ``query`` executes on the
    remote database, only its result crosses the wire."""
    reader = spark.read.format("jdbc").option("url", url).option("query", query)
    for k, v in {**(properties or {}), **options}.items():
        reader = reader.option(k, v)
    return reader.load()


def from_rows(
    spark: SparkSession,
    rows: Iterable[tuple | dict],
    schema: T.StructType | str,
) -> DataFrame:
    """Driver-collected rows → DataFrame (the reference's
    ``sc.parallelize(list).toDF`` bridge, minus the RDD detour)."""
    return spark.createDataFrame(list(rows), schema)


def read_paginated_api(
    spark: SparkSession,
    fetch_page: Callable[[int], tuple[list[dict], bool]],
    schema: T.StructType | str,
    max_pages: int = 10_000,
    retries: int = 10,
    backoff_seconds: float = 1.0,
) -> DataFrame:
    """Paginated API → DataFrame with linear-backoff retry (reference:
    from_api_call_to_columnar_db.py:99-151 — 500/page, retry ×10).

    ``fetch_page(page)`` returns (rows, has_more). Fetching is inherently
    driver-side (the API is the bottleneck, not Spark); the result becomes
    a distributed DataFrame immediately. For large extractions, fetch to
    object storage and use a file scan instead.
    """
    all_rows: list[dict] = []
    page = 0
    while page < max_pages:
        for attempt in range(retries):
            try:
                rows, has_more = fetch_page(page)
                break
            except Exception:  # noqa: BLE001
                if attempt == retries - 1:
                    raise
                time.sleep(backoff_seconds * (attempt + 1))
        all_rows.extend(rows)
        if not has_more:
            break
        page += 1
    return spark.createDataFrame(all_rows, schema)


def copy_into(
    spark: SparkSession,
    target_path: str,
    source_glob: str,
    schema: T.StructType | str,
    fmt: str = "csv",
    pattern: str | None = None,
    delimiter: str = ",",
    header: bool = True,
) -> int:
    """Bulk-load files matching a glob (and optional regex ``pattern`` on
    the file name) into a parquet target — the COPY INTO idiom
    (reference: copy_into_command_gzip_splittable.sql:47-63, including the
    PATTERN= file filter). Returns rows loaded.

    Splittable formats parallelize per file split; gzip inputs fall back to
    one task per file, so many medium files beat one giant archive (the
    reference ships a splittable-gzip codec for exactly this reason).
    """
    reader = (
        spark.read.option("header", str(header).lower())
        .option("delimiter", delimiter)
        .schema(schema)
    )
    if pattern is not None:
        reader = reader.option("pathGlobFilter", pattern)
    df = reader.format(fmt).load(source_glob)
    # Pin ONE scan for both the count and the write: files matching the
    # glob that appear/disappear between two separate jobs would make the
    # returned count diverge from what was actually appended.
    #
    # Deliberately NOT the Observation API: registering any Observation
    # on this session leaves Spark 4.1's ObservationManager captured in
    # later ML-vector collect closures, which then fail with
    # NotSerializableException (regression-pinned in
    # tests/test_catalog_copyinto.py::test_copy_into_does_not_poison_ml_collect).
    df = df.cache()
    try:
        loaded = df.count()
        df.write.mode("append").parquet(target_path)
    finally:
        df.unpersist()
    return loaded


def range_table(spark: SparkSession, n: int, col: str = "id") -> DataFrame:
    """``RANGE(n)`` generator table (reference: sas_conversion...sql:30 salt ids)."""
    return spark.range(n).withColumnRenamed("id", col)


def read_jsonl_quarantine(
    spark: SparkSession,
    path: str,
    schema: str | T.StructType,
    corrupt_col: str = "_corrupt_record",
) -> tuple[DataFrame, DataFrame]:
    """Schema-on-read JSON-lines ingestion with dead-letter routing:
    PERMISSIVE parsing keeps malformed lines in ``corrupt_col`` instead
    of dropping (DROPMALFORMED) or failing the job (FAILFAST), and this
    splits them out — (good rows with the declared schema, bad rows as
    (raw_line,)) — so ingestion never silently loses data and the
    quarantine sink preserves the original bytes for replay after a
    parser fix.

    Spark quirk handled here: a row is only SAFELY "good" if the corrupt
    column is null — but referencing the corrupt column requires it in
    the declared schema, and Spark refuses to prune a query that selects
    ONLY the corrupt column, so the split caches one parsed pass and
    filters twice.
    """
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    # copy, don't .add() in place — StructType.add mutates the caller's object
    full = T.StructType(list(schema.fields) + [T.StructField(corrupt_col, T.StringType())])
    parsed = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .json(path)
        .cache()
    )
    good = parsed.filter(F.col(corrupt_col).isNull()).drop(corrupt_col)
    bad = parsed.filter(F.col(corrupt_col).isNotNull()).select(
        F.col(corrupt_col).alias("raw_line")
    )
    return good, bad
