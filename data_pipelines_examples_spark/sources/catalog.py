"""Catalog & DDL operations (SURVEY §2.1 K8/K9).

Reference parity:
- CREATE DATABASE/TABLE with partition columns, comments, properties —
  copy_into_command_gzip_splittable.sql:31-43, hive_to_hive_cte.py:14-38,
  windowed_lagN_awskms_postgres_date_partition.py:72-87
- register-external-tables loop over a path listing —
  glue_catolog_copy_register_tables.py:11-35,134-151
- SHOW TABLES / DESCRIBE probes — copy_into_command_gzip_splittable.sql:67
- cache lifecycle — usage_analysis.py:87, from_api_call_to_columnar_db.py:588
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def create_database(spark: SparkSession, name: str, comment: str = "") -> None:
    c = f" COMMENT '{comment}'" if comment else ""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {name}{c}")


def create_table(
    spark: SparkSession,
    name: str,
    columns_ddl: str,
    fmt: str = "parquet",
    partitioned_by: list[str] | None = None,
    location: str | None = None,
    comment: str = "",
    properties: dict[str, str] | None = None,
) -> None:
    """CREATE TABLE with optional partitioning/location/properties — the
    reference's DDL shapes as one helper."""
    parts = (
        f" PARTITIONED BY ({', '.join(partitioned_by)})" if partitioned_by else ""
    )
    loc = f" LOCATION '{location}'" if location else ""
    cmt = f" COMMENT '{comment}'" if comment else ""
    props = (
        " TBLPROPERTIES (" + ", ".join(f"'{k}'='{v}'" for k, v in properties.items()) + ")"
        if properties
        else ""
    )
    spark.sql(
        f"CREATE TABLE IF NOT EXISTS {name} ({columns_ddl}) USING {fmt}"
        f"{parts}{cmt}{loc}{props}"
    )


def register_parquet_tables(
    spark: SparkSession, tables: dict[str, str], database: str | None = None
) -> list[str]:
    """Register a {table_name: path} mapping as external parquet tables —
    the Glue register loop. Returns the registered names."""
    registered = []
    for name, path in tables.items():
        full = f"{database}.{name}" if database else name
        spark.sql(f"CREATE TABLE IF NOT EXISTS {full} USING parquet LOCATION '{path}'")
        registered.append(full)
    return registered


def show_tables(spark: SparkSession, database: str | None = None) -> list[str]:
    df = spark.sql(f"SHOW TABLES IN {database}" if database else "SHOW TABLES")
    return [r.tableName for r in df.collect()]


def table_row_counts(spark: SparkSession, names: list[str]) -> dict[str, int]:
    """Row-count probe loop (the reference prints counts per registered
    table)."""
    return {n: spark.table(n).count() for n in names}


def cached(df: DataFrame) -> DataFrame:
    df.cache()
    return df


def analyze_table(
    spark: SparkSession,
    name: str,
    columns: list[str] | None = None,
) -> dict:
    """ANALYZE TABLE → table- and column-level statistics for the
    cost-based optimizer. At 100 TB this is what lets Catalyst reorder
    multi-way joins and choose broadcast sides from true row counts rather
    than file-size guesses; run it after large loads/compactions.

    ``columns=None`` computes table stats only (cheap — size + count);
    a column list adds NDV/min/max/null-count per column (a full scan —
    schedule it, don't run it inline). Returns the parsed statistics
    from DESCRIBE EXTENDED.
    """
    spark.sql(f"ANALYZE TABLE {name} COMPUTE STATISTICS")
    if columns:
        cols = ", ".join(columns)
        spark.sql(f"ANALYZE TABLE {name} COMPUTE STATISTICS FOR COLUMNS {cols}")
    rows = spark.sql(f"DESCRIBE TABLE EXTENDED {name}").collect()
    stats = next(
        (r.data_type for r in rows if r.col_name == "Statistics"), None
    )
    out = {"statistics": stats}
    if columns:
        for c in columns:
            desc = spark.sql(f"DESCRIBE EXTENDED {name} {c}").collect()
            out[c] = {r.info_name: r.info_value for r in desc}
    return out


def drop_table(spark: SparkSession, name: str) -> None:
    spark.sql(f"DROP TABLE IF EXISTS {name}")
