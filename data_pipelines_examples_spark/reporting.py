"""Usage-report export: small aggregate → HTML table artifact → executions
audit table.

Reference parity: the job-usage report pipeline
(notebooks/databricks/python/send_email_job_usage_report_html.py:111-115,
232-245) renders an HTML report body, saves it next to the data
(``save_to_s3 → .../usage_report.html``), and appends one audit row per
execution to a ``report_executions`` table registered in the catalog.
Re-expressed Spark-first: the report input is whatever aggregate the
caller built with the DataFrame API; only the FINAL, already-aggregated
rows are collected to the driver (a report table is human-scale by
definition — ``max_rows`` guards against misuse on an unaggregated
frame), and the audit table is a plain parquet-backed catalog table since
this environment ships no Delta.
"""

from __future__ import annotations

import datetime
import html
import os

from pyspark.sql import DataFrame, SparkSession


class ReportTooLargeError(ValueError):
    """Raised when the report input exceeds ``max_rows`` — the input must
    be an aggregate, not a fact table."""


def to_html_report(df: DataFrame, title: str | None = None, max_rows: int = 1000) -> str:
    """Render a small aggregate DataFrame as a self-contained HTML table.

    Values are HTML-escaped; NULL renders as an empty cell. Deterministic
    for a deterministic input order — callers should ``orderBy`` first
    (golden test pins the exact output).
    """
    rows = df.limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise ReportTooLargeError(
            f"report input exceeds max_rows={max_rows}; aggregate before reporting"
        )
    cols = df.columns
    head = "".join(f"<th>{html.escape(c)}</th>" for c in cols)
    body = "".join(
        "<tr>"
        + "".join(
            f"<td>{'' if v is None else html.escape(str(v))}</td>" for v in row
        )
        + "</tr>"
        for row in rows
    )
    title_html = f"<h2>{html.escape(title)}</h2>" if title else ""
    return (
        "<html><body>"
        + title_html
        + "<table border=\"1\"><thead><tr>"
        + head
        + "</tr></thead><tbody>"
        + body
        + "</tbody></table></body></html>"
    )


def save_html_report(
    df: DataFrame,
    report_dir: str,
    filename: str = "usage_report.html",
    title: str | None = None,
    max_rows: int = 1000,
) -> str:
    """Write the rendered report next to the data (the reference's
    ``save_to_s3`` shape) and return its path."""
    os.makedirs(report_dir, exist_ok=True)
    path = os.path.join(report_dir, filename)
    with open(path, "w", encoding="utf-8") as f:
        f.write(to_html_report(df, title=title, max_rows=max_rows))
    return path


def record_execution(
    spark: SparkSession,
    table_path: str,
    job_name: str,
    report_path: str,
    run_id: int,
    started_at: datetime.datetime,
    finished_at: datetime.datetime,
    table_name: str = "report_executions",
) -> None:
    """Append one audit row per report execution and keep the catalog table
    registered over the path (reference lines 232-245: append + CREATE
    TABLE IF NOT EXISTS over the same location)."""
    row_df = spark.createDataFrame(
        [(job_name, report_path, run_id, started_at, finished_at)],
        "job_name string, report_path string, run_id bigint, "
        "started_at timestamp, finished_at timestamp",
    )
    row_df.write.mode("append").parquet(table_path)
    spark.sql(
        f"CREATE TABLE IF NOT EXISTS {table_name} USING PARQUET LOCATION '{table_path}'"
    )
