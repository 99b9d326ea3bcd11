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


def build_report_email(
    to_addrs: list[str],
    from_addr: str,
    subject: str,
    html_body: str,
    attachment_name: str | None = None,
    boundary: str | None = None,
):
    """Compose the report email exactly as the reference does
    (send_email_job_usage_report_html.py:118-145): multipart message,
    joined To header, the HTML report attached under a dated filename —
    but without the tempfile detour (the body is attached directly).

    ``boundary`` pins the MIME boundary for deterministic golden tests;
    leave None in production for a random one."""
    from email.mime.application import MIMEApplication
    from email.mime.multipart import MIMEMultipart
    from email.mime.text import MIMEText

    msg = MIMEMultipart(boundary=boundary)
    msg["Subject"] = subject
    msg["From"] = from_addr
    msg["To"] = ", ".join(to_addrs)
    msg.attach(MIMEText(html_body, "html"))
    if attachment_name:
        attachment = MIMEApplication(html_body.encode("utf-8"))
        attachment.add_header(
            "Content-Disposition", "attachment", filename=attachment_name
        )
        msg.attach(attachment)
    return msg


def send_report(
    html_body: str,
    to_addrs: list[str],
    from_addr: str,
    subject: str,
    send_fn=None,
    attachment_name: str | None = None,
    smtp_host: str | None = None,
    smtp_port: int = 25,
    boundary: str | None = None,
) -> str:
    """Deliver the rendered report. ``send_fn(msg)`` is the injectable
    transport (the reference's SES client is env-bound the same way);
    without it, plain smtplib to ``smtp_host``. Returns the serialized
    message that was handed to the transport."""
    msg = build_report_email(
        to_addrs, from_addr, subject, html_body, attachment_name, boundary
    )
    if send_fn is not None:
        send_fn(msg)
    elif smtp_host is not None:
        import smtplib

        with smtplib.SMTP(smtp_host, smtp_port) as smtp:
            smtp.sendmail(from_addr, to_addrs, msg.as_string())
    else:
        raise ValueError("provide send_fn or smtp_host — no delivery route")
    return msg.as_string()


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


def corpus_datacard(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str | None = "source",
    lang_col: str | None = "lang",
    save_path: str | None = None,
) -> dict:
    """One datacard dict for a document corpus — the release artifact a
    training dataset ships with (counts, token volume, length deciles,
    composition by source/language, exact-duplicate rate). Three
    aggregation jobs total regardless of corpus size: one global stats
    pass (count / tokens / distinct text hashes / length deciles via
    percentile_approx in a single aggregate row), plus one
    dimension-sized groupBy each for source and language composition.

    With ``save_path`` the card is also written as a single JSON file
    next to the data (the ``_manifest.json`` discipline of
    ``write_training_shards``).
    """
    import json as _json

    from pyspark.sql import functions as F

    from .cache import internal_persist_scope

    ntok = F.size(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"))
    # Terminal composition: the card is a plain dict — scoped drain
    # (cache.py) releases exactly the internal persists armed inside
    # this call, on success or exception.
    with internal_persist_scope():
        return _corpus_datacard_inner(
            df, text_col, source_col, lang_col, save_path, ntok, _json
        )


def _corpus_datacard_inner(df, text_col, source_col, lang_col, save_path, ntok, _json):
    from pyspark.sql import functions as F

    row = df.agg(
        F.count("*").alias("n_docs"),
        F.sum(ntok).alias("n_tokens"),
        F.countDistinct(F.xxhash64(text_col)).alias("n_distinct_texts"),
        F.percentile_approx(
            ntok.cast("double"), [i / 10.0 for i in range(1, 10)], 10000
        ).alias("token_deciles"),
    ).first()
    card = {
        "n_docs": row["n_docs"],
        "n_tokens": row["n_tokens"],
        "n_distinct_texts": row["n_distinct_texts"],
        "exact_dup_rate": (
            round(1.0 - row["n_distinct_texts"] / row["n_docs"], 6)
            if row["n_docs"]
            else 0.0
        ),
        "token_deciles": [float(x) for x in row["token_deciles"]],
    }
    for key, col in (("by_source", source_col), ("by_lang", lang_col)):
        if col is not None and col in df.columns:
            card[key] = {
                r[col]: r["n"]
                for r in df.groupBy(col).agg(F.count("*").alias("n")).collect()
            }
    if save_path is not None:
        from .sources.writers import _hadoop_fs

        fs, hpath = _hadoop_fs(df.sparkSession, save_path)
        out = fs.create(hpath, True)
        out.write(bytearray(_json.dumps(card, indent=2, sort_keys=True).encode()))
        out.close()
    return card


def corpus_checksum(
    df: DataFrame,
    cols: list[str] | None = None,
    hash_how: str = "xxhash64",
) -> int:
    """Order-independent content checksum of a whole DataFrame: XOR of
    per-row 64-bit hashes over ``cols`` (default: all columns). Equal
    checksums over the same columns ⇒ same multiset of rows NO MATTER
    the partitioning, file layout, or row order — the artifact-equality
    primitive behind "did the rewrite/compaction/migration change the
    data?" (complements write_validated's count check, which a
    swap-two-values corruption passes).

    XOR, not SUM: self-inverse, overflow-free, and still detects any
    single-row change. Caveat shared by every XOR scheme: a row
    appearing an EVEN number of times cancels out — pair it with the
    row count. ``hash_how='portable'`` makes the checksum re-derivable
    outside Spark (md5-based, engine-independent).
    """
    from pyspark.sql import functions as F

    from .functions.hashing import hash64

    row = corpus_checksum_frame(df, cols, hash_how).first()
    x = row["checksum_xor"] if row["checksum_xor"] is not None else 0
    # fold the count in so even-multiplicity cancellation can't alias an
    # empty/smaller corpus
    return int(x) ^ int(row["n_rows"])


def corpus_checksum_frame(
    df: DataFrame,
    cols: list[str] | None = None,
    hash_how: str = "xxhash64",
) -> DataFrame:
    """The 1-row (checksum_xor, n_rows) frame behind ``corpus_checksum``
    — exposed so the checksum itself is oracle-verifiable (q99) and can
    be written as a tiny artifact next to the data."""
    from pyspark.sql import functions as F

    from .functions.hashing import hash64

    cols = cols or df.columns
    # Unambiguous row encoding for the portable path: concat_ws SKIPS
    # null columns, so ('a', NULL) and (NULL, 'a') would hash
    # identically, and a value containing the separator could alias a
    # column boundary. Encode each column as 'N' when NULL, else
    # '<char_length>:<value>' — the length prefix makes the joined
    # string parse to exactly one tuple regardless of embedded
    # separators, and the N sentinel distinguishes NULL from ''. The
    # q99 oracle mirrors this encoding byte-for-byte in DuckDB SQL.
    def _enc(c: str):
        s = F.col(c).cast("string")
        return F.when(s.isNull(), F.lit("N")).otherwise(
            F.concat(F.length(s).cast("string"), F.lit(":"), s)
        )

    struct = F.concat_ws("\x1f", *[_enc(c) for c in cols])
    # The fast path needs the same disambiguation: xxhash64 SKIPS null
    # inputs (the fold leaves the running seed unchanged), so
    # xxhash64('a', NULL) == xxhash64(NULL, 'a') — interleaving each
    # column with its isNull flag puts the null POSITION into the hash
    # stream, so rows differing only in null placement can't alias.
    h = (
        F.xxhash64(*[x for c in cols for x in (F.col(c), F.col(c).isNull())])
        if hash_how == "xxhash64"
        else hash64(struct, how="portable")
    )
    return df.agg(
        F.bit_xor(h).cast("long").alias("checksum_xor"),
        F.count("*").alias("n_rows"),
    )
