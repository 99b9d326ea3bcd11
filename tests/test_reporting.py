"""Usage-report export: golden HTML rendering + executions audit table."""

from __future__ import annotations

import datetime

import pytest

from data_pipelines_examples_spark.reporting import (
    ReportTooLargeError,
    record_execution,
    save_html_report,
    to_html_report,
)

GOLDEN = (
    "<html><body><h2>Usage &amp; cost</h2>"
    '<table border="1"><thead><tr><th>bu</th><th>n_jobs</th><th>note</th></tr></thead>'
    "<tbody><tr><td>finance</td><td>3</td><td>&lt;ok&gt;</td></tr>"
    "<tr><td>ops</td><td>1</td><td></td></tr></tbody></table></body></html>"
)


def _agg(spark):
    return spark.createDataFrame(
        [("finance", 3, "<ok>"), ("ops", 1, None)], "bu string, n_jobs int, note string"
    ).orderBy("bu")


def test_to_html_report_golden(spark):
    assert to_html_report(_agg(spark), title="Usage & cost") == GOLDEN


def test_save_html_report_writes_artifact(spark, tmp_path):
    path = save_html_report(_agg(spark), str(tmp_path / "rpt"), title="Usage & cost")
    assert open(path, encoding="utf-8").read() == GOLDEN


def test_report_rejects_unaggregated_input(spark):
    with pytest.raises(ReportTooLargeError):
        to_html_report(spark.range(100), max_rows=10)


def test_record_execution_appends_and_registers(spark, tmp_path):
    t0 = datetime.datetime(2024, 1, 1, 8, 0, 0)
    t1 = datetime.datetime(2024, 1, 1, 8, 5, 0)
    path = str(tmp_path / "exec_audit")
    record_execution(spark, path, "usage_report", "s3://x/r.html", 1, t0, t1)
    record_execution(spark, path, "usage_report", "s3://x/r2.html", 2, t0, t1)
    got = spark.table("report_executions")
    assert got.count() == 2
    assert {r.run_id for r in got.collect()} == {1, 2}
    spark.sql("DROP TABLE report_executions")


GOLDEN_EMAIL = (
    'Content-Type: multipart/mixed; boundary="==b=="\n'
    "MIME-Version: 1.0\n"
    "Subject: Usage metrics finance 2024-01-01\n"
    "From: noreply@example.com\n"
    "To: a@example.com, b@example.com\n"
    "\n"
    "--==b==\n"
    'Content-Type: text/html; charset="us-ascii"\n'
    "MIME-Version: 1.0\n"
    "Content-Transfer-Encoding: 7bit\n"
    "\n"
    "<html><body>hi</body></html>\n"
    "--==b==\n"
    "Content-Type: application/octet-stream\n"
    "MIME-Version: 1.0\n"
    "Content-Transfer-Encoding: base64\n"
    "Content-Disposition: attachment; filename=\"usage_2024-01-01.html\"\n"
    "\n"
    "PGh0bWw+PGJvZHk+aGk8L2JvZHk+PC9odG1sPg==\n"
    "\n"
    "--==b==--\n"
)


def test_send_report_golden_via_injected_transport():
    from data_pipelines_examples_spark.reporting import send_report

    sent = []
    raw = send_report(
        "<html><body>hi</body></html>",
        ["a@example.com", "b@example.com"],
        "noreply@example.com",
        "Usage metrics finance 2024-01-01",
        send_fn=sent.append,
        attachment_name="usage_2024-01-01.html",
        boundary="==b==",
    )
    assert len(sent) == 1 and sent[0].as_string() == raw
    assert raw == GOLDEN_EMAIL


def test_send_report_requires_a_route():
    import pytest as _pytest

    from data_pipelines_examples_spark.reporting import send_report

    with _pytest.raises(ValueError, match="delivery route"):
        send_report("<p/>", ["a@x"], "f@x", "s")


def test_quarantine_split_tags_all_failed_rules(spark):
    from data_pipelines_examples_spark.dq.rules import DQRule, quarantine_split

    df = spark.createDataFrame(
        [
            (1, 10.0, "a"),    # clean
            (2, -5.0, "a"),    # fails neg
            (3, -1.0, None),   # fails neg AND null
            (4, 20.0, None),   # fails null
        ],
        "id int, amount double, tag string",
    )
    rules = [
        DQRule("neg_amount", "amount < 0"),
        DQRule("null_tag", "tag IS NULL"),
    ]
    valid, quarantined = quarantine_split(df, rules)
    assert [r["id"] for r in valid.collect()] == [1]
    assert valid.columns == df.columns  # schema preserved exactly
    got = {r["id"]: r["dq_failed_rules"] for r in quarantined.collect()}
    assert got == {2: "neg_amount", 3: "neg_amount,null_tag", 4: "null_tag"}


def test_quarantine_split_null_condition_is_not_a_violation(spark):
    """A rule condition evaluating to NULL (e.g. comparison on a NULL
    column) must not quarantine the row — only a definite TRUE does."""
    from data_pipelines_examples_spark.dq.rules import DQRule, quarantine_split

    df = spark.createDataFrame([(1, None), (2, -1.0)], "id int, amount double")
    valid, quarantined = quarantine_split(df, [DQRule("neg", "amount < 0")])
    assert [r["id"] for r in valid.collect()] == [1]
    assert [r["id"] for r in quarantined.collect()] == [2]


def test_flag_outliers_iqr_and_zscore(spark):
    from data_pipelines_examples_spark.dq.rules import flag_outliers

    rows = [(i, float(i % 10), None if i == 50 else 1.0) for i in range(100)]
    rows.append((100, 1000.0, 1.0))  # planted outlier in col a
    df = spark.createDataFrame(rows, "id int, a double, b double")
    out = flag_outliers(df, ["a", "b"], method="iqr")
    got = {r["id"]: (r["a_outlier"], r["b_outlier"]) for r in out.collect()}
    assert got[100][0] is True
    assert all(not got[i][0] for i in range(100))
    assert not any(v[1] for v in got.values())  # constant col: no outliers, NULL not flagged
    z = flag_outliers(df, ["a"], method="zscore", factor=3.0)
    zg = {r["id"]: r["a_outlier"] for r in z.collect()}
    assert zg[100] is True and sum(zg.values()) == 1


def test_detect_gaps(spark):
    from data_pipelines_examples_spark.operators.windows import detect_gaps

    rows = [
        (1, "2024-01-01 00:00:00"),
        (1, "2024-01-01 00:10:00"),
        (1, "2024-01-01 02:00:00"),  # 110-minute gap
        (2, "2024-01-01 00:00:00"),
    ]
    df = spark.createDataFrame(rows, "k int, ts string").selectExpr(
        "k", "cast(ts as timestamp) as ts"
    )
    out = detect_gaps(df, "k", "ts", max_gap_seconds=3600)
    rows = out.collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["k"] == 1 and r["gap_seconds"] == 6600.0
    assert str(r["gap_start"]) == "2024-01-01 00:10:00"
    assert str(r["gap_end"]) == "2024-01-01 02:00:00"


def test_corpus_datacard_values_and_artifact(spark, tmp_path):
    import json

    from data_pipelines_examples_spark.reporting import corpus_datacard

    df = spark.createDataFrame(
        [
            (1, "one two three", "web", "en"),
            (2, "one two three", "web", "en"),   # exact dup of 1
            (3, "four five", "books", "en"),
            (4, "sechs sieben acht", "web", "de"),
        ],
        "doc_id int, text string, source string, lang string",
    )
    path = str(tmp_path / "card.json")
    card = corpus_datacard(df, save_path=path)
    assert card["n_docs"] == 4
    assert card["n_tokens"] == 3 + 3 + 2 + 3
    assert card["n_distinct_texts"] == 3
    assert card["exact_dup_rate"] == 0.25
    assert card["by_source"] == {"web": 3, "books": 1}
    assert card["by_lang"] == {"en": 3, "de": 1}
    assert len(card["token_deciles"]) == 9
    with open(path) as f:
        assert json.load(f)["n_docs"] == 4


def test_numeric_drift_detects_scale_shift(spark):
    from data_pipelines_examples_spark.dq.rules import numeric_drift

    y = spark.range(1000).selectExpr("cast(id as double) as a", "cast(id % 7 as double) as b")
    t_same = spark.range(1000).selectExpr("cast(id as double) as a", "cast(id % 7 as double) as b")
    t_scaled = spark.range(1000).selectExpr(
        "cast(id * 100 as double) as a", "cast(id % 7 as double) as b"
    )
    same = numeric_drift(t_same, y, ["a", "b"])
    assert same["a"][1] and same["b"][1]
    shifted = numeric_drift(t_scaled, y, ["a", "b"])
    assert not shifted["a"][1]   # 100x amounts caught
    assert shifted["b"][1]       # untouched column stays ok


def test_compression_ratio_orders_text_quality(spark):
    from data_pipelines_examples_spark.operators.text import compression_ratio

    import random

    rng = random.Random(1)
    mash = "".join(rng.choice("abcdefghijklmnopqrstuvwxyz") for _ in range(2000))
    docs = spark.createDataFrame(
        [
            (1, "spam " * 400),                       # templated -> tiny ratio
            (
                2,
                "the quick brown fox jumps over one lazy dog near a quiet river "
                "while seventeen distant engines hum under gray november skies and "
                "several careful readers annotate unusual margins with green ink "
                "before walking home through narrow streets past closed bakeries",
            ),
            (3, mash),                                # high entropy -> ratio ~1
            (4, ""),
            (5, None),
        ],
        "doc_id int, text string",
    )
    out = {r["doc_id"]: r["compression_ratio"] for r in compression_ratio(docs).collect()}
    # templated text sits far below both natural prose and entropy; the
    # prose/mash ORDER is length-dependent (zlib overhead), so only the
    # templated-vs-rest separation is asserted
    assert out[1] < 0.05
    assert out[2] > 0.3 and out[3] > 0.3
    assert out[4] is None and out[5] is None


def test_corpus_checksum_order_independent_and_sensitive(spark):
    from data_pipelines_examples_spark.reporting import corpus_checksum

    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5), (3, "c", None)], "id int, v string, x double"
    )
    base = corpus_checksum(df)
    assert corpus_checksum(df.repartition(7)) == base          # layout-independent
    assert corpus_checksum(df.orderBy("v")) == base            # order-independent
    changed = df.replace(2.5, 99.0, subset=["x"])
    assert corpus_checksum(changed) != base                    # value change detected
    assert corpus_checksum(df.limit(2)) != base                # row-count folded in
    assert corpus_checksum(spark.createDataFrame([], df.schema)) != base
    # portable path is deterministic too
    assert corpus_checksum(df, hash_how="portable") == corpus_checksum(
        df.repartition(3), hash_how="portable"
    )


def test_corpus_checksum_null_placement_sensitive_both_paths(spark):
    """xxhash64 skips NULL inputs (the fold keeps the running seed), so
    without the isNull interleave ('a', NULL) and (NULL, 'a') hashed
    identically — a value sliding into an adjacent NULL column passed
    the migration check. Both hash paths must distinguish them."""
    from data_pipelines_examples_spark.reporting import corpus_checksum

    a = spark.createDataFrame([("a", None)], "c1 string, c2 string")
    b = spark.createDataFrame([(None, "a")], "c1 string, c2 string")
    for how in ("xxhash64", "portable"):
        assert corpus_checksum(a, hash_how=how) != corpus_checksum(
            b, hash_how=how
        ), how
    # NULL vs empty string must also differ (the 'N' sentinel / flag)
    c = spark.createDataFrame([("", "x")], "c1 string, c2 string")
    d = spark.createDataFrame([(None, "x")], "c1 string, c2 string")
    for how in ("xxhash64", "portable"):
        assert corpus_checksum(c, hash_how=how) != corpus_checksum(
            d, hash_how=how
        ), how
