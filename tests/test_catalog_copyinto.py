"""Tests for catalog/DDL helpers and the COPY INTO analog."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipelines_examples_spark.sources.catalog import (
    create_database,
    create_table,
    drop_table,
    register_parquet_tables,
    show_tables,
    table_row_counts,
)
from data_pipelines_examples_spark.sources.readers import copy_into


def test_catalog_register_and_probe(spark, tmp_path):
    p1 = str(tmp_path / "t1")
    p2 = str(tmp_path / "t2")
    spark.range(10).write.parquet(p1)
    spark.range(5).write.parquet(p2)
    names = register_parquet_tables(spark, {"reg_t1": p1, "reg_t2": p2})
    try:
        assert set(names) <= set(show_tables(spark))
        counts = table_row_counts(spark, names)
        assert counts == {"reg_t1": 10, "reg_t2": 5}
    finally:
        for n in names:
            drop_table(spark, n)


def test_create_table_ddl(spark, tmp_path):
    create_database(spark, "dq_test_db")
    create_table(
        spark,
        "dq_test_db.audit",
        "ds string, rule_name string, n_violations bigint",
        partitioned_by=["ds"],
        location=str(tmp_path / "audit"),
        properties={"pipeline": "dq"},
    )
    try:
        assert "audit" in show_tables(spark, "dq_test_db")
        spark.sql(
            "INSERT INTO dq_test_db.audit PARTITION (ds='2024-01-01') "
            "SELECT 'r1', 3"
        )
        got = spark.table("dq_test_db.audit").collect()
        assert [(r.ds, r.rule_name, r.n_violations) for r in got] == [
            ("2024-01-01", "r1", 3)
        ]
    finally:
        drop_table(spark, "dq_test_db.audit")


def test_copy_into_with_pattern(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    (src / "a_enc_prov_1.txt").write_text("id,v\n1,x\n2,y\n")
    (src / "a_enc_prov_2.txt").write_text("id,v\n3,z\n")
    (src / "skipme.csv").write_text("id,v\n99,n\n")
    target = str(tmp_path / "out")
    n = copy_into(
        spark,
        target,
        str(src),
        "id bigint, v string",
        pattern="*_enc_prov_*.txt",
    )
    assert n == 3
    # returns rows loaded BY THIS CALL; append mode still doubles the target
    n2 = copy_into(
        spark, target, str(src), "id bigint, v string", pattern="*_enc_prov_*.txt"
    )
    assert n2 == 3
    assert spark.read.parquet(target).count() == 6


def test_read_parquet_sql_path_scan(spark, tmp_path):
    from data_pipelines_examples_spark.sources.readers import read_parquet_sql

    path = str(tmp_path / "pq")
    spark.range(7).write.parquet(path)
    assert read_parquet_sql(spark, path).count() == 7


def test_write_single_file_export(spark, tmp_path):
    import glob

    from data_pipelines_examples_spark.sources.writers import write_single_file

    path = str(tmp_path / "export")
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string")
    write_single_file(df, path, fmt="csv", header=True)
    parts = glob.glob(f"{path}/part-*")
    assert len(parts) == 1  # coalesce(1): exactly one data file
    lines = open(parts[0]).read().strip().splitlines()
    assert lines[0] == "id,v" and len(lines) == 3


def test_cache_lifecycle(spark):
    from data_pipelines_examples_spark.sources.catalog import cached

    df = cached(spark.range(10).selectExpr("id", "id * 2 AS d"))
    assert df.count() == 10
    assert df.storageLevel.useMemory  # cache actually armed
    df.unpersist()
    assert not df.storageLevel.useMemory


def test_compact_path_shrinks_files_preserves_data(spark, tmp_path):
    """Many tiny appended files -> few target-sized files, identical rows,
    atomic swap, idempotent re-run."""
    from data_pipelines_examples_spark.sources.writers import compact_path

    path = str(tmp_path / "t")
    # simulate micro-batch appends: 12 separate tiny writes
    for i in range(12):
        spark.range(i * 10, i * 10 + 10).withColumn(
            "part", (F.col("id") % 2).cast("int")
        ).write.mode("append").parquet(path)
    before_rows = sorted(r.id for r in spark.read.parquet(path).collect())

    stats = compact_path(spark, path, target_mb=128)
    assert stats["files_before"] >= 12
    assert stats["files_after"] < stats["files_before"]
    assert stats["files_after"] == 1  # tiny data -> single target file
    assert stats["rows"] == 120
    assert sorted(r.id for r in spark.read.parquet(path).collect()) == before_rows

    # idempotent: second run is a stable no-op rewrite
    stats2 = compact_path(spark, path, target_mb=128)
    assert stats2["files_after"] == stats["files_after"]
    assert sorted(r.id for r in spark.read.parquet(path).collect()) == before_rows


def test_compact_path_partitioned_layout(spark, tmp_path):
    from data_pipelines_examples_spark.sources.writers import compact_path

    path = str(tmp_path / "p")
    for i in range(6):
        spark.range(i * 10, i * 10 + 10).withColumn(
            "part", (F.col("id") % 2).cast("int")
        ).write.mode("append").parquet(path)
    stats = compact_path(spark, path, target_mb=128, partition_by="part")
    out = spark.read.parquet(path)
    assert out.count() == 60 and stats["rows"] == 60
    # partitioned layout emerged: partition dirs exist and prune
    assert out.filter("part = 1").count() == 30
    import os
    assert any(d.startswith("part=") for d in os.listdir(path))


def test_analyze_table_stats_for_cbo(spark, tmp_path):
    from data_pipelines_examples_spark.sources.catalog import analyze_table, drop_table

    spark.range(1000).withColumn("v", F.col("id") % 7).write.mode(
        "overwrite"
    ).saveAsTable("t_stats")
    try:
        out = analyze_table(spark, "t_stats", columns=["v"])
        assert out["statistics"] is not None and "1000 rows" in out["statistics"]
        # column stats parsed: NDV of id % 7 is 7
        assert out["v"].get("distinct_count") == "7"
        assert out["v"].get("min") == "0" and out["v"].get("max") == "6"
    finally:
        drop_table(spark, "t_stats")


def test_copy_into_does_not_poison_ml_collect(spark, tmp_path):
    """Regression: Spark 4.1's Observation API leaves the session's
    ObservationManager captured in later ML-vector collect closures
    (NotSerializableException) — so the validated writers must never
    register Observations. This test IS the canary: copy_into followed
    by an MLlib transform + collect must succeed."""
    src = tmp_path / "in"
    src.mkdir()
    (src / "a.txt").write_text("id,v\n1,x\n")
    copy_into(spark, str(tmp_path / "out"), str(src), "id bigint, v string", pattern="*.txt")
    from data_pipelines_examples_spark.ml import score_quality, train_quality_classifier

    df = spark.createDataFrame(
        [(1, 1.0, "good careful text"), (2, 0.0, "spam click now")] * 5,
        "doc_id int, label double, text string",
    )
    model = train_quality_classifier(df, "label")
    assert len(score_quality(model, df).collect()) == 10
