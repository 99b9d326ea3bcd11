"""Tests for catalog/DDL helpers and the COPY INTO analog."""

from __future__ import annotations

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
