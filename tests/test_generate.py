"""Tests for the schema-driven generator and new relational helpers."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipelines_examples_spark.operators.relational import (
    build_predicate,
    first_or_default,
    lookup_join,
)
from data_pipelines_examples_spark.schema import schema_from_fields
from data_pipelines_examples_spark.sources.generate import (
    benchmark_corpus,
    random_dataframe,
)


def test_random_dataframe_deterministic(spark):
    schema = schema_from_fields(
        "id,name,amount,flag,d,ts",
        "bigint,string,decimal(10,2),boolean,date,timestamp",
    )
    df1 = random_dataframe(spark, schema, 100, seed=7, categories={"name": ["a", "b"]})
    df2 = random_dataframe(spark, schema, 100, seed=7, categories={"name": ["a", "b"]})
    assert df1.count() == 100
    assert sorted(map(str, df1.collect())) == sorted(map(str, df2.collect()))
    assert {r.name for r in df1.select("name").distinct().collect()} <= {"a", "b"}
    assert [f.dataType.simpleString() for f in df1.schema.fields] == [
        "bigint", "string", "decimal(10,2)", "boolean", "date", "timestamp",
    ]


def test_benchmark_corpus(spark, tmp_path):
    schema = schema_from_fields("k,v", "bigint,double")
    counts = benchmark_corpus(
        spark, {"t1": (schema, 1000), "t2": (schema, 500)}, str(tmp_path), scale_factor=0.1
    )
    assert counts == {"t1": 100, "t2": 50}
    assert spark.read.parquet(str(tmp_path / "t1.parquet")).count() == 100


def test_build_predicate(spark):
    df = spark.createDataFrame(
        [(1, "a", 5), (2, "b", 15), (3, "a", 25)], "id int, cat string, v int"
    )
    pred = build_predicate(equals={"cat": "a"}, between={"v": (0, 10)})
    assert [r.id for r in df.filter(pred).collect()] == [1]
    pred2 = build_predicate(isin={"id": [2, 3]}, like={"cat": "b%"})
    assert [r.id for r in df.filter(pred2).collect()] == [2]
    assert build_predicate() is None


def test_first_or_default(spark):
    df = spark.createDataFrame([("x", 2), ("y", 1)], "name string, prio int")
    best = first_or_default(df, [F.col("prio")], {"name": "default", "prio": 999})
    assert best.first().name == "y"
    empty = df.filter("prio > 100")
    fallback = first_or_default(empty, [F.col("prio")], {"name": "default", "prio": 999})
    assert fallback.first().name == "default"


def test_lookup_join_broadcasts(spark):
    from data_pipelines_examples_spark.plans.inspect import has_broadcast_join

    df = spark.createDataFrame([("10.0.0.1",), ("10.0.0.9",)], "ip string")
    mapping = spark.createDataFrame(
        [("10.0.0.1", "US"), ("10.0.0.9", "DE")], "ip_key string, country string"
    )
    out = lookup_join(df, "ip", mapping, "ip_key", "country")
    assert has_broadcast_join(out)
    assert {(r.ip, r.country) for r in out.collect()} == {
        ("10.0.0.1", "US"), ("10.0.0.9", "DE"),
    }
