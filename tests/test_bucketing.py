"""Bucketed-table co-located join: the shuffle-free join path for
repeatedly-joined fact tables at scale."""

from __future__ import annotations

import pytest

from conftest import SF_SMOKE
from data_pipelines_examples_spark.plans.inspect import count_shuffles
from data_pipelines_examples_spark.sources.writers import write_bucketed


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    write_bucketed(li, "b_lineitem", "l_orderkey", num_buckets=8, sort_by="l_orderkey")
    write_bucketed(
        o.withColumnRenamed("o_orderkey", "l_orderkey"),
        "b_orders",
        "l_orderkey",
        num_buckets=8,
        sort_by="l_orderkey",
    )
    yield "b_lineitem", "b_orders"
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    t1, t2 = bucketed_tables
    # disable broadcast so the join strategy is bucket-aware sort-merge
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table(t1).join(spark.table(t2), "l_orderkey")
        assert count_shuffles(joined) == 0, joined._jdf.queryExecution().executedPlan().toString()[:500]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(50 * 1024 * 1024))


def test_bucketed_join_correct(spark, bucketed_tables):
    t1, t2 = bucketed_tables
    joined = spark.table(t1).join(spark.table(t2), "l_orderkey")
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    plain = li.join(o, li.l_orderkey == o.o_orderkey)
    assert joined.count() == plain.count()


def test_write_training_shards_manifest_and_order(spark, tmp_path):
    import json

    from data_pipelines_examples_spark.sources.writers import write_training_shards

    df = spark.range(0, 1000).withColumnRenamed("id", "doc_id")
    path = str(tmp_path / "shards")
    manifest = write_training_shards(df, path, "doc_id", n_shards=4, seed=7)
    assert manifest["total_rows"] == 1000
    assert len(manifest["shards"]) == 4
    assert sum(s["rows"] for s in manifest["shards"]) == 1000
    # range partitioning balances: no shard is empty or hoards the corpus
    assert all(100 <= s["rows"] <= 500 for s in manifest["shards"])
    # manifest is on disk and Spark scans skip it (underscore prefix)
    with open(f"{path}/_manifest.json") as f:
        assert json.load(f)["seed"] == 7
    back = spark.read.parquet(path)
    assert back.count() == 1000
    assert sorted(r["doc_id"] for r in back.collect()) == list(range(1000))


def test_write_training_shards_reproducible_order(spark, tmp_path):
    from data_pipelines_examples_spark.sources.writers import write_training_shards

    df = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    p1, p2, p3 = (str(tmp_path / n) for n in ("a", "b", "c"))
    write_training_shards(df, p1, "doc_id", n_shards=3, seed=11)
    write_training_shards(df.repartition(7), p2, "doc_id", n_shards=3, seed=11)
    write_training_shards(df, p3, "doc_id", n_shards=3, seed=12)
    # same seed -> identical global order regardless of input partitioning
    o1 = [r["doc_id"] for r in spark.read.parquet(p1).collect()]
    o2 = [r["doc_id"] for r in spark.read.parquet(p2).collect()]
    # collect order across files isn't guaranteed; compare per-file order
    def per_file(path):
        from pyspark.sql import functions as F

        rows = (
            spark.read.parquet(path)
            .select("doc_id", F.input_file_name().alias("f"))
            .collect()
        )
        by_f = {}
        for r in rows:
            by_f.setdefault(r["f"].rsplit("/", 1)[-1], []).append(r["doc_id"])
        return sorted(by_f.items())

    f1, f2, f3 = per_file(p1), per_file(p2), per_file(p3)
    assert [v for _, v in f1] == [v for _, v in f2]
    # different seed -> different epoch order
    assert [v for _, v in f1] != [v for _, v in f3]
