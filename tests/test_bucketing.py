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
