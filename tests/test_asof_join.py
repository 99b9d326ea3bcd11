"""asof_join: tie semantics, strict mode, unmatched rows, multi-key isolation."""

from __future__ import annotations

from data_pipelines_examples_spark.operators.relational import asof_join


def _frames(spark):
    quotes = spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00", 100.0),
            (1, "2024-01-01 10:05:00", 101.0),
            (1, "2024-01-01 10:10:00", 102.0),
            (2, "2024-01-01 10:02:00", 200.0),
        ],
        "sym int, ts string, px double",
    )
    trades = spark.createDataFrame(
        [
            (1, "2024-01-01 10:04:00"),  # between quotes → 100.0
            (1, "2024-01-01 10:05:00"),  # exactly on a quote → tie
            (1, "2024-01-01 09:59:00"),  # before any quote → null
            (2, "2024-01-01 11:00:00"),  # other key → 200.0, never sym 1's
            (3, "2024-01-01 10:30:00"),  # key with no quotes → null
        ],
        "sym int, ts string",
    )
    return quotes, trades


def test_asof_join_basic(spark):
    quotes, trades = _frames(spark)
    out = asof_join(trades, quotes, key="sym", left_ts="ts", right_ts="ts")
    got = {(r.sym, r.ts): r.px for r in out.collect()}
    assert got[(1, "2024-01-01 10:04:00")] == 100.0
    assert got[(1, "2024-01-01 10:05:00")] == 101.0  # non-strict includes tie
    assert got[(1, "2024-01-01 09:59:00")] is None
    assert got[(2, "2024-01-01 11:00:00")] == 200.0
    assert got[(3, "2024-01-01 10:30:00")] is None
    assert out.count() == trades.count()  # left join: every row kept


def test_asof_join_strict_excludes_tie(spark):
    quotes, trades = _frames(spark)
    out = asof_join(trades, quotes, key="sym", left_ts="ts", right_ts="ts", strict=True)
    got = {(r.sym, r.ts): r.px for r in out.collect()}
    assert got[(1, "2024-01-01 10:05:00")] == 100.0  # tie excluded → prior quote


def test_asof_join_matches_theta_join_reference(spark):
    """Union+window result == naive theta-join + max-pick on the same data."""
    import pyspark.sql.functions as F

    quotes, trades = _frames(spark)
    q = quotes.select(
        F.col("sym").alias("qsym"),
        F.col("ts").cast("timestamp").alias("qts"),
        "px",
    )
    t = trades.withColumn("tts", F.col("ts").cast("timestamp"))
    naive = (
        t.join(q, (t.sym == q.qsym) & (q.qts <= t.tts), "left")
        .groupBy("sym", "ts")
        .agg(F.max_by("px", "qts").alias("px"))
    )
    fast = asof_join(trades, quotes, key="sym", left_ts="ts", right_ts="ts").select(
        "sym", "ts", "px"
    )
    assert sorted(map(tuple, naive.collect())) == sorted(map(tuple, fast.collect()))
