"""Pin CUBE against a DuckDB oracle (SURVEY §2.4 claims the whole
grouping-analytics family comes free with Spark: ROLLUP is q50,
GROUPING SETS is q61, CUBE is pinned here — all four subtotal
combinations from one Expand + one shuffle)."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"

SQL = """
SELECT
  o_orderstatus,
  o_orderpriority,
  GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS gid,
  COUNT(*) AS n_orders,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


def test_cube_matches_duckdb(spark):
    got = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
            (F.grouping("o_orderstatus") * 2 + F.grouping("o_orderpriority")).alias(
                "gid"
            ),
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
            .cast("double")
            .alias("total_price"),
        )
        .select("o_orderstatus", "o_orderpriority", "gid", "n_orders", "total_price")
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM '{SF}/orders.parquet'")
    exp = con.execute(SQL).fetchdf()

    def norm(rows):
        return sorted(
            (
                "NULL" if a is None else str(a),
                "NULL" if b is None else str(b),
                int(g),
                int(n),
                f"{t:.6f}",
            )
            for a, b, g, n, t in rows
        )

    got_rows = norm(tuple(r) for r in got.collect())
    exp_rows = norm(map(tuple, exp.itertuples(index=False)))
    assert got_rows == exp_rows
    # the full cube: (1 grand total) + statuses + priorities + pairs
    gids = [r[2] for r in got_rows]
    assert gids.count(3) == 1 and 0 in gids and 1 in gids and 2 in gids
