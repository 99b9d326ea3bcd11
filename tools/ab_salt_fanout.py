"""A/B the salted_join fan-out default at a scaling rung (r9 verdict item 5
evidence): q07's exact shape (lineitem JOIN orders -> groupBy priority) with
the reference's fixed salt_n=16 vs the r10 parallelism-aware default
(max(16, defaultParallelism) = 32 on local[32]).

Both variants run in ONE session, interleaved A/B/A/B with min-of-2, so the
comparison shares a climate. On un-skewed rungs the two should be ~equal
(the default only matters when a hot key would cap at 16 reducers); on the
composed skew rung the wider fan-out is the one that spreads the hot
orderkey over every core.

Usage: python tools/ab_salt_fanout.py SF_DIR
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1]

    from pyspark.sql import functions as F

    from data_pipelines_examples_spark.operators.relational import salted_join
    from data_pipelines_examples_spark.queries import _dsum, _t
    from data_pipelines_examples_spark.session import get_session

    spark = get_session("ab-salt-fanout")

    def q07_shape(salt_n):
        li = _t(spark, sf_dir, "lineitem").select(
            F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
        )
        o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
        joined = salted_join(li, o, "o_orderkey", salt_n=salt_n)
        return (
            joined.groupBy("o_orderpriority")
            .agg(_dsum("l_quantity").alias("sum_qty"), F.count("*").alias("n_items"))
            .orderBy("o_orderpriority")
        )

    def consume(df) -> int:
        return df.agg(
            F.count("*").alias("n"),
            F.sum(F.xxhash64(F.struct(*df.columns))).alias("h"),
        ).first()["n"]

    consume(q07_shape(16))  # warm: parquet footers + codegen for both shapes
    consume(q07_shape(None))
    walls: dict[str, list[float]] = {"fixed16": [], "parallelism": []}
    for _ in range(2):
        for label, salt_n in (("fixed16", 16), ("parallelism", None)):
            t0 = time.time()
            consume(q07_shape(salt_n))
            walls[label].append(round(time.time() - t0, 3))
    print(
        json.dumps(
            {
                "sf_dir": os.path.basename(sf_dir.rstrip("/")),
                "default_parallelism": spark.sparkContext.defaultParallelism,
                "fixed16_walls": walls["fixed16"],
                "parallelism_walls": walls["parallelism"],
                "fixed16_min": min(walls["fixed16"]),
                "parallelism_min": min(walls["parallelism"]),
            }
        )
    )


if __name__ == "__main__":
    main()
