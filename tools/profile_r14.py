"""Per-query phase profiler for the r14 optimization round.

For each headline query, splits wall time into:
  build   — Python-side DataFrame construction (py4j traffic, eager probes)
  analyze — first .schema access (Catalyst analysis)
  exec    — the bench's consume (optimization + codegen + run)

and re-times the bench's cpu canary before each query so phases can be
load-normalized. Writes plans/r14/<query>_before.txt explain output when
--plans is passed.

Usage: python tools/profile_r14.py [--plans] [q33_minhash_candidates ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import BENCH_QUERIES  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    write_plans = "--plans" in sys.argv
    plan_suffix = "_before"
    for a in sys.argv[1:]:
        if a.startswith("--suffix="):
            plan_suffix = a.split("=", 1)[1]
    names = args or BENCH_QUERIES

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import functions as F

    from data_pipelines_examples_spark import queries as catalog, release_cached
    from data_pipelines_examples_spark.session import get_session

    spark = get_session("profile_r14")
    qs = catalog.queries()

    # warm: tables + one pass per query at sf0.001 (codegen cache)
    spark.range(1).count()
    for t in ("lineitem", "orders", "customer", "events", "documents",
              "embeddings", "part"):
        spark.read.parquet(os.path.join(sf_dir, f"{t}.parquet")).count()
    warm_dir = "/root/testdata/sf0.001"
    for name in names:
        try:
            qs[name](spark, warm_dir).count()
        except Exception:
            pass
        release_cached()
        spark.catalog.clearCache()

    def consume(df) -> int:
        try:
            row = df.agg(
                F.count("*").alias("n"),
                F.sum(F.xxhash64(F.struct(*df.columns))).alias("h"),
            ).first()
            return row["n"]
        except Exception:
            return df.count()

    def canary() -> float:
        t0 = time.time()
        spark.range(50_000_000).select(F.xxhash64("id").alias("h")).agg(
            F.count("*"), F.sum("h")
        ).first()
        return round(time.time() - t0, 3)

    plans_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r14")
    os.makedirs(plans_dir, exist_ok=True)

    out = {}
    for name in names:
        rec = {"canary": canary()}
        best = None
        for rep in range(2):
            release_cached()
            spark.catalog.clearCache()
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            t1 = time.time()
            _ = df.schema
            t2 = time.time()
            consume(df)
            t3 = time.time()
            phases = {
                "build": round(t1 - t0, 3),
                "analyze": round(t2 - t1, 3),
                "exec": round(t3 - t2, 3),
                "total": round(t3 - t0, 3),
            }
            if best is None or phases["total"] < best["total"]:
                best = phases
        rec.update(best)
        out[name] = rec
        print(f"# {name}: {json.dumps(rec)}", file=sys.stderr)
        if write_plans:
            release_cached()
            spark.catalog.clearCache()
            df = qs[name](spark, sf_dir)
            with open(os.path.join(plans_dir, f"{name}{plan_suffix}.txt"), "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        release_cached()
        spark.catalog.clearCache()
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
