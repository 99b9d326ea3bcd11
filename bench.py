"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line with per-query wall times.

Headline set mirrors BASELINE.md's bench plan: interval collapse, salted
skew join, usage-style agg + cumulative window + top-N, JSON shred +
latest-dedup, windowed distinct over events — plus the LLM-pipeline
extensions (exact dedup, minhash candidate pairs, embedding top-k).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = [
    "q01_pricing_summary",
    "q02_top_customers",
    "q03_interval_collapse",
    "q05_latest_order_per_customer",
    "q06_cumulative_daily_revenue",
    "q07_salted_join_priority_volume",
    "q09_json_shred_events",
    "q10_scd_latest_event_per_user",
    "q11_sessionize_events",
    "q12_sliding_distinct_users",
    "q13_dedup_exact_documents",
    "q15_embedding_topk",
    "q08_part_unpivot",
    "q19_customer_running_spend",
    "q22_user_value_streaks",
    "q24_region_revenue_rollup",
    "q31_ngram_jaccard_pairs",
    "q49_asof_latest_event_value",
    "q55_shipping_priority",
    # LLM dedup/similarity family at sf0.1 — previously only run under the
    # sf0.01 correctness gate, so perf regressions here were invisible.
    "q33_minhash_candidates",
    "q34_simhash_pairs",
    "q42_embedding_dedup_pairs",
    "q43_lsh_topk",
    # pretraining-prep family (round 4): chunking + packing manifest
    "q63_chunk_documents",
    "q64_pack_offsets",
    # corpus-statistics family (round 5): surprisal + TF-IDF — the two
    # heaviest token-level aggregation pipelines; visible here so vocab-
    # join and persist regressions show up round-over-round.
    "q67_unigram_surprisal",
    "q71_tfidf_top_terms",
    # verbatim-span dedup (round 4 cont.): the heaviest window-hash
    # pipeline — k-token window explode + frequency groupBy + islands.
    "q80_duplicate_spans",
    # xxhash64 fast-path twins of q33/q34: the throughput users actually
    # get (the oracle-portable md5 variants above pay the md5 tax).
    "q87_minhash_fast_path",
    "q88_simhash_fast_path",
    # winnowing fingerprints (round 5): previously the slowest operator
    # in the catalog and invisible to BENCH — the O(len²) interpreted
    # recompute fixed this round (125×) stays visible here so it can
    # never silently regress.
    "q90_winnowing_fingerprints",
    # analytics + scale-path families newly promoted into the graded
    # window (round 5): perf visibility from the round they start being
    # hash-graded — co-occurrence self-join, funnel join chain,
    # retention window, binned interval join.
    "q97_copurchase_pairs",
    "q101_event_funnel",
    "q102_retention_cohorts",
    "q109_overlap_join_binned",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # Strict match: Python's float() accepts digit underscores, so a rung
    # dir like "sf1_0" would silently parse as 10.0 under a bare float()
    # — a mislabeled artifact. Numeric only for exactly sf<digits[.digits]>;
    # any other rung name (e.g. sf1_bench) stays the raw basename string.
    base = os.path.basename(sf_dir.rstrip("/"))
    m = re.fullmatch(r"sf(\d+(?:\.\d+)?)", base)
    sf: float | str = float(m.group(1)) if m else base
    # Optional subset (comma-separated names) for scaling rungs above
    # sf0.1 — same harness (canary, full-column-hash consume, min-of-2/3)
    # so rung walls are directly comparable to the sf0.1 artifact.
    subset = os.environ.get("SPARK_GRAFT_BENCH_QUERIES")
    bench_queries = (
        [q.strip() for q in subset.split(",") if q.strip()]
        if subset
        else BENCH_QUERIES
    )

    from data_pipelines_examples_spark import queries as catalog
    from data_pipelines_examples_spark.session import get_session

    spark = get_session("bench")
    qs = catalog.queries()
    unknown = sorted(set(bench_queries) - set(qs))
    if unknown:
        # fail FAST: a typo'd subset would otherwise record a null timing
        # and silently understate the rung total
        raise SystemExit(f"unknown bench queries: {unknown}")

    # Warm the JVM/readers once (session spin-up, codegen compiler, parquet
    # footers) so timings measure query execution, not first-job overhead.
    spark.range(1).count()
    for t in ("lineitem", "orders", "customer", "events", "documents", "embeddings", "part"):
        spark.read.parquet(os.path.join(sf_dir, f"{t}.parquet")).count()
    # Compile each query's generated code against the smallest SF first:
    # Janino whole-stage compilation is a one-time per-plan-shape cost
    # (measured 5s on the jaccard pipeline, ~1s steady-state) and would
    # otherwise be attributed to whichever query runs first.
    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    if not os.path.isdir(warm_dir):
        warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir) and warm_dir != sf_dir:
        for name in bench_queries:
            try:
                qs[name](spark, warm_dir).count()
            except Exception:  # noqa: BLE001 — failures surface in the timed run
                pass

    # Per-query isolation: one failing query must cost one null data
    # point, never the whole benchmark artifact (the JSON line below must
    # always print). Each query runs TWICE and reports the faster run:
    # single-shot walls on a shared host swing 2× with ambient load, and
    # the min is the standard noise-robust estimator of true plan cost.
    from pyspark.sql import functions as F

    def consume(df) -> int:
        # count() alone lets Catalyst PRUNE unaggregated projections (an
        # explode's cardinality is value-independent, so e.g. chunk text
        # would never materialize). Hash every column into an aggregate
        # to force full evaluation; fall back to count() for types the
        # hash doesn't support (maps).
        try:
            row = df.agg(
                F.count("*").alias("n"),
                F.sum(F.xxhash64(F.struct(*df.columns))).alias("h"),
            ).first()
            return row["n"]
        except Exception:  # noqa: BLE001 — unhashable column type
            return df.count()

    # Ambient-load canary: this VM's walls swing ±30% with invisible host
    # load, so round-over-round deltas on the queries alone can't separate
    # a regression from a noisy host. Time two FIXED reference workloads
    # (a full lineitem scan-hash — I/O + codegen bound — and a pure-CPU
    # range hash) with the same min-of-3 estimator; future rounds divide
    # query walls by the canary before calling anything a regression.
    def _canary(make_df) -> float:
        best = None
        for _ in range(3):
            spark.catalog.clearCache()
            t0 = time.time()
            consume(make_df())
            wall = time.time() - t0
            best = wall if best is None else min(best, wall)
        return round(best, 3)

    def _cpu_canary_df():
        return spark.range(50_000_000).select(F.xxhash64("id").alias("h"))

    canary = {
        "scan_lineitem": _canary(
            lambda: spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
        ),
        "cpu_hash_50m": _canary(_cpu_canary_df),
    }
    print(f"# canary: {canary}", file=sys.stderr)

    # Per-BLOCK canary (r7 verdict): a single start-of-run canary cannot
    # see mid-run host load — r7's artifact carried 16 false >1.3×
    # "regressions" from exactly that. Re-time the fixed pure-CPU
    # workload every CANARY_EVERY queries (clearCache+min-of-3, ~1 s per
    # block) and emit the timeline, so a load-corrupted artifact self-identifies:
    # a query wall is only a regression if the canary value in force for
    # its block is at the baseline level (normalization rule in
    # BASELINE.md). Keyed by the index of the NEXT query to run.
    CANARY_EVERY = 8

    def _block_canary() -> float:
        # SAME estimator as the start-of-run canary (clearCache +
        # min-of-3): a cheaper min-of-2 without the cache clear read
        # systematically ~2× the start value at JVM steady state, which
        # would make the >1.2× noise rule cry wolf on every block.
        return _canary(_cpu_canary_df)

    canary_timeline: dict[str, float] = {"0": canary["cpu_hash_50m"]}

    timings: dict[str, float | None] = {}
    for qi, name in enumerate(bench_queries):
        if qi and qi % CANARY_EVERY == 0:
            canary_timeline[str(qi)] = _block_canary()
            print(
                f"# canary cpu_hash_50m @q{qi}: {canary_timeline[str(qi)]}",
                file=sys.stderr,
            )
        best: float | None = None
        n = 0
        try:
            # min-of-2, plus a third run for sub-second queries: at
            # those walls a single ambient-load hiccup still swings the
            # two-run min by ~40% round-over-round (r4 observed on
            # q12/q19), and a third sample stabilizes the estimator at
            # negligible cost precisely where it is cheapest.
            for run in range(3):
                if run == 2 and best is not None and best >= 1.0:
                    break
                # Operators with internal multi-consumer persists would
                # otherwise serve run 2+ from run 1's cache, timing the
                # cached-read path instead of the full pipeline. Drain
                # the library's persist registry too so its strong refs
                # stay bounded across 35 queries × 3 runs.
                from data_pipelines_examples_spark import release_cached

                release_cached()
                spark.catalog.clearCache()
                t0 = time.time()
                n = consume(qs[name](spark, sf_dir))
                wall = time.time() - t0
                best = wall if best is None else min(best, wall)
        except Exception as e:  # noqa: BLE001
            timings[name] = None
            print(f"# {name}: FAILED {type(e).__name__}: {e}", file=sys.stderr)
            continue
        timings[name] = round(best, 3)
        print(f"# {name}: {timings[name]:.2f}s ({n} rows)", file=sys.stderr)
        # Drop this query's py4j plan handles NOW (outside any timed
        # region) so the JVM ContextCleaner can reclaim its broadcast
        # relations before the next query allocates: at the 100x replica
        # rung the accumulated broadcasts of ~16 queries OOM the shared
        # 8g local JVM if their Python references linger until a lazy GC.
        import gc

        gc.collect()
    # closing sample so the LAST block is bracketed too
    canary_timeline[str(len(bench_queries))] = _block_canary()

    total = round(sum(t for t in timings.values() if t is not None), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                # Methodology (since r4, commit 928fee8): the timed
                # consume is agg(count, sum(xxhash64(struct(*)))) —
                # FULL materialization of every output column — so
                # r1-r3 count()-only numbers (Catalyst pruned unused
                # projections) are NOT comparable to r4+. min-of-2
                # runs, min-of-3 when the best is sub-second.
                "method": "full-column-hash consume; min-of-2 (3 if <1s)",
                # Fixed reference workloads timed the same way; divide
                # query walls by these before reading a cross-round
                # delta as a regression (host load swings ±30% here).
                "canary_sec": canary["scan_lineitem"],
                "canary": canary,
                # cpu_hash_50m re-timed every 8 queries, keyed by the
                # index of the next query: before reading queries[i] as
                # a regression, check canary_timeline at the largest key
                # <= i — if it is inflated vs this round's first block,
                # the block's walls are host-load noise, not plan cost.
                "canary_timeline": canary_timeline,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
