"""End-to-end curation pipeline: stage monotonicity, per-stage
invariants on the output, determinism across reruns and repartitioning."""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import SF_SMOKE
from data_pipelines_examples_spark.curation import curate_corpus


def _docs(spark):
    return spark.read.parquet(f"{SF_SMOKE}/documents.parquet")


def test_curate_corpus_stages_and_invariants(spark):
    docs = _docs(spark)
    bench = docs.filter("doc_id % 97 = 0").select("doc_id", "text")
    out, stats = curate_corpus(docs, benchmark=bench)
    rows = out.cache()
    n = rows.count()

    # stage counts monotone non-increasing, output consistent
    order = ["input", "quality_floor", "exact_dedup", "near_dedup", "decontaminated"]
    counts = [stats[s] for s in order]
    assert counts == sorted(counts, reverse=True)
    assert n == stats["decontaminated"] == stats["output"]
    assert n > 0

    # invariant: no exact duplicate texts survive
    assert rows.select("text").distinct().count() == n
    # invariant: nothing sharing a 13-gram with the benchmark survives
    from data_pipelines_examples_spark.operators.dedup import decontaminate

    assert decontaminate(rows, bench).count() == n
    # output schema carries the curation columns
    for c in ("lang_pred", "quality", "shuffle_key"):
        assert c in rows.columns
    rows.unpersist()


def test_curate_corpus_deterministic(spark):
    docs = _docs(spark)
    a, _ = curate_corpus(docs, collect_stats=False)
    b, _ = curate_corpus(docs.repartition(13), collect_stats=False)
    ka = sorted((r.doc_id, r.shuffle_key) for r in a.collect())
    kb = sorted((r.doc_id, r.shuffle_key) for r in b.collect())
    assert ka == kb  # same survivors, same epoch order, any partitioning


def test_curate_corpus_mix_rates(spark):
    docs = _docs(spark)
    full, _ = curate_corpus(docs, collect_stats=False)
    langs = [r.lang_pred for r in full.select("lang_pred").distinct().collect()]
    # halve one stratum, keep the rest
    target = sorted(langs)[0]
    rates = {lang: 100 for lang in langs}
    rates[target] = 50
    mixed, stats = curate_corpus(docs, mix_rates=rates)
    by_lang_full = {
        r.lang_pred: r["count"]
        for r in full.groupBy("lang_pred").count().collect()
    }
    by_lang_mixed = {
        r.lang_pred: r["count"]
        for r in mixed.groupBy("lang_pred").count().collect()
    }
    for lang in langs:
        if lang == target:
            assert by_lang_mixed.get(lang, 0) < by_lang_full[lang]
        else:
            assert by_lang_mixed.get(lang, 0) == by_lang_full[lang]


def test_curate_with_cap_and_temperature_mix(spark):
    """The extended recipe: per-source cap bounds every source, the
    temperature mix flattens shares, stages stay monotone."""
    from data_pipelines_examples_spark.curation import curate_corpus
    from pyspark.sql import functions as F

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out, stats = curate_corpus(
        docs,
        source_col="source",
        source_cap=60,
        mix_alpha=0.5,
    )
    assert stats["source_cap"] <= stats["quality_floor"]
    assert stats["mixed"] <= stats["near_dedup"]
    per_source = out.groupBy("source").agg(F.count("*").alias("n")).collect()
    assert all(r["n"] <= 60 for r in per_source)
    # deterministic rerun
    _, stats2 = curate_corpus(
        docs, source_col="source", source_cap=60, mix_alpha=0.5
    )
    assert stats == stats2


def test_curate_rejects_conflicting_mix_args(spark):
    import pytest as _pytest

    from data_pipelines_examples_spark.curation import curate_corpus

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    with _pytest.raises(ValueError):
        curate_corpus(docs, mix_rates={"en": 10}, mix_alpha=0.5)
