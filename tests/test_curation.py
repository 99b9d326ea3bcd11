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


def test_publishable_corpus_pipeline_end_to_end(spark, tmp_path):
    """The full release pipeline composed from this round's operators:
    curate (quality floor + exact/near dedup + mix) -> strip verbatim
    duplicated spans -> select under a token budget -> materialize
    epoch-ordered shards with a manifest -> emit the datacard. Every
    stage's invariant is checked on the final artifact."""
    import json

    from data_pipelines_examples_spark.curation import curate_corpus
    from data_pipelines_examples_spark.operators.dedup import strip_duplicate_spans
    from data_pipelines_examples_spark.operators.sampling import (
        select_within_token_budget,
    )
    from data_pipelines_examples_spark.reporting import corpus_datacard
    from data_pipelines_examples_spark.sources.writers import write_training_shards

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    curated, _ = curate_corpus(docs, quality_quantile=0.1)
    stripped = strip_duplicate_spans(curated.select("doc_id", "text"), k=8)
    with_stats = stripped.selectExpr(
        "doc_id",
        "text",
        "cast(n_tokens_kept as double) as quality",
        "n_tokens_kept as n_tokens",
    )
    budgeted = select_within_token_budget(with_stats, "quality", "n_tokens", 8000)
    picked = budgeted.join(stripped, "doc_id").select("doc_id", "text")
    assert 0 < picked.count() < docs.count()
    path = str(tmp_path / "corpus")
    manifest = write_training_shards(picked, path, "doc_id", n_shards=2, seed=3)
    back = spark.read.parquet(path)
    assert back.count() == manifest["total_rows"] == picked.count()
    card = corpus_datacard(back, source_col=None, lang_col=None,
                           save_path=f"{path}/_datacard.json")
    assert card["n_docs"] == manifest["total_rows"]
    assert card["n_tokens"] <= 8000  # the budget held through materialization
    assert card["exact_dup_rate"] == 0.0  # dedup held end to end
    with open(f"{path}/_datacard.json") as f:
        assert json.load(f)["n_docs"] == card["n_docs"]
