"""Deterministic sampling operators: exact membership, rerun stability,
stratified rates."""

from __future__ import annotations

from data_pipelines_examples_spark.operators.sampling import (
    hash_mod_sample,
    sample_by,
    stratified_mod_sample,
)


def _docs(spark):
    rows = [(i, "en" if i % 2 == 0 else "zh") for i in range(200)]
    return spark.createDataFrame(rows, "doc_id long, lang string")


def test_hash_mod_sample_exact_membership(spark):
    df = _docs(spark)
    got = {r.doc_id for r in hash_mod_sample(df, "doc_id", rate=10).collect()}
    assert got == {i for i in range(200) if i % 100 < 10}
    # rerun → identical sample (determinism is the point)
    again = {r.doc_id for r in hash_mod_sample(df, "doc_id", rate=10).collect()}
    assert got == again


def test_stratified_mod_sample_rates(spark):
    df = _docs(spark)
    out = stratified_mod_sample(df, "lang", {"en": 100, "zh": 25}, id_col="doc_id")
    by_lang = {
        r.lang: r.n for r in out.groupBy("lang").agg(
            __import__("pyspark.sql.functions", fromlist=["count"]).count("*").alias("n")
        ).collect()
    }
    assert by_lang["en"] == 100  # all kept
    # zh ids are odd; odd ids with id % 100 < 25 → 13 of 100
    assert by_lang["zh"] == sum(1 for i in range(200) if i % 2 == 1 and i % 100 < 25)
    # unlisted strata default to dropped
    out2 = stratified_mod_sample(df, "lang", {"en": 50}, id_col="doc_id")
    assert out2.filter("lang = 'zh'").count() == 0


def test_sample_by_seeded(spark):
    df = _docs(spark)
    a = sample_by(df, "lang", {"en": 0.5, "zh": 0.1}, seed=7).count()
    b = sample_by(df, "lang", {"en": 0.5, "zh": 0.1}, seed=7).count()
    assert a == b  # same seed, same partitioning → same sample


def test_epoch_shuffle_deterministic_and_seed_independent(spark):
    from data_pipelines_examples_spark.operators.sampling import epoch_shuffle

    df = _docs(spark)
    a = {r.doc_id: r.shuffle_key for r in epoch_shuffle(df, "doc_id", seed=1).collect()}
    b = {r.doc_id: r.shuffle_key for r in epoch_shuffle(df, "doc_id", seed=1).collect()}
    c = {r.doc_id: r.shuffle_key for r in epoch_shuffle(df, "doc_id", seed=2).collect()}
    assert a == b  # same seed → same epoch order
    assert a != c  # different seed → different order
    assert len(set(a.values())) == len(a)  # keys distinct → total order
    # epoch order is a genuine permutation change, not a shift: the rank
    # sequence of seed-2 keys under seed-1 order must not be monotone
    order1 = [d for d, _ in sorted(a.items(), key=lambda kv: kv[1])]
    order2 = [d for d, _ in sorted(c.items(), key=lambda kv: kv[1])]
    assert order1 != order2


def test_filter_by_group_quantile_exact_vs_approx(spark):
    from data_pipelines_examples_spark.operators.sampling import (
        filter_by_group_quantile,
    )

    rows = [(i, "a" if i < 100 else "b", float(i % 50)) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, grp string, score double")
    exact = filter_by_group_quantile(df, "grp", "score", 0.5, how="exact")
    # per group scores are 0..49 ×2, median 24.5 → keep score >= 24.5
    got = exact.groupBy("grp").count().collect()
    assert {r.grp: r["count"] for r in got} == {"a": 50, "b": 50}
    # approx picks an ACTUAL data value as the quantile (24.0, no
    # interpolation), so it may differ from exact only at the boundary
    approx = filter_by_group_quantile(df, "grp", "score", 0.5, how="approx")
    exact_ids = {r.id for r in exact.collect()}
    approx_ids = {r.id for r in approx.collect()}
    boundary = {r.id for r in df.filter("score = 24.0").collect()}
    assert approx_ids - exact_ids <= boundary
    assert exact_ids <= approx_ids
    # kept rows all sit at/above their group threshold
    assert exact.filter("score < 24.5").count() == 0


def test_temperature_mix_rates_analytic(spark):
    from data_pipelines_examples_spark.operators.sampling import (
        temperature_mix_rates,
    )

    rows = (
        [(i, "big") for i in range(8000)]
        + [(10000 + i, "mid") for i in range(2000)]
        + [(20000 + i, "small") for i in range(500)]
    )
    df = spark.createDataFrame(rows, "id bigint, src string")

    # alpha=1: natural proportions — every stratum keeps everything
    assert temperature_mix_rates(df, "src", alpha=1.0) == {
        "big": 1000, "mid": 1000, "small": 1000,
    }

    # alpha=0: uniform target — keep-fraction n_min/n_i
    r0 = temperature_mix_rates(df, "src", alpha=0.0)
    assert r0 == {"big": round(500 / 8000 * 1000),
                  "mid": round(500 / 2000 * 1000),
                  "small": 1000}

    # alpha=0.5: keep-fraction (n_min/n_i)^0.5
    r5 = temperature_mix_rates(df, "src", alpha=0.5)
    assert r5["small"] == 1000
    assert r5["mid"] == round((500 / 2000) ** 0.5 * 1000)
    assert r5["big"] == round((500 / 8000) ** 0.5 * 1000)


def test_temperature_mix_shares_approach_target(spark):
    from data_pipelines_examples_spark.operators.sampling import temperature_mix
    from pyspark.sql import functions as F

    rows = (
        [(i, "big") for i in range(8000)]
        + [(10000 + i, "small") for i in range(500)]
    )
    df = spark.createDataFrame(rows, "id bigint, src string")
    out = temperature_mix(df, "src", "id", alpha=0.5)
    got = {r["src"]: r["n"] for r in
           out.groupBy("src").agg(F.count("*").alias("n")).collect()}
    # small keeps everything; big keeps ~ (500/8000)^0.5 = 25%
    assert got["small"] == 500
    assert abs(got["big"] / 8000 - 0.25) < 0.02
    # kept shares ∝ n^0.5: big/small ≈ sqrt(8000/500) = 4
    assert abs(got["big"] / got["small"] - 4.0) < 0.25
    # deterministic re-run
    out2 = temperature_mix(df, "src", "id", alpha=0.5)
    got2 = {r["src"]: r["n"] for r in
            out2.groupBy("src").agg(F.count("*").alias("n")).collect()}
    assert got == got2


def test_weighted_sample_deterministic_and_weight_biased(spark):
    from data_pipelines_examples_spark.operators.sampling import weighted_sample

    rows = [(i, 100.0 if i < 50 else 1.0) for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id int, w double")
    s1 = sorted(r["doc_id"] for r in weighted_sample(df, "doc_id", "w", 100, seed=1).collect())
    s2 = sorted(r["doc_id"] for r in weighted_sample(df.repartition(13), "doc_id", "w", 100, seed=1).collect())
    s3 = sorted(r["doc_id"] for r in weighted_sample(df, "doc_id", "w", 100, seed=2).collect())
    assert s1 == s2          # partitioning-independent, seed-reproducible
    assert s1 != s3          # a new seed is a new draw
    assert len(s1) == 100
    # the 50 heavy rows (weight 100x) should be drawn near-certainly:
    # P(include) ~ 1 - exp(-100k/W) >> the light rows'
    heavy = sum(1 for i in s1 if i < 50)
    assert heavy >= 45


def test_weighted_sample_excludes_nonpositive_weights(spark):
    from data_pipelines_examples_spark.operators.sampling import weighted_sample

    df = spark.createDataFrame(
        [(1, 5.0), (2, 0.0), (3, -1.0), (4, None), (5, 5.0)],
        "doc_id int, w double",
    )
    got = sorted(r["doc_id"] for r in weighted_sample(df, "doc_id", "w", 10).collect())
    assert got == [1, 5]


def test_weighted_sample_plan_uses_takeordered(spark):
    from data_pipelines_examples_spark.operators.sampling import weighted_sample
    from data_pipelines_examples_spark.plans.inspect import physical_plan

    df = spark.range(0, 10000).selectExpr("id as doc_id", "1.0 + id % 7 as w")
    plan = physical_plan(weighted_sample(df, "doc_id", "w", 50))
    assert "TakeOrderedAndProject" in plan


def test_select_within_token_budget_matches_global_window(spark):
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from data_pipelines_examples_spark.operators.sampling import (
        select_within_token_budget,
    )

    rng = random.Random(3)
    rows = [
        (i, float(rng.choice([0.2, 0.5, 0.5, 0.8, 0.9])), rng.randint(10, 200))
        for i in range(500)
    ]
    df = spark.createDataFrame(rows, "doc_id int, q double, toks int")
    for budget in (0, 500, 7_000, 40_000, 10**9):
        got = {
            r["doc_id"]
            for r in select_within_token_budget(df, "q", "toks", budget).collect()
        }
        w = Window.orderBy(F.col("q").desc(), F.col("doc_id").asc())
        ref = {
            r["doc_id"]
            for r in df.withColumn("cum", F.sum("toks").over(w))
            .filter(F.col("cum") <= budget)
            .collect()
        }
        assert got == ref, budget


def test_select_within_token_budget_boundary_level_partial(spark):
    from data_pipelines_examples_spark.operators.sampling import (
        select_within_token_budget,
    )

    df = spark.createDataFrame(
        [(1, 0.9, 100), (2, 0.9, 100), (3, 0.5, 100), (4, 0.5, 100), (5, 0.5, 100)],
        "doc_id int, q double, toks int",
    )
    # budget 400: both 0.9-docs + first two 0.5-docs (id order)
    got = sorted(
        r["doc_id"] for r in select_within_token_budget(df, "q", "toks", 400).collect()
    )
    assert got == [1, 2, 3, 4]
