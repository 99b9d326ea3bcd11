"""Tests for orchestration helpers and the ML handoff."""

from __future__ import annotations

import datetime as dt

from data_pipelines_examples_spark.ml import (
    assemble_features,
    shift_label,
    time_split,
    to_mllib_vectors,
)
from data_pipelines_examples_spark.pipeline import (
    Params,
    distributed_map_text,
    has_new_data,
    incremental_filter,
    max_watermark,
    reprocess_dates,
)


def test_params_env_override(monkeypatch):
    monkeypatch.setenv("PIPELINE_SCALE", "100")
    p = Params({"scale": "1", "name": "x"})
    assert p.get_int("scale") == 100 and p.get("name") == "x"
    p2 = Params({"scale": "1"}, overrides={"scale": "7", "bogus": "ignored"})
    assert p2.get("scale") == "7" and "bogus" not in p2.as_dict()


def test_watermark_sensor(spark):
    df = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1)), (2, dt.datetime(2024, 1, 3))], "id int, ts timestamp"
    )
    wm = max_watermark(df, "ts")
    assert wm == dt.datetime(2024, 1, 3)
    assert has_new_data(df, "ts", dt.datetime(2024, 1, 2))
    assert not has_new_data(df, "ts", wm)
    assert incremental_filter(df, "ts", dt.datetime(2024, 1, 2)).count() == 1


def test_reprocess_dates():
    assert reprocess_dates(dt.date(2024, 3, 1), days_back=1) == ["2024-02-29", "2024-03-01"]


def test_distributed_map_text(spark, tmp_path):
    src = tmp_path / "lines.txt"
    src.write_text("\n".join(f"line{i}" for i in range(5000)))
    out = distributed_map_text(
        spark, str(src), lambda lines: (l.upper() for l in lines)
    )
    rows = [r.value for r in out.collect()]
    assert len(rows) == 5000 and all(r.startswith("LINE") for r in rows)
    # partition cap: 5000 rows / 1000 min rows → ≤5 partitions
    assert out.rdd.getNumPartitions() <= 5


def test_feature_assembly_and_label(spark):
    df = spark.createDataFrame(
        [(i, float(i), float(i * 2)) for i in range(5)], "t int, a double, b double"
    )
    shifted = shift_label(df, "a", "t", horizon=1)
    feats = assemble_features(shifted, ["a", "b", "label"])
    rows = {r.t: r.features for r in feats.collect()}
    assert rows[0] == [0.0, 0.0, 1.0]
    assert 4 not in rows  # lead null at tail dropped
    vecs = to_mllib_vectors(feats)
    from pyspark.ml.linalg import DenseVector

    assert isinstance(vecs.first().features, DenseVector)


def test_time_split(spark):
    df = spark.createDataFrame(
        [(dt.datetime(2024, 1, d),) for d in range(1, 11)], "ts timestamp"
    )
    train, test = time_split(df, "ts", dt.datetime(2024, 1, 8))
    assert train.count() == 7 and test.count() == 3


def test_fit_evaluate_recovers_exact_linear_series(spark):
    """An AR(2)-exact series (v_{t+1} = 2*v_t - v_{t-1}) must fit to ~zero
    held-out RMSE with the closed-form normal solver — and deterministically
    so (two runs, identical output)."""
    from data_pipelines_examples_spark.ml import fit_evaluate
    from data_pipelines_examples_spark.operators.windows import lag_features

    df = spark.createDataFrame(
        [(t, 3.0 + 0.5 * t) for t in range(60)], "t int, v double"
    )
    feats = lag_features(df, "v", "t", [1, 2])
    run = lambda: fit_evaluate(  # noqa: E731
        feats, ["v", "v_lag1"], "v", "t", 45, horizons=[1, 3]
    )
    r1, r2 = run(), run()
    assert r1 == r2, "normal-solver fit must be deterministic"
    for h in (1, 3):
        assert r1[h]["rmse"] < 1e-6
        assert r1[h]["n_train"] > 0 and r1[h]["n_test"] > 0
    # the features are collinear (v - v_lag1 == 0.5 exactly), so individual
    # coefficients aren't identifiable — but any solver solution must still
    # satisfy the series identity on the fitted hyperplane: c_v + c_lag == 1
    c_v, c_lag = r1[1]["coefficients"]
    assert abs(c_v + c_lag - 1.0) < 1e-4


def test_fit_evaluate_noisy_series_partitioned(spark):
    """Seeded noisy multi-series fit: per-horizon RMSE tracks the injected
    noise scale and longer horizons never report fewer train rows."""
    import numpy as np

    from data_pipelines_examples_spark.ml import fit_evaluate
    from data_pipelines_examples_spark.operators.windows import lag_features

    rng = np.random.RandomState(42)
    rows = [
        (s, t, float(10 * s + 0.3 * t + rng.normal(0, 0.1)))
        for s in range(3)
        for t in range(80)
    ]
    df = spark.createDataFrame(rows, "series int, t int, v double")
    feats = lag_features(df, "v", "t", [1], partition_by="series")
    res = fit_evaluate(
        feats, ["v", "v_lag1"], "v", "t", 60, horizons=[1, 5], partition_by="series"
    )
    for h in (1, 5):
        # predictions can't beat the noise floor but must stay near it
        assert 0.05 < res[h]["rmse"] < 0.5
    assert res[1]["n_train"] >= res[5]["n_train"]


def test_quartile_strata(spark):
    from data_pipelines_examples_spark.ml import quartile_strata

    df = spark.createDataFrame(
        [(i, float(i), None if i == 0 else float(100 - i)) for i in range(8)],
        "id int, income double, educ double",
    )
    out = quartile_strata(df, ["income", "educ"])
    rows = {r.id: (r.income_qtile, r.educ_qtile) for r in out.collect()}
    assert {q for q, _ in rows.values()} == {1, 2, 3, 4}
    # NULL educ coalesces to 0 -> lowest quartile
    assert rows[0][1] == 1


def test_propensity_match_nearest_and_threshold(spark):
    from data_pipelines_examples_spark.ml import propensity_match

    # stratum A: treatment 0.50 sits between controls 0.48 and 0.60 -> 0.48;
    # treatment 0.90 has only 0.60 below -> matched at distance 0.30.
    # stratum B: control above only. with-replacement: both B treatments
    # match the same control.
    df = spark.createDataFrame(
        [
            ("A", 1, 0.50, 1),
            ("A", 2, 0.48, 0),
            ("A", 3, 0.60, 0),
            ("A", 4, 0.90, 1),
            ("B", 5, 0.10, 1),
            ("B", 6, 0.12, 1),
            ("B", 7, 0.20, 0),
        ],
        "stratum string, pid int, score double, treated int",
    )
    out = propensity_match(df, "treated", "score", "pid", strata=["stratum"])
    got = {r.pid: (r.match_id, round(r.score_dist, 6)) for r in out.collect()}
    assert got == {1: (2, 0.02), 4: (3, 0.30), 5: (7, 0.10), 6: (7, 0.08)}
    thr = propensity_match(df, "treated", "score", "pid", strata=["stratum"], threshold=0.1)
    assert {r.pid for r in thr.collect()} == {1, 5, 6}


def test_propensity_match_equal_score_control_visible(spark):
    from data_pipelines_examples_spark.ml import propensity_match

    df = spark.createDataFrame(
        [(1, 0.5, 1), (2, 0.5, 0)], "pid int, score double, treated int"
    )
    got = propensity_match(df, "treated", "score", "pid").collect()
    assert len(got) == 1 and got[0].match_id == 2 and got[0].score_dist == 0.0


def test_quality_classifier_separable(spark):
    from data_pipelines_examples_spark.ml import (
        score_quality,
        train_quality_classifier,
    )

    # Clean docs use one vocabulary, junk docs another — linearly
    # separable, so the classifier must score them apart decisively.
    clean = [
        (i, 1.0, f"thoughtful prose about careful analysis topic{i % 5}")
        for i in range(20)
    ]
    junk = [
        (100 + i, 0.0, f"click here buy now free offer spam{i % 5}")
        for i in range(20)
    ]
    df = spark.createDataFrame(clean + junk, "doc_id int, label double, text string")
    model = train_quality_classifier(df, "label")
    scored = score_quality(model, df)
    rows = {r["doc_id"]: r["quality_prob"] for r in scored.collect()}
    assert all(rows[i] > 0.9 for i, _, _ in clean)
    assert all(rows[i] < 0.1 for i, _, _ in junk)
    # intermediate feature columns are gone; original columns survive
    assert set(scored.columns) == {"doc_id", "label", "text", "quality_prob"}


def test_quality_classifier_generalizes_to_unseen(spark):
    from data_pipelines_examples_spark.ml import (
        score_quality,
        train_quality_classifier,
    )

    train = spark.createDataFrame(
        [(i, 1.0, "careful analysis of query engines") for i in range(10)]
        + [(10 + i, 0.0, "free spam offer click now") for i in range(10)],
        "doc_id int, label double, text string",
    )
    unseen = spark.createDataFrame(
        [(100, "careful engines analysis"), (101, "spam click free")],
        "doc_id int, text string",
    )
    model = train_quality_classifier(train, "label")
    got = {r["doc_id"]: r["quality_prob"] for r in score_quality(model, unseen).collect()}
    assert got[100] > 0.5 > got[101]


def test_log_run_roundtrip_fit_evaluate(spark, tmp_path):
    """Round-5 artifact: fit_evaluate(run_dir=...) persists a run.json
    (params, per-horizon metrics, input checksum) that reads back
    exactly — the file-based MLflow-run shape."""
    from data_pipelines_examples_spark.ml import fit_evaluate, read_run
    from data_pipelines_examples_spark.operators.windows import lag_features
    from data_pipelines_examples_spark.reporting import corpus_checksum

    df = spark.createDataFrame(
        [(t, 3.0 + 0.5 * t) for t in range(60)], "t int, v double"
    )
    feats = lag_features(df, "v", "t", [1, 2])
    run_dir = str(tmp_path / "run1")
    res = fit_evaluate(feats, ["v", "v_lag1"], "v", "t", 45, run_dir=run_dir)
    art = read_run(spark, run_dir)
    assert art["params"]["feature_cols"] == ["v", "v_lag1"]
    assert art["params"]["split_point"] == "45"
    assert art["metrics"]["1"]["rmse"] == res[1]["rmse"]
    # the checksum ties the run to the frame the models ACTUALLY trained
    # from: post assemble_features null-drop (lag features are null at
    # the series head), not the raw input
    from data_pipelines_examples_spark.ml import assemble_features

    trained_frame = assemble_features(feats, ["v", "v_lag1"])
    assert art["data_checksum"] == corpus_checksum(
        trained_frame, cols=["v", "v_lag1", "v"]
    )
    assert art["data_checksum"] != corpus_checksum(feats, cols=["v", "v_lag1", "v"])


def test_log_run_roundtrip_quality_classifier(spark, tmp_path):
    """train_quality_classifier(run_dir=...) saves run.json AND a
    reloadable PipelineModel whose scores match the in-memory model."""
    from pyspark.ml import PipelineModel

    from data_pipelines_examples_spark.ml import (
        read_run,
        score_quality,
        train_quality_classifier,
    )

    rows = [
        (i, 1.0, f"thoughtful prose about careful analysis topic{i % 5}")
        for i in range(20)
    ] + [
        (100 + i, 0.0, f"click here buy now free offer spam{i % 5}")
        for i in range(20)
    ]
    df = spark.createDataFrame(rows, "doc_id int, label double, text string")
    run_dir = str(tmp_path / "run2")
    model = train_quality_classifier(df, "label", run_dir=run_dir)
    art = read_run(spark, run_dir)
    assert art["metrics"]["n_train"] == 40
    assert art["metrics"]["accuracy"] >= 0.95
    assert isinstance(art["data_checksum"], int)
    reloaded = PipelineModel.load(run_dir + "/model")
    a = {r["doc_id"]: r["quality_prob"] for r in score_quality(model, df).collect()}
    b = {r["doc_id"]: r["quality_prob"] for r in score_quality(reloaded, df).collect()}
    assert a == b


def test_log_run_relog_and_crash_fallback(spark, tmp_path):
    """Re-logging the same run_dir replaces the marker atomically, and a
    crash that parked the previous marker (run.json.old present,
    run.json absent) still reads back the last COMPLETE run."""
    import shutil

    from data_pipelines_examples_spark.ml import log_run, read_run

    run_dir = str(tmp_path / "run")
    log_run(spark, run_dir, {"p": 1}, {"rmse": 0.5})
    log_run(spark, run_dir, {"p": 2}, {"rmse": 0.4})  # re-log, no crash
    assert read_run(spark, run_dir)["params"]["p"] == 2
    # simulate the crash window: marker parked, install never happened
    shutil.move(run_dir + "/run.json", run_dir + "/run.json.old")
    assert read_run(spark, run_dir)["params"]["p"] == 2
