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
