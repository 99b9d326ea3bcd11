"""ML-handoff helpers (SURVEY §2 feature-engineering cluster), kept thin:
feature assembly, leakage-safe time splits, label shifting.

Reference parity:
- lag/momentum feature building + label shift —
  automl_linearreg_process_stocks.py:100-335 (the lag cascade itself is
  operators.windows.lag_features — one window sort, not N self-joins)
- train/test date split — automl_linearreg_process_stocks.py:441-449
- VectorUDT assembly for MLlib — automl_linearreg_process_stocks.py:44-45,470-474

Features are plain ``array<double>`` columns by default (portable,
arrow-friendly); ``to_mllib_vectors`` converts at the MLlib boundary only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def assemble_features(
    df: DataFrame, feature_cols: list[str], out_col: str = "features", drop_na: bool = True
) -> DataFrame:
    """Pack feature columns into one array<double> column; rows with any
    null feature are dropped by default (lag features are null at the
    series head)."""
    if drop_na:
        df = df.dropna(subset=feature_cols)
    return df.withColumn(
        out_col, F.array(*[F.col(c).cast("double") for c in feature_cols])
    )


def to_mllib_vectors(df: DataFrame, array_col: str = "features", out_col: str | None = None):
    """array<double> → MLlib DenseVector column at the MLlib boundary."""
    from pyspark.ml.functions import array_to_vector

    return df.withColumn(out_col or array_col, array_to_vector(F.col(array_col)))


def shift_label(
    df: DataFrame,
    value_col: str,
    order_by: str | list[str],
    horizon: int = 1,
    partition_by: str | list[str] | None = None,
    out_col: str = "label",
) -> DataFrame:
    """Predict-the-future label: lead(value, horizon) over the series order
    (the reference shifts labels with an offset self-join)."""
    from pyspark.sql import Window

    orders = [order_by] if isinstance(order_by, str) else list(order_by)
    if partition_by:
        parts = [partition_by] if isinstance(partition_by, str) else list(partition_by)
        w = Window.partitionBy(*parts).orderBy(*orders)
    else:
        w = Window.orderBy(*orders)
    return df.withColumn(out_col, F.lead(value_col, horizon).over(w))


def time_split(
    df: DataFrame, ts_col: str, split_point
) -> tuple[DataFrame, DataFrame]:
    """Leakage-safe train/test split on a time boundary: train strictly
    before, test at/after. Both sides partition-prune on a partitioned
    source."""
    train = df.filter(F.col(ts_col) < F.lit(split_point))
    test = df.filter(F.col(ts_col) >= F.lit(split_point))
    return train, test


def log_run(
    spark,
    run_dir: str,
    params: dict,
    metrics: dict,
    data_checksum: int | None = None,
    model=None,
) -> str:
    """Persist an experiment-run artifact with NO service dependency —
    the file-based stand-in for the reference's MLflow run logging
    (notebooks/databricks/python/mlflow_pymatch_single_node.py:268-325
    logs params/metrics/model to a tracking server): a ``run.json``
    holding params, metrics, and an optional input-data checksum
    (``reporting.corpus_checksum`` — anchors the run to the exact input
    frame training derived from; together with the split/horizon params
    it answers the lineage question "what data produced this model"),
    plus the fitted model saved beside it when given. Returns the
    run.json path. Works on any Hadoop-visible filesystem — the same
    ``corpus_datacard`` pattern used for dataset artifacts.
    """
    import json

    from .sources.writers import _hadoop_fs

    payload = {
        "params": params,
        "metrics": metrics,
        "data_checksum": data_checksum,
    }
    # model first, run.json last via staging+rename (the repo's
    # upsert_by_key/incremental_rollup discipline): run.json is the
    # artifact's commit marker — a crash mid-write leaves a .tmp file,
    # never a truncated run.json; on a FRESH run_dir run.json present ⇒
    # model present. Re-logging the same dir can transiently pair the
    # previous marker with a newer model until the install lands — use
    # one run_dir per run (the MLflow convention) where that matters.
    if model is not None:
        model.write().overwrite().save(run_dir.rstrip("/") + "/model")
    run_path = run_dir.rstrip("/") + "/run.json"
    fs, p = _hadoop_fs(spark, run_path)
    tmp = _hadoop_fs(spark, run_path + ".tmp")[1]
    out = fs.create(tmp, True)
    out.write(bytearray(json.dumps(payload, indent=2, default=str).encode()))
    out.close()
    # re-log into an existing run_dir must not destroy the previous
    # marker before the new one is in place: park it at .old (read_run
    # falls back to it), install, then drop the parked copy
    old = _hadoop_fs(spark, run_path + ".old")[1]
    if fs.exists(old):
        fs.delete(old, False)
    if fs.exists(p) and not fs.rename(p, old):
        raise IOError(f"log_run: rename failed: {p} -> {old}")
    if not fs.rename(tmp, p):
        fs.rename(old, p)  # best-effort rollback
        raise IOError(f"log_run: rename failed: {tmp} -> {p}")
    if fs.exists(old):
        fs.delete(old, False)
    return run_path


def read_run(spark, run_dir: str) -> dict:
    """Read back a ``log_run`` artifact (the roundtrip half). Falls back
    to ``run.json.old`` when a re-log crashed after parking the previous
    marker — the last COMPLETE run is always readable."""
    import json

    from .sources.writers import _hadoop_fs

    fs, p = _hadoop_fs(spark, run_dir.rstrip("/") + "/run.json")
    if not fs.exists(p):
        fallback = _hadoop_fs(spark, run_dir.rstrip("/") + "/run.json.old")[1]
        if fs.exists(fallback):
            p = fallback
    stream = fs.open(p)
    try:
        text = spark._jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
    finally:
        stream.close()
    return json.loads(text)


def fit_evaluate(
    df: DataFrame,
    feature_cols: list[str],
    value_col: str,
    ts_col: str,
    split_point,
    horizons: list[int] | None = None,
    partition_by: str | list[str] | None = None,
    reg_param: float = 0.0,
    elastic_net_param: float = 0.0,
    run_dir: str | None = None,
) -> dict[int, dict]:
    """Train and evaluate one LinearRegression per forecast horizon — the
    reference's AutoML workflow closed end-to-end (train/test date split,
    gaussian/identity linear fit, per-horizon error report;
    automl_linearreg_process_stocks.py:441-530).

    Per horizon: shift the label ``lead(value, h)``, drop the unlabeled
    series tail (the reference's ``Date_Rank <> 1`` most-recent exclusion),
    split leakage-safe on ``split_point`` (train strictly before), fit on
    the train side, score RMSE on the held-out side. The "normal" solver is
    closed-form, so results are deterministic for a fixed input — no seed
    needed. Feature assembly stays a plain array<double> until the MLlib
    boundary (``to_mllib_vectors``).

    Returns ``{horizon: {"rmse": float, "coefficients": [...],
    "intercept": float, "n_train": int, "n_test": int}}``.

    ``run_dir``: when given, persist a ``log_run`` artifact there —
    params, per-horizon metrics, and a checksum of the input features —
    completing the reference's MLflow-logging shape file-side.

    Scale note: each fit is one pass over the train side (WLS normal
    equations, feature count must be modest); the horizons loop reuses one
    cached feature frame so the lag-window sort runs once, not per horizon.
    """
    from pyspark.ml.evaluation import RegressionEvaluator
    from pyspark.ml.regression import LinearRegression

    from .cache import internal_persist_scope

    horizons = horizons or [1]
    base = assemble_features(df, feature_cols).cache()
    # Terminal composition: results are fully materialized dicts, so no
    # returned plan depends on library-internal persists. The SCOPED
    # drain (cache.py) releases exactly the persists armed inside this
    # call — on success or exception — without touching caches backing
    # a caller's unrelated pending lazy frames.
    try:
        with internal_persist_scope():
            results: dict[int, dict] = {}
            for h in horizons:
                labeled = shift_label(
                    base, value_col, ts_col, horizon=h, partition_by=partition_by
                ).dropna(subset=["label"])
                vec = to_mllib_vectors(labeled)
                train, test = time_split(vec, ts_col, split_point)
                lr = LinearRegression(
                    featuresCol="features",
                    labelCol="label",
                    regParam=reg_param,
                    elasticNetParam=elastic_net_param,
                    solver="normal",
                )
                model = lr.fit(train)
                preds = model.transform(test)
                rmse = RegressionEvaluator(
                    labelCol="label", predictionCol="prediction", metricName="rmse"
                ).evaluate(preds)
                results[h] = {
                    "rmse": float(rmse),
                    "coefficients": [float(c) for c in model.coefficients],
                    "intercept": float(model.intercept),
                    "n_train": train.count(),
                    "n_test": test.count(),
                }
            if run_dir is not None:
                from .reporting import corpus_checksum

                log_run(
                    df.sparkSession,
                    run_dir,
                    params={
                        "feature_cols": feature_cols,
                        "value_col": value_col,
                        "ts_col": ts_col,
                        "split_point": str(split_point),
                        "horizons": horizons,
                        "partition_by": partition_by,
                        "reg_param": reg_param,
                        "elastic_net_param": elastic_net_param,
                    },
                    metrics={str(h): r for h, r in results.items()},
                    # checksum BASE, not df: the cached post-null-drop
                    # feature frame every horizon trains FROM (each model
                    # additionally label-drops its horizon tail and splits
                    # at split_point — those are pinned by the params, not
                    # the checksum), served from cache instead of re-running
                    # the raw input lineage end-to-end
                    data_checksum=corpus_checksum(
                        base, cols=[*feature_cols, value_col]
                    ),
                )
            return results
    finally:
        base.unpersist()


def train_quality_classifier(
    df: DataFrame,
    label_col: str,
    text_col: str = "text",
    num_features: int = 1 << 18,
    use_idf: bool = False,
    reg_param: float = 0.0,
    max_iter: int = 50,
    run_dir: str | None = None,
):
    """Train a fasttext-style linear quality classifier: hashed
    bag-of-tokens features → logistic regression — the standard
    model-based rung of the corpus quality ladder (the heuristic rungs
    are ``text.quality_score`` and the surprisal filters): label a seed
    set (e.g. curated vs crawled sources), fit, then score the whole
    corpus and keep the high-probability tail.

    Pipeline: RegexTokenizer (``\\s+``, matching every other tokenizer in
    the engine) → HashingTF (feature hashing — no vocabulary broadcast,
    the trick that makes the featurizer corpus-size-independent) →
    optional IDF → LogisticRegression. Returns the fitted PipelineModel.

    Scale shape: featurization is a narrow map (hashing, no dictionary);
    the only distributed iteration is LBFGS's gradient treeAggregate —
    one pass over the corpus per iteration with map-side combine, the
    same shape MLlib uses at any cluster size. ``num_features`` bounds
    the model vector (2^18 doubles ≈ 2 MB broadcast).
    """
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import IDF, HashingTF, RegexTokenizer

    from .cache import internal_persist_scope

    stages = [
        RegexTokenizer(
            inputCol=text_col, outputCol="__tokens", pattern=r"\s+", toLowercase=True
        ),
        HashingTF(inputCol="__tokens", outputCol="__tf", numFeatures=num_features),
    ]
    feat_col = "__tf"
    if use_idf:
        stages.append(IDF(inputCol="__tf", outputCol="__tfidf"))
        feat_col = "__tfidf"
    stages.append(
        LogisticRegression(
            featuresCol=feat_col,
            labelCol=label_col,
            regParam=reg_param,
            maxIter=max_iter,
        )
    )
    # Terminal composition: the fitted PipelineModel is driver-resident
    # state, independent of any library-internal persist — the SCOPED
    # drain (cache.py) releases exactly what this call armed, on success
    # or exception, leaving a caller's unrelated pending frames cached.
    with internal_persist_scope():
        model = Pipeline(stages=stages).fit(df)
        if run_dir is not None:
            from .reporting import corpus_checksum

            lr_model = model.stages[-1]
            summary = lr_model.summary
            log_run(
                df.sparkSession,
                run_dir,
                params={
                    "label_col": label_col,
                    "text_col": text_col,
                    "num_features": num_features,
                    "use_idf": use_idf,
                    "reg_param": reg_param,
                    "max_iter": max_iter,
                },
                metrics={
                    "accuracy": float(summary.accuracy),
                    "area_under_roc": float(summary.areaUnderROC),
                    "n_train": df.count(),
                },
                data_checksum=corpus_checksum(df, cols=[text_col, label_col]),
                model=model,
            )
        return model


def score_quality(
    model,
    df: DataFrame,
    out_col: str = "quality_prob",
) -> DataFrame:
    """Score a corpus with a trained quality classifier: append the
    positive-class probability and drop the intermediate feature
    columns. Pure transform — no shuffle; filters on ``out_col``
    compose with the scan."""
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(df)
    return scored.withColumn(
        out_col, vector_to_array(F.col("probability"))[1]
    ).drop("__tokens", "__tf", "__tfidf", "rawPrediction", "probability", "prediction")


def quartile_strata(
    df: DataFrame, cols: list[str], n: int = 4, suffix: str = "_qtile"
) -> DataFrame:
    """Add NTILE(n) stratum columns per feature — the reference builds
    these as covariate strata for propensity matching
    (mlflow_pymatch_single_node.py:113-115, HH_INCOME_QTILE /
    COLLEGE_EDUC_QTILE). NULLs coalesce to 0 before ranking, matching the
    reference's COALESCE. One window sort per column; at scale prefer
    ``approxQuantile``-derived bucket edges (one pass, no global sort)."""
    from pyspark.sql import Window

    out = df
    for c in cols:
        w = Window.orderBy(F.coalesce(F.col(c), F.lit(0)))
        out = out.withColumn(f"{c}{suffix}", F.ntile(n).over(w))
    return out


def propensity_match(
    df: DataFrame,
    treatment_col: str,
    score_col: str,
    id_col: str,
    strata: list[str] | None = None,
    threshold: float | None = None,
) -> DataFrame:
    """Nearest-propensity-score matching of treatment rows to control rows
    (with replacement), optionally within covariate strata and within a
    max score distance — the distributed re-expression of the reference's
    single-node pymatch ``m.match(...)`` driver loop
    (mlflow_pymatch_single_node.py:268-289).

    Spark-first shape: matching on a 1-D score is an AS-OF JOIN on the
    score axis. Union treatments and controls, sort once per stratum by
    (score, tiebreak), and take the running last control at-or-below and
    first control at-or-above each treatment via one window pass each
    direction; the nearest of the two wins. Two exchanges total,
    no per-case driver loop, no cross join — scales to any cohort size.

    Returns one row per matched treatment:
    (id_col, score, match_id, match_score, score_dist).
    """
    from pyspark.sql import Window

    parts = list(strata) if strata else []
    t = F.col(treatment_col)
    base = df.select(
        *parts,
        F.col(id_col).alias("__id"),
        F.col(score_col).cast("double").alias("__score"),
        t.cast("int").alias("__treated"),
    )
    # Controls sort ahead of treatments at equal scores so a same-score
    # control is visible to the "at-or-below" pass (and symmetric above).
    w_dn = Window.partitionBy(*parts).orderBy("__score", F.col("__treated").asc(), "__id")
    w_up = (
        Window.partitionBy(*parts)
        .orderBy(F.col("__score").desc(), F.col("__treated").asc(), F.col("__id").desc())
    )
    ctl_struct = F.when(
        F.col("__treated") == 0, F.struct("__score", "__id")
    )
    enriched = base.withColumn(
        "__below", F.last(ctl_struct, ignorenulls=True).over(w_dn)
    ).withColumn("__above", F.last(ctl_struct, ignorenulls=True).over(w_up))
    d_below = F.abs(F.col("__score") - F.col("__below.__score"))
    d_above = F.abs(F.col("__above.__score") - F.col("__score"))
    best = F.when(
        F.col("__above").isNull()
        | (F.col("__below").isNotNull() & (d_below <= d_above)),
        F.col("__below"),
    ).otherwise(F.col("__above"))
    out = (
        enriched.filter(F.col("__treated") == 1)
        .withColumn("__match", best)
        .filter(F.col("__match").isNotNull())
        .select(
            *parts,
            F.col("__id").alias(id_col),
            F.col("__score").alias(score_col),
            F.col("__match.__id").alias("match_id"),
            F.col("__match.__score").alias("match_score"),
            F.abs(F.col("__score") - F.col("__match.__score")).alias("score_dist"),
        )
    )
    if threshold is not None:
        out = out.filter(F.col("score_dist") <= threshold)
    return out
