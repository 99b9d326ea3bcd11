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
