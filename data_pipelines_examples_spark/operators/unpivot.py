"""Wide→long unpivot via the ``stack`` generator.

Reference: notebooks/databricks/sql/sas_conversion_with_manual_salt_skewed_join.sql:240
unpivots 16 diagnosis-ish columns into rows with ``stack(16, 'c1', c1, ...)``.

Scale note: stack is a generator — narrow, no shuffle; output rows = input
rows × n_cols, so push filters (e.g. ``value IS NOT NULL``) immediately
after to cut the blow-up before any downstream exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def unpivot(
    df: DataFrame,
    id_cols: list[str],
    value_cols: list[str],
    key_col: str = "key",
    value_col: str = "value",
    drop_nulls: bool = True,
) -> DataFrame:
    """Unpivot ``value_cols`` into (key, value) rows, keeping ``id_cols``."""
    pairs = ", ".join(f"'{c}', `{c}`" for c in value_cols)
    expr = f"stack({len(value_cols)}, {pairs}) as (`{key_col}`, `{value_col}`)"
    out = df.select(*id_cols, F.expr(expr))
    if drop_nulls:
        out = out.filter(F.col(value_col).isNotNull())
    return out
