from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from data_pipelines_examples_spark.session import get_session

    s = get_session("tests", extra_conf={"spark.sql.shuffle.partitions": "8"})
    yield s
    s.stop()


def assert_df_equal(actual, expected, sort_by: list[str] | None = None):
    """Order-insensitive DataFrame equality on collected rows."""
    a = actual.toPandas()
    e = expected.toPandas()
    cols = sorted(a.columns)
    assert sorted(e.columns) == cols, f"columns differ: {list(a.columns)} vs {list(e.columns)}"
    a_rows = sorted(map(tuple, a[cols].astype(str).values.tolist()))
    e_rows = sorted(map(tuple, e[cols].astype(str).values.tolist()))
    assert a_rows == e_rows
