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

    # local[8], NOT local[$SPARK_GRAFT_CPUS] (r14): the fixtures are
    # tens-to-thousands of rows, so a 32-slot scheduler only adds task
    # dispatch overhead to every one of the suite's ~2000 tiny jobs —
    # measured 68 s → 47 s on the asof+reporting subset, local[4] is
    # worse again (8 keeps narrow 8-partition stages fully parallel).
    # The $SPARK_GRAFT_CPUS contract binds bench.py, not the test
    # fixtures; tests that reference parallelism read it from the live
    # session. This exists to keep the suite inside the driver's pytest
    # budget even on a loaded host (r13: cut off at 77% under 2× load).
    s = get_session(
        "tests",
        master="local[8]",
        extra_conf={"spark.sql.shuffle.partitions": "8"},
    )
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
