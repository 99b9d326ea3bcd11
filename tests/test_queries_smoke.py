"""Smoke: every catalog query runs at sf0.001 and returns a stable schema;
entry() works. Full value parity vs DuckDB runs in tools/check_oracle.py
(and in the driver's t2 gate at sf0.01)."""

from __future__ import annotations

import pytest

from data_pipelines_examples_spark import queries as catalog

from conftest import SF_SMOKE


@pytest.mark.parametrize("name", sorted(catalog.queries()))
def test_query_runs(spark, name):
    fn = catalog.queries()[name]
    df = fn(spark, SF_SMOKE)
    assert df.columns  # schema resolves
    assert df.count() >= 0


def test_every_oracle_has_query():
    qs, os_ = catalog.queries(), catalog.oracle_sql()
    assert set(os_) <= set(qs)


def test_entry(spark):
    import __spark_entry__ as mod

    df = mod.entry(spark)
    assert df.count() > 0
