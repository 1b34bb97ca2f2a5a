"""Registry smoke: every declared query runs at sf0.001 and returns a stable
schema; entry() returns rows (the driver's t1 gate)."""

from __future__ import annotations

import pytest

import __spark_entry__ as em
from tests.conftest import SF_DIR


def test_entry_returns_rows(spark):
    df = em.entry(spark)
    assert df.count() > 0


def test_oracle_sql_keys_subset_of_queries():
    qs, os_ = em.queries(), em.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 40


@pytest.mark.parametrize("name", sorted(em.queries()))
def test_query_runs(spark, name):
    df = em.queries()[name](spark, SF_DIR)
    assert df.columns  # non-empty schema
    assert df.count() >= 0
