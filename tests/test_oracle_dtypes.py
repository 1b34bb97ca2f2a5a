"""Representation-drift gate: every oracle pair's analyzed schemas must
agree at the pandas-materialization level (tools/oracle_dtype_audit.py).

The driver's value hash is representation-sensitive: a DuckDB HUGEINT or
DECIMAL materializes as float64 through .df(), so it can never hash-match
a Spark int64 even when every value is equal. This class killed
q_scalar_math (r1), q_pack_linear (r3), and q_kaplan_meier/q_rollup_merge
(r9) — and each time the audit tool existed but was not on any gate. The
lesson of r8-q11 and r9 is the same: checks that are not in `pytest
tests/` do not run. This test is that wiring. It is schema-only (Spark
analyzed plan vs DuckDB LIMIT-0 relation) — no data is executed beyond
what plan-builders do at construction time, so the whole 218-oracle sweep
costs ~70s at sf0.001.
"""

from __future__ import annotations

import pytest
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

import oracle_dtype_audit  # noqa: E402


@pytest.mark.slow
def test_every_oracle_pair_is_representation_clean(spark):
    # audit() calls get_spark(), which returns the live singleton the
    # `spark` fixture already created — no second JVM.
    assert oracle_dtype_audit.audit("/root/testdata/sf0.001") == 0
