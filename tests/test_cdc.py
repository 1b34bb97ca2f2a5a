"""Snapshot-diff (CDC) tests: classification, NULL discipline, digest-vs-
value equivalence on the registered query's derivation."""

from __future__ import annotations

from pyspark.sql import functions as F

from gdelt_2_0_event_database_pipeline_spark.operators.cdc import snapshot_diff


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, a string, b string")


def test_snapshot_diff_classifies(spark):
    old = _df(spark, [(1, "x", "y"), (2, "x", "y"), (3, "x", "y")])
    new = _df(spark, [(2, "x", "y"), (3, "x", "z"), (4, "x", "y")])
    got = {r.k: r.change_type for r in snapshot_diff(old, new, ["k"]).collect()}
    assert got == {1: "removed", 3: "changed", 4: "added"}


def test_snapshot_diff_null_column_swap_detected(spark):
    # (NULL,'x') → ('x',NULL) must register as changed — naive multi-arg
    # xxhash64 skips NULLs and would collide the two states
    old = _df(spark, [(1, None, "x"), (2, None, None)])
    new = _df(spark, [(1, "x", None), (2, None, None)])
    got = {r.k: r.change_type for r in snapshot_diff(old, new, ["k"]).collect()}
    assert got == {1: "changed"}


def test_snapshot_diff_explicit_compare_cols(spark):
    old = _df(spark, [(1, "x", "y")])
    new = _df(spark, [(1, "x", "CHANGED")])
    assert snapshot_diff(old, new, ["k"], compare_cols=["a"]).count() == 0
    assert snapshot_diff(old, new, ["k"], compare_cols=["b"]).count() == 1


def test_snapshot_diff_identical_snapshots_empty(spark):
    d = _df(spark, [(1, "x", "y"), (2, None, "z")])
    assert snapshot_diff(d, d, ["k"]).count() == 0


def test_snapshot_diff_composite_key(spark):
    old = spark.createDataFrame(
        [(1, "p", "v1"), (1, "q", "v1")], "k long, part string, v string"
    )
    new = spark.createDataFrame(
        [(1, "p", "v2"), (1, "r", "v1")], "k long, part string, v string"
    )
    got = {
        (r.k, r.part): r.change_type
        for r in snapshot_diff(old, new, ["k", "part"]).collect()
    }
    assert got == {(1, "p"): "changed", (1, "q"): "removed", (1, "r"): "added"}


# ---------------------------------------------------------------- fuzz
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_VALS = st.one_of(st.none(), st.sampled_from(["a", "b", "", "x\x1fy"]))
_ROWS = st.lists(
    st.tuples(st.integers(0, 6), _VALS, _VALS), min_size=0, max_size=8
).map(lambda rows: list({k: (k, a, b) for k, a, b in rows}.values()))  # unique keys


def _reference_diff(old_rows, new_rows):
    old = {k: (a, b) for k, a, b in old_rows}
    new = {k: (a, b) for k, a, b in new_rows}
    out = {}
    for k in old.keys() | new.keys():
        if k not in new:
            out[k] = "removed"
        elif k not in old:
            out[k] = "added"
        elif old[k] != new[k]:
            out[k] = "changed"
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(old_rows=_ROWS, new_rows=_ROWS)
def test_snapshot_diff_fuzz_matches_reference(spark, old_rows, new_rows):
    """Random keyed snapshots (NULLs, empty strings, separator-colliding
    values) — the digest join must classify exactly like a dict diff."""
    schema = "k long, a string, b string"
    old = spark.createDataFrame(old_rows, schema) if old_rows else spark.createDataFrame([], schema)
    new = spark.createDataFrame(new_rows, schema) if new_rows else spark.createDataFrame([], schema)
    got = {r.k: r.change_type for r in snapshot_diff(old, new, ["k"]).collect()}
    assert got == _reference_diff(old_rows, new_rows)
