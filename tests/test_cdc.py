"""Snapshot-diff (CDC) tests: classification, NULL discipline, digest-vs-
value equivalence on the registered query's derivation."""

from __future__ import annotations

import pytest

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
@pytest.mark.slow
def test_snapshot_diff_fuzz_matches_reference(spark, old_rows, new_rows):
    """Random keyed snapshots (NULLs, empty strings, separator-colliding
    values) — the digest join must classify exactly like a dict diff."""
    schema = "k long, a string, b string"
    old = spark.createDataFrame(old_rows, schema) if old_rows else spark.createDataFrame([], schema)
    new = spark.createDataFrame(new_rows, schema) if new_rows else spark.createDataFrame([], schema)
    got = {r.k: r.change_type for r in snapshot_diff(old, new, ["k"]).collect()}
    assert got == _reference_diff(old_rows, new_rows)


# ---------------------------------------------------------------------------
# SCD2 build + point-in-time join
# ---------------------------------------------------------------------------

from gdelt_2_0_event_database_pipeline_spark.operators.cdc import (  # noqa: E402
    scd2_build,
    scd2_pit_join,
)


def _log(spark, rows):
    return spark.createDataFrame(rows, "k long, ts long, attr string").withColumn(
        "ts", F.timestamp_micros(F.col("ts") * 1_000_000)
    )


def test_scd2_collapses_noop_changes(spark):
    log = _log(spark, [(1, 10, "a"), (1, 20, "a"), (1, 30, "b"), (1, 40, "b")])
    vs = scd2_build(log, ["k"], "ts", ["attr"]).orderBy("version").collect()
    assert [(v.attr, v.version, v.is_current) for v in vs] == [
        ("a", 1, False),
        ("b", 2, True),
    ]
    # valid_to of version 1 == valid_from of version 2 (half-open chain)
    assert vs[0].valid_to == vs[1].valid_from
    assert vs[1].valid_to is None


def test_scd2_no_collapse_keeps_every_row(spark):
    log = _log(spark, [(1, 10, "a"), (1, 20, "a")])
    assert scd2_build(log, ["k"], "ts", ["attr"], collapse=False).count() == 2


def test_scd2_attr_reverts_start_new_version(spark):
    # a -> b -> a must be 3 versions (SCD2 tracks history, not distinct states)
    log = _log(spark, [(1, 10, "a"), (1, 20, "b"), (1, 30, "a")])
    vs = scd2_build(log, ["k"], "ts", ["attr"]).orderBy("version").collect()
    assert [v.attr for v in vs] == ["a", "b", "a"]


def test_scd2_null_attr_transitions(spark):
    # NULL <-> value transitions are real changes; NULL == NULL is a no-op
    log = _log(spark, [(1, 10, None), (1, 20, None), (1, 30, "x"), (1, 40, None)])
    vs = scd2_build(log, ["k"], "ts", ["attr"]).orderBy("version").collect()
    assert [v.attr for v in vs] == [None, "x", None]


def test_scd2_pit_picks_containing_interval(spark):
    dim = scd2_build(
        _log(spark, [(1, 10, "a"), (1, 20, "b"), (2, 15, "z")]), ["k"], "ts", ["attr"]
    )
    facts = spark.createDataFrame(
        [(100, 1, 5), (101, 1, 10), (102, 1, 19), (103, 1, 20), (104, 2, 99), (105, 3, 50)],
        "fid long, k long, fts long",
    ).withColumn("fts", F.timestamp_micros(F.col("fts") * 1_000_000))
    out = scd2_pit_join(facts, dim.select("k", "attr", "valid_from", "valid_to"),
                        ["k"], "fts")
    got = {r.fid: r.attr for r in out.collect()}
    # 5 predates the first version -> NULL; 19 still 'a'; 20 flips to 'b';
    # unknown key 3 -> NULL
    assert got == {100: None, 101: "a", 102: "a", 103: "b", 104: "z", 105: None}
    assert out.count() == facts.count()  # left join, no fan-out


def test_scd2_same_ts_versions_zero_width(spark):
    # two changes at one instant: the later order_col wins for PIT lookups
    log = spark.createDataFrame(
        [(1, 10, 0, "a"), (1, 10, 1, "b")], "k long, ts long, seq long, attr string"
    ).withColumn("ts", F.timestamp_micros(F.col("ts") * 1_000_000))
    dim = scd2_build(log, ["k"], "ts", ["attr"], order_cols=["seq"])
    facts = spark.createDataFrame([(1, 1, 10)], "fid long, k long, fts long").withColumn(
        "fts", F.timestamp_micros(F.col("fts") * 1_000_000)
    )
    out = scd2_pit_join(facts, dim.select("k", "attr", "valid_from", "valid_to"),
                        ["k"], "fts").collect()
    assert len(out) == 1 and out[0].attr == "b"


# ---------------------------------------------------------------------------
# apply_changes (batch MERGE) + diff/apply round-trip
# ---------------------------------------------------------------------------

from gdelt_2_0_event_database_pipeline_spark.operators.cdc import (  # noqa: E402
    apply_changes,
)


def test_apply_changes_semantics(spark):
    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    )
    changes = spark.createDataFrame(
        [(2, "upsert", "B"), (3, "delete", None), (4, "upsert", "d")],
        "k long, op string, v string",
    )
    got = {r.k: r.v for r in apply_changes(base, changes, ["k"]).collect()}
    assert got == {1: "a", 2: "B", 4: "d"}


def test_apply_changes_rejects_unknown_op(spark):
    # validation is IN-PLAN (raise_error rides the job — no eager
    # validation pass per call), so it surfaces at action time
    base = spark.createDataFrame([(1, "a")], "k long, v string")
    bad = spark.createDataFrame([(1, "merge", "x")], "k long, op string, v string")
    import pytest as _pytest

    with _pytest.raises(Exception, match="unknown op value"):
        apply_changes(base, bad, ["k"]).collect()


def test_diff_apply_roundtrip(spark):
    """apply(old, payload-enriched diff(old, new)) reproduces new exactly."""
    old = spark.createDataFrame(
        [(i, f"v{i}", i % 3) for i in range(40)], "k long, v string, g long"
    )
    new = spark.createDataFrame(
        [(i, ("V" if i % 5 == 0 else "v") + str(i), i % 3) for i in range(7, 45)],
        "k long, v string, g long",
    )
    d = snapshot_diff(old, new, ["k"])
    # enrich the diff into a change set: removed -> delete; added/changed ->
    # upsert with the NEW payload
    changes = d.join(new, ["k"], "left").select(
        "k",
        F.when(F.col("change_type") == "removed", "delete")
        .otherwise("upsert")
        .alias("op"),
        "v",
        "g",
    )
    rebuilt = apply_changes(old, changes, ["k"])
    assert rebuilt.exceptAll(new).count() == 0
    assert new.exceptAll(rebuilt).count() == 0
