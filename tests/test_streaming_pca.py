"""Streaming PCA moment-state maintenance (streaming/moments.py):
maintained == direct, replay no-ops, both crash windows, width guard,
fit-from-state parity, and the foreachBatch wrapper end-to-end."""

import numpy as np
import pytest

from pyspark.sql import functions as F

from gdelt_2_0_event_database_pipeline_spark.operators.pca import (
    embedding_moments,
    fit_pca,
)
from gdelt_2_0_event_database_pipeline_spark.streaming import moments as M

D = 8


def _vecs(rng, n, start=0):
    return [(start + i, [float(v) for v in rng.normal(size=D)]) for i in range(n)]


def _df(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _state_dict(spark, sp):
    return {
        (r["dim_i"], r["dim_j"]): (r["n"], r["s"])
        for r in M.read_moments_state(spark, sp).collect()
    }


@pytest.fixture()
def batches(spark):
    rng = np.random.default_rng(21)
    return [_df(spark, _vecs(rng, 40, start=100 * b)) for b in range(3)]


def test_maintained_equals_direct_and_replay_noops(spark, tmp_path, batches):
    sp = str(tmp_path / "mstate")
    for i, b in enumerate(batches):
        assert M.merge_moments_batch(spark, b, i, sp)
    # replay of any applied batch is a no-op
    assert not M.merge_moments_batch(spark, batches[1], 1, sp)

    full = batches[0].unionByName(batches[1]).unionByName(batches[2])
    direct = {
        (r["dim_i"], r["dim_j"]): (r["n"], r["s"])
        for r in embedding_moments(full).collect()
    }
    got = _state_dict(spark, sp)
    assert set(got) == set(direct)
    for key, (n, s) in direct.items():
        gn, gs = got[key]
        assert gn == n  # counts exact
        assert gs == pytest.approx(s, rel=1e-12, abs=1e-12)  # sums to fp tolerance


def test_fit_from_state_matches_batch_fit(spark, tmp_path, batches):
    sp = str(tmp_path / "mstate")
    for i, b in enumerate(batches):
        M.merge_moments_batch(spark, b, i, sp)
    full = batches[0].unionByName(batches[1]).unionByName(batches[2])
    a = M.fit_pca_from_state(spark, sp, k=3)
    b = fit_pca(full, k=3)
    assert a.n_rows == b.n_rows == 120
    assert np.allclose(a.mean, b.mean, atol=1e-12)
    assert np.allclose(a.components, b.components, atol=1e-8)
    assert np.allclose(a.explained_variance, b.explained_variance, rtol=1e-9)


def test_crash_before_commit_replays_cleanly(spark, tmp_path, batches, monkeypatch):
    sp = str(tmp_path / "mstate")
    assert M.merge_moments_batch(spark, batches[0], 0, sp)
    before = _state_dict(spark, sp)

    def _boom(*a, **k):
        raise RuntimeError("crash before ledger commit")

    monkeypatch.setattr(M, "_append_ledger_atomic", _boom)
    with pytest.raises(RuntimeError):
        M.merge_moments_batch(spark, batches[1], 1, sp)
    # state untouched; the aborted staging is dropped on the next attempt
    assert _state_dict(spark, sp) == before
    monkeypatch.undo()
    assert M.merge_moments_batch(spark, batches[1], 1, sp)
    got = _state_dict(spark, sp)
    assert got[(0, -1)][0] == 80  # both batches counted exactly once


def test_crash_after_commit_never_double_counts(spark, tmp_path, batches, monkeypatch):
    sp = str(tmp_path / "mstate")
    assert M.merge_moments_batch(spark, batches[0], 0, sp)

    real_publish = M._publish_pending_whole

    def _boom(*a, **k):
        raise RuntimeError("crash after ledger commit")

    monkeypatch.setattr(M, "_publish_pending_whole", _boom)
    with pytest.raises(RuntimeError):
        M.merge_moments_batch(spark, batches[1], 1, sp)
    monkeypatch.setattr(M, "_publish_pending_whole", real_publish)
    # replay: ledger says applied -> finish the publish, never re-merge
    assert not M.merge_moments_batch(spark, batches[1], 1, sp)
    got = _state_dict(spark, sp)
    assert got[(0, -1)][0] == 80


def test_recover_without_a_batch(spark, tmp_path, batches, monkeypatch):
    sp = str(tmp_path / "mstate")
    assert M.merge_moments_batch(spark, batches[0], 0, sp)
    monkeypatch.setattr(
        M, "_publish_pending_whole",
        lambda *a, **k: (_ for _ in ()).throw(RuntimeError("x")),
    )
    with pytest.raises(RuntimeError):
        M.merge_moments_batch(spark, batches[1], 1, sp)
    monkeypatch.undo()
    M.recover_moments_state(spark, sp)
    assert _state_dict(spark, sp)[(0, -1)][0] == 80


def test_width_mismatch_raises_and_state_survives(spark, tmp_path, batches):
    sp = str(tmp_path / "mstate")
    assert M.merge_moments_batch(spark, batches[0], 0, sp)
    before = _state_dict(spark, sp)
    narrow = _df(spark, [(0, [1.0, 2.0]), (1, [3.0, 4.0])])  # width 2 != 8
    with pytest.raises(ValueError, match="width"):
        M.merge_moments_batch(spark, narrow, 1, sp)
    assert _state_dict(spark, sp) == before
    # and the failed batch id was never committed: a corrected retry applies
    fixed = batches[1]
    assert M.merge_moments_batch(spark, fixed, 1, sp)
    assert _state_dict(spark, sp)[(0, -1)][0] == 80


def test_stream_wrapper_end_to_end(spark, tmp_path, batches):
    src = str(tmp_path / "src")
    for i, b in enumerate(batches):
        b.write.mode("append").parquet(src)
    sp = str(tmp_path / "mstate")
    stream = spark.readStream.schema(
        "vec_id long, embedding array<double>"
    ).parquet(src)
    q = M.maintain_moments_stream(
        stream, sp, checkpoint=str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    full = batches[0].unionByName(batches[1]).unionByName(batches[2])
    a = M.fit_pca_from_state(spark, sp, k=2)
    b = fit_pca(full, k=2)
    assert a.n_rows == 120
    assert np.allclose(a.components, b.components, atol=1e-8)


# --- merge-algebra fuzz: for ANY vector multiset and ANY partition into
# batches, summed per-batch moments == single-pass moments (the property
# that makes the maintained state trustworthy; the filesystem protocol
# is covered by the crash tests above). Spark jobs are slow per example,
# so few examples over an adversarial value domain (zeros, repeats,
# sign flips) instead of many over a bland one.
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_vals = st.sampled_from([0.0, 1.0, -1.0, 0.5, -273.25, 999.0])
_vecs_st = st.lists(
    st.tuples(_vals, _vals, _vals), min_size=2, max_size=16
)
_cuts_st = st.lists(st.integers(1, 15), max_size=2, unique=True)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(vecs=_vecs_st, cuts=_cuts_st)
@pytest.mark.slow
def test_fuzz_batched_moments_equal_direct(spark, vecs, cuts):
    rows = [(i, list(t)) for i, t in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    direct = {
        (r["dim_i"], r["dim_j"]): (r["n"], r["s"])
        for r in embedding_moments(df).collect()
    }

    bounds = sorted({0, len(rows), *[c for c in cuts if c < len(rows)]})
    batches = [rows[lo:hi] for lo, hi in zip(bounds, bounds[1:]) if rows[lo:hi]]
    acc: dict = {}
    for b in batches:
        bdf = spark.createDataFrame(b, "vec_id long, embedding array<double>")
        for r in embedding_moments(bdf).collect():
            key = (r["dim_i"], r["dim_j"])
            n0, s0 = acc.get(key, (0, 0.0))
            acc[key] = (n0 + r["n"], s0 + r["s"])

    assert set(acc) == set(direct)
    for key, (n, s) in direct.items():
        an, as_ = acc[key]
        assert an == n
        assert math.isclose(as_, s, rel_tol=1e-9, abs_tol=1e-9)


@pytest.mark.slow
def test_cli_pca_from_state_and_communities(spark, tmp_path, batches, capsys):
    import json as _json

    from gdelt_2_0_event_database_pipeline_spark.cli import main as cli_main

    sp = str(tmp_path / "mstate")
    for i, b in enumerate(batches):
        M.merge_moments_batch(spark, b, i, sp)
    src = str(tmp_path / "src")
    batches[0].unionByName(batches[1]).unionByName(batches[2]).write.parquet(src)

    out = str(tmp_path / "reduced")
    rc = cli_main(["pca", "--in", src, "--out", out, "-k", "2",
                   "--from-state", sp])
    assert rc in (0, None)
    payload = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert payload["rows"] == 120 and payload["n_fit_rows"] == 120

    # communities over two cliques + bridge
    cl = [(a, b) for a in range(4) for b in range(4) if a < b]
    cl += [(a, b) for a in range(10, 14) for b in range(10, 14) if a < b]
    cl += [(3, 10)]
    epath = str(tmp_path / "edges")
    spark.createDataFrame(cl, "src long, dst long").write.parquet(epath)
    cout = str(tmp_path / "labels")
    rc = cli_main(["communities", "--in", epath, "--out", cout])
    assert rc in (0, None)
    payload = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert payload["nodes"] == 8 and payload["communities"] == 2

    with pytest.raises(SystemExit, match="exclusive"):
        cli_main(["pca", "--in", src, "--out", out,
                  "--from-state", sp, "--model-in", "x"])
