"""Rotation-policy unit tests for tools/gen_rotation.py (r14 verdict
item 3 mechanized): ERR'd / row-less queries first, then strictly
oldest-evidence-first, alphabetical within a round; a newer clean driver
row supersedes an older ERR."""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from gen_rotation import build_order, latest_rows  # noqa: E402


def _write(tmp_path, rnd, rows):
    (tmp_path / f"CORRECTNESS_r{rnd:02d}.json").write_text(json.dumps(rows))


def test_oldest_first_with_err_and_rowless_head(tmp_path):
    _write(tmp_path, 1, {"q_old": {"err": None}, "q_mid": {"err": None}})
    _write(tmp_path, 2, {"q_mid": {"err": None}, "q_err": {"err": "boom"}})
    qs = {"q_old", "q_mid", "q_err", "q_new"}
    order = [q for q, _ in build_order(qs, str(tmp_path))]
    # head: ERR'd + row-less, alphabetical; then r1 before r2
    assert order == ["q_err", "q_new", "q_old", "q_mid"]


def test_newer_clean_row_supersedes_err(tmp_path):
    _write(tmp_path, 1, {"q_a": {"err": "boom"}})
    _write(tmp_path, 2, {"q_a": {"err": None}, "q_b": {"err": None}})
    latest, err_at = latest_rows(str(tmp_path))
    assert latest == {"q_a": 2, "q_b": 2}
    assert err_at == {}
    order = [q for q, _ in build_order({"q_a", "q_b"}, str(tmp_path))]
    assert order == ["q_a", "q_b"]  # both r2, alphabetical — no ERR head


def test_no_oracle_rows_are_not_errs(tmp_path):
    _write(tmp_path, 3, {"q_sketch": {"err": "no_oracle"}})
    latest, err_at = latest_rows(str(tmp_path))
    assert latest == {"q_sketch": 3}
    assert err_at == {}


def test_live_registry_order_matches_checked_in_list():
    """The committed _DRIVER_PRIORITY must be exactly what the tool
    regenerates from the committed evidence — no hand-drift.

    Deliberate forcing function: when a new CORRECTNESS_r*.json lands at
    a round boundary this goes red until the rotation is refreshed —
    the fix is one command: ``python tools/gen_rotation.py --write``."""
    import __spark_entry__ as em
    from gdelt_2_0_event_database_pipeline_spark.plans import _DRIVER_PRIORITY

    expected = [q for q, _ in build_order(set(em.queries()))]
    assert list(_DRIVER_PRIORITY) == expected
