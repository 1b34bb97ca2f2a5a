"""Multimodal column tests: schema shape, Arrow-batched decode plumbing,
metadata-only plans, stub behavior on foreign payloads."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gdelt_2_0_event_database_pipeline_spark.operators import multimodal as M


@pytest.fixture(scope="module")
def media(spark):
    return M.make_media_df(spark, n=40)


def test_media_schema(media):
    assert dict(media.dtypes)["payload"] == "binary"
    assert "struct" in dict(media.dtypes)["meta"]
    assert media.count() == 40


def test_extract_features_roundtrip(media):
    out = M.extract_features(media)
    rows = {r.media_id: r for r in out.collect()}
    assert len(rows) == 40
    # header roundtrips through the binary payload
    r7 = rows[7]
    assert (r7.width, r7.height, r7.n_frames) == (32 + 7 % 8 * 16, 32 + 7 % 5 * 16, 1 + 7 % 4)
    assert 0 < r7.mean_intensity < 251


def test_decode_stub_rejects_foreign_payload():
    with pytest.raises(NotImplementedError, match="imaging library"):
        M._decode_image_bytes(b"\x89PNG\r\n\x1a\nxxxx")


def test_resize_plan_native_only(media):
    out = M.resize_plan(media, max_side=64)
    rows = {r.media_id: r for r in out.collect()}
    big = rows[7]   # 144x64 → needs resize
    assert big.needs_resize and max(big.target_w, big.target_h) == 64
    small = rows[0]  # 32x32
    assert not small.needs_resize and small.target_w == 32
    # (payload-pruning is asserted on a parquet scan in
    # test_media_stats_metadata_only — a LocalRelation always lists every
    # column in its plan text, so the check is meaningless here)


def test_sample_frames(media):
    out = M.sample_frames(media, every_k=2)
    per = {r.media_id: r.cnt for r in out.groupBy("media_id").agg(F.count("*").alias("cnt")).collect()}
    assert per[3] == 2   # n_frames=4 → frames 0,2
    assert per[0] == 1   # n_frames=1 → frame 0


def test_media_stats_metadata_only(media, tmp_path):
    # via parquet so the scan-level column pruning is observable
    p = str(tmp_path / "media")
    media.write.parquet(p)
    df = media.sparkSession.read.parquet(p)
    out = M.media_stats(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "payload" not in plan  # binary column pruned at scan
    got = {r.media_type: r for r in out.collect()}
    assert got["image"].cnt + got["video"].cnt == 40
    assert got["video"].total_frames > got["video"].cnt  # multi-frame
