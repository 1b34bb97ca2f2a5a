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


def test_decode_rejects_unknown_and_truncated_payloads():
    with pytest.raises(ValueError, match="unsupported media payload"):
        M._decode_image_bytes(b"\xff\xd8\xff\xe0 fake jpeg")
    with pytest.raises(ValueError, match="truncated PNG"):
        M._decode_image_bytes(b"\x89PNG\r\n\x1a\nxxxx")


# ---------------------------------------------------------------- real codecs
import os
import struct
import zlib

_DATA = os.path.join(os.path.dirname(__file__), "data")


def test_decode_real_checked_in_png():
    """A real PNG file (1×1 red RGBA, the canonical minimal PNG) decodes
    through the same seam the synthetic payloads use."""
    payload = open(os.path.join(_DATA, "tiny_1x1.png"), "rb").read()
    d = M._decode_image_bytes(payload)
    assert (d["width"], d["height"], d["n_frames"]) == (1, 1, 1)
    assert d["mean_intensity"] == pytest.approx(85.0)  # (255,0,0) / 3


def _gradient(w, h):
    return bytes((x * 16 + y * 3) % 256 for y in range(h) for x in range(w) for _ in range(3))


def test_png_roundtrip_filter0():
    px = _gradient(16, 16)
    d = M.decode_png(M.encode_png(16, 16, px))
    assert (d["width"], d["height"]) == (16, 16)
    assert d["mean_intensity"] == pytest.approx(sum(px) / len(px))


def _forward_filter(ftype, line, prev, bpp):
    """Reference forward-filter from the PNG spec, to exercise de-filtering."""
    out = bytearray()
    for x, b in enumerate(line):
        a = line[x - bpp] if x >= bpp else 0
        up = prev[x] if prev else 0
        c = prev[x - bpp] if (prev and x >= bpp) else 0
        if ftype == 1:
            pred = a
        elif ftype == 2:
            pred = up
        elif ftype == 3:
            pred = (a + up) // 2
        else:  # Paeth
            p = a + up - c
            pa, pb, pc = abs(p - a), abs(p - up), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (up if pb <= pc else c)
        out.append((b - pred) & 0xFF)
    return bytes(out)


@pytest.mark.parametrize("ftype", [1, 2, 3, 4])
def test_png_defilter_all_filters(ftype):
    """Hand-filter every scanline with one of Sub/Up/Average/Paeth and
    assert decode recovers the exact pixels (via the mean)."""
    w, h, bpp = 8, 6, 3
    px = _gradient(w, h)
    stride = w * bpp
    raw, prev = b"", None
    for y in range(h):
        line = px[y * stride : (y + 1) * stride]
        raw += bytes([ftype]) + _forward_filter(ftype, line, prev, bpp)
        prev = line

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    d = M.decode_png(png)
    assert d["mean_intensity"] == pytest.approx(sum(px) / len(px))


def test_decode_bmp_24bit():
    """Hand-built 3×2 24-bit BMP (BGR rows, 4-byte padded, bottom-up)."""
    w, h = 3, 2
    rows = [bytes([10, 20, 30] * w), bytes([40, 50, 60] * w)]
    padded = [r + b"\x00" * ((4 - len(r) % 4) % 4) for r in rows]
    pix = b"".join(padded)
    hdr = b"BM" + struct.pack("<IHHI", 54 + len(pix), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pix), 2835, 2835, 0, 0)
    d = M._decode_image_bytes(hdr + info + pix)
    assert (d["width"], d["height"]) == (w, h)
    assert d["mean_intensity"] == pytest.approx((10 + 20 + 30 + 40 + 50 + 60) / 6)


def test_decode_wav_pcm16():
    samples = [0, 1000, -1000, 32767, -32768, 500]
    data = struct.pack(f"<{len(samples)}h", *samples)
    fmt = struct.pack("<HHIIHH", 1, 2, 16000, 16000 * 4, 4, 16)
    wav = (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    d = M.decode_wav(wav)
    assert d["sample_rate"] == 16000
    assert d["n_frames"] == 3  # 6 samples / 2 channels
    assert d["mean_amplitude"] == pytest.approx(sum(abs(s) for s in samples) / len(samples))


def test_extract_features_mixed_real_and_synthetic(spark):
    """The mapInPandas pipeline decodes REAL PNG payloads and synthetic
    blobs in one pass — the dispatch is per-row inside the Arrow batch."""
    png = open(os.path.join(_DATA, "tiny_1x1.png"), "rb").read()
    grad = M.encode_png(4, 4, _gradient(4, 4))
    df = spark.createDataFrame(
        [
            (100, png, ("image", "png", 1, 1, 1, None)),
            (101, grad, ("image", "png", 4, 4, 1, None)),
            (102, M.encode_fake_payload(102, 32, 32, 2), ("video", "fake", 32, 32, 2, None)),
        ],
        M.MEDIA_SCHEMA,
    )
    rows = {r.media_id: r for r in M.extract_features(df).collect()}
    assert (rows[100].width, rows[100].height) == (1, 1)
    assert rows[100].mean_intensity == pytest.approx(85.0)
    assert (rows[101].width, rows[101].height) == (4, 4)
    assert rows[102].n_frames == 2


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


def _noisy_copy(pixels: bytes, delta: int) -> bytes:
    return bytes(min(255, p + delta) for p in pixels)


def _rgb(gray: bytes) -> bytes:
    return bytes(v for g in gray for v in (g, g, g))


def test_dhash_invariant_to_brightness_and_distinguishes_images(spark):
    import random

    from gdelt_2_0_event_database_pipeline_spark.operators.multimodal import (
        dhash64,
        encode_png,
    )

    rng = random.Random(3)
    w, h = 24, 16
    base = bytes(rng.randrange(256) for _ in range(w * h))
    other = bytes(rng.randrange(256) for _ in range(w * h))
    png_a = encode_png(w, h, _rgb(base))
    png_bright = encode_png(w, h, _rgb(_noisy_copy(base, 20)))
    png_other = encode_png(w, h, _rgb(other))

    ha, hb, ho = dhash64(png_a), dhash64(png_bright), dhash64(png_other)
    ham = lambda x, y: bin(x ^ y).count("1")
    assert ham(ha, hb) <= 6          # uniform brightness shift ≈ same dhash
    assert ham(ha, ho) > 16          # unrelated image is far


def test_media_near_dup_pairs_banded_equals_bruteforce(spark):
    import random

    from gdelt_2_0_event_database_pipeline_spark.operators.multimodal import (
        dhash64,
        encode_png,
        media_near_dup_pairs,
    )

    rng = random.Random(11)
    w, h = 24, 16
    imgs = {}
    base = bytes(rng.randrange(256) for _ in range(w * h))
    imgs[1] = encode_png(w, h, _rgb(base))
    imgs[2] = encode_png(w, h, _rgb(_noisy_copy(base, 15)))   # near-dup of 1
    for i in range(3, 9):                                # unrelated images
        imgs[i] = encode_png(w, h, _rgb(bytes(rng.randrange(256) for _ in range(w * h))))
    imgs[9] = b"garbage-not-an-image"                    # undecodable -> skipped

    df = spark.createDataFrame(
        [(i, bytearray(p)) for i, p in imgs.items()], "media_id long, payload binary"
    )
    got = {(r.id_a, r.id_b): r.hamming
           for r in media_near_dup_pairs(df, max_hamming=6).collect()}

    # brute-force reference over the decodable images
    hs = {i: dhash64(p) for i, p in imgs.items() if i != 9}
    want = {}
    for a in hs:
        for b in hs:
            if a < b:
                d = bin(hs[a] ^ hs[b]).count("1")
                if d <= 6:
                    want[(a, b)] = d
    assert got == want and (1, 2) in got


def _wav(samples, rate=8000, channels=1):
    import struct as st

    data = b"".join(st.pack("<h", max(-32768, min(32767, s))) for s in samples)
    fmt = st.pack("<HHIIHH", 1, channels, rate, rate * channels * 2, channels * 2, 16)
    body = b"WAVE" + b"fmt " + st.pack("<I", len(fmt)) + fmt + b"data" + st.pack("<I", len(data)) + data
    return b"RIFF" + st.pack("<I", len(body)) + body


def test_audio_fingerprint_amplitude_invariant(spark):
    import math

    from gdelt_2_0_event_database_pipeline_spark.operators.multimodal import (
        audio_fingerprint64,
        hamming_near_dup_pairs,
        media_audio_fingerprint,
    )

    n = 2000
    # amplitude-modulated tone: energy envelope varies frame to frame
    tone = [int(8000 * math.sin(i / 7.0) * (1.0 + 0.8 * math.sin(i / 150.0))) for i in range(n)]
    scaled = [s // 3 for s in tone]                       # re-levelled copy
    other = [int(8000 * math.sin(i / 3.0) * (1.0 + 0.8 * math.cos(i / 45.0))) for i in range(n)]

    fa, fs, fo = (audio_fingerprint64(_wav(x)) for x in (tone, scaled, other))
    ham = lambda x, y: bin(x ^ y).count("1")
    assert ham(fa, fs) <= 4          # scaling preserves energy ordering
    assert ham(fa, fo) > 12

    df = spark.createDataFrame(
        [(1, bytearray(_wav(tone))), (2, bytearray(_wav(scaled))),
         (3, bytearray(_wav(other))), (4, b"not audio")],
        "media_id long, payload binary",
    )
    sig = media_audio_fingerprint(df)
    got = {(r.id_a, r.id_b) for r in
           hamming_near_dup_pairs(sig, "media_id", "afp", max_hamming=4).collect()}
    assert got == {(1, 2)}


# ---------------------------------------------------------------------------
# Video: container round-trip, frame hashing, near-dup pairs
# ---------------------------------------------------------------------------

from gdelt_2_0_event_database_pipeline_spark.operators.multimodal import (  # noqa: E402
    decode_video,
    encode_video,
    make_video_df,
    video_frame_dhashes,
    video_near_dup_pairs,
)


def test_video_container_roundtrip():
    frames = [(4, 3, bytes(range(12))), (2, 2, bytes([9, 8, 7, 6]))]
    assert decode_video(encode_video(frames)) == frames


def test_video_frame_dhashes_counts_and_sampling(spark):
    df = make_video_df(spark, n=6)
    all_frames = video_frame_dhashes(df, every_k=1)
    total = {r.meta.n_frames for r in df.select("meta").collect()}
    assert all_frames.count() == sum(
        r.meta.n_frames for r in df.select("meta").collect()
    )
    sampled = video_frame_dhashes(df, every_k=2)
    # every_k=2 keeps ceil(n/2) frames per clip
    per = {r.media_id: r.cnt for r in sampled.groupBy("media_id").count().withColumnRenamed("count", "cnt").collect()}
    want = {r.media_id: -(-r.meta.n_frames // 2) for r in df.select("media_id", "meta").collect()}
    assert per == want


def test_video_near_dup_finds_planted_trimmed_copies(spark):
    df = make_video_df(spark, n=24)
    got = {
        (r.id_a, r.id_b)
        for r in video_near_dup_pairs(df, max_hamming=4, min_matched_frames=2).collect()
    }
    # planted: every 6th clip copies its predecessor (trim + brightness)
    want = {(4, 5), (10, 11), (16, 17), (22, 23)}
    assert want <= got
    # nothing else should collide on >=2 frames in this corpus
    assert got == want


def test_video_undecodable_payloads_skipped(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"garbage-not-a-video"))], "media_id long, payload binary"
    )
    assert video_frame_dhashes(df).count() == 0


# ------------------------------------------------- real-codec seam (Pillow)
import importlib.util as _ilu

_HAS_PIL = _ilu.find_spec("PIL") is not None
pil_only = pytest.mark.skipif(not _HAS_PIL, reason="Pillow not installed")


def test_pil_backend_fails_fast_without_pillow(spark, media):
    """backend='pil' without Pillow must raise at the call, not return
    all-NULL hashes from worker-side per-payload exception handling."""
    if _HAS_PIL:
        pytest.skip("Pillow installed — fail-fast path not reachable")
    with pytest.raises(ModuleNotFoundError, match="Pillow"):
        M.media_dhash(media, backend="pil")
    with pytest.raises(ValueError, match="backend"):
        M.media_dhash(media, backend="bogus")


@pil_only
def test_pil_raster_and_dhash_bit_parity(spark):
    """The seam is real: Pillow-decoded rasters use the same integer
    channel-mean grayscale convention, so gray_raster_pil == gray_raster
    and dhash64_pil == dhash64 bit-for-bit on PNG and BMP payloads both
    backends can decode."""
    import random

    rng = random.Random(7)
    w, h = 24, 16
    gray = bytes(rng.randrange(256) for _ in range(w * h))
    png = M.encode_png(w, h, _rgb(gray))
    assert M.gray_raster_pil(png) == M.gray_raster(png)
    assert M.dhash64_pil(png) == M.dhash64(png)

    # BMP (24-bit, bottom-up rows) through the same parity check
    import struct as _s

    def _bmp(w, h, rgb):
        padded = (w * 3 + 3) & ~3
        rows = b""
        for y in range(h - 1, -1, -1):
            row = b"".join(
                bytes([rgb[(y * w + x) * 3 + 2], rgb[(y * w + x) * 3 + 1],
                       rgb[(y * w + x) * 3]])
                for x in range(w)
            )
            rows += row + b"\x00" * (padded - w * 3)
        off = 14 + 40
        return (b"BM" + _s.pack("<IHHI", off + len(rows), 0, 0, off)
                + _s.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(rows),
                          2835, 2835, 0, 0) + rows)

    bmp = _bmp(w, h, _rgb(gray))
    assert M.gray_raster_pil(bmp) == M.gray_raster(bmp)
    assert M.dhash64_pil(bmp) == M.dhash64(bmp)


@pil_only
def test_pil_backend_near_dup_pipeline_matches_pure(spark):
    """media_near_dup_pairs(backend='pil') finds the identical pair set as
    the pure backend on a planted near-dup corpus — the whole banded
    Hamming pipeline is backend-agnostic past the decode seam."""
    import random

    rng = random.Random(11)
    w, h = 24, 16
    rows = []
    for i in range(12):
        if i % 3 == 2:  # every third image: noisy copy of its predecessor
            base = rows[-1][2]
            px = _noisy_copy(base, 15)
        else:
            px = bytes(rng.randrange(256) for _ in range(w * h))
        rows.append((i, M.encode_png(w, h, _rgb(px)), px))
    df = spark.createDataFrame(
        [(i, bytearray(p)) for i, p, _ in rows], "media_id long, payload binary"
    )
    pure = {(r.id_a, r.id_b, r.hamming)
            for r in M.media_near_dup_pairs(df, max_hamming=6).collect()}
    pil = {(r.id_a, r.id_b, r.hamming)
           for r in M.media_near_dup_pairs(df, max_hamming=6, backend="pil").collect()}
    assert pil == pure and pure  # identical, and the planted pairs exist
