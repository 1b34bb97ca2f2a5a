"""Multimodal columns for LLM-data pipelines (SURVEY.md §2.10 X6).

Design: media travels as an opaque ``binary`` column plus a typed metadata
struct — the lake-friendly shape at 100 TB (payload bytes never shuffle
unless a stage genuinely transforms them; metadata-only queries prune the
binary column at the parquet scan). Heavy per-item work (decode, resize,
frame-sample, feature-extract) runs in Arrow-batched ``mapInPandas`` stages:
one Python worker per partition, zero-copy Arrow transfer, schema declared
up front.

The actual image/audio codecs are STUBBED behind ``_decode_image_bytes`` /
``_decode_audio_bytes`` (this container has no PIL/ffmpeg): a deterministic
fake parses our synthetic payload header instead. The Spark-side plumbing —
schemas, batch shapes, partitioning, UDF signatures — is real and tested;
swapping the stub for Pillow is a one-function change.
"""

from __future__ import annotations

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


def _decode_image_bytes(payload: bytes) -> dict:
    """STUB decode. A real build replaces this body with e.g.
    ``PIL.Image.open(io.BytesIO(payload))``; everything around it stays."""
    if payload is None or not payload.startswith(_MAGIC):
        raise NotImplementedError(
            "real image decoding needs an imaging library not present in "
            "this container; payload is not a synthetic SGMEDIA1 blob"
        )
    hlen = int.from_bytes(payload[8:10], "big")
    media_id, width, height, n_frames = (
        int(x) for x in payload[10 : 10 + hlen].decode().split(":")
    )
    body = payload[10 + hlen :]
    return {
        "media_id": media_id,
        "width": width,
        "height": height,
        "n_frames": n_frames,
        "mean_intensity": sum(body) / len(body),
    }


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
            yield pd.DataFrame(out, columns=[f.name for f in EXTRACT_SCHEMA])

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
