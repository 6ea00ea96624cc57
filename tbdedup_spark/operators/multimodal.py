"""Multimodal column operators — image/audio/video as opaque binary + typed
metadata, processed via Arrow-batched ``mapInPandas``.

The Spark-side plumbing (schemas, batch iteration, partition behavior, UDF
signatures) is real and tested; the media codecs are the sandbox stand-ins
from ``codecs.py`` (this container ships no libjpeg/ffmpeg/librosa — the
audio/video decoders are explicit ``NotImplementedError`` stubs or
deterministic fakes, clearly marked, exactly per the build contract).

Scale shape: every operator is a map-only stage (no shuffle), so it scales
with input splits; heavy per-row work stays in C (zlib/numpy). Feature
outputs are narrow so downstream joins/groupBys never carry pixel payloads.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from .. import codecs

IMAGE_FEATURES = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("mean_r", T.DoubleType()),
        T.StructField("mean_g", T.DoubleType()),
        T.StructField("mean_b", T.DoubleType()),
        T.StructField("stddev", T.DoubleType()),
        T.StructField("entropy_bits", T.DoubleType()),
        T.StructField("phash", T.LongType()),
        T.StructField("decode_ok", T.BooleanType()),
    ]
)


def image_features(images: DataFrame) -> DataFrame:
    """Decode + per-image feature extraction (map-only, Arrow batches).

    Features: channel means, global stddev, an 8-bit-histogram entropy, and
    a freshly computed pHash (lets callers validate a stored ``phash`` column
    — the integrity-check spirit of the reference's verify-on-write,
    tbdedup/dedup/__init__.py:142-151).
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for iid, raw in zip(pdf["image_id"], pdf["bytes"]):
                try:
                    px = codecs.decode_image(bytes(raw))
                    g = px.astype(np.float64)
                    hist = np.bincount(px.reshape(-1), minlength=256)
                    p = hist / hist.sum()
                    ent = float(-(p[p > 0] * np.log2(p[p > 0])).sum())
                    out.append(
                        (iid, px.shape[1], px.shape[0],
                         float(g[..., 0].mean()), float(g[..., 1].mean()),
                         float(g[..., 2].mean()), float(g.std()), ent,
                         codecs.phash64(px), True)
                    )
                except Exception:
                    out.append((iid, None, None, None, None, None, None, None, None, False))
            yield pd.DataFrame(out, columns=[f.name for f in IMAGE_FEATURES.fields])

    return images.select("image_id", "bytes").mapInPandas(fn, IMAGE_FEATURES)


def resize_images(images: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize, re-encoded as PNG — IMAGES-shaped output.

    Map-only; the real-world version swaps the numpy kernel for a proper
    resampler, the Spark plumbing is identical.
    """
    out_schema = images.select("image_id", "bytes", "w", "h").schema

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for iid, raw in zip(pdf["image_id"], pdf["bytes"]):
                px = codecs.decode_image(bytes(raw))
                h, w, _ = px.shape
                yi = (np.arange(out_h) * h // out_h).clip(0, h - 1)
                xi = (np.arange(out_w) * w // out_w).clip(0, w - 1)
                small = px[yi][:, xi]
                rows.append((iid, codecs.encode_png(small), out_w, out_h))
            yield pd.DataFrame(rows, columns=["image_id", "bytes", "w", "h"])

    return images.select("image_id", "bytes", "w", "h").mapInPandas(fn, out_schema)


# --- audio / video (plumbing real, codecs stubbed) ---------------------------

_FAKE_VIDEO_MAGIC = b"FVID0001"  # our deterministic fake container

AUDIO_FEATURES = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_png", T.BinaryType()),
    ]
)


def encode_fake_video(frames: list[np.ndarray]) -> bytes:
    """Deterministic FAKE video container: frame count + zlib'd raw frames.
    Stands in for a real container until ffmpeg exists in the runtime."""
    h, w, _ = frames[0].shape
    payload = b"".join(f.tobytes() for f in frames)
    return (
        _FAKE_VIDEO_MAGIC
        + struct.pack(">HHH", len(frames), w, h)
        + zlib.compress(payload, 6)
    )


def decode_fake_video(data: bytes) -> list[np.ndarray]:
    if data[:8] != _FAKE_VIDEO_MAGIC:
        raise ValueError("not a fake video")
    n, w, h = struct.unpack(">HHH", data[8:14])
    raw = np.frombuffer(zlib.decompress(data[14:]), np.uint8)
    return list(raw.reshape(n, h, w, 3))


def audio_features(media: DataFrame, id_col: str = "media_id", bytes_col: str = "bytes") -> DataFrame:
    """STUB: no audio codec in this container. The mapInPandas plumbing is
    real; decode raises NotImplementedError per row, surfaced as nulls
    (callers see schema + partitioning exactly as the real version will)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid in pdf[id_col]:
                # real impl: librosa/soundfile decode -> duration, RMS
                out.append((mid, None, None))
            yield pd.DataFrame(out, columns=["media_id", "duration_s", "rms"])

    return media.select(id_col, bytes_col).mapInPandas(fn, AUDIO_FEATURES)


def sample_frames(media: DataFrame, every_k: int = 2,
                  id_col: str = "media_id", bytes_col: str = "bytes") -> DataFrame:
    """Frame sampling: one output row per kept frame (a flatMap — the same
    shape as the reference's one-file-to-N-messages record split,
    tbdedup/mbox/mboxfile.py:187-344). Uses the fake container; the real
    version swaps in an ffmpeg reader with identical plumbing."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, raw in zip(pdf[id_col], pdf[bytes_col]):
                frames = decode_fake_video(bytes(raw))
                for i in range(0, len(frames), every_k):
                    rows.append((mid, i, codecs.encode_png(frames[i])))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame_png"])

    return media.select(id_col, bytes_col).mapInPandas(fn, FRAME_SCHEMA)
