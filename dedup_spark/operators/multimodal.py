"""Multimodal payload operators: decode / resize / feature-extract /
frame-sample over opaque binary columns (training-data pipeline ops beyond
the core dedup engine; companion to SURVEY.md §2 B13).

Design: the payload stays an opaque ``binary`` column with typed metadata
(w, h, fmt) beside it — exactly the input_hint layout — and every transform
is a single ``mapInPandas`` pass of vectorized numpy over Arrow batches.
Codecs resolve through functions.codecs; the sandbox registers the three
numpy-decodable image formats, and a real deployment registers JPEG/PNG (or
video containers) behind the same ``decode(fmt, bytes, w, h)`` signature —
the Spark-side plumbing (schema, batching, partitioning) is format-agnostic
and is what this module makes real and tested.

Scale notes: each operator touches ``bytes`` exactly once and emits either a
smaller payload (resize, thumbnails) or fixed-width features — never a wider
row. Nothing shuffles: these are map-only stages, so they pipeline with the
scan and parallelize embarrassingly; partition sizing is governed by
spark.sql.files.maxPartitionBytes on the input scan.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from dedup_spark.functions.codecs import decode, encode

RESIZED_SCHEMA = StructType(
    [
        StructField("image_id", StringType(), False),
        StructField("bytes", BinaryType(), False),
        StructField("w", IntegerType(), False),
        StructField("h", IntegerType(), False),
        StructField("fmt", StringType(), False),
    ]
)

FEATURES_SCHEMA = StructType(
    [
        StructField("image_id", StringType(), False),
        StructField("mean_rgb", ArrayType(DoubleType(), False), False),
        StructField("std_rgb", ArrayType(DoubleType(), False), False),
        StructField("luma_hist", ArrayType(DoubleType(), False), False),
        StructField("aspect", DoubleType(), False),
        StructField("edge_density", DoubleType(), False),
    ]
)

FRAMES_SCHEMA = StructType(
    [
        StructField("video_id", StringType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("bytes", BinaryType(), False),
        StructField("w", IntegerType(), False),
        StructField("h", IntegerType(), False),
        StructField("fmt", StringType(), False),
    ]
)


def _resize_bilinear(px: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Separable bilinear resize, pure numpy (h, w, 3) → (out_h, out_w, 3)."""
    h, w = px.shape[:2]
    ys = (np.arange(out_h) + 0.5) * h / out_h - 0.5
    xs = (np.arange(out_w) + 0.5) * w / out_w - 0.5
    y0 = np.clip(np.floor(ys).astype(np.int64), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(np.int64), 0, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = np.clip(ys - y0, 0.0, 1.0)[:, None, None]
    wx = np.clip(xs - x0, 0.0, 1.0)[None, :, None]
    p = px.astype(np.float64)
    top = p[y0][:, x0] * (1 - wx) + p[y0][:, x1] * wx
    bot = p[y1][:, x0] * (1 - wx) + p[y1][:, x1] * wx
    out = top * (1 - wy) + bot * wy
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


def resize_images(images: DataFrame, out_w: int, out_h: int,
                  out_fmt: str = "rgb8") -> DataFrame:
    """Decode → bilinear resize → re-encode; output schema RESIZED_SCHEMA."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            out_bytes = []
            for data, w, h, fmt in zip(
                pdf["bytes"], pdf["w"], pdf["h"], pdf["fmt"]
            ):
                px = decode(fmt, data, int(w), int(h))
                out_bytes.append(encode(out_fmt, _resize_bilinear(px, out_w, out_h)))
            yield pd.DataFrame(
                {
                    "image_id": pdf["image_id"].tolist(),
                    "bytes": out_bytes,
                    "w": [out_w] * len(pdf),
                    "h": [out_h] * len(pdf),
                    "fmt": [out_fmt] * len(pdf),
                }
            )

    return images.select("image_id", "bytes", "w", "h", "fmt").mapInPandas(
        run, schema=RESIZED_SCHEMA
    )


def image_features(images: DataFrame, hist_bins: int = 16) -> DataFrame:
    """Decode → fixed-width feature vector per image (FEATURES_SCHEMA):
    channel mean/std, luma histogram, aspect ratio, gradient edge density."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            rows = {k: [] for k in
                    ("image_id", "mean_rgb", "std_rgb", "luma_hist", "aspect",
                     "edge_density")}
            for iid, data, w, h, fmt in zip(
                pdf["image_id"], pdf["bytes"], pdf["w"], pdf["h"], pdf["fmt"]
            ):
                px = decode(fmt, data, int(w), int(h)).astype(np.float64)
                luma = px @ np.array([0.299, 0.587, 0.114])
                hist, _ = np.histogram(luma, bins=hist_bins, range=(0, 256))
                gx = np.abs(np.diff(luma, axis=1)).mean()
                gy = np.abs(np.diff(luma, axis=0)).mean()
                rows["image_id"].append(iid)
                rows["mean_rgb"].append(px.mean(axis=(0, 1)).tolist())
                rows["std_rgb"].append(px.std(axis=(0, 1)).tolist())
                rows["luma_hist"].append((hist / luma.size).tolist())
                rows["aspect"].append(float(w) / float(h))
                rows["edge_density"].append(float((gx + gy) / 2.0 / 255.0))
            yield pd.DataFrame(rows)

    return images.select("image_id", "bytes", "w", "h", "fmt").mapInPandas(
        run, schema=FEATURES_SCHEMA
    )


def sample_frames(videos: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame sampling: (video_id, bytes, fmt) → FRAMES_SCHEMA rows.

    No video codec exists in this sandbox (SURVEY.md §7.0), so actual
    container demuxing is STUBBED: formats other than the deterministic
    test container ``rawvid`` raise NotImplementedError. ``rawvid`` is a
    trivial concatenation container (4-byte n_frames/w/h little-endian
    header + n w*h*3 raw frames) so the plumbing — one binary row fanning
    out to many frame rows through mapInPandas, frame stride, output
    schema — is real and tested end-to-end.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            out = {k: [] for k in
                   ("video_id", "frame_idx", "bytes", "w", "h", "fmt")}
            for vid, data, fmt in zip(pdf["video_id"], pdf["bytes"], pdf["fmt"]):
                if fmt != "rawvid":
                    raise NotImplementedError(
                        f"video codec {fmt!r} not available in this sandbox; "
                        "register a demuxer with the rawvid signature"
                    )
                head = np.frombuffer(data[:12], dtype="<u4")
                n, w, h = int(head[0]), int(head[1]), int(head[2])
                stride = w * h * 3
                for idx in range(0, n, every_n):
                    off = 12 + idx * stride
                    out["video_id"].append(vid)
                    out["frame_idx"].append(idx)
                    out["bytes"].append(data[off : off + stride])
                    out["w"].append(w)
                    out["h"].append(h)
                    out["fmt"].append("rgb8")
            yield pd.DataFrame(out)

    return videos.select(
        videos.columns[0], "bytes", "fmt"
    ).toDF("video_id", "bytes", "fmt").mapInPandas(run, schema=FRAMES_SCHEMA)


def encode_rawvid(frames: list[np.ndarray]) -> bytes:
    """Test helper: pack (h, w, 3) uint8 frames into the rawvid container."""
    h, w = frames[0].shape[:2]
    head = np.array([len(frames), w, h], dtype="<u4").tobytes()
    return head + b"".join(
        np.ascontiguousarray(f, dtype=np.uint8).tobytes() for f in frames
    )


AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("audio_id", StringType(), False),
        StructField("n_samples", IntegerType(), False),
        StructField("duration_sec", DoubleType(), False),
        StructField("rms", DoubleType(), False),
        StructField("peak", DoubleType(), False),
        StructField("zero_cross_rate", DoubleType(), False),
        StructField("spectral_centroid_hz", DoubleType(), False),
        StructField("clipping_ratio", DoubleType(), False),
    ]
)


def decode_rawpcm(data: bytes) -> tuple[np.ndarray, int]:
    """Deterministic audio container: 8-byte header (<u4 sample_rate,
    <u4 n_samples) + mono int16 little-endian samples → (float samples in
    [-1, 1], sample_rate). Real compressed codecs (mp3/flac/opus) are not
    available in this sandbox; a deployment registers them behind this
    same (bytes) → (samples, rate) signature."""
    head = np.frombuffer(data[:8], dtype="<u4")
    rate, n = int(head[0]), int(head[1])
    samples = np.frombuffer(data[8 : 8 + 2 * n], dtype="<i2").astype(np.float64)
    return samples / 32768.0, rate


def encode_rawpcm(samples: np.ndarray, rate: int) -> bytes:
    """Test helper: pack float samples in [-1, 1] into the rawpcm container."""
    i16 = np.clip(np.round(samples * 32767.0), -32768, 32767).astype("<i2")
    head = np.array([rate, len(i16)], dtype="<u4").tobytes()
    return head + i16.tobytes()


def audio_features(audio: DataFrame) -> DataFrame:
    """(audio_id, bytes, fmt) → quality/feature signals per clip — the audio
    analog of image_features for training-data curation: loudness (RMS,
    peak), zero-crossing rate, FFT spectral centroid, and clipping ratio
    (the standard cheap filters for junk audio). Map-only; bytes touched
    once; all math vectorized numpy over the decoded batch.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            out = {k: [] for k in (
                "audio_id", "n_samples", "duration_sec", "rms", "peak",
                "zero_cross_rate", "spectral_centroid_hz", "clipping_ratio",
            )}
            for aid, data, fmt in zip(pdf["audio_id"], pdf["bytes"], pdf["fmt"]):
                if fmt != "rawpcm":
                    raise NotImplementedError(
                        f"audio codec {fmt!r} not available in this sandbox; "
                        "register a decoder with the rawpcm signature"
                    )
                x, rate = decode_rawpcm(data)
                n = len(x)
                if n == 0:
                    continue
                spec = np.abs(np.fft.rfft(x))
                freqs = np.fft.rfftfreq(n, d=1.0 / rate)
                power = spec.sum()
                centroid = float((freqs * spec).sum() / power) if power > 0 else 0.0
                out["audio_id"].append(aid)
                out["n_samples"].append(n)
                out["duration_sec"].append(round(n / rate, 6))
                out["rms"].append(round(float(np.sqrt((x * x).mean())), 6))
                out["peak"].append(round(float(np.abs(x).max()), 6))
                out["zero_cross_rate"].append(
                    round(float((np.diff(np.signbit(x)) != 0).mean()), 6)
                )
                out["spectral_centroid_hz"].append(round(centroid, 3))
                out["clipping_ratio"].append(
                    round(float((np.abs(x) >= 0.999).mean()), 6)
                )
            yield pd.DataFrame(out)

    return audio.select(
        audio.columns[0], "bytes", "fmt"
    ).toDF("audio_id", "bytes", "fmt").mapInPandas(
        run, schema=AUDIO_FEATURES_SCHEMA
    )
