"""numpy-only image codecs + PSNR (SURVEY.md §7.4, FIXTURES.md).

The sandbox has no Pillow/OpenCV and no network, so fixtures use three
numpy-decodable formats. The codec registry is format-generic: a real
deployment would register JPEG/PNG decoders here (behind the same
decode(fmt, bytes, w, h) signature) — the Spark-side plumbing (binary column →
pandas UDF → pixel ndarray) is identical.

- ``rgb8``: raw C-order uint8 RGB, len = w*h*3 (lossless).
- ``ppm``:  P6 header + raw RGB (lossless).
- ``qraw``: 8→6-bit quantized RGB (deterministic lossy; PSNR ≈ 46 dB vs
  source, exercising the PSNR ≥ 40 dB invariant path of BASELINE.json:15).
"""

from __future__ import annotations

import numpy as np

FORMATS = ("rgb8", "ppm", "qraw")


def encode(fmt: str, pixels: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 array. Raises on unknown fmt."""
    h, w, c = pixels.shape
    assert c == 3
    raw = np.ascontiguousarray(pixels, dtype=np.uint8)
    if fmt == "rgb8":
        return raw.tobytes()
    if fmt == "ppm":
        return b"P6\n%d %d\n255\n" % (w, h) + raw.tobytes()
    if fmt == "qraw":
        return (raw >> 2).tobytes()
    raise NotImplementedError(
        f"codec {fmt!r} not available in this sandbox (no image libs); "
        "register a decoder in dedup_spark.functions.codecs.FORMATS"
    )


def decode(fmt: str, data: bytes, w: int, h: int) -> np.ndarray:
    """Decode to an (h, w, 3) uint8 array. Deterministic, numpy-only."""
    if fmt == "rgb8":
        return np.frombuffer(data, dtype=np.uint8).reshape(h, w, 3)
    if fmt == "ppm":
        # header: P6\n<w> <h>\n255\n — fixed shape written by encode()
        idx = data.index(b"255\n") + 4
        return np.frombuffer(data, dtype=np.uint8, offset=idx).reshape(h, w, 3)
    if fmt == "qraw":
        q = np.frombuffer(data, dtype=np.uint8).reshape(h, w, 3)
        # mid-rise reconstruction: max abs error 2 per channel → PSNR ≈ 46 dB
        return ((q << 2) | 2).astype(np.uint8)
    raise NotImplementedError(f"codec {fmt!r} not available")


def psnr_db(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio between two uint8 images; inf if identical."""
    d = a.astype(np.float64) - b.astype(np.float64)
    mse = float(np.mean(d * d))
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)
