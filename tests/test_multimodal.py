"""Multimodal payload operators (operators.multimodal): resize round-trip,
feature extraction, rawvid frame sampling — the Spark plumbing is real; only
external codecs are stubbed (SURVEY.md §7.0/§7.4)."""

import numpy as np
import pandas as pd
import pytest

from dedup_spark.functions.codecs import decode
from dedup_spark.operators.multimodal import (
    _resize_bilinear,
    encode_rawvid,
    image_features,
    resize_images,
    sample_frames,
)
from dedup_spark.sources.gen_images import gen_images


def test_resize_bilinear_identity_and_constant():
    px = np.random.default_rng(0).integers(0, 256, (32, 32, 3), dtype=np.uint8)
    assert np.array_equal(_resize_bilinear(px, 32, 32), px)
    const = np.full((16, 24, 3), 77, dtype=np.uint8)
    out = _resize_bilinear(const, 48, 8)
    assert out.shape == (8, 48, 3)
    assert (out == 77).all()


def test_resize_images_spark(spark):
    images = gen_images(spark, 60, 7)
    out = resize_images(images, 16, 16).toPandas()
    assert len(out) == 60
    assert (out.w == 16).all() and (out.h == 16).all()
    px = decode("rgb8", out.iloc[0]["bytes"], 16, 16)
    assert px.shape == (16, 16, 3)


def test_image_features_spark(spark):
    images = gen_images(spark, 60, 7).where("w > 0")
    out = image_features(images).toPandas()
    assert len(out) == out.image_id.nunique()
    assert all(len(m) == 3 for m in out.mean_rgb)
    assert all(abs(sum(hh) - 1.0) < 1e-9 for hh in out.luma_hist)
    assert (out.aspect > 0).all()
    assert out.edge_density.between(0, 1).all()


def test_sample_frames_rawvid(spark):
    rng = np.random.default_rng(3)
    frames = [rng.integers(0, 256, (8, 8, 3), dtype=np.uint8) for _ in range(95)]
    blob = encode_rawvid(frames)
    df = spark.createDataFrame(
        pd.DataFrame({"video_id": ["v0"], "bytes": [blob], "fmt": ["rawvid"]})
    )
    out = sample_frames(df, every_n=30).toPandas().sort_values("frame_idx")
    assert out.frame_idx.tolist() == [0, 30, 60, 90]
    got = decode("rgb8", out.iloc[1]["bytes"], 8, 8)
    assert np.array_equal(got, frames[30])


def test_sample_frames_unknown_codec_raises(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"video_id": ["v0"], "bytes": [b"xx"], "fmt": ["mp4"]})
    )
    with pytest.raises(Exception, match="NotImplementedError|not available"):
        sample_frames(df).collect()


def test_audio_features_signal_properties(spark):
    """Spectral centroid lands on a pure tone's frequency; clipping and
    silence are flagged; non-sandbox codecs raise (documented stub)."""
    import numpy as np
    import pandas as pd
    import pytest
    from dedup_spark.operators.multimodal import (
        audio_features, encode_rawpcm,
    )

    rate = 16000
    t = np.arange(rate) / rate  # 1 second
    tone = 0.5 * np.sin(2 * np.pi * 440.0 * t)
    clipped = np.clip(2.0 * np.sin(2 * np.pi * 100.0 * t), -1, 1)
    quiet = 0.001 * np.sin(2 * np.pi * 1000.0 * t)
    rows = [
        ("tone440", encode_rawpcm(tone, rate), "rawpcm"),
        ("clipped", encode_rawpcm(clipped, rate), "rawpcm"),
        ("quiet", encode_rawpcm(quiet, rate), "rawpcm"),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["audio_id", "bytes", "fmt"])
    )
    feats = {r.audio_id: r for r in audio_features(df).collect()}
    assert abs(feats["tone440"].spectral_centroid_hz - 440.0) < 5.0
    assert abs(feats["tone440"].rms - 0.5 / np.sqrt(2)) < 0.01
    assert feats["tone440"].clipping_ratio == 0.0
    assert feats["clipped"].clipping_ratio > 0.2
    assert feats["quiet"].rms < 0.001
    assert feats["tone440"].duration_sec == 1.0
    # zero-cross rate of a 440 Hz tone ≈ 2*440/rate
    assert abs(feats["tone440"].zero_cross_rate - 880 / rate) < 0.001

    bad = spark.createDataFrame(
        pd.DataFrame([("x", b"\x00" * 16, "mp3")],
                     columns=["audio_id", "bytes", "fmt"])
    )
    with pytest.raises(Exception, match="rawpcm"):
        audio_features(bad).collect()
