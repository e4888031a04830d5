import numpy as np
import pytest

from dedup_spark.functions.codecs import decode, encode, psnr_db
from dedup_spark.functions.hashing import popcount64
from dedup_spark.functions.phash import phash64, phash_batch

rng = np.random.default_rng(42)


def _img(side=48):
    coarse = rng.integers(0, 256, size=(side // 8, side // 8, 3))
    return np.clip(np.kron(coarse, np.ones((8, 8, 1), int)), 0, 255).astype(np.uint8)


@pytest.mark.parametrize("fmt", ["rgb8", "ppm"])
def test_lossless_roundtrip(fmt):
    img = _img()
    out = decode(fmt, encode(fmt, img), 48, 48)
    assert (out == img).all()


def test_qraw_psnr_above_invariant():
    img = _img(64)
    out = decode("qraw", encode("qraw", img), 64, 64)
    assert psnr_db(img, out) >= 40.0  # BASELINE.json:15 lossy invariant


def test_unknown_codec_raises():
    with pytest.raises(NotImplementedError):
        decode("jpeg", b"", 1, 1)


def test_phash_noise_robust_and_discriminative():
    img = _img(64)
    noisy = np.clip(img.astype(int) + rng.integers(-2, 3, img.shape), 0, 255).astype(
        np.uint8
    )
    other = _img(64)
    d_near = popcount64(np.array([np.uint64(phash64(img)) ^ np.uint64(phash64(noisy))]))[0]
    d_far = popcount64(np.array([np.uint64(phash64(img)) ^ np.uint64(phash64(other))]))[0]
    assert d_near <= 6
    assert d_far > 6


def test_phash_nonnegative_int64():
    for side in (32, 48, 64):
        assert 0 <= phash64(_img(side)) < 2**63


def test_phash_batch_matches_single():
    imgs = [_img(32), _img(48), _img(48), _img(64)]
    fmts, datas, ws, hs = [], [], [], []
    for i, im in enumerate(imgs):
        fmt = ["rgb8", "ppm", "qraw"][i % 3]
        fmts.append(fmt)
        datas.append(encode(fmt, im))
        hs.append(im.shape[0])
        ws.append(im.shape[1])
    got = phash_batch(fmts, datas, ws, hs)
    exp = [phash64(decode(f, d, w, h)) for f, d, w, h in zip(fmts, datas, ws, hs)]
    assert got.tolist() == exp
