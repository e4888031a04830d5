"""MinHash signatures + LSH band keys (SURVEY.md §2 B11, B16).

Pinned family (FIXTURES.md): P=128 permutations h_i(x) = (a_i*x + b_i) mod p,
p = 2^61-1, (a_i, b_i) drawn from numpy default_rng(97); signature banded as
16 bands x 8 rows. Band key = sha256-derived 64-bit hash of the band's row
values (collision-safe across bands via the band index prefix).

Everything is numpy over a whole Arrow batch: shingle ids of a batch are
flattened into one array, the (P, n_shingles) permutation product is one
broadcasted mulmod, and per-row minima come from ``np.minimum.reduceat`` —
no per-row Python in the hot loop (BASELINE.json:15).
"""

from __future__ import annotations

import numpy as np

from dedup_spark.config import MERSENNE_P61, PipelineConfig
from dedup_spark.functions.hashing import mulmod_p61

_EMPTY_SENTINEL = np.uint64(MERSENNE_P61)  # signature value for shingle-less rows


def perm_params(cfg: PipelineConfig) -> tuple[np.ndarray, np.ndarray]:
    """The pinned (a, b) permutation parameters, shape (P,) each."""
    rng = np.random.default_rng(cfg.minhash_seed)
    p = MERSENNE_P61
    a = rng.integers(1, p, size=cfg.minhash_perms, dtype=np.uint64)
    b = rng.integers(0, p, size=cfg.minhash_perms, dtype=np.uint64)
    return a, b


def minhash_batch(
    shingle_lists: list[np.ndarray], a: np.ndarray, b: np.ndarray
) -> np.ndarray:
    """MinHash signatures for a batch of shingle-id arrays → (n_rows, P) uint64.

    Flattens the batch, computes the full (P, total_shingles) universal-hash
    matrix in one vectorized pass, then segment-min-reduces per row.
    Rows with zero shingles get the sentinel signature (never collides into a
    band bucket with a real signature of a different row-set).
    """
    n = len(shingle_lists)
    P = a.shape[0]
    sig = np.full((n, P), _EMPTY_SENTINEL, dtype=np.uint64)
    lengths = np.array([len(s) for s in shingle_lists], dtype=np.int64)
    total = int(lengths.sum())
    if total == 0:
        return sig
    flat = np.concatenate([s for s in shingle_lists if len(s)]).astype(np.uint64)
    flat = flat % np.uint64(MERSENNE_P61)
    # Shingles repeat heavily across the rows of a batch (shared vocabulary),
    # so hash only the DISTINCT values and gather — ~an order of magnitude
    # fewer mulmods — and chunk over the permutation axis so the working set
    # stays cache-resident instead of materializing a (P, total) matrix.
    uniq, inv = np.unique(flat, return_inverse=True)
    nonempty = np.nonzero(lengths)[0]
    offsets = np.zeros(len(nonempty), dtype=np.int64)
    np.cumsum(lengths[nonempty][:-1], out=offsets[1:])
    p = np.uint64(MERSENNE_P61)
    chunk = max(1, min(P, (1 << 21) // max(len(uniq), 1)))  # ~16MB hot temp
    for lo in range(0, P, chunk):
        hi = min(lo + chunk, P)
        # (chunk, n_uniq): h_i(x) = (a_i * x + b_i) mod p
        hu = mulmod_p61(a[lo:hi, None], uniq[None, :])
        hu += b[lo:hi, None]
        hu = np.where(hu >= p, hu - p, hu)
        hm = hu[:, inv]  # (chunk, total) gather
        mins = np.minimum.reduceat(hm, offsets, axis=1)  # (chunk, n_nonempty)
        sig[nonempty, lo:hi] = mins.T
    return sig


_SM_C1 = np.uint64(0x9E3779B97F4A7C15)
_SM_C2 = np.uint64(0xBF58476D1CE4E5B9)
_SM_C3 = np.uint64(0x94D049BB133111EB)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain mixing constants)."""
    z = x.astype(np.uint64, copy=True) + _SM_C1
    z ^= z >> np.uint64(30)
    z *= _SM_C2
    z ^= z >> np.uint64(27)
    z *= _SM_C3
    z ^= z >> np.uint64(31)
    return z


def band_keys(sig: np.ndarray, bands: int, rows: int) -> np.ndarray:
    """LSH band keys for a (n, P) signature matrix → (n, bands) uint64.

    Key = splitmix64 chain over (band_idx, row values): equal signature rows
    in the same band ⇒ equal key; a cross-vector collision only creates a
    spurious candidate pair, which exact verification later discards — so a
    cheap fully-vectorized mix is safe here (the sha256 pinning applies to
    shingle ids, not to internal bucket keys).
    """
    n = sig.shape[0]
    by = sig.reshape(n, bands, rows)
    h = splitmix64(np.arange(bands, dtype=np.uint64))[None, :]  # (1, bands)
    h = np.broadcast_to(h, (n, bands)).copy()
    for r in range(rows):
        h = splitmix64(h ^ splitmix64(by[:, :, r]))
    return h


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    """Exact Jaccard of two sorted-unique uint64 shingle-id arrays."""
    if len(a) == 0 and len(b) == 0:
        return 1.0
    if len(a) == 0 or len(b) == 0:
        return 0.0
    inter = len(np.intersect1d(a, b, assume_unique=True))
    return inter / (len(a) + len(b) - inter)
