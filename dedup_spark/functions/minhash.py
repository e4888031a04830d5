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


# Worker-persistent buffers: transient multi-MB allocations are the real
# cost of this kernel — on VM hosts a fresh arena page-faults at ~100ms per
# 30MB, and 32 concurrent workers serialize on the kernel's mmap path (the
# SAME numpy work measured 6× more CPU per row at 32 processes than at 8).
# Everything below writes into buffers allocated once per worker and reused
# across Arrow batches.
_CHUNK = 4096               # uniq values hashed per kernel call
_scratch: dict[int, list[np.ndarray]] = {}
_hu_buf: np.ndarray | None = None


def _get_scratch(P: int) -> list[np.ndarray]:
    bufs = _scratch.get(P)
    if bufs is None:
        bufs = [np.empty((_CHUNK, P), dtype=np.uint64) for _ in range(3)]
        _scratch[P] = bufs
    return bufs


def _get_hu(n: int, P: int) -> np.ndarray:
    global _hu_buf
    if _hu_buf is None or _hu_buf.shape[0] < n or _hu_buf.shape[1] != P:
        _hu_buf = np.empty((max(n, 1 << 16), P), dtype=np.uint64)
    return _hu_buf[:n]


def _perm_hash_chunk(
    x: np.ndarray, a_hi: np.ndarray, a_lo: np.ndarray, b: np.ndarray,
    out: np.ndarray, t1: np.ndarray, t2: np.ndarray,
) -> None:
    """out[:m] = (a * x + b) mod p for x (m,) against all perms (P,).

    Same 32-bit-limb decomposition as hashing.mulmod_p61 (2^64 ≡ 8,
    2^32·2^29 ≡ 1 mod p), specialized to write through preallocated (m, P)
    buffers — no allocation beyond the tiny (m, 1) limb views of x.
    """
    c3, c29, c32, c61 = np.uint64(3), np.uint64(29), np.uint64(32), np.uint64(61)
    m = len(x)
    xh = (x >> c32)[:, None]
    xl = (x & _M32)[:, None]
    o, u, v = out[:m], t1[:m], t2[:m]
    np.multiply(xh, a_hi[None, :], out=o)
    np.left_shift(o, c3, out=o)                  # ahi*xhi*2^64 ≡ *8
    np.multiply(xl, a_hi[None, :], out=u)
    np.multiply(xh, a_lo[None, :], out=v)
    np.add(u, v, out=u)                          # mid < 2^62
    np.right_shift(u, c61, out=v)
    np.bitwise_and(u, _M61, out=u)
    np.add(u, v, out=u)                          # folded mid < 2^61
    np.right_shift(u, c29, out=v)
    np.bitwise_and(u, _M29, out=u)
    np.left_shift(u, c32, out=u)
    np.add(u, v, out=u)                          # mid*2^32 mod-ish
    np.add(o, u, out=o)
    np.multiply(xl, a_lo[None, :], out=u)
    np.right_shift(u, c61, out=v)
    np.bitwise_and(u, _M61, out=u)
    np.add(u, v, out=u)
    np.add(o, u, out=o)                          # s < 2^63
    np.right_shift(o, c61, out=v)
    np.bitwise_and(o, _M61, out=o)
    np.add(o, v, out=o)                          # < 2^61 + 3
    np.subtract(o, _P61, out=v)
    np.minimum(o, v, out=o)                      # a*x mod p  (< p)
    np.add(o, b[None, :], out=o)                 # < 2p
    np.subtract(o, _P61, out=v)
    np.minimum(o, v, out=o)                      # (a*x+b) mod p


_M32 = np.uint64(0xFFFFFFFF)
_M61 = np.uint64(MERSENNE_P61)
_M29 = np.uint64((1 << 29) - 1)
_P61 = np.uint64(MERSENNE_P61)


def minhash_batch(
    shingle_lists: list[np.ndarray], a: np.ndarray, b: np.ndarray
) -> np.ndarray:
    """MinHash signatures for a batch of shingle-id arrays → (n_rows, P) uint64.

    Hashes only the DISTINCT shingle values of the batch (shared vocabulary
    ⇒ ~10× fewer mulmods) into a worker-persistent (n_uniq, P) matrix in
    fixed-size chunks through persistent scratch, then takes per-row minima
    over contiguous row gathers. Rows with zero shingles get the sentinel
    signature (never collides into a band bucket with a real signature).
    """
    n = len(shingle_lists)
    P = a.shape[0]
    sig = np.full((n, P), _EMPTY_SENTINEL, dtype=np.uint64)
    lengths = np.array([len(s) for s in shingle_lists], dtype=np.int64)
    total = int(lengths.sum())
    if total == 0:
        return sig
    flat = np.concatenate([s for s in shingle_lists if len(s)]).astype(np.uint64)
    flat = flat % _P61
    uniq, inv = np.unique(flat, return_inverse=True)

    a_hi = a >> np.uint64(32)
    a_lo = a & _M32
    hu = _get_hu(len(uniq), P)               # (n_uniq, P), row-contiguous
    out, t1, t2 = _get_scratch(P)
    for lo in range(0, len(uniq), _CHUNK):
        hi = min(lo + _CHUNK, len(uniq))
        _perm_hash_chunk(uniq[lo:hi], a_hi, a_lo, b, out, t1, t2)
        hu[lo:hi] = out[: hi - lo]
    pos = 0
    for i in range(n):
        k = int(lengths[i])
        if k == 0:
            continue
        # gather k contiguous (P,)-rows of hu — cache-friendly — and reduce
        sig[i] = hu[inv[pos : pos + k]].min(axis=0)
        pos += k
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
