"""Deterministic hashing shared by the Spark pipeline and the golden oracle.

All functions here are pure (numpy/hashlib only) so the SAME code runs inside
Arrow-batched pandas UDFs on executors and inside the single-process test
oracle — this is what guarantees "same shingle/signature config" agreement
(BASELINE.json:14) without a reference binary to diff against.

Key pieces:
- ``hash64_str`` / ``hash64_bytes``: sha256-derived 64-bit universal hash
  (FIXTURES.md pinned config: "hashed to int64 (sha256-derived universal hash)").
- ``mulmod_p61``: vectorized (a*x) mod (2^61 - 1) without 128-bit ints, via
  32-bit limb decomposition and the identity 2^61 ≡ 1 (mod p). Used by MinHash.
"""

from __future__ import annotations

import hashlib

import numpy as np

from dedup_spark.config import MERSENNE_P61

_P = np.uint64(MERSENNE_P61)
_MASK61 = np.uint64(MERSENNE_P61)
_MASK32 = np.uint64(0xFFFFFFFF)
_MASK29 = np.uint64((1 << 29) - 1)


def hash64_str(s: str) -> int:
    """sha256-derived unsigned 64-bit hash of a string. Deterministic forever."""
    return int.from_bytes(hashlib.sha256(s.encode("utf-8")).digest()[:8], "big")


def hash64_bytes(b: bytes) -> int:
    return int.from_bytes(hashlib.sha256(b).digest()[:8], "big")


def content_digest(image_bytes: bytes, caption: str) -> str:
    """Exact-dup content digest: sha256 over bytes || 0x00 || utf8(caption).

    Spark analog of the reference's per-file digest; the DataFrame side
    computes the identical value with built-in F.sha2(F.concat(...), 256)
    (dedup_spark.operators.exact) — keep the two in lockstep.
    """
    h = hashlib.sha256()
    h.update(image_bytes)
    h.update(b"\x00")
    h.update(caption.encode("utf-8"))
    return h.hexdigest()


def mulmod_p61(a: np.ndarray, x: np.ndarray) -> np.ndarray:
    """(a * x) mod (2^61 - 1) for uint64 arrays with values < 2^61.

    Decompose a*x = ahi*xhi*2^64 + (ahi*xlo + alo*xhi)*2^32 + alo*xlo and use
    2^61 ≡ 1 (mod p), i.e. 2^64 ≡ 8 and 2^32*2^29 ≡ 1. Every intermediate
    stays < 2^64, so plain wrapping uint64 numpy arithmetic is exact.
    """
    a = a.astype(np.uint64, copy=False)
    x = x.astype(np.uint64, copy=False)
    a_hi = a >> np.uint64(32)          # < 2^29
    a_lo = a & _MASK32                 # < 2^32
    x_hi = x >> np.uint64(32)
    x_lo = x & _MASK32

    # ahi*xhi*2^64 ≡ ahi*xhi*8  (< 2^61, no fold needed)
    t1 = (a_hi * x_hi) << np.uint64(3)

    # mid = ahi*xlo + alo*xhi  (< 2^62); fold once, then *2^32 via 29/32 split
    mid = a_hi * x_lo + a_lo * x_hi
    mid = (mid >> np.uint64(61)) + (mid & _MASK61)
    t2 = (mid >> np.uint64(29)) + ((mid & _MASK29) << np.uint64(32))

    # alo*xlo < 2^64: fold
    t3 = a_lo * x_lo
    t3 = (t3 >> np.uint64(61)) + (t3 & _MASK61)

    s = t1 + t2 + t3                   # < 2^63
    s = (s >> np.uint64(61)) + (s & _MASK61)
    s = np.where(s >= _P, s - _P, s)
    return s


def to_signed64(u: np.ndarray) -> np.ndarray:
    """Reinterpret uint64 as int64 (two's complement) for Spark LongType."""
    return u.astype(np.uint64, copy=False).view(np.int64)


def popcount64(x: np.ndarray) -> np.ndarray:
    """Per-element popcount of a uint64/int64 array (numpy<2 lacks bit_count)."""
    v = np.ascontiguousarray(x).view(np.uint8)
    return np.unpackbits(v).reshape(x.shape + (8 * x.dtype.itemsize,)).sum(axis=-1)
