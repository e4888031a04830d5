"""Suffix-array substring containment (SURVEY.md §2 B21/B22).

A real suffix array (numpy prefix-doubling, O(n log^2 n)) built over the
concatenated NUL-separated captions of one bounded group; containment queries
(is caption A a substring of any other member?) are two binary searches on the
array per query doc. Patterns never contain NUL, so a match can never span a
document boundary — matches are intra-document by construction.

Used inside a grouped-map pandas UDF (operators.containment): groups are the
anchor-gram buckets, each small enough for worker memory; the distributed part
is the gram-index join that forms the groups.
"""

from __future__ import annotations

import numpy as np


def suffix_array(data: bytes) -> np.ndarray:
    """Suffix array of ``data`` via numpy prefix doubling."""
    n = len(data)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    rank = np.frombuffer(data, dtype=np.uint8).astype(np.int64)
    sa = np.argsort(rank, kind="stable")  # initial order by first byte
    # compress initial ranks to 0..r
    order = np.argsort(rank, kind="stable")
    compressed = np.empty(n, dtype=np.int64)
    vals = rank[order]
    compressed[order] = np.cumsum(np.r_[0, (vals[1:] != vals[:-1]).astype(np.int64)])
    rank = compressed
    k = 1
    idx = np.arange(n, dtype=np.int64)
    while True:
        rank2 = np.full(n, -1, dtype=np.int64)
        rank2[: n - k] = rank[k:]
        sa = np.lexsort((rank2, rank))
        # new ranks: increment where (rank, rank2) differs from predecessor
        r1, r2 = rank[sa], rank2[sa]
        diff = np.r_[0, ((r1[1:] != r1[:-1]) | (r2[1:] != r2[:-1])).astype(np.int64)]
        new_rank = np.empty(n, dtype=np.int64)
        new_rank[sa] = np.cumsum(diff)
        rank = new_rank
        if rank[sa[-1]] == n - 1:
            return sa.astype(np.int64)
        k *= 2
        if k >= n:
            return sa.astype(np.int64)
    # unreachable
    return idx


def _lower_bound(corpus: bytes, sa: np.ndarray, pat: bytes) -> int:
    lo, hi = 0, len(sa)
    while lo < hi:
        mid = (lo + hi) // 2
        s = int(sa[mid])
        if corpus[s : s + len(pat)] < pat:
            lo = mid + 1
        else:
            hi = mid
    return lo


def _upper_bound(corpus: bytes, sa: np.ndarray, pat: bytes) -> int:
    lo, hi = 0, len(sa)
    while lo < hi:
        mid = (lo + hi) // 2
        s = int(sa[mid])
        if corpus[s : s + len(pat)] <= pat:
            lo = mid + 1
        else:
            hi = mid
    return lo


def containment_pairs(
    ids: list[str], texts: list[str], min_len: int
) -> set[tuple[str, str]]:
    """All unordered cross-doc pairs where one text is a substring of the
    other and the contained text has ≥ ``min_len`` CHARACTERS.

    The length gate counts characters (len of the unencoded text), matching
    SQL ``length()`` semantics in the DuckDB oracle twin — the suffix-array
    machinery itself works over UTF-8 bytes, where multibyte characters only
    make a text LONGER, so char-eligibility implies byte-eligibility for the
    winnowed-anchor recall guarantee (ADVICE r3: a non-ASCII caption near
    the boundary must not diverge engine vs oracle).

    Builds one suffix array over the NUL-joined corpus, then binary-searches
    each eligible doc's full text. Returns {(min_id, max_id), ...}.
    """
    enc = [t.encode("utf-8") for t in texts]
    n_docs = len(enc)
    if n_docs < 2:
        return set()
    corpus = b"\x00".join(enc)
    sa = suffix_array(corpus)
    # map corpus position → doc index
    starts = np.zeros(n_docs, dtype=np.int64)
    pos = 0
    for i, e in enumerate(enc):
        starts[i] = pos
        pos += len(e) + 1
    doc_of = np.searchsorted(starts, np.arange(len(corpus)), side="right") - 1

    out: set[tuple[str, str]] = set()
    for i, pat in enumerate(enc):
        if len(texts[i]) < min_len:  # characters, not bytes (see docstring)
            continue
        lo = _lower_bound(corpus, sa, pat)
        hi = _upper_bound(corpus, sa, pat)
        if hi <= lo:
            continue
        holders = np.unique(doc_of[sa[lo:hi]])
        for j in holders:
            j = int(j)
            if j == i:
                continue
            a, b = ids[i], ids[j]
            out.add((a, b) if a < b else (b, a))
    return out
