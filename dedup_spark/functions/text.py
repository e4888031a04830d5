"""Caption normalization + word-shingle extraction (SURVEY.md §2 B8, B10).

Two lockstep implementations of the SAME pinned normalization
(lower → strip punctuation → collapse whitespace → trim, FIXTURES.md):

- ``normalize_caption`` / ``word_shingles``: pure Python, used inside pandas
  UDF batches and by the golden oracle.
- ``norm_col``: Spark Column expression built only from JVM built-ins
  (lower/regexp_replace/trim) so Catalyst keeps it in whole-stage codegen.

Shingle ids are sha256-derived 64-bit hashes (functions.hashing.hash64_str);
MinHash consumes them reduced mod 2^61-1, SimHash consumes the full 64 bits.
"""

from __future__ import annotations

import re

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

from dedup_spark.functions.hashing import hash64_str

_PUNCT_RE = re.compile(r"[^a-z0-9\s]")
_WS_RE = re.compile(r"\s+")


def normalize_caption(caption: str) -> str:
    """lower → strip punctuation → collapse whitespace → trim (pinned)."""
    s = caption.lower()
    s = _PUNCT_RE.sub("", s)
    s = _WS_RE.sub(" ", s)
    return s.strip()


def norm_col(col: Column) -> Column:
    """Spark-built-in twin of ``normalize_caption`` (codegen'd, no UDF)."""
    s = F.lower(col)
    s = F.regexp_replace(s, r"[^a-z0-9\s]", "")
    s = F.regexp_replace(s, r"\s+", " ")
    return F.trim(s)


def word_shingles(norm: str, k: int) -> list[str]:
    """Distinct word k-gram shingles of an already-normalized caption.

    Fewer than k tokens → one shingle of all tokens joined (so short captions
    still participate); empty → no shingles.
    """
    toks = norm.split(" ") if norm else []
    toks = [t for t in toks if t]
    if not toks:
        return []
    if len(toks) < k:
        return [" ".join(toks)]
    seen: dict[str, None] = {}
    for i in range(len(toks) - k + 1):
        seen[" ".join(toks[i : i + k])] = None
    return list(seen.keys())


def shingle_hashes(norm: str, k: int, _memo: dict | None = None) -> np.ndarray:
    """uint64 hash ids of the distinct shingles of one normalized caption.

    ``_memo`` lets a pandas-UDF batch reuse hashes across rows (captions in a
    batch share vocabulary heavily — this is the vectorization-friendly path
    for the inherently string-y step; all downstream math is pure numpy).
    """
    out = []
    for sh in word_shingles(norm, k):
        if _memo is not None:
            h = _memo.get(sh)
            if h is None:
                h = hash64_str(sh)
                _memo[sh] = h
        else:
            h = hash64_str(sh)
        out.append(h)
    return np.array(sorted(set(out)), dtype=np.uint64)
