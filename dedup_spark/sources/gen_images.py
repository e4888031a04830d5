"""Deterministic synthetic image+caption source (SURVEY.md §2 B1, FIXTURES.md).

Every row is a pure function of ``(seed, id)`` — never of partition id or
wall-clock — so the table is identical under any parallelism (this is what
makes the local[8]-vs-local[32] scaling benchmark apples-to-apples and lets
the single-process golden oracle regenerate the exact table the cluster saw).

Ids are laid out in blocks of 100 (block = id // 100, slot = id % 100) with
planted duplicate scenarios per FIXTURES.md §"Planted structure":

  slot 0..49   base unique images (fmt cycles rgb8/ppm/qraw)
  slot 50,51   exact copies of slot 0  (S2: k=3 exact group)
  slot 52      exact copy of slot 1    (S1: exact pair, different prefix)
  slot 53      pixel-noise near-dup of slot 2, same caption      (S3)
  slot 54      pixel-noise near-dup of slot 3, unrelated caption (S3b: image-only)
  slot 55,56   caption near-dup (1-word edit) of slots 4,5; new image (S4)
  slot 57      caption = word-slice of slot 6's caption; new image (S5 containment)
  slot 58,59   transitive caption chain off slot 7 (S12: a~b~c, a!~c)
  slot 60      qraw re-encode of slot 9's pixels (S13: lossy PSNR invariant)
  slot 61..63  decoys just outside thresholds (S10)
  slot 64      empty payload (S9: filtered by validity predicates)
  slot 65..79  hot-LSH-bucket boilerplate captions (S11: skew; NOT true dups)
  slot 80..85  dirA members (2 subdirs x 3)   (S6/S7 dup prefix-groups,
  slot 86..91  dirB = exact mirror of dirA     only in even blocks)
  slot 92..97  dirC/dirD partial overlap (S8; only in even blocks)
  slot 98,99   more base uniques

Odd blocks use 80..97 as extra uniques so dup-dir scenarios stay crisp.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import numpy as np
import pandas as pd

from dedup_spark.config import DEFAULT_CONFIG, PipelineConfig
from dedup_spark.functions.codecs import encode
from dedup_spark.functions.hashing import hash64_str
from dedup_spark.functions.phash import phash64
from dedup_spark.schema import IMAGES_SCHEMA

_VOCAB = (
    "amber bridge canyon drifting ember forest glacier harbor island juniper "
    "kestrel lantern meadow nebula orchid prairie quartz river summit tundra "
    "umbral violet willow zephyr basalt cobalt dune estuary fjord grove "
    "heather inlet jetty knoll lagoon mesa nectar oasis pebble quarry "
    "ridge shale terrace upland vale wharf yarrow zenith boulder cascade"
).split()

_FMTS = ("rgb8", "ppm", "qraw")

_HOT_PREFIX = (
    "a photo of a thing in the wild captured on a bright day with a camera lens"
).split()  # 17 words; +1 below → 18-word shared prefix


def _rng(seed: int, tag: str) -> np.random.Generator:
    return np.random.default_rng(hash64_str(f"{seed}:{tag}") % (1 << 63))


def _base_pixels(seed: int, block: int, slot: int) -> np.ndarray:
    """Distinctive low-frequency pattern + fine noise, (h, w, 3) uint8."""
    r = _rng(seed, f"px:{block}:{slot}")
    side = int(r.choice([32, 48, 64]))
    coarse = r.integers(0, 256, size=(side // 8, side // 8, 3), dtype=np.int64)
    img = np.kron(coarse, np.ones((8, 8, 1), dtype=np.int64))
    img = img + r.integers(-8, 9, size=img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


def _noisy(pixels: np.ndarray, seed: int, tag: str, amp: int) -> np.ndarray:
    r = _rng(seed, tag)
    noise = r.integers(-amp, amp + 1, size=pixels.shape)
    return np.clip(pixels.astype(np.int64) + noise, 0, 255).astype(np.uint8)


def _base_caption_tokens(seed: int, block: int, slot: int, nwords: int) -> list[str]:
    r = _rng(seed, f"cap:{block}:{slot}")
    return [str(_VOCAB[i]) for i in r.integers(0, len(_VOCAB), size=nwords)]


def _caption_len(seed: int, block: int, slot: int) -> int:
    # near-dup / chain source slots need long captions so a 1-word edit keeps
    # word-3-gram Jaccard ≥ 0.8 (n_sh ≥ 27 ⇒ ≥ 29 words); others vary 16..28
    if slot in (4, 5, 7, 12):
        return 32
    r = _rng(seed, f"clen:{block}:{slot}")
    return int(r.integers(16, 29))


def _edit_tokens(toks: list[str], pos: int, seed: int, tag: str) -> list[str]:
    r = _rng(seed, tag)
    out = list(toks)
    w = str(_VOCAB[int(r.integers(0, len(_VOCAB)))])
    while w == out[pos]:
        w = w + "x"
    out[pos] = w
    return out


def _base_row(seed: int, block: int, slot: int) -> dict:
    px = _base_pixels(seed, block, slot)
    fmt = _FMTS[slot % 3]
    toks = _base_caption_tokens(seed, block, slot, _caption_len(seed, block, slot))
    return {"pixels": px, "fmt": fmt, "caption": " ".join(toks), "toks": toks}


def _finish(image_id: str, pixels: np.ndarray, fmt: str, caption: str) -> dict:
    data = encode(fmt, pixels)
    h, w = pixels.shape[:2]
    # phash over the *stored* representation (decode(encode(x))) so the
    # fixture column and the pipeline's recompute (B13) agree exactly
    from dedup_spark.functions.codecs import decode as _dec

    ph = phash64(_dec(fmt, data, w, h))
    return {
        "image_id": image_id,
        "bytes": data,
        "w": int(w),
        "h": int(h),
        "fmt": fmt,
        "caption": caption,
        "phash": int(ph),
    }


def _base_id(block: int, slot: int, rid: int) -> str:
    return f"ds{block % 4}/blk{block:04d}/g{slot // 10}/img_{rid:06d}"


def row_for_id(rid: int, seed: int) -> dict:
    """The canonical row for global index ``rid`` (pure function)."""
    b, s = divmod(rid, 100)

    def base(slot: int) -> dict:
        return _base_row(seed, b, slot)

    def finish_base(slot: int) -> dict:
        r = base(slot)
        return _finish(_base_id(b, slot, rid), r["pixels"], r["fmt"], r["caption"])

    if s < 50 or s >= 98:
        return finish_base(s)

    iid = _base_id(b, s, rid)
    if s in (50, 51):  # exact copies of slot 0 (k=3 group with the original)
        r = base(0)
        return _finish(iid, r["pixels"], r["fmt"], r["caption"])
    if s == 52:  # exact pair with slot 1
        r = base(1)
        return _finish(iid, r["pixels"], r["fmt"], r["caption"])
    if s == 53:  # image near-dup of slot 2, same caption
        r = base(2)
        return _finish(iid, _noisy(r["pixels"], seed, f"n53:{b}", 2), "rgb8", r["caption"])
    if s == 54:  # image near-dup of slot 3, unrelated caption
        r = base(3)
        cap = " ".join(_base_caption_tokens(seed, b, 540, 20))
        return _finish(iid, _noisy(r["pixels"], seed, f"n54:{b}", 2), "rgb8", cap)
    if s in (55, 56):  # caption near-dup (1 mid-word edit) of slots 4/5
        src = 4 if s == 55 else 5
        r = base(src)
        toks = _edit_tokens(r["toks"], 15, seed, f"e{s}:{b}")
        px = _base_pixels(seed, b, 500 + s)
        return _finish(iid, px, "rgb8", " ".join(toks))
    if s == 57:  # caption containment: word-slice of slot 6
        r = base(6)
        sub = " ".join(r["toks"][3:10])
        px = _base_pixels(seed, b, 570)
        return _finish(iid, px, "rgb8", sub)
    if s in (58, 59):  # transitive chain: 58 edits slot 7 @5; 59 edits 58 @25
        r = base(7)
        t1 = _edit_tokens(r["toks"], 5, seed, f"ch1:{b}")
        if s == 58:
            px = _base_pixels(seed, b, 580)
            return _finish(iid, px, "rgb8", " ".join(t1))
        t2 = _edit_tokens(t1, 25, seed, f"ch2:{b}")
        px = _base_pixels(seed, b, 590)
        return _finish(iid, px, "rgb8", " ".join(t2))
    if s == 60:  # lossy re-encode of slot 9's pixels (slot 9 is rgb8)
        r = base(9)
        return _finish(iid, r["pixels"], "qraw", r["caption"])
    if s == 61:  # caption decoy: ~50% token overlap with slot 10
        r = base(10)
        toks = list(r["toks"])
        rr = _rng(seed, f"d61:{b}")
        for pos in range(0, len(toks), 2):
            toks[pos] = str(_VOCAB[int(rr.integers(0, len(_VOCAB)))]) + "q"
        px = _base_pixels(seed, b, 610)
        return _finish(iid, px, "rgb8", " ".join(toks))
    if s == 62:  # image decoy: 50/50 structural blend with an unrelated
        # pattern — pHash is invariant to high-amplitude *uniform* noise (it
        # averages out in the low-freq DCT), so a true near-miss must differ
        # in low-frequency structure (Hamming lands ~12-20, outside ≤6)
        r = base(11)
        side = r["pixels"].shape[0]
        rr = _rng(seed, f"d62:{b}")
        coarse = rr.integers(0, 256, size=(side // 8, side // 8, 3), dtype=np.int64)
        other = np.kron(coarse, np.ones((8, 8, 1), dtype=np.int64))
        blend = ((r["pixels"].astype(np.int64) + other) // 2).astype(np.uint8)
        cap = " ".join(_base_caption_tokens(seed, b, 620, 20))
        return _finish(iid, blend, "rgb8", cap)
    if s == 63:  # caption decoy: 6 spaced edits of slot 12 — outside BOTH the
        # Jaccard threshold (J ≈ 12/48 = 0.25) and SimHash reach (≈18 of 30
        # shingles differ → Hamming ≫ 8); a 2-edit variant proved to be a
        # genuine simhash near-dup, not a decoy
        r = base(12)
        toks = list(r["toks"])
        for i, pos in enumerate((2, 7, 12, 17, 22, 27)):
            toks = _edit_tokens(toks, pos, seed, f"d63{i}:{b}")
        px = _base_pixels(seed, b, 630)
        return _finish(iid, px, "rgb8", " ".join(toks))
    if s == 64:  # empty payload — must be excluded by validity predicates
        return {
            "image_id": iid,
            "bytes": b"",
            "w": 0,
            "h": 0,
            "fmt": "rgb8",
            "caption": "",
            "phash": 0,
        }
    if 65 <= s <= 79:  # hot-bucket boilerplate: 18 shared words + 1 unique
        # One zero-padded unique token ⇒ pairwise Jaccard = 16/18 ≈ 0.89 —
        # a TRUE dup mega-cluster whose minhash band buckets hold ~60% of all
        # hot rows (>> bucket_cap), so the salting path is exercised while
        # cluster connectivity stays robust. Zero-padding keeps equal caption
        # lengths so no accidental substring containment.
        toks = _HOT_PREFIX + ["scene", f"u{rid:06d}"]
        px = _base_pixels(seed, b, 600 + s)
        return _finish(iid, px, "rgb8", " ".join(toks))

    # 80..97: directory scenarios in even blocks, extra uniques in odd blocks
    if b % 2 == 1:
        return finish_base(s)
    if 80 <= s <= 91:  # dirA (80-85) mirrored exactly by dirB (86-91)
        j = (s - 80) % 6
        r = _base_row(seed, b, 800 + j)  # content keyed by j → equal across A/B
        d = "dirA" if s <= 85 else "dirB"
        iid = f"ds{b % 4}/blk{b:04d}/{d}/s{j // 3}/m{j % 3:02d}"
        return _finish(iid, r["pixels"], r["fmt"], r["caption"])
    if 92 <= s <= 97:  # dirC (92-94) vs dirD (95-97): 2 shared, 1 distinct
        j = s - 92
        if j < 3:
            r = _base_row(seed, b, 900 + j)
            iid = f"ds{b % 4}/blk{b:04d}/dirC/m{j:02d}"
        else:
            k = j - 3
            r = _base_row(seed, b, 900 + k if k < 2 else 990)
            iid = f"ds{b % 4}/blk{b:04d}/dirD/m{k:02d}"
        return _finish(iid, r["pixels"], r["fmt"], r["caption"])
    return finish_base(s)


_COLS = [f.name for f in IMAGES_SCHEMA.fields]


def gen_pandas(ids: Iterable[int], seed: int) -> pd.DataFrame:
    rows = [row_for_id(int(i), seed) for i in ids]
    return pd.DataFrame(rows, columns=_COLS)


def gen_local(n: int, seed: int) -> pd.DataFrame:
    """Whole table in one pandas frame (oracle/tests; keep n small)."""
    return gen_pandas(range(n), seed)


def gen_images(spark, n: int, seed: int, num_partitions: int | None = None):
    """Distributed generator: spark.range → mapInPandas, no driver data.

    Partition count defaults to defaultParallelism so generation scales with
    the cluster; content is partitioning-invariant (pure f(seed, id)).
    """
    from dedup_spark.session import py_parallelism

    parts = num_partitions or py_parallelism(spark)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield gen_pandas(pdf["id"].to_numpy(), seed)

    return (
        spark.range(0, n, numPartitions=parts)
        .mapInPandas(gen, schema=IMAGES_SCHEMA)
    )


def scenario_of(rid: int) -> str:
    """Scenario tag for a row id (sidecar for per-scenario assertions)."""
    b, s = divmod(rid, 100)
    if s < 50 or s >= 98:
        return "base"
    if s in (50, 51):
        return "S2"
    if s == 52:
        return "S1"
    if s == 53:
        return "S3"
    if s == 54:
        return "S3b"
    if s in (55, 56):
        return "S4"
    if s == 57:
        return "S5"
    if s in (58, 59):
        return "S12"
    if s == 60:
        return "S13"
    if s in (61, 62, 63):
        return "S10"
    if s == 64:
        return "S9"
    if 65 <= s <= 79:
        return "S11"
    if b % 2 == 1:
        return "base"
    if 80 <= s <= 91:
        return "S6"
    return "S8"


DEFAULT_SEED = 1337
SMOKE_SEED = 7
BENCH_SEED = 4242

__all__ = [
    "gen_images",
    "gen_local",
    "gen_pandas",
    "row_for_id",
    "scenario_of",
    "DEFAULT_SEED",
    "SMOKE_SEED",
    "BENCH_SEED",
]

# keep a reference so linters don't flag the import — config is part of the
# generator contract even though current scenarios don't read thresholds
_ = (DEFAULT_CONFIG, PipelineConfig)
