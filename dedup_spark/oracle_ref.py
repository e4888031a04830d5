"""Single-process golden oracle (SURVEY.md §5 layer 1).

Plays the role of the reference's expected test outputs: a pure
python/numpy/networkx re-statement of the pinned config over the SAME
deterministic table the Spark pipeline reads. True dup pairs are defined by
the verification thresholds themselves (not by LSH banding), so the oracle is
an upper bound on what any banding can find — dup-pair recall ≥ 0.99 is
measured against it (BASELINE.json:14).

Uses the same dedup_spark.functions.* primitives as the executors' pandas
UDFs; only the *orchestration* differs (dicts/loops here, DataFrames there).
"""

from __future__ import annotations

from collections import Counter, defaultdict
from dataclasses import dataclass

import networkx as nx
import numpy as np
import pandas as pd

from dedup_spark.config import DEFAULT_CONFIG, PipelineConfig
from dedup_spark.functions.codecs import decode
from dedup_spark.functions.hashing import content_digest, popcount64
from dedup_spark.functions.minhash import jaccard
from dedup_spark.functions.simhash import simhash_batch
from dedup_spark.functions.suffix import containment_pairs
from dedup_spark.functions.text import normalize_caption, shingle_hashes


def expected_len(fmt: str, w: int, h: int) -> int:
    if fmt in ("rgb8", "qraw"):
        return w * h * 3
    if fmt == "ppm":
        return len(b"P6\n%d %d\n255\n" % (w, h)) + w * h * 3
    return -1


def is_valid(row) -> bool:
    return (
        row["w"] > 0
        and row["h"] > 0
        and row["bytes"] is not None
        and len(row["bytes"]) == expected_len(row["fmt"], row["w"], row["h"])
    )


def depth_of(image_id: str) -> int:
    return image_id.count("/")


@dataclass
class GoldenResult:
    pairs: set[tuple[str, str]]           # true dup pairs (recall denominator)
    pair_families: dict[tuple[str, str], set[str]]
    clusters: dict[str, str]              # image_id -> cluster_id (min member)
    winners: set[str]
    dup_dirs: list[set[str]]              # dup prefix-groups (outermost only)
    suppressed: set[str]                  # image_ids under a dup dir
    valid_ids: list[str]


def _cluster_pairs(clusters: dict[str, str]) -> set[tuple[str, str]]:
    """Same-cluster pairs implied by a cluster assignment."""
    by: dict[str, list[str]] = defaultdict(list)
    for iid, cid in clusters.items():
        by[cid].append(iid)
    out: set[tuple[str, str]] = set()
    for members in by.values():
        members.sort()
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                out.add((members[i], members[j]))
    return out


def cluster_pairs(clusters: dict[str, str]) -> set[tuple[str, str]]:
    return _cluster_pairs(clusters)


def compute_golden(
    table: pd.DataFrame, cfg: PipelineConfig = DEFAULT_CONFIG
) -> GoldenResult:
    rows = [r for _, r in table.iterrows() if is_valid(r)]
    ids = [r["image_id"] for r in rows]
    n = len(rows)
    idx = {iid: i for i, iid in enumerate(ids)}

    # --- signatures (shared primitives, same pinned config) ---
    memo: dict = {}
    norms = [normalize_caption(r["caption"]) for r in rows]
    shingles = [shingle_hashes(s, cfg.shingle_k, memo) for s in norms]
    sims = simhash_batch(shingles)
    phashes = np.array([np.uint64(r["phash"]) for r in rows], dtype=np.uint64)
    digests = [content_digest(bytes(r["bytes"]), r["caption"]) for r in rows]

    pairs: set[tuple[str, str]] = set()
    fams: dict[tuple[str, str], set[str]] = defaultdict(set)

    def add(i: int, j: int, fam: str) -> None:
        a, b = (ids[i], ids[j]) if ids[i] < ids[j] else (ids[j], ids[i])
        pairs.add((a, b))
        fams[(a, b)].add(fam)

    # exact: identical content digest
    by_digest: dict[str, list[int]] = defaultdict(list)
    for i, d in enumerate(digests):
        by_digest[d].append(i)
    for members in by_digest.values():
        for x in range(len(members)):
            for y in range(x + 1, len(members)):
                add(members[x], members[y], "exact")

    # minhash family truth: exact shingle Jaccard ≥ threshold.
    # Candidates via shingle co-occurrence (J ≥ t ⇒ ≥1 shared shingle).
    inv: dict[int, list[int]] = defaultdict(list)
    for i, sh in enumerate(shingles):
        for h in sh.tolist():
            inv[h].append(i)
    co: Counter = Counter()
    for members in inv.values():
        if len(members) < 2:
            continue
        for x in range(len(members)):
            for y in range(x + 1, len(members)):
                co[(members[x], members[y])] += 1
    for (i, j), shared in co.items():
        union = len(shingles[i]) + len(shingles[j]) - shared
        if union > 0 and shared / union >= cfg.jaccard_threshold:
            add(i, j, "minhash")

    # simhash / phash families: full N×N Hamming (fine at oracle scale)
    for vals, fam, thr in (
        (sims, "simhash", cfg.simhash_hamming_max),
        (phashes, "phash", cfg.phash_hamming_max),
    ):
        x = np.bitwise_xor.outer(vals, vals)
        d = popcount64(x)
        ii, jj = np.nonzero(np.triu(d <= thr, k=1))
        for i, j in zip(ii.tolist(), jj.tolist()):
            # caption-less/simhash-0 rows must not all collide with each other
            if fam == "simhash" and (len(shingles[i]) == 0 or len(shingles[j]) == 0):
                continue
            add(i, j, fam)

    # containment family: suffix-array over the whole (small) corpus
    for a, b in containment_pairs(ids, norms, cfg.suffix_min_len):
        i, j = idx[a], idx[b]
        fams_key = (a, b)
        pairs.add(fams_key)
        fams[fams_key].add("containment")

    # --- connected components + winners ---
    g = nx.Graph()
    g.add_nodes_from(ids)
    g.add_edges_from(pairs)
    clusters: dict[str, str] = {}
    winners: set[str] = set()
    for comp in nx.connected_components(g):
        cid = min(comp)
        for m in comp:
            clusters[m] = cid
        winners.add(min(comp, key=lambda x: (depth_of(x), x)))

    # --- prefix rollup: hierarchical dir digests, dup groups, subsumption ---
    # dir digest = commutative multiset digest of immediate children's
    # digests (child file → content digest, child dir → its dir digest);
    # name-agnostic. MUST match operators.rollup.multiset_digest exactly:
    # sha256(sum(term) ":" xor(term) ":" count),
    # term = int(sha256(child_digest).hex[:15], 16).
    import hashlib

    children: dict[str, list[str]] = defaultdict(list)  # dir -> child keys
    file_digest: dict[str, str] = {}
    for i, iid in enumerate(ids):
        parts = iid.split("/")
        file_digest[iid] = digests[i]
        for lvl in range(1, len(parts)):
            parent = "/".join(parts[:lvl])
            child = "/".join(parts[: lvl + 1])
            if child not in children[parent]:
                children[parent].append(child)

    dir_digest: dict[str, str] = {}

    def dd(d: str) -> str:
        if d in dir_digest:
            return dir_digest[d]
        subs = []
        for c in children.get(d, []):
            subs.append(dd(c) if c in children else file_digest[c])
        terms = [
            int(hashlib.sha256(h.encode()).hexdigest()[:15], 16) for h in subs
        ]
        x = 0
        for t in terms:
            x ^= t
        blob = f"{sum(terms)}:{x}:{len(terms)}"
        dir_digest[d] = hashlib.sha256(blob.encode()).hexdigest()
        return dir_digest[d]

    all_dirs = list(children.keys())
    for d in all_dirs:
        dd(d)
    by_dd: dict[str, list[str]] = defaultdict(list)
    for d in all_dirs:
        by_dd[dir_digest[d]].append(d)
    dup_dir_set = {d for ds in by_dd.values() if len(ds) > 1 for d in ds}

    def has_dup_ancestor(path: str) -> bool:
        parts = path.split("/")
        for lvl in range(1, len(parts)):
            if "/".join(parts[:lvl]) in dup_dir_set:
                return True
        return False

    # per-member subsumption (matches operators.rollup.dup_dirs): drop
    # members that sit under a dup dir; report groups with ≥2 outermost left
    dup_dirs = []
    for ds in by_dd.values():
        if len(ds) < 2:
            continue
        outer = {d for d in ds if not has_dup_ancestor(d)}
        if len(outer) > 1:
            dup_dirs.append(outer)
    suppressed = {iid for iid in ids if has_dup_ancestor(iid)}

    return GoldenResult(
        pairs=pairs,
        pair_families=dict(fams),
        clusters=clusters,
        winners=winners,
        dup_dirs=dup_dirs,
        suppressed=suppressed,
        valid_ids=ids,
    )


__all__ = [
    "compute_golden",
    "cluster_pairs",
    "GoldenResult",
    "is_valid",
    "expected_len",
    "depth_of",
]

_ = (decode, jaccard)  # re-exported building blocks used by tests
