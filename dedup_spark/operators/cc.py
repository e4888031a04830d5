"""Connected components (SURVEY.md §2 B34): size-gated hybrid.

Dedup edge sets are tiny relative to the corpus — verification keeps
O(true duplicates) edges, not O(candidates) — so the common case (even at
10^12 input rows, if dup density is sane) is an edge table far below worker
memory. The hybrid:

- ``edge count ≤ local_threshold``: ONE executor task runs a vectorized
  numpy union-find over the whole edge set (mapInPandas on a single
  partition — executor-side, memory-bounded by the threshold knob, NOT a
  driver collect). Replaces the r1 per-round driver loop whose ~6 barrier
  jobs made t_clusters the least-scalable stage in BENCH r1 (ratio 0.79 of
  ideal 4.0 — it got *slower* with more cores).
- above the threshold: DataFrame-iterative large-star/small-star (Kiveris
  et al., "Connected Components in MapReduce and Beyond", SoCC'14 — the
  standard O(log n)-round algorithm needing only groupBy/join per round).
  This is the 100-TB path for graphs whose edges don't fit one worker;
  rounds converge on an order-insensitive (count, xor-of-hashes)
  fingerprint, one aggregate per round, with ``localCheckpoint`` truncating
  lineage (without it the plan doubles per iteration).

Node ids are the string image_ids; ordering is lexicographic, cluster id =
component minimum. Both paths produce identical assignments (property-tested
against networkx in tests/test_cc.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sym(edges: DataFrame) -> DataFrame:
    e = edges.select(F.col("a").alias("src"), F.col("b").alias("dst"))
    return e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))


def _large_star(sym: DataFrame) -> DataFrame:
    mins = sym.groupBy("src").agg(F.min("dst").alias("mn"))
    mins = mins.withColumn("mn", F.least("mn", F.col("src")))
    return (
        sym.join(mins, "src")
        .where(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("a"), F.col("mn").alias("b"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    # orient max → min
    e = edges.select(
        F.greatest("a", "b").alias("src"), F.least("a", "b").alias("dst")
    ).where(F.col("src") != F.col("dst"))
    mins = e.groupBy("src").agg(F.min("dst").alias("mn"))
    linked = (
        e.join(mins, "src")
        .select(F.col("dst").alias("a"), F.col("mn").alias("b"))
        .union(mins.select(F.col("src").alias("a"), F.col("mn").alias("b")))
    )
    return linked.where(F.col("a") != F.col("b")).distinct()


def _fingerprint(edges: DataFrame) -> tuple:
    row = edges.agg(
        F.count("*").alias("n"),
        F.expr("bit_xor(xxhash64(a, b))").alias("h"),  # xor: no ANSI overflow
    ).collect()[0]
    return (row["n"], row["h"])


def _numpy_components(a: np.ndarray, b: np.ndarray) -> pd.DataFrame:
    """Vectorized union-find over integer-coded edges → (node, min-root).

    O(E) per round, O(log n) rounds (pointer-jumping + per-edge min-root
    linking via np.minimum.at); no python-level per-edge loop.
    """
    ids, codes = np.unique(np.concatenate([a, b]), return_inverse=True)
    # np.unique sorts → code order == lexicographic id order, so the min
    # CODE per component is the min image_id: root code = cluster id
    ca, cb = codes[: len(a)], codes[len(a):]
    parent = np.arange(len(ids), dtype=np.int64)
    for _ in range(64):
        # full path compression
        while True:
            gp = parent[parent]
            if np.array_equal(gp, parent):
                break
            parent = gp
        ra, rb = parent[ca], parent[cb]
        lo, hi = np.minimum(ra, rb), np.maximum(ra, rb)
        live = hi != lo
        if not live.any():
            break
        np.minimum.at(parent, hi[live], lo[live])
    labeled = pd.DataFrame(
        {"image_id": ids, "cluster_id": ids[parent[parent]]}
    )
    return labeled[labeled.image_id != labeled.cluster_id]


def _local_cc(edges: DataFrame) -> DataFrame:
    """Whole-graph union-find in one executor task (small/medium graphs)."""

    def run(batches):
        frames = [pdf for pdf in batches if len(pdf)]
        if not frames:
            return
            yield  # pragma: no cover — make `run` a generator
        df = pd.concat(frames, ignore_index=True)
        yield _numpy_components(
            df["a"].to_numpy(), df["b"].to_numpy()
        )

    return edges.repartition(1).mapInPandas(
        run, schema="image_id string, cluster_id string"
    )


def connected_components(
    edges: DataFrame,
    nodes: DataFrame,
    max_iter: int = 25,
    local_threshold: int = 20_000_000,
) -> DataFrame:
    """edges(a, b) + nodes(image_id) → clusters(image_id, cluster_id).

    Every node appears exactly once; isolated nodes are their own cluster.
    ``local_threshold`` gates the single-task union-find: at the default,
    ~20M edges of ~30-byte string ids is ≈ 1.2 GB resident in one task —
    comfortable for any real executor profile (and measured: 2M edges
    union-find in seconds at n=1.6M). Size down only for very small
    executors; above the gate the iterative star-contraction path takes
    over (the path for edge sets that genuinely exceed worker memory).
    """
    cur = (
        edges.select(
            F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint()
    )
    if cur.count() <= local_threshold:
        labeled = _local_cc(cur)
    else:
        prev_fp = None
        for _ in range(max_iter):
            cur = _small_star(_large_star(_sym(cur))).localCheckpoint()
            fp = _fingerprint(cur)
            if fp == prev_fp:
                break
            prev_fp = fp
        else:
            raise RuntimeError(
                f"connected_components did not converge in {max_iter} rounds"
            )
        # fixpoint of star-contraction: every edge is (member, component_min)
        assign = cur.select(
            F.col("a").alias("image_id"), F.col("b").alias("cluster_id")
        )
        roots = cur.select(F.col("b").alias("image_id")).distinct().withColumn(
            "cluster_id", F.col("image_id")
        )
        labeled = assign.union(roots).dropDuplicates(["image_id"])

    singletons = nodes.join(labeled, "image_id", "left_anti").withColumn(
        "cluster_id", F.col("image_id")
    )
    return labeled.union(singletons)
