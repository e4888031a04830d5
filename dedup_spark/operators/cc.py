"""Connected components: DataFrame-iterative large-star/small-star
(SURVEY.md §2 B34; Kiveris et al., "Connected Components in MapReduce and
Beyond", SoCC'14 — the standard O(log n)-round label-propagation-free
algorithm that needs only groupBy/join per round, no graph library).

Node ids are the string image_ids; ordering is lexicographic, cluster id =
component minimum. Each round:

  large-star: every node u connects its strictly-greater neighbors to
              min(N(u) ∪ {u})
  small-star: on edges oriented max→min, every node u connects its
              smaller-or-equal neighborhood (and itself) to its minimum

Convergence when the edge set is a fixpoint, detected via an
order-insensitive (count, xor-of-hashes) fingerprint — one cheap aggregate
per round instead of two anti-joins. ``localCheckpoint`` truncates lineage
every round; without it the plan doubles per iteration and the driver dies
at scale (SURVEY.md §4).
"""

from __future__ import annotations

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


def connected_components(
    edges: DataFrame, nodes: DataFrame, max_iter: int = 25
) -> DataFrame:
    """edges(a, b) + nodes(image_id) → clusters(image_id, cluster_id).

    Every node appears exactly once; isolated nodes are their own cluster.
    """
    spark = edges.sparkSession
    cur = (
        edges.select(
            F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint()
    )
    prev_fp = None
    for _ in range(max_iter):
        cur = _small_star(_large_star(_sym(cur))).localCheckpoint()
        fp = _fingerprint(cur)
        if fp == prev_fp:
            break
        prev_fp = fp
    else:
        raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")

    # fixpoint of star-contraction: every edge is (member, component_min)
    assign = cur.select(F.col("a").alias("image_id"), F.col("b").alias("cluster_id"))
    roots = cur.select(F.col("b").alias("image_id")).distinct().withColumn(
        "cluster_id", F.col("image_id")
    )
    labeled = assign.union(roots).dropDuplicates(["image_id"])
    singletons = nodes.join(labeled, "image_id", "left_anti").withColumn(
        "cluster_id", F.col("image_id")
    )
    _ = spark  # (kept for symmetry; session is reachable via any df)
    return labeled.union(singletons)
