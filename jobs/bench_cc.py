"""Micro-benchmark for the t_clusters serial term (VERDICT r2 #3).

Builds a synthetic edge set shaped like the flagship's (hierarchical string
ids; dup clusters emitting star edges to several alternative roots, the way
multiple LSH bands each pick their own bucket representative; plus random
cross edges) and times:

- r2 path: single task over STRING pairs (object-dtype np.unique — the shape
  that measured a flat ~68 s inside t_clusters at n=3.2M/16c);
- r3 path: operators.cc.connected_components (xxhash64 int64-coded single
  task + distributed min-id relabel).

Usage: python jobs/bench_cc.py [n_nodes] [cores] [bands]
"""

from __future__ import annotations

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main() -> None:
    n_nodes = int(sys.argv[1]) if len(sys.argv) > 1 else 3_200_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    bands = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    import pandas as pd
    from pyspark.sql import functions as F

    from dedup_spark.operators import cc
    from dedup_spark.session import get_spark

    spark = get_spark(app="bench_cc", master=f"local[{cores}]")

    def id_str(idcol):
        return F.concat(
            F.lit("ds"), (idcol % 4).cast("string"), F.lit("/shard"),
            ((idcol / 4096).cast("long") % 64).cast("string"),
            F.lit("/img_"), F.lpad(idcol.cast("string"), 9, "0"),
        )

    base = spark.range(n_nodes).select(
        F.col("id"), id_str(F.col("id")).alias("image_id")
    )
    # 40% of rows sit in 4-member clusters; each "band" links every member
    # to a band-dependent representative of its cluster (root id = cluster
    # base + band%4) — the star-edge shape salted LSH banding produces
    cluster_base = (F.col("id") / 4).cast("long") * 4
    in_cluster = (F.col("id") % 10) < 4
    star = None
    for band in range(bands):
        root = cluster_base + (band % 4)
        e = base.where(in_cluster & (F.col("id") != root)).select(
            F.col("image_id").alias("a"), id_str(root).alias("b")
        )
        star = e if star is None else star.union(e)
    rnd_tgt = (F.col("id") * 2654435761) % n_nodes
    rnd = base.where(F.col("id") % 10 == 5).select(
        F.col("image_id").alias("a"), id_str(rnd_tgt).alias("b")
    )
    edges = star.union(rnd).where(F.col("a") != F.col("b")).localCheckpoint()
    nodes = base.select("image_id").localCheckpoint()
    n_edges = edges.count()
    print(f"nodes={n_nodes} edges={n_edges} cores={cores}", flush=True)

    # --- r3 path ---
    t0 = time.perf_counter()
    out = cc.connected_components(edges, nodes)
    n_rows = out.count()
    t_new = time.perf_counter() - t0
    print(f"r3 int-coded path: {t_new:.1f}s ({n_rows} rows)", flush=True)

    # --- r2 path (string single-task) for comparison ---
    def run(batches):
        frames = [pdf for pdf in batches if len(pdf)]
        if not frames:
            return
            yield
        df = pd.concat(frames, ignore_index=True)
        yield cc._numpy_components(df["a"].to_numpy(), df["b"].to_numpy())

    t0 = time.perf_counter()
    dedup = (
        edges.select(F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b"))
        .where(F.col("a") != F.col("b")).distinct()
    )
    labeled = dedup.repartition(1).mapInPandas(
        run, schema="image_id string, cluster_id string"
    )
    singles = nodes.join(labeled, "image_id", "left_anti").withColumn(
        "cluster_id", F.col("image_id")
    )
    n_rows_old = labeled.union(singles).count()
    t_old = time.perf_counter() - t0
    print(f"r2 string path:    {t_old:.1f}s ({n_rows_old} rows)", flush=True)
    print(f"speedup: {t_old / t_new:.2f}x", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
