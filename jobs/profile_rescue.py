"""One-off profiler for the t_rescued stage (diagnosis, not shipped path).

Builds the pipeline up to t_verified on a kept store (resume makes the
second invocation skip straight to the probe), then times each sub-step of
the orphan-rescue computation separately at the given parallelism.

Usage: python jobs/profile_rescue.py --n 800000 --cores 16
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=800000)
    p.add_argument("--seed", type=int, default=4242)
    p.add_argument("--cores", type=int, default=16)
    p.add_argument("--store", default=None)
    args = p.parse_args()

    from pyspark.sql import functions as F

    from dedup_spark.config import DEFAULT_CONFIG as cfg
    from dedup_spark.operators import exact, pairs as pairs_op, verify
    from dedup_spark.plans.pipeline import run_pipeline
    from dedup_spark.session import get_spark

    store = args.store or f"/dev/shm/profile_rescue_{args.n}"
    input_path = f"/dev/shm/scale_input_{args.n}_{args.seed}"
    spark = get_spark(app="profile_rescue", master=f"local[{args.cores}]")
    if not os.path.exists(os.path.join(input_path, "_SUCCESS")):
        from dedup_spark.sources.gen_images import gen_images

        gen_images(spark, args.n, args.seed).write.mode("overwrite").parquet(
            input_path
        )
    images = spark.read.parquet(input_path)
    run_pipeline(spark, images, store, run_id="prof", input_token=input_path)

    t_sigs = spark.read.parquet(f"{store}/t_sigs")
    t_salted = spark.read.parquet(f"{store}/t_salted")
    t_verified = spark.read.parquet(f"{store}/t_verified")
    t_hamming = spark.read.parquet(f"{store}/t_hamming")

    def timed(name, fn):
        t0 = time.perf_counter()
        out = fn()
        print(f"{name:28s} {time.perf_counter() - t0:8.2f}s  {out}")
        return out

    mh = t_salted.where(F.col("family") == "minhash").drop("hot")
    timed("mh_salted count", lambda: mh.count())

    true_col = F.lit(True).alias("verified")
    judged = (
        t_verified.select("a", "b", "verified")
        .unionByName(t_hamming.select("a", "b", true_col))
        .unionByName(exact.exact_edges(t_sigs).select("a", "b", true_col))
    )
    timed("judged count", lambda: judged.count())

    ok = judged.where("verified")
    linked = (
        ok.select(F.col("a").alias("image_id"))
        .unionByName(ok.select(F.col("b").alias("image_id")))
        .distinct()
    )
    timed("linked count", lambda: linked.count())

    orphan_ids = (
        mh.select("image_id").distinct().join(linked, "image_id", "left_anti")
    ).localCheckpoint()
    timed("orphan_ids count", lambda: orphan_ids.count())

    skey = ["family", "band_idx", "band_key", "salt"]
    orphans = mh.join(orphan_ids, "image_id", "leftsemi").select(
        *skey, F.col("image_id").alias("o")
    ).localCheckpoint()
    timed("orphan rows count", lambda: orphans.count())

    members = mh.select(*skey, F.col("image_id").alias("m"))
    cand_raw = orphans.join(members, skey).where(F.col("o") != F.col("m"))
    timed("cand_raw count", lambda: cand_raw.count())

    cand = cand_raw.select(
        F.least("o", "m").alias("a"),
        F.greatest("o", "m").alias("b"),
        F.col("o"),
    ).dropDuplicates(["a", "b"])
    timed("cand dedup count", lambda: cand.count())

    full = pairs_op.orphan_rescue_pairs(mh, judged)
    timed("full rescue pairs count", lambda: full.count())
    timed(
        "rescue verify count",
        lambda: verify.rescue_verify_pairs(full, t_sigs, cfg).count(),
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
