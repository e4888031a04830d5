"""Phase-level profiler for the suffix-containment stage (VERDICT r4 #3).

t_containment is ~49% of the 16-core arm at n=3.2M and scales only ~2.6x
from 4 to 16 cores (BENCH/r4_isolated_3200k.log), with a ±12% run-to-run
band concentrated in this stage. This job decomposes the stage into its
phases over an EXISTING t_sigs table (e.g. the one a killed scaling run
left behind) so each phase's scaling and skew can be measured directly
instead of inferred from whole-pipeline runs:

  A  gram_index (winnowing mapInPandas) + localCheckpoint
  B  anchor count (the broadcast-gate action)
  C  membership semi-join + localCheckpoint
  D  group-size census + viable filter
  E  caption join + repartition(gram) + sort + suffix-array mapInPandas
     + dropDuplicates

plus distribution diagnostics: group-size histogram, char-mass of the top
groups, and the per-partition char-load imbalance of the final UDF's hash
partitioning (the direct cause of straggler tasks if it is lopsided).

Usage:
  python jobs/profile_containment.py --sigs /dev/shm/<store>/t_sigs \
      --cores 16 [--frac 0.25] [--phases AE] [--json out.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--sigs", required=True, help="path to a t_sigs parquet dir")
    p.add_argument("--cores", type=int, default=16)
    p.add_argument("--frac", type=float, default=1.0,
                   help="uniform doc subsample (hash of image_id)")
    p.add_argument("--phases", default="ABCDE")
    p.add_argument("--json", default=None)
    args = p.parse_args()

    from pyspark.sql import functions as F

    from dedup_spark.config import DEFAULT_CONFIG
    from dedup_spark.operators import containment
    from dedup_spark.session import get_spark, py_parallelism

    spark = get_spark(app="profile_containment", master=f"local[{args.cores}]")
    cfg = DEFAULT_CONFIG
    out: dict = {"cores": args.cores, "frac": args.frac, "phases": {}}

    sigs = spark.read.parquet(args.sigs).select("image_id", "caption_norm")
    if args.frac < 1.0:
        mod = 1_000_000
        sigs = sigs.where(
            F.pmod(F.xxhash64("image_id"), F.lit(mod)) < int(args.frac * mod)
        )
    sigs = sigs.localCheckpoint()  # isolate scan cost from phase A
    out["n_docs"] = sigs.count()

    def clock(name: str, fn):
        t0 = time.monotonic()
        r = fn()
        dt = round(time.monotonic() - t0, 2)
        out["phases"][name] = {"sec": dt, **(r or {})}
        print(f"[{name}] {dt}s {r or ''}", flush=True)

    gi = None
    if "A" in args.phases:
        def run_a():
            nonlocal gi
            gi = containment.gram_index(sigs, cfg).localCheckpoint()
            return {"index_rows": gi.count()}
        clock("A_gram_index", run_a)
    else:
        gi = containment.gram_index(sigs, cfg).localCheckpoint()

    if "B" in args.phases:
        clock("B_anchor_count",
              lambda: {"anchors": gi.where("is_anchor").count()})

    membership = skipped = None
    if "C" in args.phases or "D" in args.phases or "E" in args.phases:
        def run_cd():
            nonlocal membership, skipped
            membership, skipped = containment.containment_candidates(gi, cfg)
            return {"member_rows": membership.count(),
                    "skipped_groups": skipped.count()}
        clock("CD_candidates", run_cd)

    if "D" in args.phases:
        # distribution diagnostics (not part of the timed production stage)
        sizes = membership.groupBy("gram").agg(F.count("*").alias("n"))
        hist = (
            sizes.groupBy(
                F.floor(F.log2("n")).cast("int").alias("log2_size")
            )
            .agg(F.count("*").alias("groups"), F.sum("n").alias("members"))
            .orderBy("log2_size")
            .collect()
        )
        out["group_hist"] = [
            {"log2_size": r["log2_size"], "groups": r["groups"],
             "members": r["members"]}
            for r in hist
        ]
        # char-mass per final-UDF partition under the production hash layout
        nparts = py_parallelism(spark)
        with_text = membership.join(
            sigs.select("image_id", F.length("caption_norm").alias("chars")),
            "image_id",
        )
        load = (
            with_text.groupBy(F.pmod(F.hash("gram"), F.lit(nparts)).alias("part"))
            .agg(F.sum("chars").alias("chars"), F.count("*").alias("rows"))
            .orderBy("part")
            .collect()
        )
        chars = [r["chars"] for r in load]
        out["udf_partitions"] = {
            "nparts": nparts,
            "chars": chars,
            "imbalance_max_over_mean": round(
                max(chars) / (sum(chars) / len(chars)), 3
            ) if chars else None,
        }
        print(f"[D] group_hist={out['group_hist']}", flush=True)
        print(f"[D] udf_partitions={out['udf_partitions']}", flush=True)

    if "E" in args.phases:
        clock("E_suffix_udf", lambda: {
            "pairs": containment.containment_pairs_df(membership, sigs, cfg)
            .count()
        })

    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=2)
    print(json.dumps(out), flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
