"""Explicit hot-bucket skew handling (SURVEY.md §2 B18/B29; north rule:
"partitioning / shuffle / skew handled explicitly").

LSH buckets follow a power law — boilerplate captions ("a photo of …") drive
some band keys to millions of members, and the in-bucket pair self-join is
quadratic in bucket size. AQE's skew-join split cannot fix a quadratic
blow-up, only uneven partition sizes, so we defuse it at the algorithm level:

1. census: bucket sizes via one hash aggregate;
2. singleton buckets are dropped (no pairs possible);
3. buckets over ``cfg.bucket_cap`` get a deterministic per-member salt
   pmod(xxhash64(image_id), fanout), fanout = min(ceil(size/cap), salt_fanout),
   so each sub-bucket stays ≤ ~cap and pair generation is bounded by
   size * cap instead of size^2;
4. the candidate loss (cross-sub-bucket pairs of that band) is *counted and
   logged* — recall accounting stays honest; other bands/families recover
   the true pairs (verified in the golden recall test).

The census is joined back BROADCAST: only hot buckets (> cap) are shipped,
a tiny set by construction, so the big band table is never reshuffled twice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dedup_spark.config import DEFAULT_CONFIG, PipelineConfig

_KEY = ["family", "band_idx", "band_key"]


def bucket_census(bands: DataFrame) -> DataFrame:
    return bands.groupBy(*_KEY).agg(F.count("*").alias("bucket_size"))


def salted_bands(
    bands: DataFrame, cfg: PipelineConfig = DEFAULT_CONFIG
) -> tuple[DataFrame, DataFrame]:
    """→ (salted band table, skew report).

    Salted table: (image_id, family, band_idx, band_key, salt) with
    singleton buckets removed. Skew report: one row per hot bucket with its
    size, fanout, and estimated lost candidate pairs.
    """
    census = bucket_census(bands)
    multi = census.where(F.col("bucket_size") > 1)
    hot = multi.where(F.col("bucket_size") > cfg.bucket_cap).withColumn(
        "fanout",
        F.least(
            F.ceil(F.col("bucket_size") / cfg.bucket_cap).cast("int"),
            F.lit(cfg.salt_fanout),
        ),
    )

    # pairs lost in a salted bucket ≈ C(n,2) - fanout * C(n/fanout, 2)
    n = F.col("bucket_size").cast("double")
    f = F.col("fanout").cast("double")
    skew_report = hot.withColumn(
        "est_lost_pairs",
        (n * (n - 1) / 2 - f * ((n / f) * (n / f - 1) / 2)).cast("long"),
    )

    # only the HOT bucket list is broadcast (tiny by construction); singleton
    # buckets need no explicit filter — the in-bucket self-join emits nothing
    # for them, and AQE coalesces their empty shuffle partitions.
    salted = (
        bands.join(F.broadcast(hot.select(*_KEY, "fanout")), _KEY, "left")
        .withColumn(
            "salt",
            F.when(
                F.col("fanout").isNotNull(),
                F.pmod(F.xxhash64("image_id"), F.col("fanout")).cast("int"),
            ).otherwise(F.lit(0)),
        )
        # `hot` tells pair generation to switch from the quadratic in-bucket
        # self-join to linear star edges (operators.pairs) — a mega-cluster of
        # k boilerplate captions must cost O(k) candidates, not O(k^2/fanout)
        .withColumn("hot", F.col("fanout").isNotNull())
        .drop("fanout")
    )
    return salted, skew_report
