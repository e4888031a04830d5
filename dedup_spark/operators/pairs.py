"""Candidate pair generation (SURVEY.md §2 B19/B20).

In-bucket self-equi-join on (family, band_idx, band_key, salt) with a < b,
then cross-family/band dedup to distinct (a, b). The join shuffles both
sides on the bucket key — after salting, every bucket is ≤ ~cap members, so
the per-key work is bounded and the shuffle is skew-free by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_KEY = ["family", "band_idx", "band_key", "salt"]


def candidate_pairs(salted_bands: DataFrame) -> DataFrame:
    x = salted_bands.select(*_KEY, F.col("image_id").alias("a"))
    y = salted_bands.select(*_KEY, F.col("image_id").alias("b"))
    pairs = (
        x.join(y, _KEY, "inner")
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
    )
    # distinct = partial+final agg on (a,b); a pair found by 16 minhash bands
    # and 8 phash bands still verifies exactly once
    return pairs.dropDuplicates(["a", "b"])


def union_pairs(*pair_dfs: DataFrame) -> DataFrame:
    """Cross-family union → distinct (a, b) (B20)."""
    out = None
    for df in pair_dfs:
        d = df.select("a", "b")
        out = d if out is None else out.unionByName(d)
    return out.dropDuplicates(["a", "b"])
