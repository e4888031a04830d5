"""LSH banding → long-format band table (SURVEY.md §2 B14/B16/B17).

Output: (image_id, family, band_idx, band_key) with families
  minhash : posexplode of the precomputed 16 band keys (zero-shingle rows
            are excluded — the empty-signature sentinel must not bucket)
  simhash : 4 x 16-bit slices via built-in shiftrightunsigned/and (codegen'd)
  phash   : 8 x 8-bit slices, same built-ins

The long format makes candidate generation one self-equi-join keyed on
(family, band_idx, band_key) — the natural shuffle key, and the unit the
skew census (operators.skew) salts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dedup_spark.config import DEFAULT_CONFIG, PipelineConfig


def _hamming_bands_df(
    sigs: DataFrame, col: str, family: str, bands: int, band_bits: int
) -> DataFrame:
    mask = (1 << band_bits) - 1
    keys = F.array(
        *[
            F.shiftrightunsigned(F.col(col), j * band_bits).bitwiseAND(F.lit(mask))
            for j in range(bands)
        ]
    )
    return sigs.select(
        "image_id", F.posexplode(keys).alias("band_idx", "band_key")
    ).select("image_id", F.lit(family).alias("family"), "band_idx", "band_key")


def band_table(sigs: DataFrame, cfg: PipelineConfig = DEFAULT_CONFIG) -> DataFrame:
    with_caption = sigs.where(F.col("n_shingles") > 0)
    mh = with_caption.select(
        "image_id", F.posexplode("minhash_bands").alias("band_idx", "band_key")
    ).select("image_id", F.lit("minhash").alias("family"), "band_idx", "band_key")
    sim = _hamming_bands_df(
        with_caption, "simhash", "simhash", cfg.simhash_bands, cfg.simhash_band_bits
    )
    ph = _hamming_bands_df(
        sigs, "phash", "phash", cfg.phash_bands, cfg.phash_band_bits
    )
    return mh.unionByName(sim).unionByName(ph)
