"""dedup_spark — a from-scratch PySpark-native near-duplicate detection and
clustering engine.

Generalizes the semantics of the reference (boblaublaw/dedup — a single-process
file/directory redundancy eliminator; see SURVEY.md §0 for why no file:line
citations into /root/reference are possible) to a distributed pipeline over an
Iceberg/Parquet table of image+caption pairs:

- exact duplicates via content-hash groupBy  (reference: per-file digest walk)
- near-duplicates via MinHash-over-caption-shingles, SimHash, and pHash
  Hamming LSH bands, with explicit hot-bucket salting
- substring-level caption containment via a suffix-array pass
- candidate verification by exact signature comparison
- clustering by DataFrame-iterative connected components (large-star/small-star)
- winner selection per cluster              (reference: keep-one, rest redundant)
- hierarchical prefix rollup                (reference: directory digest rollup)
- checkpointed, resumable stages with per-partition lineage + metrics

All heavy math is numpy inside Arrow-vectorized pandas UDFs; no per-row Python
UDFs anywhere (BASELINE.json:15).
"""

from dedup_spark.config import PipelineConfig, DEFAULT_CONFIG

__all__ = ["PipelineConfig", "DEFAULT_CONFIG"]
__version__ = "0.1.0"
