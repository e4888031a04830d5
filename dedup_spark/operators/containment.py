"""Suffix-array substring containment pass (SURVEY.md §2 B21/B22).

Distributed scheme (exact for contained captions ≥ min_len chars):

1. every captioned row emits the hashes of ALL its distinct min_len-char
   grams (vectorized sliding-window mix — internal keys, collisions only add
   spurious group members) plus its ANCHOR gram (the first min_len chars);
2. anchors equi-join the gram index: if caption A ⊆ caption B then A's
   anchor gram literally occurs in B, so (A, B) co-occur on A's anchor key —
   recall 1.0 by construction;
3. each anchor-gram group (pattern docs + holder docs) goes through a
   grouped-map pandas UDF that builds ONE suffix array over the group's
   NUL-joined captions and binary-searches each pattern doc
   (functions.suffix) — emitting only true containments;
4. oversized groups (boilerplate grams) are capped and LOGGED, mirroring the
   LSH hot-bucket policy (operators.skew).

The gram index is O(total caption chars) rows — the same asymptotics as the
corpus-level suffix-array dedup of Lee et al. 2022 ("Deduplicating Training
Data Makes Language Models Better"), but shuffle-partitioned by gram key
instead of globally sorted.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from dedup_spark.config import DEFAULT_CONFIG, PipelineConfig
from dedup_spark.functions.hashing import to_signed64
from dedup_spark.functions.minhash import splitmix64
from dedup_spark.functions.suffix import containment_pairs

_GRAMS_SCHEMA = StructType(
    [
        StructField("image_id", StringType(), False),
        StructField("anchor", LongType(), True),
        StructField("grams", ArrayType(LongType(), False), False),
    ]
)

_PAIRS_SCHEMA = StructType(
    [StructField("a", StringType(), False), StructField("b", StringType(), False)]
)


def _gram_hashes_one(text: bytes, q: int) -> np.ndarray:
    """Distinct 64-bit hashes of all q-byte grams, vectorized sliding window."""
    arr = np.frombuffer(text, dtype=np.uint8)
    if len(arr) < q:
        return np.empty(0, dtype=np.uint64)
    win = np.lib.stride_tricks.sliding_window_view(arr, q).astype(np.uint64)
    h = np.zeros(win.shape[0], dtype=np.uint64)
    for c in range(q):
        h = splitmix64(h ^ win[:, c])
    return np.unique(h)


def gram_index(sigs: DataFrame, cfg: PipelineConfig = DEFAULT_CONFIG) -> DataFrame:
    """(image_id, anchor, grams) for captions long enough to be contained."""
    q = cfg.suffix_min_len

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, anchors, grams = [], [], []
            for iid, norm in zip(pdf["image_id"], pdf["caption_norm"]):
                b = norm.encode("utf-8")
                g = _gram_hashes_one(b, q)
                if len(g) == 0:
                    continue
                first = _gram_hashes_one(b[:q], q)
                ids.append(iid)
                anchors.append(int(to_signed64(first)[0]) if len(first) else None)
                grams.append(to_signed64(g).tolist())
            yield pd.DataFrame(
                {"image_id": ids, "anchor": anchors, "grams": grams},
                columns=["image_id", "anchor", "grams"],
            )

    from dedup_spark.session import py_parallelism

    return (
        sigs.select("image_id", "caption_norm")
        .coalesce(py_parallelism(sigs.sparkSession))
        .mapInPandas(run, schema=_GRAMS_SCHEMA)
    )


def containment_candidates(
    gram_df: DataFrame, cfg: PipelineConfig = DEFAULT_CONFIG, group_cap: int = 1000
) -> tuple[DataFrame, DataFrame]:
    """→ (group membership rows, skipped-group log).

    Membership: (gram, image_id, is_pattern) — holders of each anchor gram
    plus the anchored pattern docs themselves.
    """
    holders = gram_df.select(
        "image_id", F.explode("grams").alias("gram")
    )
    anchors = gram_df.where(F.col("anchor").isNotNull()).select(
        F.col("anchor").alias("gram"), F.col("image_id")
    )
    # keep only grams that are someone's anchor: semi-join prunes the index
    # to the tiny fraction that can seed a containment group
    anchor_keys = anchors.select("gram").distinct()
    members = holders.join(anchor_keys, "gram", "left_semi")
    pat = anchors.withColumn("is_pattern", F.lit(True))
    mem = members.withColumn("is_pattern", F.lit(False))
    both = pat.unionByName(mem)

    sizes = both.groupBy("gram").agg(F.count("*").alias("n"))
    skipped = sizes.where(F.col("n") > group_cap)
    # singleton groups (an anchor gram occurring only in its own doc — the
    # overwhelming majority) cannot produce a pair; dropping them before the
    # grouped-map UDF removes ~95% of the per-group invocation overhead,
    # which is what the suffix stage's wall-clock is actually made of
    viable = sizes.where((F.col("n") > 1) & (F.col("n") <= group_cap))
    kept = both.join(viable.select("gram"), "gram", "left_semi")
    return kept, skipped


def containment_pairs_df(
    membership: DataFrame, sigs: DataFrame, cfg: PipelineConfig = DEFAULT_CONFIG
) -> DataFrame:
    """Suffix-array pass over each anchor-gram group → (a, b).

    NOT applyInPandas: per-group grouped-map pays Arrow + pandas setup for
    every group, and anchor groups are tiny and numerous (tens of thousands
    of 2–15 member groups), so the fixed per-group cost dwarfs the actual
    suffix-array work by ~30×. Instead: repartition on gram, sort within
    partitions, and run ONE mapInPandas whose batches each carry many
    complete groups — the group that straddles a batch boundary is carried
    into the next batch (batches of one partition arrive in order).
    """
    min_len = cfg.suffix_min_len
    with_text = membership.join(
        sigs.select("image_id", "caption_norm"), "image_id"
    )

    def emit(pdf: pd.DataFrame) -> pd.DataFrame:
        out_a: list[str] = []
        out_b: list[str] = []
        for _, grp in pdf.groupby("gram", sort=False):
            uniq = grp.drop_duplicates("image_id")
            if len(uniq) < 2:
                continue
            pairs = containment_pairs(
                uniq["image_id"].tolist(), uniq["caption_norm"].tolist(), min_len
            )
            for a, b in pairs:
                out_a.append(a)
                out_b.append(b)
        return pd.DataFrame({"a": out_a, "b": out_b})

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        carry: pd.DataFrame | None = None
        for pdf in batches:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
            if not len(pdf):
                continue
            last = pdf["gram"].iloc[-1]
            boundary = pdf["gram"] == last
            carry = pdf[boundary]
            done = pdf[~boundary]
            if len(done):
                yield emit(done)
        if carry is not None and len(carry):
            yield emit(carry)

    from dedup_spark.session import py_parallelism

    nparts = py_parallelism(membership.sparkSession)
    return (
        with_text.repartition(nparts, "gram")
        .sortWithinPartitions("gram")
        .mapInPandas(run, schema=_PAIRS_SCHEMA)
        .dropDuplicates(["a", "b"])
    )


def containment_stage(
    sigs: DataFrame, cfg: PipelineConfig = DEFAULT_CONFIG, group_cap: int = 1000
) -> tuple[DataFrame, DataFrame]:
    """sigs → (containment pairs (a,b), skipped-group log).

    The gram index is localCheckpoint'd: it feeds both the holder explode and
    the anchor extraction, and mapInPandas cannot column-prune, so an
    unmaterialized index would run the sliding-window UDF twice per action.
    """
    gi = gram_index(sigs, cfg).localCheckpoint()
    membership, skipped = containment_candidates(gi, cfg, group_cap)
    return containment_pairs_df(membership, sigs, cfg), skipped
