"""Approximate nearest neighbors over an embedding column (SURVEY.md
"Similarity search"; LLM-pipeline operator set).

Two paths over `array<float>` embeddings:

- ``brute_force_topk``: exact cosine top-k, O(Q*N) — correctness baseline,
  DuckDB-oracled (entry: embedding_topk). Fine when Q is small.
- ``lsh_topk``: the scale path. Sign-random-projection LSH with multiple
  OR'd tables + query-side multi-probe:

    * every vector hashes to ``n_tables`` independent ``bits``-bit SRP
      buckets (one 64-plane matrix, sliced per table — a pandas UDF over
      Arrow batches, one matmul per batch);
    * DATA rows emit one (table, bucket) row each — linear fan-out;
    * QUERY rows additionally probe every bucket at Hamming distance 1
      (flip each bit), because for top-k on weakly-clustered data the
      nearest neighbors sit near the SRP hyperplane boundaries;
    * candidates = bucket equi-join (shuffle keyed on (table, bucket) —
      never a cross join), deduped, then exact-cosine reranked and
      window-ranked to top-k.

  Recall against ``brute_force_topk`` is pinned in
  tests/test_ann.py (deterministic planes + data ⇒ deterministic recall).

Scale posture (10^12 rows): data-side fan-out is n_tables rows/vector;
the join key space is n_tables * 2^bits, so bucket occupancy ~ N/2^bits per
table — tune ``bits`` up with log2(N). SRP buckets on high-dim data are
near-balanced (no power-law key like text LSH), and the rerank is
O(candidates), not O(N*Q). For harder recall targets raise n_tables or
probe radius, not the per-bucket scan.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

ANN_SEED = 0xA11CE


def _planes(dim: int, n_tables: int, bits: int) -> np.ndarray:
    rng = np.random.default_rng(ANN_SEED)
    return rng.standard_normal((n_tables * bits, dim))


def _as_double(df: DataFrame, vec_col: str) -> DataFrame:
    return df.withColumn(
        vec_col, F.transform(vec_col, lambda x: x.cast("double"))
    )


def srp_buckets(
    df: DataFrame, vec_col: str, dim: int, n_tables: int = 8, bits: int = 8,
    probe: bool = False,
) -> DataFrame:
    """→ input columns + (table, bucket). One output row per (row, table)
    — plus per flipped bit when ``probe`` (query side only)."""
    planes = _planes(dim, n_tables, bits)
    n_keys = n_tables * (1 + bits) if probe else n_tables

    @F.pandas_udf(ArrayType(LongType()))
    def keys_udf(vs: pd.Series) -> pd.Series:
        arr = np.stack(vs.to_numpy())
        bm = (arr @ planes.T) > 0                       # (n, tables*bits)
        bm = bm.reshape(len(arr), n_tables, bits)
        weights = 1 << np.arange(bits, dtype=np.int64)
        base = (bm * weights).sum(axis=2)               # (n, tables)
        # key = table_idx * 2^bits + bucket → single long join key
        tb = np.arange(n_tables, dtype=np.int64) << bits
        out = [base + tb]
        if probe:
            for b in range(bits):
                out.append((base ^ (1 << b)) + tb)
        keys = np.concatenate(out, axis=1)              # (n, n_keys)
        return pd.Series(list(keys))

    assert n_keys  # documents the fan-out for the caller
    return df.withColumn("tb", F.explode(keys_udf(F.col(vec_col)))).select(
        *df.columns, "tb"
    )


def lsh_topk(
    emb: DataFrame, queries: DataFrame, dim: int, k: int = 10,
    n_tables: int = 8, bits: int = 8,
) -> DataFrame:
    """emb(vec_id, v) x queries(query_id, qv) → (query_id, neighbor_id, rank).

    Same output shape as brute_force_topk so recall is a set intersection.
    """
    data_b = srp_buckets(_as_double(emb, "v"), "v", dim, n_tables, bits)
    query_b = srp_buckets(
        _as_double(queries, "qv"), "qv", dim, n_tables, bits, probe=True
    )
    cand = (
        query_b.select("query_id", "tb")
        .join(data_b.select("vec_id", "tb"), "tb")
        .where(F.col("query_id") != F.col("vec_id"))
        .select("query_id", "vec_id")
        .distinct()
    )
    scored = (
        cand.join(_as_double(emb, "v"), "vec_id")
        .join(_as_double(queries, "qv"), "query_id")
        .select("query_id", "vec_id", _cosine("qv", "v").alias("sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.col("rank").cast("long").alias("rank"),
        )
    )


def _cosine(a: str, b: str):
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, z: acc + z
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, z: acc + z * z))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, z: acc + z * z))
    return dot / (na * nb)


def brute_force_topk(
    emb: DataFrame, queries: DataFrame, k: int = 10
) -> DataFrame:
    """Exact cosine top-k (the O(Q*N) baseline; broadcast the query side)."""
    sims = (
        F.broadcast(_as_double(queries, "qv"))
        .crossJoin(_as_double(emb, "v"))
        .where(F.col("query_id") != F.col("vec_id"))
        .select("query_id", "vec_id", _cosine("qv", "v").alias("sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.col("rank").cast("long").alias("rank"),
        )
    )
