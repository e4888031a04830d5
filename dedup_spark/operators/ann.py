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

    _ = n_keys  # fan-out per row: n_tables, or n_tables*(1+bits) when probing
    return df.withColumn("tb", F.explode(keys_udf(F.col(vec_col)))).select(
        *df.columns, "tb"
    )


def lsh_candidates(
    emb: DataFrame, queries: DataFrame, dim: int,
    n_tables: int = 8, bits: int = 8,
) -> DataFrame:
    """Distinct (query_id, vec_id) candidate pairs from the bucket
    equi-join — exposed so the rerank COST (candidates per query) is
    measurable alongside recall (VERDICT r3 #6), not just inferable."""
    data_b = srp_buckets(_as_double(emb, "v"), "v", dim, n_tables, bits)
    query_b = srp_buckets(
        _as_double(queries, "qv"), "qv", dim, n_tables, bits, probe=True
    )
    return (
        query_b.select("query_id", "tb")
        .join(data_b.select("vec_id", "tb"), "tb")
        .where(F.col("query_id") != F.col("vec_id"))
        .select("query_id", "vec_id")
        .distinct()
    )


def _rerank(
    cand: DataFrame, emb: DataFrame, queries: DataFrame, k: int
) -> DataFrame:
    """Exact-cosine rerank of candidate pairs → (query_id, neighbor_id,
    rank); O(candidates), the shared tail of both ANN scale paths."""
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


def lsh_topk(
    emb: DataFrame, queries: DataFrame, dim: int, k: int = 10,
    n_tables: int = 8, bits: int = 8,
) -> DataFrame:
    """emb(vec_id, v) x queries(query_id, qv) → (query_id, neighbor_id, rank).

    Same output shape as brute_force_topk so recall is a set intersection.
    """
    return _rerank(
        lsh_candidates(emb, queries, dim, n_tables, bits), emb, queries, k
    )


def _cosine(a: str, b: str):
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, z: acc + z
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, z: acc + z * z))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, z: acc + z * z))
    return dot / (na * nb)


def _kmeans(sample: np.ndarray, n_centroids: int, iters: int = 15,
            seed: int = ANN_SEED) -> np.ndarray:
    """Deterministic mini k-means over L2-normalized sample rows (numpy).

    The sample is BOUNDED (caller collects a fixed-size, deterministic
    slice), so training is O(sample · centroids · iters) on the driver —
    the standard IVF recipe: train small, assign distributed.
    """
    norms = np.linalg.norm(sample, axis=1, keepdims=True)
    x = sample / np.maximum(norms, 1e-12)
    rng = np.random.default_rng(seed)
    c = x[rng.choice(len(x), size=min(n_centroids, len(x)), replace=False)]
    for _ in range(iters):
        sims = x @ c.T
        assign = sims.argmax(axis=1)
        for j in range(len(c)):
            members = x[assign == j]
            if len(members):
                m = members.mean(axis=0)
                c[j] = m / max(np.linalg.norm(m), 1e-12)
    return c


def ivf_topk(
    emb: DataFrame, queries: DataFrame, dim: int, k: int = 10,
    n_centroids: int = 64, nprobe: int = 8, train_sample: int = 2048,
    data_assign: int = 2,
) -> DataFrame:
    """IVF (inverted-file) ANN: k-means coarse quantizer, cosine rerank.

    - TRAIN: a deterministic bounded sample (lowest vec_ids) is collected
      and k-means'd on the driver — fixed size regardless of corpus scale;
    - ASSIGN: every data row posts to its ``data_assign`` nearest centroids
      (one pandas-UDF matmul per Arrow batch) — multi-assignment: a row
      near a Voronoi boundary lives in both adjacent lists, which is where
      IVF recall dies on weakly clustered corpora. Measured on the driver's
      near-random sf0.01 embeddings at (32 lists, nprobe 12): recall 0.775
      with 1-assignment → 0.950 with 2-assignment, for 2× list storage and
      ~2× rerank candidates (r3; pinned in tests/test_ann.py);
    - PROBE: queries explode to their ``nprobe`` nearest centroids, join on
      the list key (shuffle keyed on centroid id, never a cross join), and
      candidates rerank by exact cosine to top-k.

    Same output shape as brute_force_topk/lsh_topk so recall is comparable.
    At 10^12 rows grow n_centroids ~ sqrt(N) and train on a bigger sample;
    the per-list scan is N/n_centroids · nprobe · data_assign per query.
    """
    return _rerank(
        ivf_candidates(
            emb, queries, dim, n_centroids, nprobe, train_sample, data_assign
        ),
        emb, queries, k,
    )


def ivf_candidates(
    emb: DataFrame, queries: DataFrame, dim: int,
    n_centroids: int = 64, nprobe: int = 8, train_sample: int = 2048,
    data_assign: int = 2,
) -> DataFrame:
    """Distinct (query_id, vec_id) candidates from the IVF list join —
    exposed so the probe COST of multi-assignment is measurable (the 2-way
    assignment bought recall 0.775→0.95 for ~2× rerank candidates; the
    candidate count per query pins the cost side of that trade)."""
    sample_rows = (
        _as_double(emb, "v").orderBy("vec_id").limit(train_sample).collect()
    )
    centroids = _kmeans(
        np.array([r["v"] for r in sample_rows], dtype=np.float64), n_centroids
    )

    def _assign_udf(top: int):
        @F.pandas_udf(ArrayType(LongType()))
        def assign(vs: pd.Series) -> pd.Series:
            arr = np.stack(vs.to_numpy())
            arr = arr / np.maximum(
                np.linalg.norm(arr, axis=1, keepdims=True), 1e-12
            )
            sims = arr @ centroids.T
            idx = np.argsort(-sims, axis=1)[:, :top].astype(np.int64)
            return pd.Series(list(idx))

        return assign

    data_b = _as_double(emb, "v").withColumn(
        "cid", F.explode(_assign_udf(data_assign)(F.col("v")))
    )
    query_b = _as_double(queries, "qv").withColumn(
        "cid", F.explode(_assign_udf(nprobe)(F.col("qv")))
    )
    return (
        query_b.select("query_id", "cid")
        .join(data_b.select("vec_id", "cid"), "cid")
        .where(F.col("query_id") != F.col("vec_id"))
        .select("query_id", "vec_id")
        .distinct()
    )


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
