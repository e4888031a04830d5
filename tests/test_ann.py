"""ANN recall gate (VERDICT r1 #3): the LSH scale path must find a pinned
fraction of the exact top-k — a vacuous bucketing (nothing co-buckets) fails
here, not silently in production.

Deterministic: fixed SRP planes (ann.ANN_SEED) + the driver's sf0.01
embeddings ⇒ recall is a constant. Measured 0.95 at (16 tables, 6 bits);
pinned with slack at 0.85.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dedup_spark.operators.ann import brute_force_topk, lsh_topk

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def emb(spark):
    return (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .select("vec_id", F.col("embedding").alias("v"))
        .cache()
    )


def _pairs(df):
    return set(map(tuple, df.select("query_id", "neighbor_id").collect()))


def test_lsh_topk_recall_floor(spark, emb):
    q = emb.where("vec_id < 8").select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    exact = _pairs(brute_force_topk(emb, q, k=10))
    approx = _pairs(lsh_topk(emb, q, dim=64, k=10, n_tables=16, bits=6))
    assert len(exact) == 80
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.85, f"LSH ANN recall collapsed: {recall:.3f}"


def test_lsh_topk_shape_and_determinism(spark, emb):
    q = emb.where("vec_id < 3").select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    out = lsh_topk(emb, q, dim=64, k=5, n_tables=8, bits=6)
    rows = out.collect()
    assert len(rows) == 15  # 3 queries x k=5 (enough candidates co-bucket)
    per_q = {}
    for r in rows:
        per_q.setdefault(r.query_id, []).append(r.rank)
        assert r.neighbor_id != r.query_id
    assert all(sorted(v) == list(range(1, 6)) for v in per_q.values())
    # deterministic planes: a rerun returns the identical neighbor set
    again = lsh_topk(emb, q, dim=64, k=5, n_tables=8, bits=6)
    assert _pairs(out) == _pairs(again)


def test_brute_force_matches_duckdb_semantics(spark, emb):
    # cross-check one query's exact neighbors against a local numpy rerank
    import numpy as np

    vecs = {r.vec_id: np.array(r.v, dtype=float) for r in emb.collect()}
    qv = vecs[0]

    def cos(a, b):
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    want = sorted(
        ((vid, cos(qv, v)) for vid, v in vecs.items() if vid != 0),
        key=lambda t: (-t[1], t[0]),
    )[:10]
    q = emb.where("vec_id = 0").select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    got = [
        r.neighbor_id
        for r in brute_force_topk(emb, q, k=10).orderBy("rank").collect()
    ]
    assert got == [vid for vid, _ in want]


def test_ivf_topk_recall_floor_on_corpus(spark, emb):
    """IVF on the (near-random) driver corpus: with 2-way data-side
    multi-assignment (the r3 default) measured recall is 0.950 at
    (32 centroids, nprobe 12) — up from 0.775 with 1-assignment, which is
    also re-measured here so a regression in either path can't hide
    (VERDICT r2 #7: floors raised to the measured margins)."""
    from dedup_spark.operators.ann import ivf_topk

    q = emb.where("vec_id < 8").select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    exact = _pairs(brute_force_topk(emb, q, k=10))
    approx = _pairs(ivf_topk(emb, q, dim=64, k=10, n_centroids=32, nprobe=12))
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.85, f"IVF ANN recall collapsed: {recall:.3f}"
    single = _pairs(
        ivf_topk(
            emb, q, dim=64, k=10, n_centroids=32, nprobe=12, data_assign=1
        )
    )
    recall1 = len(exact & single) / len(exact)
    assert recall1 >= 0.70, f"IVF 1-assign recall collapsed: {recall1:.3f}"


def test_ivf_candidate_cost_is_bounded(spark, emb):
    """The cost side of the 2-way multi-assignment trade (VERDICT r3 #6):
    recall 0.775→0.95 was bought with ~2× list storage and rerank work, so
    the mean rerank candidates per query must stay under the analytic
    ceiling nprobe·data_assign·N/n_centroids (dedup of overlapping lists
    keeps it below; measured 307/query at N=500, ceiling 375)."""
    from dedup_spark.operators.ann import ivf_candidates

    n = emb.count()
    q = emb.where("vec_id < 8").select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    cand = ivf_candidates(emb, q, dim=64, n_centroids=32, nprobe=12)
    mean_cand = cand.count() / 8
    ceiling = 12 * 2 * n / 32
    assert mean_cand <= ceiling, (
        f"IVF rerank cost blew past the probe budget: {mean_cand:.0f} "
        f"candidates/query > ceiling {ceiling:.0f}"
    )


def test_ivf_topk_high_recall_on_clustered_data(spark):
    """On genuinely clustered embeddings (IVF's home turf) a narrow probe
    already recalls ≥0.9 of the exact top-k."""
    import numpy as np
    from dedup_spark.operators.ann import ivf_topk

    rng = np.random.default_rng(77)
    centers = rng.standard_normal((20, 64)) * 3.0
    rows = []
    for i in range(1000):
        c = centers[i % 20]
        rows.append((i, (c + rng.standard_normal(64) * 0.4).tolist()))
    e = spark.createDataFrame(rows, "vec_id long, v array<double>").cache()
    q = e.where("vec_id < 8").select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    exact = _pairs(brute_force_topk(e, q, k=10))
    approx = _pairs(ivf_topk(e, q, dim=64, k=10, n_centroids=32, nprobe=4))
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, f"IVF recall on clustered data: {recall:.3f}"
