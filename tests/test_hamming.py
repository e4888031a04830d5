"""In-bucket exact Hamming verification (operators.hamming): spanning-edge
connectivity equals the threshold graph's components; Spark path matches a
brute-force oracle on random buckets."""

import numpy as np
import pandas as pd
import networkx as nx
from hypothesis import given, settings
from hypothesis import strategies as st

from dedup_spark.operators.hamming import _bucket_edges, hamming_family_pairs


def _brute_components(hv, thr):
    g = nx.Graph()
    g.add_nodes_from(range(len(hv)))
    for i in range(len(hv)):
        for j in range(i + 1, len(hv)):
            if int(np.uint64(hv[i]) ^ np.uint64(hv[j])).bit_count() <= thr:
                g.add_edge(i, j)
    return {frozenset(c) for c in nx.connected_components(g) if len(c) > 1}


@given(st.integers(0, 10_000), st.integers(2, 40), st.integers(0, 12))
@settings(max_examples=60, deadline=None)
def test_bucket_edges_components_match_bruteforce(seed, m, thr):
    rng = np.random.default_rng(seed)
    # mix of clustered values (small perturbations) and random ones
    base = rng.integers(0, 2**63, size=max(m // 3, 1), dtype=np.uint64)
    vals = []
    for _ in range(m):
        b = base[rng.integers(0, len(base))]
        flips = rng.integers(0, 64, size=rng.integers(0, 8))
        for f in flips:
            b = np.uint64(b) ^ np.uint64(1 << int(f))
        vals.append(np.uint64(b))
    hv = np.array(vals, dtype=np.uint64)
    ids = np.array([f"n{i:03d}" for i in range(m)])
    out = {"a": [], "b": [], "family": [], "hamming": [], "spanning": []}
    _bucket_edges(ids.copy(), hv.copy(), thr, out, "simhash")

    g = nx.Graph()
    g.add_nodes_from(ids)
    g.add_edges_from(zip(out["a"], out["b"]))
    got = {frozenset(c) for c in nx.connected_components(g) if len(c) > 1}
    exp = {
        frozenset(ids[i] for i in c) for c in _brute_components(hv, thr)
    }
    assert got == exp


def test_hamming_family_pairs_spark(spark):
    rng = np.random.default_rng(11)
    n = 300
    base = np.uint64(0x0123456789ABCDEF)
    hv = []
    for i in range(n):
        if i % 3 == 0:  # near-dups of base (<= 4 flips)
            v = base
            for f in rng.integers(0, 64, size=rng.integers(0, 4)):
                v = np.uint64(v) ^ np.uint64(1 << int(f))
            hv.append(int(np.int64(v)))
        else:
            hv.append(int(rng.integers(-(2**63), 2**63)))
    rows = [
        {"image_id": f"i{i:04d}", "family": "simhash", "band_idx": 0,
         "band_key": 7, "salt": 0, "hval": hv[i], "hot": False}
        for i in range(n)
    ]
    df = spark.createDataFrame(pd.DataFrame(rows))
    out = hamming_family_pairs(df, {"simhash": 8}).toPandas()
    g = nx.Graph()
    g.add_edges_from(zip(out.a, out.b))
    comp = {frozenset(c) for c in nx.connected_components(g) if len(c) > 1}
    exp = _brute_components(np.array(hv, dtype=np.int64).view(np.uint64), 8)
    exp_ids = {frozenset(f"i{i:04d}" for i in c) for c in exp}
    assert comp == exp_ids
    assert (out.hamming >= 0).all()


def test_blockwise_labels_match_matrix_path():
    """The O(block·m)-memory fallback is label-identical to the matrix path."""
    from dedup_spark.operators.hamming import _labels_blockwise, _labels_matrix

    rng = np.random.default_rng(5)
    base = rng.integers(0, 2**63, size=40, dtype=np.uint64)
    vals = []
    for _ in range(500):
        b = base[rng.integers(0, len(base))]
        for f in rng.integers(0, 64, size=rng.integers(0, 6)):
            b = np.uint64(b) ^ np.uint64(1 << int(f))
        vals.append(b)
    hv = np.array(vals, dtype=np.uint64)
    for thr in (0, 4, 10):
        lm = _labels_matrix(hv, thr)
        lb = _labels_blockwise(hv, thr)
        if lm is None or lb is None:
            assert lm is None and lb is None
        else:
            assert np.array_equal(lm, lb)


def test_spanning_flag_marks_above_threshold_root_edges():
    """A chain a—b—c (each link ≤ thr, a—c > thr) emits c→root(a) flagged."""
    from dedup_spark.operators.hamming import _bucket_edges

    a = np.uint64(0)
    b = np.uint64((1 << 3) - 1)          # hamming(a,b)=3
    c = np.uint64((1 << 6) - 1)          # hamming(b,c)=3, hamming(a,c)=6
    ids = np.array(["a", "b", "c"])
    hv = np.array([a, b, c], dtype=np.uint64)
    out = {"a": [], "b": [], "family": [], "hamming": [], "spanning": []}
    _bucket_edges(ids, hv, 3, out, "simhash")
    rows = {(x, y): (h, s) for x, y, h, s in
            zip(out["a"], out["b"], out["hamming"], out["spanning"])}
    assert rows[("a", "b")] == (3, False)
    assert rows[("a", "c")] == (6, True)  # root edge spans > thr, flagged


def test_planted_hot_bucket_bounded_memory(spark):
    """VERDICT r1 #4 'done' criterion: a planted hot bucket far above the
    old salt_fanout ceiling completes with sub-buckets ≈ cap (unbounded
    Hamming fanout) and still links the planted near-dup pairs."""
    from dedup_spark.config import DEFAULT_CONFIG
    from dedup_spark.operators.skew import salted_bands

    n = 100_000
    rng = np.random.default_rng(3)
    base = np.uint64(0x5A5A5A5A5A5A5A5A)
    hv = []
    for i in range(n):
        v = base
        for f in rng.integers(0, 64, size=rng.integers(0, 3)):
            v = np.uint64(v) ^ np.uint64(1 << int(f))
        hv.append(int(np.int64(v)))
    pdf = pd.DataFrame({
        "image_id": [f"i{i:06d}" for i in range(n)],
        "family": "simhash", "band_idx": 0, "band_key": 7,
        "hval": hv,
    })
    bands = spark.createDataFrame(pdf)
    salted, report = salted_bands(bands, DEFAULT_CONFIG)
    rep = report.toPandas()
    assert len(rep) == 1
    # fanout must NOT be clipped at salt_fanout=16 for a Hamming family
    assert rep.fanout[0] >= n // DEFAULT_CONFIG.bucket_cap
    sizes = salted.groupBy("salt").count().toPandas()["count"]
    assert sizes.max() <= DEFAULT_CONFIG.bucket_cap * 3  # ≈ cap, hash jitter
    out = hamming_family_pairs(salted, {"simhash": 8})
    # every sub-bucket is a near-clique of the planted base → ~n-fanout edges
    assert out.count() > n * 0.9
