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
    out = {"a": [], "b": [], "family": [], "hamming": []}
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
