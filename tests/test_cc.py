import networkx as nx
import numpy as np
import pandas as pd
import pytest

from dedup_spark.operators.cc import connected_components


def _run_cc(spark, edge_list, node_list):
    edges = spark.createDataFrame(
        pd.DataFrame(edge_list, columns=["a", "b"])
        if edge_list
        else pd.DataFrame({"a": pd.Series(dtype=str), "b": pd.Series(dtype=str)})
    )
    nodes = spark.createDataFrame(pd.DataFrame({"image_id": node_list}))
    out = connected_components(edges, nodes).toPandas()
    return dict(zip(out.image_id, out.cluster_id))


@pytest.mark.parametrize("seed,n,m", [(0, 30, 25), (1, 60, 80), (2, 40, 10)])
def test_cc_matches_networkx(spark, seed, n, m):
    rng = np.random.default_rng(seed)
    nodes = [f"n{i:03d}" for i in range(n)]
    edges = []
    for _ in range(m):
        i, j = rng.integers(0, n, size=2)
        if i != j:
            edges.append((nodes[min(i, j)], nodes[max(i, j)]))
    got = _run_cc(spark, edges, nodes)
    g = nx.Graph()
    g.add_nodes_from(nodes)
    g.add_edges_from(edges)
    exp = {}
    for comp in nx.connected_components(g):
        root = min(comp)
        for x in comp:
            exp[x] = root
    assert got == exp
    assert len(got) == n  # every node labeled exactly once


def test_cc_chain_and_star(spark):
    # pathological shapes: long chain (max rounds) and giant star
    chain = [(f"c{i:03d}", f"c{i+1:03d}") for i in range(40)]
    star = [("s000", f"s{i:03d}") for i in range(1, 30)]
    nodes = sorted({x for e in chain + star for x in e}) + ["lonely"]
    got = _run_cc(spark, chain + star, nodes)
    assert {got[f"c{i:03d}"] for i in range(41)} == {"c000"}
    assert {got[f"s{i:03d}"] for i in range(30)} == {"s000"}
    assert got["lonely"] == "lonely"


@pytest.mark.parametrize(
    "small_threshold,local_threshold",
    [
        (1_000_000, 1_000_000),  # tiny-graph string path (r4 default here)
        (0, 1_000_000),          # int64-coded single-task + distributed relabel
        (0, 0),                  # iterative large-star/small-star
    ],
)
def test_cc_paths_agree(spark, small_threshold, local_threshold):
    """All three tiers (string union-find, coded union-find, iterative
    star-contraction) produce identical assignments."""
    rng = np.random.default_rng(9)
    n = 120
    nodes = [f"n{i:03d}" for i in range(n)]
    edges = []
    for _ in range(150):
        i, j = rng.integers(0, n, size=2)
        if i != j:
            edges.append((nodes[min(i, j)], nodes[max(i, j)]))
    e_df = spark.createDataFrame(pd.DataFrame(edges, columns=["a", "b"]))
    n_df = spark.createDataFrame(pd.DataFrame({"image_id": nodes}))
    out = connected_components(
        e_df, n_df,
        local_threshold=local_threshold, small_threshold=small_threshold,
    ).toPandas()
    got = dict(zip(out.image_id, out.cluster_id))
    g = nx.Graph()
    g.add_nodes_from(nodes)
    g.add_edges_from(edges)
    exp = {x: min(c) for c in nx.connected_components(g) for x in c}
    assert got == exp


def test_cc_collision_falls_back_to_iterative(spark, monkeypatch):
    """An id-hash collision in the coded path must not raise: the caller
    falls back to the id-preserving iterative path automatically (ADVICE r3
    — pipeline users cannot reach the local_threshold knob)."""
    from dedup_spark.operators import cc as cc_mod

    monkeypatch.setattr(cc_mod, "_ids_collide", lambda ends: True)
    nodes = [f"m{i}" for i in range(6)]
    edges = [("m0", "m1"), ("m1", "m2"), ("m4", "m5")]
    e_df = spark.createDataFrame(pd.DataFrame(edges, columns=["a", "b"]))
    n_df = spark.createDataFrame(pd.DataFrame({"image_id": nodes}))
    out = connected_components(
        e_df, n_df, small_threshold=0, local_threshold=1_000_000
    ).toPandas()
    got = dict(zip(out.image_id, out.cluster_id))
    assert got == {
        "m0": "m0", "m1": "m0", "m2": "m0",
        "m3": "m3", "m4": "m4", "m5": "m4",
    }


def test_numpy_components_random_graphs():
    from dedup_spark.operators.cc import _numpy_components

    rng = np.random.default_rng(21)
    for _ in range(25):
        n = int(rng.integers(2, 200))
        m = int(rng.integers(1, 400))
        a = rng.integers(0, n, size=m)
        b = rng.integers(0, n, size=m)
        keep = a != b
        a, b = a[keep], b[keep]
        if not len(a):
            continue
        ids = np.array([f"x{v:04d}" for v in range(n)])
        out = _numpy_components(ids[a], ids[b])
        got = dict(zip(out.image_id, out.cluster_id))
        g = nx.Graph()
        g.add_edges_from(zip(ids[a], ids[b]))
        exp = {}
        for comp in nx.connected_components(g):
            root = min(comp)
            for x in comp:
                if x != root:
                    exp[x] = root
        assert got == exp
