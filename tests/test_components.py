"""Connected components: iterative-join implementation vs a Python DFS
oracle on seeded random graphs (SURVEY §2.5 L8)."""

import random

import pytest

from named_entity_algorithm_project_spark.operators.components import (
    connected_components,
)


def _dfs_components(nodes, edges):
    adj = {n: set() for n in nodes}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    seen, out = set(), {}
    for n in sorted(nodes):
        if n in seen:
            continue
        stack, comp = [n], []
        while stack:
            cur = stack.pop()
            if cur in seen:
                continue
            seen.add(cur)
            comp.append(cur)
            stack.extend(adj[cur])
        root = min(comp)
        for m in comp:
            out[m] = root
    return out


@pytest.mark.parametrize("seed,n_nodes,n_edges", [(1, 30, 20), (2, 60, 80), (3, 100, 40)])
def test_random_graphs_match_dfs(spark, seed, n_nodes, n_edges):
    rng = random.Random(seed)
    nodes = [f"n{i:03d}" for i in range(n_nodes)]
    edges = set()
    while len(edges) < n_edges:
        a, b = rng.sample(nodes, 2)
        edges.add((min(a, b), max(a, b)))
    expected = _dfs_components(nodes, edges)

    nodes_df = spark.createDataFrame([(n,) for n in nodes], "norm string")
    edges_df = spark.createDataFrame(sorted(edges), "src string, dst string")
    # distributed iterative-join path (local_threshold=0 disables the
    # driver-side small-graph shortcut)
    got = {
        r["norm"]: r["component"]
        for r in connected_components(nodes_df, edges_df, local_threshold=0).collect()
    }
    assert got == expected
    # driver-side union-find path must agree exactly
    got_local = {
        r["norm"]: r["component"]
        for r in connected_components(nodes_df, edges_df).collect()
    }
    assert got_local == expected


def test_chain_graph_converges(spark):
    # a long path graph stresses iteration count (diameter = n-1)
    n = 40
    nodes = [f"c{i:03d}" for i in range(n)]
    edges = [(nodes[i], nodes[i + 1]) for i in range(n - 1)]
    nodes_df = spark.createDataFrame([(x,) for x in nodes], "norm string")
    edges_df = spark.createDataFrame(edges, "src string, dst string")
    got = connected_components(
        nodes_df, edges_df, max_iterations=60, local_threshold=0
    ).collect()
    assert {r["component"] for r in got} == {nodes[0]}


@pytest.mark.parametrize("seed,n_nodes,n_edges", [(4, 50, 35), (5, 80, 100)])
def test_star_algorithm_matches_dfs(spark, seed, n_nodes, n_edges):
    rng = random.Random(seed)
    nodes = [f"s{i:03d}" for i in range(n_nodes)]
    edges = set()
    while len(edges) < n_edges:
        a, b = rng.sample(nodes, 2)
        edges.add((min(a, b), max(a, b)))
    expected = _dfs_components(nodes, edges)
    nodes_df = spark.createDataFrame([(n,) for n in nodes], "norm string")
    edges_df = spark.createDataFrame(sorted(edges), "src string, dst string")
    got = {
        r["norm"]: r["component"]
        for r in connected_components(
            nodes_df, edges_df, local_threshold=0, algorithm="star"
        ).collect()
    }
    assert got == expected


def test_adversarial_long_chain_auto_fallback(spark):
    """Diameter-120 path: hash-to-min is O(diameter) and blows its budget;
    auto mode must switch to large/small-star (O(log n) rounds) and still
    produce the exact DFS labels."""
    n = 120
    nodes = [f"x{i:03d}" for i in range(n)]
    edges = [(nodes[i], nodes[i + 1]) for i in range(n - 1)]
    expected = _dfs_components(nodes, set(edges))
    nodes_df = spark.createDataFrame([(x,) for x in nodes], "norm string")
    edges_df = spark.createDataFrame(edges, "src string, dst string")
    got = {
        r["norm"]: r["component"]
        for r in connected_components(
            nodes_df,
            edges_df,
            max_iterations=25,
            local_threshold=0,
            hash_to_min_budget=5,
        ).collect()
    }
    assert got == expected

    # explicit hash_to_min with an insufficient budget must raise, not
    # silently return partial labels
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(
            nodes_df,
            edges_df,
            max_iterations=5,
            local_threshold=0,
            algorithm="hash_to_min",
        )


def test_singletons_preserved(spark):
    nodes_df = spark.createDataFrame([("a",), ("b",), ("c",)], "norm string")
    edges_df = spark.createDataFrame([], "src string, dst string")
    got = {r["norm"]: r["component"] for r in connected_components(nodes_df, edges_df).collect()}
    assert got == {"a": "a", "b": "b", "c": "c"}


def test_hub_star_graph_distributed(spark):
    # skew shape: one hub connected to 2000 spokes; distributed path with
    # salted aggregation must converge to the hub-component minimum
    hub = "hub"
    spokes = [f"spoke{i:05d}" for i in range(2000)]
    nodes_df = spark.createDataFrame(
        [(hub,)] + [(s,) for s in spokes], "norm string"
    )
    edges_df = spark.createDataFrame(
        [(hub, s) for s in spokes], "src string, dst string"
    )
    got = connected_components(
        nodes_df, edges_df, local_threshold=0, salt_partitions=4
    ).collect()
    assert {r["component"] for r in got} == {"hub"}
    assert len(got) == 2001


def test_edge_volume_guard_forces_distributed(spark):
    """Few nodes, dense edges: the driver-local path gates on BOTH node
    count and edge count — a dense gated similarity graph under the node
    cutoff must still run distributed (and produce the DFS answer)."""
    import itertools

    nodes = [f"n{i}" for i in range(30)]
    edges = list(itertools.combinations(nodes, 2))  # 435 edges, one clique
    nodes_df = spark.createDataFrame([(n,) for n in nodes], "norm string")
    edges_df = spark.createDataFrame(edges, "src string, dst string")
    got = {
        r["norm"]: r["component"]
        for r in connected_components(
            nodes_df,
            edges_df,
            local_threshold=1000,  # node gate would take the driver path...
            local_edge_threshold=100,  # ...but the edge gate trips
        ).collect()
    }
    expected = _dfs_components(nodes, edges)
    assert got == expected
    assert set(got.values()) == {"n0"}
