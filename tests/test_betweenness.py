"""Exact XLA betweenness (Brandes as matmuls) vs exact NetworkX."""
import jax.numpy as jnp
import networkx as nx
import numpy as np
import pytest

from vidgraph_tpu.pipeline.acs import _betweenness


def _xla_bc(adj: np.ndarray) -> np.ndarray:
    n = adj.shape[0]
    pad = 128
    a = np.zeros((pad, pad), np.float32)
    a[:n, :n] = adj
    valid = np.zeros(pad, np.float32)
    valid[:n] = 1.0
    return np.asarray(_betweenness(jnp.asarray(a), jnp.asarray(valid),
                                   max_steps=16))[:n]


def _nx_bc(adj: np.ndarray) -> np.ndarray:
    G = nx.DiGraph()
    n = adj.shape[0]
    G.add_nodes_from(range(n))
    rows, cols = np.nonzero(adj)
    G.add_edges_from(zip(rows.tolist(), cols.tolist()))
    bc = nx.betweenness_centrality(G)  # exact, normalized
    return np.asarray([bc[i] for i in range(n)])


def test_path_graph():
    # 0 -> 1 -> 2 -> 3: node 1 and 2 are intermediates
    adj = np.zeros((4, 4), np.float32)
    for i in range(3):
        adj[i, i + 1] = 1.0
    np.testing.assert_allclose(_xla_bc(adj), _nx_bc(adj), atol=1e-5)


def test_star_graph():
    # hub 0 <-> all others
    n = 6
    adj = np.zeros((n, n), np.float32)
    for i in range(1, n):
        adj[0, i] = adj[i, 0] = 1.0
    np.testing.assert_allclose(_xla_bc(adj), _nx_bc(adj), atol=1e-5)


def test_multiple_shortest_paths():
    # diamond: 0->1->3, 0->2->3 (two shortest paths share credit)
    adj = np.zeros((4, 4), np.float32)
    adj[0, 1] = adj[0, 2] = adj[1, 3] = adj[2, 3] = 1.0
    np.testing.assert_allclose(_xla_bc(adj), _nx_bc(adj), atol=1e-5)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_directed_graphs(seed):
    rng = np.random.default_rng(seed)
    n = 30
    adj = (rng.random((n, n)) < 0.12).astype(np.float32)
    np.fill_diagonal(adj, 0.0)
    np.testing.assert_allclose(_xla_bc(adj), _nx_bc(adj),
                               atol=1e-4, rtol=1e-4)


def test_disconnected_components():
    adj = np.zeros((6, 6), np.float32)
    adj[0, 1] = adj[1, 2] = 1.0   # component A (path)
    adj[3, 4] = adj[4, 5] = 1.0   # component B (path)
    np.testing.assert_allclose(_xla_bc(adj), _nx_bc(adj), atol=1e-5)


def test_directed_clustering_matches_networkx():
    from vidgraph_tpu.pipeline.acs import _directed_clustering

    for seed in (0, 1, 2):
        rng = np.random.default_rng(seed)
        n = 25
        adj = (rng.random((n, n)) < 0.15).astype(np.float32)
        np.fill_diagonal(adj, 0.0)
        pad = 128
        a = np.zeros((pad, pad), np.float32)
        a[:n, :n] = adj
        valid = np.zeros(pad, np.float32)
        valid[:n] = 1.0
        got = float(_directed_clustering(jnp.asarray(a),
                                         jnp.asarray(valid)))
        G = nx.DiGraph()
        G.add_nodes_from(range(n))
        rows, cols = np.nonzero(adj)
        G.add_edges_from(zip(rows.tolist(), cols.tolist()))
        ref = nx.average_clustering(G)
        assert abs(got - ref) < 1e-4, (got, ref)


def test_assortativity_matches_networkx():
    from vidgraph_tpu.pipeline.acs import _assortativity

    for seed in (0, 1, 2):
        rng = np.random.default_rng(seed)
        n = 25
        adj = (rng.random((n, n)) < 0.15).astype(np.float32)
        np.fill_diagonal(adj, 0.0)
        pad = 128
        a = np.zeros((pad, pad), np.float32)
        a[:n, :n] = adj
        valid = np.zeros(pad, np.float32)
        valid[:n] = 1.0
        got = float(_assortativity(jnp.asarray(a), jnp.asarray(valid)))
        G = nx.DiGraph()
        G.add_nodes_from(range(n))
        rows, cols = np.nonzero(adj)
        G.add_edges_from(zip(rows.tolist(), cols.tolist()))
        ref = nx.degree_assortativity_coefficient(G)
        assert abs(got - ref) < 1e-3, (got, ref)
