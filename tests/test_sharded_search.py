"""Sharded embedding search on the 8-device CPU mesh."""
import numpy as np
import pytest

from vidgraph_tpu.parallel.sharded_search import ShardedEmbeddingStore


def test_sharded_search_matches_numpy(cpu_mesh):
    rng = np.random.default_rng(0)
    n, d = 5000, 64
    store = ShardedEmbeddingStore(cpu_mesh, dim=d, capacity=1024)
    vecs = rng.normal(size=(n, d)).astype(np.float32)
    store.add([f"i{i}" for i in range(n)], vecs)
    assert len(store) == n
    assert store.capacity % cpu_mesh.shape["data"] == 0

    q = rng.normal(size=(3, d)).astype(np.float32)
    hits = store.search(q, k=5)

    vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    ref = qn @ vn.T
    for r in range(3):
        expected = set(np.argsort(-ref[r])[:5])
        got = {int(i[1:]) for i, _ in hits[r]}
        assert got == expected


def test_sharded_store_sharding_layout(cpu_mesh):
    store = ShardedEmbeddingStore(cpu_mesh, dim=32, capacity=1024)
    store.add(["a"], np.ones((1, 32), np.float32))
    arr = store._device_store()
    # row axis split across the data dimension of the mesh
    spec = arr.sharding.spec
    assert spec[0] == "data"
    assert len(arr.sharding.device_set) == cpu_mesh.devices.size


def test_sharded_empty_and_threshold(cpu_mesh):
    store = ShardedEmbeddingStore(cpu_mesh, dim=16)
    assert store.search(np.ones((1, 16), np.float32), k=3) == [[]]
    store.add(["x"], np.eye(16, dtype=np.float32)[:1])
    hits = store.search(-np.eye(16, dtype=np.float32)[:1], k=3,
                        threshold=0.0)
    assert hits == [[]]
