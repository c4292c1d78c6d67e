"""Sharded embedding search on the 8-device CPU mesh.

Round 3: ShardedEmbeddingStore is a drop-in subclass of EmbeddingStore
used by the serving path (parallel/serving.py), so this suite asserts
full API parity against the single-device store, with the device path
forced (``device_min_rows=0``) so the sharded jit actually runs.
"""
import numpy as np
import pytest

from vidgraph_tpu.memory.embedding_store import EmbeddingStore
from vidgraph_tpu.parallel.sharded_search import ShardedEmbeddingStore


def test_sharded_search_matches_numpy(cpu_mesh):
    rng = np.random.default_rng(0)
    n, d = 5000, 64
    store = ShardedEmbeddingStore(cpu_mesh, dim=d, capacity=1024,
                                  device_min_rows=0)
    vecs = rng.normal(size=(n, d)).astype(np.float32)
    store.add([f"i{i}" for i in range(n)], vecs)
    assert len(store) == n
    assert store._padded_host().shape[0] % cpu_mesh.shape["data"] == 0

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
    store = ShardedEmbeddingStore(cpu_mesh, dim=16, device_min_rows=0)
    assert store.search(np.ones((1, 16), np.float32), k=3) == [[]]
    store.add(["x"], np.eye(16, dtype=np.float32)[:1])
    hits = store.search(-np.eye(16, dtype=np.float32)[:1], k=3,
                        threshold=0.0)
    assert hits == [[]]


def test_sharded_api_parity_with_single_device(cpu_mesh):
    """Same inputs -> same outputs as the plain store, across the full
    EmbeddingStore surface (search, similarity_matrix, get/ids/vectors,
    id-overwrite, state roundtrip)."""
    rng = np.random.default_rng(7)
    d, n = 48, 300
    ids = [f"c{i}" for i in range(n)]
    vecs = rng.normal(size=(n, d)).astype(np.float32)

    plain = EmbeddingStore(dim=d)
    shard = ShardedEmbeddingStore(cpu_mesh, dim=d, device_min_rows=0)
    for s in (plain, shard):
        s.add(ids, vecs)
        # id-overwrite: re-adding an existing id replaces the row in place
        s.add(["c5"], np.ones((1, d), np.float32))
    assert shard.ids() == plain.ids()
    assert len(shard) == len(plain)
    np.testing.assert_allclose(shard.vectors(), plain.vectors(), atol=1e-6)
    np.testing.assert_allclose(shard.get("c5"), plain.get("c5"))

    q = rng.normal(size=(4, d)).astype(np.float32)
    hp = plain.search(q, k=7, threshold=-1.0)
    hs = shard.search(q, k=7, threshold=-1.0)
    for rp, rs in zip(hp, hs):
        assert [i for i, _ in rp] == [i for i, _ in rs]
        np.testing.assert_allclose([s for _, s in rp], [s for _, s in rs],
                                   atol=1e-4)

    np.testing.assert_allclose(shard.similarity_matrix(q),
                               plain.similarity_matrix(q), atol=1e-4)

    # persistence roundtrip preserves content through either class
    state = shard.state_dict()
    rebuilt = EmbeddingStore.from_state(state)
    assert rebuilt.ids() == shard.ids()
    np.testing.assert_allclose(rebuilt.vectors(), shard.vectors(),
                               atol=1e-6)


def test_sharded_growth_keeps_divisible_mirror(cpu_mesh):
    store = ShardedEmbeddingStore(cpu_mesh, dim=8, capacity=1024,
                                  device_min_rows=0)
    rng = np.random.default_rng(1)
    # force a growth past the initial capacity
    n = 1500
    store.add([f"g{i}" for i in range(n)],
              rng.normal(size=(n, 8)).astype(np.float32))
    assert store.capacity >= n
    assert store._padded_host().shape[0] % cpu_mesh.shape["data"] == 0
    hits = store.search(store.get("g42")[None], k=1)
    assert hits[0][0][0] == "g42"
