import numpy as np

from vidgraph_tpu.memory import EmbeddingStore


def test_add_and_search():
    s = EmbeddingStore(dim=8)
    vecs = np.eye(8, dtype=np.float32)[:4] + 0.01
    s.add([f"c{i}" for i in range(4)], vecs)
    assert len(s) == 4
    hits = s.search(np.eye(8, dtype=np.float32)[1:2], k=2)[0]
    assert hits[0][0] == "c1"
    assert hits[0][1] > hits[1][1]


def test_overwrite_same_id():
    s = EmbeddingStore(dim=4)
    s.add(["a"], np.array([[1, 0, 0, 0]], np.float32))
    s.add(["a"], np.array([[0, 1, 0, 0]], np.float32))
    assert len(s) == 1
    hits = s.search(np.array([[0, 1, 0, 0]], np.float32), k=1)[0]
    assert hits[0][0] == "a" and hits[0][1] > 0.99


def test_growth_beyond_capacity():
    s = EmbeddingStore(dim=4, capacity=1024)
    n = 2500
    rng = np.random.default_rng(0)
    vecs = rng.normal(size=(n, 4)).astype(np.float32)
    s.add([f"i{i}" for i in range(n)], vecs)
    assert len(s) == n
    assert s.capacity >= n
    # the last-inserted row must be findable
    hits = s.search(vecs[-1:], k=1)[0]
    assert hits[0][0] == f"i{n-1}"


def test_threshold_filters():
    s = EmbeddingStore(dim=4)
    s.add(["x"], np.array([[1, 0, 0, 0]], np.float32))
    hits = s.search(np.array([[0, 1, 0, 0]], np.float32), k=1,
                    threshold=0.3)[0]
    assert hits == []


def test_state_roundtrip():
    s = EmbeddingStore(dim=4)
    rng = np.random.default_rng(1)
    s.add(["a", "b"], rng.normal(size=(2, 4)).astype(np.float32))
    s2 = EmbeddingStore.from_state(s.state_dict())
    assert s2.ids() == ["a", "b"]
    np.testing.assert_allclose(s2.vectors(), s.vectors(), atol=1e-6)


def test_similarity_matrix():
    s = EmbeddingStore(dim=4)
    s.add(["a", "b"], np.array([[1, 0, 0, 0], [0, 1, 0, 0]], np.float32))
    m = s.similarity_matrix(np.array([[1, 0, 0, 0]], np.float32))
    assert m.shape == (1, 2)
    np.testing.assert_allclose(m[0], [1.0, 0.0], atol=1e-5)
