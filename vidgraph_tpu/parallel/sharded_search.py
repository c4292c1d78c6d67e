"""Multi-chip embedding-memory search: store rows sharded over the mesh
"data" axis, each chip scores its shard, global top-k via collectives.

This is the scale-out path for the embedding memory once a single chip's
HBM (or its matmul throughput) is the bottleneck — e.g. hours-long video
memories across a v5e-8.  The single-chip path lives in
memory/embedding_store.py; this module owns placement + the pjit'd search.

XLA inserts the collectives: the row-sharded score matrix feeds
``lax.top_k`` over the full row axis, which lowers to per-shard top-k +
all-gather + final reduction over ICI.
"""
from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.topk_cosine import l2_normalize
from .mesh import DATA_AXIS


@functools.partial(jax.jit, static_argnames=("k",))
def _search_jit(q: jax.Array, store: jax.Array, count: jax.Array, k: int):
    """Per-shard cosine scoring + global top-k (XLA inserts the gather)."""
    qn = l2_normalize(q)
    scores = jax.lax.dot_general(
        qn, store, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    valid = jnp.arange(store.shape[0]) < count
    scores = jnp.where(valid[None, :], scores, -1e30)
    return jax.lax.top_k(scores, k)


class ShardedEmbeddingStore:
    """Append-mostly id -> embedding memory sharded across a device mesh."""

    def __init__(self, mesh: Mesh, dim: int, capacity: int = 8192) -> None:
        self.mesh = mesh
        self.dim = dim
        self._data_size = mesh.shape[DATA_AXIS]
        capacity = self._round_capacity(capacity)
        self._host = np.zeros((capacity, dim), np.float32)
        self._count = 0
        self._ids: List[str] = []
        self._mirror: Optional[jax.Array] = None
        self._dirty = True
        self._row_sharding = NamedSharding(mesh, P(DATA_AXIS, None))
        self._rep = NamedSharding(mesh, P())

    def _round_capacity(self, cap: int) -> int:
        unit = 1024 * self._data_size
        return ((max(cap, 1) + unit - 1) // unit) * unit

    def __len__(self) -> int:
        return self._count

    @property
    def capacity(self) -> int:
        return self._host.shape[0]

    def add(self, ids: Sequence[str], vectors: np.ndarray) -> None:
        vecs = np.asarray(vectors, np.float32)
        n = len(ids)
        if self._count + n > self.capacity:
            new_cap = self._round_capacity(2 * (self._count + n))
            grown = np.zeros((new_cap, self.dim), np.float32)
            grown[:self._count] = self._host[:self._count]
            self._host = grown
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        self._host[self._count:self._count + n] = vecs / np.maximum(
            norms, 1e-12)
        self._ids.extend(ids)
        self._count += n
        self._dirty = True

    def _device_store(self) -> jax.Array:
        if self._dirty or self._mirror is None:
            self._mirror = jax.device_put(self._host, self._row_sharding)
            self._dirty = False
        return self._mirror

    def search(self, queries: np.ndarray, k: int,
               threshold: Optional[float] = None,
               ) -> List[List[Tuple[str, float]]]:
        q = np.atleast_2d(np.asarray(queries, np.float32))
        if self._count == 0:
            return [[] for _ in range(q.shape[0])]
        kk = min(k, self._count)
        store = self._device_store()
        qd = jax.device_put(jnp.asarray(q), self._rep)
        with self.mesh:
            vals, idx = _search_jit(qd, store, jnp.int32(self._count), kk)
        vals, idx = np.asarray(vals), np.asarray(idx)
        out: List[List[Tuple[str, float]]] = []
        for r in range(q.shape[0]):
            row = []
            for c in range(kk):
                s = float(vals[r, c])
                if s <= -1e29 or (threshold is not None and s <= threshold):
                    continue
                row.append((self._ids[int(idx[r, c])], s))
            out.append(row)
        return out
