"""HBM-resident embedding memory with fused cosine top-k search.

This is the device-side replacement for three reference mechanisms:
Neo4j ``vector.similarity.cosine`` chunk search (reference:
src/pipeline/retriever_hybrid.py:284-323), the Python cosine loop over up to
5000 chunk embeddings (reference: src/components/pre_llm_injector.py:346-412)
and per-segment compression scoring (reference: src/pipeline/
retriever_hybrid.py:465-514).

Rows are L2-normalised at insert and held in a padded ``[capacity, dim]``
device array (static shape — capacity doubles by reallocation, so XLA sees a
small number of distinct shapes).  A boolean validity mask handles the
pad-and-mask discipline; searches run through ops.topk_cosine (Pallas on
TPU).  String ids are host-side metadata only.

Multi-chip: rows can be sharded along the mesh "data" axis (shard_store);
each chip scores its shard and top-k is taken after an all-gather of the
per-shard partials — wired in parallel/mesh.py round 2+.
"""
from __future__ import annotations

import threading
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.topk_cosine import cosine_topk, l2_normalize

_MIN_CAPACITY = 1024


class EmbeddingStore:
    """Append-only id -> embedding memory living on device."""

    def __init__(self, dim: int, capacity: int = _MIN_CAPACITY,
                 dtype=jnp.float32, device: Optional[jax.Device] = None):
        self.dim = int(dim)
        self.dtype = dtype
        self._device = device
        capacity = max(_MIN_CAPACITY, int(capacity))
        self._emb = self._zeros(capacity)
        self._count = 0
        self._ids: List[str] = []
        self._id_to_idx: Dict[str, int] = {}
        self._lock = threading.Lock()

    # -- internals ----------------------------------------------------------
    def _zeros(self, capacity: int) -> jax.Array:
        z = jnp.zeros((capacity, self.dim), self.dtype)
        if self._device is not None:
            z = jax.device_put(z, self._device)
        return z

    def _grow(self, needed: int) -> None:
        cap = self._emb.shape[0]
        new_cap = cap
        while new_cap < needed:
            new_cap *= 2
        if new_cap != cap:
            grown = self._zeros(new_cap)
            self._emb = jax.lax.dynamic_update_slice(
                grown, self._emb, (0, 0))

    # -- public -------------------------------------------------------------
    def __len__(self) -> int:
        return self._count

    @property
    def capacity(self) -> int:
        return int(self._emb.shape[0])

    def add(self, ids: Sequence[str], vectors: np.ndarray) -> None:
        """Insert/overwrite rows. ``vectors [n, dim]`` need not be normalised."""
        if len(ids) == 0:
            return
        vecs = np.asarray(vectors, np.float32)
        if vecs.shape != (len(ids), self.dim):
            raise ValueError(f"vectors shape {vecs.shape} != "
                             f"({len(ids)}, {self.dim})")
        with self._lock:
            new_ids = [i for i in ids if i not in self._id_to_idx]
            self._grow(self._count + len(new_ids))
            normed = np.asarray(l2_normalize(jnp.asarray(vecs)))
            # Group contiguous appends into one device update.
            append_rows = []
            for rid, v in zip(ids, normed):
                idx = self._id_to_idx.get(rid)
                if idx is None:
                    idx = self._count
                    self._id_to_idx[rid] = idx
                    self._ids.append(rid)
                    self._count += 1
                    append_rows.append(v)
                else:  # overwrite existing row in place
                    self._emb = self._emb.at[idx].set(
                        jnp.asarray(v, self.dtype))
            if append_rows:
                block = jnp.asarray(np.stack(append_rows), self.dtype)
                self._emb = jax.lax.dynamic_update_slice(
                    self._emb, block, (self._count - len(append_rows), 0))

    def get(self, rid: str) -> Optional[np.ndarray]:
        idx = self._id_to_idx.get(rid)
        if idx is None:
            return None
        return np.asarray(self._emb[idx], np.float32)

    def ids(self) -> List[str]:
        return list(self._ids)

    def vectors(self) -> np.ndarray:
        """[count, dim] materialised on host (for persistence/tests)."""
        if self._count == 0:
            return np.zeros((0, self.dim), np.float32)
        return np.asarray(self._emb[:self._count], np.float32)

    def search(self, queries: np.ndarray, k: int,
               threshold: Optional[float] = None,
               ) -> List[List[Tuple[str, float]]]:
        """Top-k cosine matches per query row -> [(id, score), ...] lists."""
        q = np.atleast_2d(np.asarray(queries, np.float32))
        if self._count == 0:
            return [[] for _ in range(q.shape[0])]
        valid = jnp.arange(self.capacity) < self._count
        kk = min(k, self._count)
        vals, idx = cosine_topk(jnp.asarray(q), self._emb, k=kk, valid=valid)
        vals = np.asarray(vals)
        idx = np.asarray(idx)
        out: List[List[Tuple[str, float]]] = []
        for r in range(q.shape[0]):
            row = []
            for c in range(kk):
                s = float(vals[r, c])
                if s <= -1e29:
                    continue
                if threshold is not None and s <= threshold:
                    continue
                row.append((self._ids[int(idx[r, c])], s))
            out.append(row)
        return out

    def similarity_matrix(self, queries: np.ndarray) -> np.ndarray:
        """Dense [nq, count] cosine scores (device matmul, host fetch)."""
        from ..ops.topk_cosine import cosine_scores
        q = np.atleast_2d(np.asarray(queries, np.float32))
        if self._count == 0:
            return np.zeros((q.shape[0], 0), np.float32)
        valid = jnp.arange(self.capacity) < self._count
        s = cosine_scores(jnp.asarray(q), self._emb, valid)
        return np.asarray(s[:, :self._count])

    # -- persistence ---------------------------------------------------------
    def state_dict(self) -> Dict:
        return {"ids": list(self._ids), "vectors": self.vectors()}

    @classmethod
    def from_state(cls, state: Dict, dim: Optional[int] = None,
                   **kw) -> "EmbeddingStore":
        vecs = np.asarray(state["vectors"], np.float32)
        dim = dim or (vecs.shape[1] if vecs.size else 512)
        store = cls(dim=dim, capacity=max(_MIN_CAPACITY, len(state["ids"])),
                    **kw)
        if state["ids"]:
            store.add(state["ids"], vecs)
        return store
