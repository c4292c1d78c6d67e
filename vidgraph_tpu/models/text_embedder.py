"""Text embedders serving every place the reference called an external
OpenAI-compatible embeddings endpoint (reference: src/components/
neo4j_handler.py:27-31, src/components/pre_llm_injector.py:207-211,
src/pipeline/retriever_hybrid.py:41-47).

Two device-side embedders:

* ``HashedNGramEmbedder`` — deterministic character n-gram hashing into a
  bucket vector (host-side, vectorised numpy), followed by a fixed random
  projection matmul + L2 norm on the TPU.  No trained weights, zero egress,
  and lexically similar texts land close in cosine space — this is the
  default offline embedder and makes retrieval genuinely functional
  (a hashing vectorizer with a Johnson–Lindenstrauss projection).

* ``TransformerTextEmbedder`` — byte-level transformer encoder (mean-pooled),
  the slot where trained weights plug in for production quality.

Both are batched: N texts -> one [N, dim] device matmul.
"""
from __future__ import annotations

import dataclasses
from typing import Any, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.topk_cosine import l2_normalize
from . import tokenizer

_FNV_OFFSET = np.uint64(14695981039346656037)
_FNV_PRIME = np.uint64(1099511628211)


def _ngram_hashes(text: str, n_buckets: int, ns=(2, 3, 4)) -> np.ndarray:
    """Bucket-count vector for character n-grams (lowercased)."""
    counts = np.zeros(n_buckets, np.float32)
    b = text.lower().encode("utf-8", errors="replace")
    if not b:
        return counts
    arr = np.frombuffer(b, np.uint8).astype(np.uint64)
    for n in ns:
        if len(arr) < n:
            continue
        # rolling FNV-1a over n-byte windows, vectorised
        h = np.full(len(arr) - n + 1, _FNV_OFFSET, np.uint64)
        with np.errstate(over="ignore"):
            for j in range(n):
                h = (h ^ arr[j:len(arr) - n + 1 + j]) * _FNV_PRIME
        idx = (h % np.uint64(n_buckets)).astype(np.int64)
        np.add.at(counts, idx, 1.0)
    # sublinear tf
    np.log1p(counts, out=counts)
    return counts


@dataclasses.dataclass
class HashedNGramEmbedder:
    dim: int = 512
    n_buckets: int = 4096
    seed: int = 42
    # Below this many uncached texts the projection runs as a host BLAS
    # matmul: a device dispatch costs a fixed round trip (~25 ms through a
    # tunnelled chip, ~0.2 ms host-attached) that only amortises on large
    # batches.  Recurring texts (entity names, relationship descriptions on
    # the rerank path) are served from the cache with no compute at all.
    device_min_batch: int = 1024
    cache_max: int = 200_000

    def __post_init__(self) -> None:
        rng = np.random.default_rng(self.seed)
        proj = rng.normal(0.0, 1.0 / np.sqrt(self.dim),
                          size=(self.n_buckets, self.dim)).astype(np.float32)
        self._proj_host = proj
        self._proj = jnp.asarray(proj)
        self._embed_jit = jax.jit(self._device_embed)
        self._cache: dict = {}

    def _device_embed(self, counts: jax.Array) -> jax.Array:
        return l2_normalize(counts @ self._proj)

    def _batch_counts(self, texts: List[str]) -> np.ndarray:
        """n-gram bucket counts via the native C++ hasher when available
        (identical semantics), else the vectorised numpy path."""
        from .. import native

        counts = native.ngram_counts_batch(texts, self.n_buckets)
        if counts is not None:
            return counts
        return np.stack([_ngram_hashes(t, self.n_buckets) for t in texts])

    def _project(self, counts: np.ndarray) -> np.ndarray:
        n = counts.shape[0]
        if n >= self.device_min_batch:
            padded = 8
            while padded < n:
                padded *= 2
            if padded != n:
                counts = np.concatenate(
                    [counts,
                     np.zeros((padded - n, self.n_buckets), np.float32)])
            return np.asarray(self._embed_jit(jnp.asarray(counts)))[:n]
        out = counts @ self._proj_host
        norms = np.linalg.norm(out, axis=1, keepdims=True)
        return out / np.maximum(norms, 1e-12)

    def embed(self, texts: Sequence[str]) -> np.ndarray:
        """[N] texts -> [N, dim] float32 L2-normalised embeddings (cached)."""
        if not texts:
            return np.zeros((0, self.dim), np.float32)
        out = np.empty((len(texts), self.dim), np.float32)
        missing_idx = []
        missing_texts = []
        for i, t in enumerate(texts):
            hit = self._cache.get(t)
            if hit is not None:
                out[i] = hit
            else:
                missing_idx.append(i)
                missing_texts.append(t)
        if missing_texts:
            counts = self._batch_counts(missing_texts)
            vecs = self._project(counts)
            if len(self._cache) + len(missing_texts) > self.cache_max:
                self._cache.clear()
            for i, t, v in zip(missing_idx, missing_texts, vecs):
                out[i] = v
                self._cache[t] = v
        return out

    def embed_query(self, text: str) -> np.ndarray:
        return self.embed([text])[0]


class TransformerTextEmbedder:
    """Byte-level transformer encoder, mean-pooled to [dim]."""

    def __init__(self, dim: int = 512, width: int = 256, layers: int = 4,
                 heads: int = 4, max_len: int = 512, seed: int = 0,
                 dtype: Any = jnp.bfloat16) -> None:
        from .captioner import CaptionerConfig, init_params
        self.dim = dim
        self.max_len = max_len
        self._cfg = CaptionerConfig(
            width=width, layers=layers, heads=heads,
            vision_dim=width, num_vision_tokens=1, max_len=max_len + 1,
            dtype=dtype)
        self._params = init_params(self._cfg, seed=seed)
        rng = np.random.default_rng(seed + 1)
        self._out_proj = jnp.asarray(rng.normal(
            0, 1 / np.sqrt(dim), size=(width, dim)).astype(np.float32))
        self._fwd = jax.jit(self._run)

    def _run(self, tokens: jax.Array) -> jax.Array:
        from .captioner import forward
        b = tokens.shape[0]
        vis = jnp.zeros((b, 1, self._cfg.width), jnp.float32)
        # Contextual features = output logits; mean-pool over non-pad tokens.
        feats = forward(self._params, self._cfg, vis, tokens)
        mask = (tokens != tokenizer.PAD_ID).astype(jnp.float32)[..., None]
        pooled = (feats * mask).sum(1) / jnp.maximum(mask.sum(1), 1.0)
        # project vocab-sized features down via slicing matmul
        pooled = pooled[:, :self._out_proj.shape[0]]
        return l2_normalize(pooled @ self._out_proj)

    def embed(self, texts: Sequence[str]) -> np.ndarray:
        if not texts:
            return np.zeros((0, self.dim), np.float32)
        toks = tokenizer.batch_encode(list(texts), self.max_len)
        return np.asarray(self._fwd(jnp.asarray(toks)))

    def embed_query(self, text: str) -> np.ndarray:
        return self.embed([text])[0]


def make_embedder(kind: str = "hash", dim: int = 512, **kw):
    if kind in ("hash", "tpu"):
        return HashedNGramEmbedder(dim=dim, **kw)
    if kind == "transformer":
        return TransformerTextEmbedder(dim=dim, **kw)
    raise ValueError(f"unknown embedder kind: {kind}")
