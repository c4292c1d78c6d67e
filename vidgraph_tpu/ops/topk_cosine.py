"""Fused cosine-similarity scoring + top-k over an HBM-resident store.

This single kernel replaces three hot paths of the reference:
  * the pure-Python O(new x existing) cosine loop in subgraph injection
    (reference: src/components/pre_llm_injector.py:346-388),
  * Neo4j ``vector.similarity.cosine`` chunk search
    (reference: src/pipeline/retriever_hybrid.py:284-323),
  * per-segment post-compression scoring
    (reference: src/pipeline/retriever_hybrid.py:465-514).

Design: store rows are L2-normalised at insert time, so cosine similarity is
one bf16/f32 matmul on the MXU.  The Pallas kernel tiles the store over a
grid, normalises the query block once per tile (VPU, cheap), and feeds the
MXU; invalid (unwritten) rows are masked to -inf outside the kernel (XLA
fuses the mask into the same HLO).  Top-k uses ``jax.lax.top_k`` on the
masked scores.

On non-TPU backends (tests run on CPU) a pure-jnp path with identical
semantics is used.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
_NEG = -1e30


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _score_kernel(q_ref, s_ref, o_ref):
    """One (query-block, store-tile) program: normalise q, MXU matmul."""
    q = q_ref[:].astype(jnp.float32)
    inv = jax.lax.rsqrt(jnp.sum(q * q, axis=-1, keepdims=True) + 1e-12)
    qn = q * inv
    s = s_ref[:].astype(jnp.float32)
    o_ref[:] = jax.lax.dot_general(
        qn, s,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


@functools.partial(jax.jit, static_argnames=("block_n", "interpret"))
def _pallas_scores(query: jax.Array, store: jax.Array,
                   block_n: int = 1024, interpret: bool = False) -> jax.Array:
    b, d = query.shape
    n = store.shape[0]
    bt = _round_up(b, 8)
    nt = min(_round_up(n, _LANE), block_n)
    q = jnp.zeros((bt, d), query.dtype).at[:b].set(query)
    grid = (pl.cdiv(n, nt),)
    out = pl.pallas_call(
        _score_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bt, d), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nt, d), lambda j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, nt), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bt, _round_up(n, nt)), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * bt * n * d,
            bytes_accessed=bt * d * 4 + n * d * store.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(q, store)
    return out[:b, :n]


def _jnp_scores(query: jax.Array, store: jax.Array) -> jax.Array:
    q = query.astype(jnp.float32)
    qn = q * jax.lax.rsqrt(jnp.sum(q * q, axis=-1, keepdims=True) + 1e-12)
    return qn @ store.astype(jnp.float32).T


def _bucket_rows(n: int) -> int:
    """Next power of two >= max(8, n): bounds the number of distinct jit
    shapes (remote compiles are expensive)."""
    b = 8
    while b < n:
        b *= 2
    return b


def cosine_scores(query: jax.Array, store: jax.Array,
                  valid: Optional[jax.Array] = None,
                  use_pallas: Optional[bool] = None) -> jax.Array:
    """Cosine scores of ``query [B,d]`` against pre-normalised ``store [N,d]``.

    ``valid [N]`` bool masks unwritten store rows to -1e30.  The query batch
    is padded to a power-of-two row bucket to bound compile count.
    """
    if use_pallas is None:
        if isinstance(query, jax.Array):
            use_pallas = bool(query.devices()) and all(
                d.platform == "tpu" for d in query.devices())
        else:  # numpy/list input lands on the default backend
            use_pallas = jax.default_backend() == "tpu"
    if store.shape[0] == 0:
        return jnp.zeros((query.shape[0], 0), jnp.float32)
    b = query.shape[0]
    bb = _bucket_rows(b)
    if bb != b:
        query = jnp.concatenate(
            [query, jnp.zeros((bb - b, query.shape[1]), query.dtype)])
    if use_pallas:
        scores = _pallas_scores(query, store)
    else:
        scores = _jnp_scores(query, store)
    scores = scores[:b]
    if valid is not None:
        scores = jnp.where(valid[None, :], scores, _NEG)
    return scores


_TOPK_TILE = 8192
_TWO_STAGE_MIN = 65536


@functools.partial(jax.jit, static_argnames=("k",))
def _masked_topk(scores: jax.Array, k: int) -> Tuple[jax.Array, jax.Array]:
    """Top-k over the row axis; two-stage (per-tile then across tile
    winners) above ``_TWO_STAGE_MIN`` rows — ``lax.top_k`` over a flat
    1M-wide axis measured 56 ms while the scoring matmul itself takes
    ~7 ms; tiling cuts the sort to ~1 ms."""
    b, n = scores.shape
    if n < _TWO_STAGE_MIN or k > _TOPK_TILE:
        return jax.lax.top_k(scores, k)
    n_pad = -(-n // _TOPK_TILE) * _TOPK_TILE
    if n_pad != n:   # padded rows carry the mask sentinel, never win
        scores = jnp.concatenate(
            [scores, jnp.full((b, n_pad - n), _NEG, scores.dtype)], axis=1)
    t = n_pad // _TOPK_TILE
    tiled = scores.reshape(b, t, _TOPK_TILE)
    v1, i1 = jax.lax.top_k(tiled, k)              # [b, t, k]
    v2, i2 = jax.lax.top_k(v1.reshape(b, t * k), k)   # [b, k]
    tile_idx = i2 // k
    within = jnp.take_along_axis(
        i1.reshape(b, t * k), i2, axis=1)
    return v2, (tile_idx * _TOPK_TILE + within).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("k", "use_pallas"))
def _fused_cosine_topk(query: jax.Array, store: jax.Array,
                       valid: jax.Array, k: int, use_pallas: bool):
    """Score + mask + top-k in ONE jit: through a tunnelled chip each
    separate dispatch costs a ~20 ms round trip, which dominated 1M-row
    searches (3 dispatches = ~60 ms for ~7 ms of compute)."""
    if use_pallas:
        scores = _pallas_scores(query, store)
    else:
        scores = _jnp_scores(query, store)
    scores = jnp.where(valid[None, :], scores, _NEG)
    return _masked_topk(scores, k)


@functools.partial(jax.jit, static_argnames=("k", "use_pallas"))
def _fused_cosine_topk_count(query: jax.Array, store: jax.Array,
                             count: jax.Array, k: int, use_pallas: bool):
    """As ``_fused_cosine_topk`` but the validity mask is derived from a
    scalar row count INSIDE the jit — building the [N]-bool mask outside
    was itself a per-call device dispatch."""
    valid = jnp.arange(store.shape[0]) < count
    return _fused_cosine_topk(query, store, valid, k, use_pallas)


def cosine_topk(query: jax.Array, store: jax.Array, k: int,
                valid: Optional[jax.Array] = None,
                use_pallas: Optional[bool] = None,
                valid_count: Optional[int] = None,
                ) -> Tuple[jax.Array, jax.Array]:
    """Top-k cosine matches: returns (scores [B,k], indices [B,k]).

    Rows masked invalid come back with score <= -1e30; callers filter on a
    score threshold (the reference used >0.3 for chunk vector search).
    Prefer ``valid_count`` (first-N-rows-valid) over a ``valid`` mask
    array on hot paths — the mask is then built inside the fused jit.
    """
    if use_pallas is None:
        if isinstance(query, jax.Array):
            use_pallas = bool(query.devices()) and all(
                d.platform == "tpu" for d in query.devices())
        else:
            use_pallas = jax.default_backend() == "tpu"
    n = store.shape[0]
    b = query.shape[0]
    if n == 0:
        return (jnp.full((b, k), _NEG, jnp.float32),
                jnp.zeros((b, k), jnp.int32))
    kk = min(k, n)
    bb = _bucket_rows(b)
    if bb != b:   # power-of-two query bucket: bounded compile count
        query = jnp.concatenate(
            [query, jnp.zeros((bb - b, query.shape[1]), query.dtype)])
    if valid_count is not None:
        vals, idx = _fused_cosine_topk_count(
            query, store, jnp.int32(valid_count), kk, bool(use_pallas))
    else:
        if valid is None:
            valid = jnp.ones((n,), bool)
        vals, idx = _fused_cosine_topk(query, store, valid, kk,
                                       bool(use_pallas))
    vals, idx = vals[:b], idx[:b]
    if kk < k:
        vals = jnp.concatenate(
            [vals, jnp.full((b, k - kk), _NEG, jnp.float32)], axis=1)
        idx = jnp.concatenate(
            [idx, jnp.zeros((b, k - kk), idx.dtype)], axis=1)
    return vals, idx


def l2_normalize(x: jax.Array, axis: int = -1, eps: float = 1e-12) -> jax.Array:
    x = x.astype(jnp.float32)
    return x * jax.lax.rsqrt(jnp.sum(x * x, axis=axis, keepdims=True) + eps)
