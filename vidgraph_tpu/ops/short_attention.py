"""Short-sequence (N~50) ViT attention: head-pair packing + fused kernel.

The serving ViT-B/32 runs attention over N = 50 tokens with head_dim 64
across B*h = 1920 (batch 160) independent heads per layer.  Each
[50, 64] @ [64, 50] product pads 50 -> 128 lanes on the MXU, so the
einsum path runs the attention matmuls at <20% occupancy and the f32
probability tensors round-trip HBM between the two einsums
(docs/EVAL.md ViT roofline: the N=50 tail is most of the gap between
the tower's 0.58-of-dense-peak and the 0.50 relay-attached MFU
ceiling).  VERDICT r4 next #6 asked for this to be attempted, not
asserted away.

Two exact implementations of the same math:

* :func:`packed_attention` (pure XLA) — concatenate head PAIRS along
  the sequence axis: scores become [2N, 2N] = 100x100 per pair (half
  the batched matmuls, 2x the useful lane fill) with the cross-head
  blocks masked to -inf before the softmax.  The zeroed cross blocks
  make the P @ V product per-head-correct with no unpacking cost
  beyond a reshape.
* :func:`fused_short_attention` (Pallas) — the same pairing, with
  QK^T + mask + softmax + P@V in ONE kernel: the [2N, 2N] f32
  probabilities never leave VMEM, removing both HBM round-trips and
  the separate softmax dispatch.  One grid step per head pair; the
  shared additive mask block is broadcast to every step.

Both are numerically exact vs the einsum reference (same f32 score
accumulation, same softmax); pick by on-chip measurement
(scripts/profile_vit.py --attn).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128


def _pair_mask(n: int, rows: int, dtype=jnp.float32) -> jax.Array:
    """Additive [rows, rows] mask for a 2-head pack: token i may attend
    token j iff both sit in the same head's [0,n) or [n,2n) block.  Pad
    rows/cols (>= 2n) are fully masked as KEYS; pad QUERY rows keep
    col 0 open so their softmax stays finite (their output is sliced
    away)."""
    idx = jnp.arange(rows)
    blk = jnp.where(idx < n, 0, jnp.where(idx < 2 * n, 1, 2))
    ok = (blk[:, None] == blk[None, :]) & (blk[None, :] < 2)
    ok = ok | ((blk[:, None] == 2) & (idx[None, :] == 0))
    return jnp.where(ok, 0.0, -1e30).astype(dtype)


def _pack_pairs(x: jax.Array) -> jax.Array:
    """[B, h, N, hd] -> [B, h//2, 2N, hd] (pure reshape: consecutive
    head pairs stack along the sequence axis)."""
    b, h, n, hd = x.shape
    return x.reshape(b, h // 2, 2 * n, hd)


@functools.partial(jax.jit, static_argnames=())
def packed_attention(q: jax.Array, k: jax.Array, v: jax.Array
                     ) -> jax.Array:
    """Exact MHA via head-pair packing (XLA path).

    q, k, v: [B, h, N, hd] (h even).  Returns [B, h, N, hd] in the
    compute dtype of ``v``; scores accumulate f32 like the einsum path.
    """
    b, h, n, hd = q.shape
    qp, kp, vp = _pack_pairs(q), _pack_pairs(k), _pack_pairs(v)
    att = jnp.einsum("bgqd,bgkd->bgqk", qp, kp,
                     preferred_element_type=jnp.float32)
    att = att / jnp.sqrt(hd).astype(att.dtype)
    att = att + _pair_mask(n, 2 * n)
    att = jax.nn.softmax(att, axis=-1).astype(v.dtype)
    out = jnp.einsum("bgqk,bgkd->bgqd", att, vp,
                     preferred_element_type=jnp.float32)
    return out.reshape(b, h, n, hd).astype(v.dtype)


def _fused_kernel(q_ref, k_ref, v_ref, m_ref, o_ref, *, scale: float):
    s = jax.lax.dot_general(
        q_ref[0], k_ref[0],
        dimension_numbers=(((1,), (1,)), ((), ())),   # q @ k^T
        preferred_element_type=jnp.float32)
    s = s * scale + m_ref[:]
    s = s - jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s)
    p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(v_ref.dtype)
    o_ref[0] = jax.lax.dot_general(
        p, v_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_short_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                          interpret: bool = False) -> jax.Array:
    """Exact MHA with QK^T + softmax + P@V fused in one Pallas kernel
    over head pairs; probabilities never touch HBM.

    q, k, v: [B, h, N, hd] (h even, hd a multiple of 8).  Rows per pair
    pad 2N -> the sublane-friendly 128; returns [B, h, N, hd].
    """
    b, h, n, hd = q.shape
    if h % 2:
        raise ValueError("fused_short_attention needs an even head count")
    rows = max(_LANE, -(-2 * n // 8) * 8)
    pairs = b * h // 2

    def prep(x):
        xp = _pack_pairs(x).reshape(pairs, 2 * n, hd)
        return jnp.pad(xp, ((0, 0), (0, rows - 2 * n), (0, 0)))

    qp, kp, vp = prep(q), prep(k), prep(v)
    mask = _pair_mask(n, rows)
    out = pl.pallas_call(
        functools.partial(_fused_kernel, scale=float(1.0 / hd ** 0.5)),
        grid=(pairs,),
        in_specs=[
            pl.BlockSpec((1, rows, hd), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, hd), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, hd), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, rows), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rows, hd), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((pairs, rows, hd), v.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * pairs * rows * rows * hd * 2,
            bytes_accessed=pairs * rows * hd * 2 * 4,
            transcendentals=pairs * rows * rows,
        ),
        interpret=interpret,
    )(qp, kp, vp, mask)
    return (out[:, :2 * n]
            .reshape(b, h // 2, 2, n, hd)
            .reshape(b, h, n, hd))
