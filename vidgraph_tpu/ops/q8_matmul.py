"""Pallas weight-only int8 matmul for bandwidth-bound decode.

``out[M,N] = (x[M,K] @ dequant(q[K,N])) * s[N]`` where the int8 weight
tile is converted to bf16 INSIDE VMEM — exactly one byte per weight
element crosses HBM, which is the whole point of weight-only int8 on a
decode step that is HBM-bound (docs/EVAL.md: 1.2B captioner at MBU 0.78
bf16).  This kernel is the hedge for the XLA ``a16`` path
(models/quant8.py::wdot): if XLA materialises the dequantised [K,N]
matrix instead of fusing the convert into the dot's operand read, the
int8 win evaporates — the Pallas kernel pins the data movement by
construction.  scripts/profile_int8_decode.py measures all paths on the
real chip.

Grid: one program per N-tile; the (small — decode M<=32) activation
block stays resident while weight tiles stream HBM->VMEM.  Used via
``qmode='a16p'`` (models/captioner.py) for shapes with K,N multiples of
128; other shapes fall back to the XLA path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _kernel(x_ref, q_ref, s_ref, o_ref):
    w = q_ref[:].astype(jnp.bfloat16)          # int8 -> bf16 in VMEM
    acc = jax.lax.dot_general(
        x_ref[:].astype(jnp.bfloat16), w,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[:] = acc * s_ref[:]                  # [1,BN] broadcasts over M


@functools.partial(jax.jit, static_argnames=("block_n", "interpret"))
def q8_matmul(x: jax.Array, q: jax.Array, s: jax.Array,
              block_n: int = 512, interpret: bool = False) -> jax.Array:
    """x [M,K] float, q [K,N] int8, s [N] f32 -> f32 [M,N].

    Requires K % 128 == 0 and N % 128 == 0 (decoder widths are); M is
    padded to the bf16 sublane tile internally.
    """
    m, k = x.shape
    n = q.shape[1]
    if k % _LANE or n % _LANE:
        raise ValueError(f"q8_matmul needs K,N multiples of {_LANE}; "
                         f"got K={k} N={n}")
    bn = min(_round_up(n, _LANE), block_n)
    if n % bn:
        bn = _LANE  # N is a lane multiple, so this always divides
    mt = _round_up(m, 16)
    xp = jnp.zeros((mt, k), jnp.bfloat16).at[:m].set(x.astype(jnp.bfloat16))
    out = pl.pallas_call(
        _kernel,
        grid=(n // bn,),
        in_specs=[
            pl.BlockSpec((mt, k), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, bn), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((mt, bn), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mt, n), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * mt * n * k,
            bytes_accessed=mt * k * 2 + n * k + n * 4 + mt * n * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp, q, s.reshape(1, n).astype(jnp.float32))
    return out[:m]
