"""Pipeline parallelism for transformer block stacks (GPipe schedule).

The captioner's L identical blocks are distributed across the mesh "pipe"
axis (each device holds L/S contiguous blocks, parameters sharded on the
stacked leading dim); microbatches stream through the stages with
``jax.lax.ppermute`` moving activations between neighbouring devices.  All
devices run the same SPMD program; the schedule has the classic S-1 bubble.

Forward output is bit-identical to the sequential block stack (verified in
tests/test_pipeline_parallel.py), and because ppermute is differentiable
the same function drops into the training step for pp x dp x tp meshes.
"""
from __future__ import annotations

import functools
from typing import Any, Callable, Dict, List

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

PIPE_AXIS = "pipe"


def stack_block_params(blocks: List[Dict]) -> Dict:
    """List of per-block param dicts -> single pytree with leading dim L."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks)


def pipeline_forward(block_fn: Callable[[Dict, jax.Array], jax.Array],
                     stacked_params: Dict, x: jax.Array, mesh: Mesh,
                     n_microbatches: int,
                     axis: str = PIPE_AXIS) -> jax.Array:
    """Run ``x [B, ...]`` through all L stacked blocks, pipelined over the
    mesh ``axis``.  B must divide by n_microbatches; L by the axis size."""
    n_stages = mesh.shape[axis]
    batch = x.shape[0]
    if batch % n_microbatches:
        raise ValueError(f"batch {batch} % microbatches {n_microbatches}")
    leading = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]
    if leading % n_stages:
        raise ValueError(f"blocks {leading} % stages {n_stages}")
    mb = batch // n_microbatches
    micro = x.reshape((n_microbatches, mb) + x.shape[1:])

    def spmd(params_local, micro_in):
        stage = jax.lax.axis_index(axis)
        n_steps = n_microbatches + n_stages - 1
        fwd_perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

        def stage_apply(h):
            def body(h, bp):
                return block_fn(bp, h), None

            h, _ = jax.lax.scan(body, h, params_local)
            return h

        def step(carry, t):
            recv, outputs = carry
            # stage 0 injects microbatch t (clamped; masked when t >= M)
            idx = jnp.clip(t, 0, n_microbatches - 1)
            inj = jax.lax.dynamic_index_in_dim(micro_in, idx, 0,
                                               keepdims=False)
            take_input = (stage == 0) & (t < n_microbatches)
            h = jnp.where(take_input, inj, recv)
            out = stage_apply(h)
            # last stage banks microbatch t-(S-1) once it's real
            out_idx = jnp.clip(t - (n_stages - 1), 0, n_microbatches - 1)
            valid = (stage == n_stages - 1) & (t >= n_stages - 1)
            slot = jax.lax.dynamic_index_in_dim(outputs, out_idx, 0,
                                                keepdims=False)
            outputs = jax.lax.dynamic_update_index_in_dim(
                outputs, jnp.where(valid, out, slot), out_idx, 0)
            # activations advance one stage
            recv = jax.lax.ppermute(out, axis, fwd_perm)
            return (recv, outputs), None

        # carry values become device-varying after ppermute; mark them so
        # from the start (shard_map varying-axis typing)
        init = (jax.lax.pcast(jnp.zeros_like(micro_in[0]), (axis,),
                              to="varying"),
                jax.lax.pcast(jnp.zeros_like(micro_in), (axis,),
                              to="varying"))
        (recv, outputs), _ = jax.lax.scan(step, init, jnp.arange(n_steps))
        # only the last stage holds real outputs; psum replicates them
        outputs = jnp.where(stage == n_stages - 1, outputs, 0.0)
        return jax.lax.psum(outputs, axis)

    out = jax.shard_map(spmd, mesh=mesh,
                        in_specs=(P(axis), P()),
                        out_specs=P())(stacked_params, micro)
    return out.reshape(x.shape)


def captioner_block_fn(cfg, mask: jax.Array
                       ) -> Callable[[Dict, jax.Array], jax.Array]:
    """Adapter: the captioner's full-sequence block as a pipeline stage
    body (mask closed over; bp leaves have no leading block dim)."""
    from ..models.captioner import _block

    def fn(bp: Dict, x: jax.Array) -> jax.Array:
        return _block(bp, cfg, x, mask)

    return fn
