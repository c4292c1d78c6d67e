"""Pipeline parallelism: GPipe forward must equal the sequential stack."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from vidgraph_tpu.models.captioner import CaptionerConfig, _block, \
    init_params
from vidgraph_tpu.parallel.pipeline import (captioner_block_fn,
                                            pipeline_forward,
                                            stack_block_params)


def _pipe_mesh(n):
    devs = [d for d in jax.devices() if d.platform == "cpu"][:n]
    return Mesh(np.asarray(devs), ("pipe",))


@pytest.mark.parametrize("n_stages,n_micro", [(2, 2), (4, 4), (2, 4)])
def test_pipeline_matches_sequential(n_stages, n_micro):
    cfg = CaptionerConfig(width=32, layers=4, heads=2, vision_dim=32,
                          num_vision_tokens=2, max_len=16,
                          dtype=jnp.float32)
    params = init_params(cfg, seed=0)
    rng = np.random.default_rng(0)
    batch, t = 8, 8
    x = jnp.asarray(rng.normal(size=(batch, t, cfg.width))
                    .astype(np.float32))
    idx = jnp.arange(t)
    mask = jnp.where(idx[None, :] <= idx[:, None], 0.0, -1e30)

    # sequential reference
    ref = x
    for bp in params["blocks"]:
        ref = _block(bp, cfg, ref, mask)

    mesh = _pipe_mesh(n_stages)
    stacked = stack_block_params(params["blocks"])
    got = pipeline_forward(captioner_block_fn(cfg, mask), stacked, x,
                           mesh, n_microbatches=n_micro)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_pipeline_is_differentiable():
    cfg = CaptionerConfig(width=32, layers=2, heads=2, vision_dim=32,
                          num_vision_tokens=2, max_len=16,
                          dtype=jnp.float32)
    params = init_params(cfg, seed=1)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(4, 8, cfg.width)).astype(np.float32))
    idx = jnp.arange(8)
    mask = jnp.where(idx[None, :] <= idx[:, None], 0.0, -1e30)
    mesh = _pipe_mesh(2)
    stacked = stack_block_params(params["blocks"])

    def loss(sp):
        y = pipeline_forward(captioner_block_fn(cfg, mask), sp, x, mesh,
                             n_microbatches=2)
        return jnp.mean(y ** 2)

    grads = jax.grad(loss)(stacked)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(float(jnp.abs(l).sum()) > 0 for l in leaves)


def test_invalid_shapes_raise():
    cfg = CaptionerConfig(width=32, layers=4, heads=2, vision_dim=32,
                          num_vision_tokens=2, max_len=16,
                          dtype=jnp.float32)
    params = init_params(cfg, seed=0)
    mesh = _pipe_mesh(2)
    stacked = stack_block_params(params["blocks"][:3])  # 3 % 2 != 0
    x = jnp.zeros((4, 8, 32), jnp.float32)
    mask = jnp.zeros((8, 8), jnp.float32)
    with pytest.raises(ValueError):
        pipeline_forward(captioner_block_fn(cfg, mask), stacked, x, mesh,
                         n_microbatches=2)
    with pytest.raises(ValueError):
        pipeline_forward(captioner_block_fn(cfg, mask),
                         stack_block_params(params["blocks"]), x, mesh,
                         n_microbatches=3)  # 4 % 3 != 0
