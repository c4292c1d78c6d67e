"""Expert-parallel MoE FFN: sharded execution must equal the unsharded
reference; routing actually distributes tokens."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vidgraph_tpu.parallel.moe import (init_moe_params, moe_ffn,
                                       place_experts)


def _expert_mesh(n):
    devs = [d for d in jax.devices() if d.platform == "cpu"][:n]
    return Mesh(np.asarray(devs), ("expert",))


def test_sharded_matches_unsharded():
    params = init_moe_params(jax.random.PRNGKey(0), d_model=32,
                             d_hidden=64, n_experts=4)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 32))
    ref = moe_ffn(params, x)

    mesh = _expert_mesh(4)
    sharded = place_experts(params, mesh)
    with mesh:
        got = jax.jit(moe_ffn)(sharded, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    # expert weights are actually split across the axis
    assert tuple(sharded["w_in"].sharding.spec)[0] == "expert"


def test_routing_uses_multiple_experts():
    params = init_moe_params(jax.random.PRNGKey(2), d_model=16,
                             d_hidden=32, n_experts=4)
    x = jax.random.normal(jax.random.PRNGKey(3), (4, 32, 16))
    top = jnp.argmax(x @ params["router_w"], axis=-1)
    assert len(np.unique(np.asarray(top))) > 1


def test_moe_differentiable():
    params = init_moe_params(jax.random.PRNGKey(4), d_model=16,
                             d_hidden=32, n_experts=2)
    x = jax.random.normal(jax.random.PRNGKey(5), (2, 4, 16))

    def loss(p):
        return jnp.mean(moe_ffn(p, x) ** 2)

    grads = jax.grad(loss)(params)
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree_util.tree_leaves(grads))
