"""FlashAttention training path (models/captioner.py::_attn_flash).

The Pallas kernel only lowers on real TPU hardware, so the CPU suite can
assert exactly two things: (1) the ``flash=True`` flag silently falls
back to the masked-einsum path on non-TPU backends (same numerics, no
crash anywhere a config enables it), and (2) the semantics the flash
path promises — causal everywhere except the mutually-visible vision
prefix — match what the einsum mask actually encodes, by reproducing the
fix-up decomposition with plain jnp.  The compiled-kernel parity (logits
AND gradients vs the einsum path, padded non-128-multiple sequence) runs
on the chip behind ``--run-tpu``.
"""
import os
import subprocess
import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

from vidgraph_tpu.models.captioner import (CaptionerConfig, flash_pad_len,
                                           forward, init_params)

REPO = Path(__file__).resolve().parent.parent


def test_flash_pad_len_picks_cheaper_large_block_multiple():
    """The pad target must (a) be >= t, (b) be divisible by 384 or 512 so
    _attn_flash never falls back to 128-blocks, and (c) be the cheaper of
    the two candidates."""
    for t in (1, 17, 258, 384, 385, 512, 513, 1024, 1032, 4000):
        p = flash_pad_len(t)
        assert p >= t
        assert p % 384 == 0 or p % 512 == 0, (t, p)
        assert p == min(x for x in (p, -(-t // 384) * 384,
                                    -(-t // 512) * 512))
    assert flash_pad_len(258) == 384
    assert flash_pad_len(512) == 512      # exact multiple stays put
    assert flash_pad_len(513) == 768      # 768 beats 1024
    assert flash_pad_len(1024) == 1024    # 1024 beats 1152


def test_flash_flag_falls_back_on_cpu():
    cfg = CaptionerConfig.tiny()
    params = init_params(cfg, seed=0)
    rng = np.random.default_rng(0)
    vis = jnp.asarray(rng.normal(size=(2, cfg.num_vision_tokens,
                                       cfg.vision_dim)).astype(np.float32))
    toks = jnp.asarray(rng.integers(3, 250, (2, 17)), jnp.int32)
    ref = forward(params, cfg, vis, toks)
    got = forward(params, cfg, vis, toks, flash=True)
    assert np.array_equal(np.asarray(ref), np.asarray(got))


def test_prefix_fixup_decomposition_matches_masked_softmax():
    """The flash path = causal softmax for rows >= nv, dense nv x nv for
    rows < nv.  Verify that decomposition against the einsum path's
    actual mask on random q/k/v (pure jnp — no kernel involved)."""
    rng = np.random.default_rng(1)
    b, t, h, hd, nv = 2, 24, 2, 8, 4
    q = jnp.asarray(rng.normal(size=(b, t, h, hd)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, t, h, hd)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, t, h, hd)).astype(np.float32))

    def masked(mask):
        att = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(hd)
        att = jax_softmax(att + mask[None, None])
        return jnp.einsum("bhqk,bkhd->bqhd", att, v)

    import jax

    def jax_softmax(x):
        return jax.nn.softmax(x, axis=-1)

    idx = jnp.arange(t)
    full_mask = jnp.where(idx[None, :] <= idx[:, None], 0.0, -1e30)
    full_mask = full_mask.at[:, :nv].set(0.0)
    ref = masked(full_mask)

    causal_only = jnp.where(idx[None, :] <= idx[:, None], 0.0, -1e30)
    o = masked(causal_only)
    att = jnp.einsum("bqhd,bkhd->bhqk", q[:, :nv], k[:, :nv]) / jnp.sqrt(hd)
    op = jnp.einsum("bhqk,bkhd->bqhd", jax_softmax(att), v[:, :nv])
    got = jnp.concatenate([op, o[:, nv:]], axis=1)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                               rtol=1e-5, atol=1e-5)


_CHIP = r"""
import numpy as np
import jax, jax.numpy as jnp
assert jax.devices()[0].platform != "cpu", jax.devices()
from vidgraph_tpu.models.captioner import CaptionerConfig, forward, init_params
import optax
from vidgraph_tpu.models.tokenizer import PAD_ID

cfg = CaptionerConfig(width=256, layers=2, heads=4, max_len=512)
params = init_params(cfg, seed=0)
rng = np.random.default_rng(0)
vis = jnp.asarray(rng.normal(size=(2, cfg.num_vision_tokens,
                                   cfg.vision_dim)).astype(np.float32))
# 250 tokens + nv 8 = 258: NOT a 128 multiple, exercises pad + slice
toks = jnp.asarray(rng.integers(3, 250, (2, 250)), jnp.int32)
ref = np.asarray(forward(params, cfg, vis, toks))
got = np.asarray(forward(params, cfg, vis, toks, flash=True))
d = np.abs(ref - got).max()
assert d < 0.05, f"logits diverge: {d}"   # bf16 qkv, different fp order

def loss(p, flash):
    lg = forward(p, cfg, vis, toks, flash=flash)
    tgt = jnp.roll(toks, -1, axis=1)
    return optax.softmax_cross_entropy_with_integer_labels(lg, tgt).mean()

g_ref = jax.grad(lambda p: loss(p, False))(params)
g_fl = jax.grad(lambda p: loss(p, True))(params)
for (ka, a), (kb, b) in zip(
        jax.tree_util.tree_leaves_with_path(g_ref),
        jax.tree_util.tree_leaves_with_path(g_fl)):
    a, b = np.asarray(a), np.asarray(b)
    denom = max(float(np.abs(a).max()), 1e-6)
    rel = float(np.abs(a - b).max()) / denom
    assert rel < 0.05, (jax.tree_util.keystr(ka), rel)
print("FLASH_PARITY_OK")
"""


@pytest.mark.tpu
def test_flash_parity_on_chip():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "host_platform_device_count" not in f)
    proc = subprocess.run([sys.executable, "-c", _CHIP], env=env,
                          cwd=REPO, capture_output=True, text=True,
                          timeout=900)
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "FLASH_PARITY_OK" in proc.stdout
