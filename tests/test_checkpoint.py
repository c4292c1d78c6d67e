import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vidgraph_tpu.models.captioner import CaptionerConfig, forward, \
    init_params
from vidgraph_tpu.models.checkpoint import load_params, save_params
from vidgraph_tpu.models.vit import ViTConfig, init_vision_tower


def test_captioner_roundtrip(tmp_path):
    cfg = CaptionerConfig.tiny()
    params = init_params(cfg, seed=0)
    path = save_params(params, str(tmp_path / "cap.npz"))
    template = init_params(cfg, seed=99)   # different values, same shapes
    loaded = load_params(template, path)
    vis = jnp.ones((1, cfg.num_vision_tokens, cfg.vision_dim), jnp.float32)
    toks = jnp.zeros((1, 4), jnp.int32)
    np.testing.assert_allclose(
        np.asarray(forward(params, cfg, vis, toks)),
        np.asarray(forward(loaded, cfg, vis, toks)), rtol=1e-6)


def test_vit_roundtrip(tmp_path):
    cfg = ViTConfig.tiny()
    model, params = init_vision_tower(cfg, seed=0)
    path = save_params(params, str(tmp_path / "vit.npz"))
    _, template = init_vision_tower(cfg, seed=5)
    loaded = load_params(template, path)
    x = jnp.ones((1, cfg.image_size, cfg.image_size, 3), jnp.float32)
    np.testing.assert_allclose(np.asarray(model.apply(params, x)),
                               np.asarray(model.apply(loaded, x)),
                               rtol=1e-5, atol=1e-6)


def test_bf16_roundtrip_exact(tmp_path):
    """bf16 leaves persist as uint16 bit patterns — bit-exact round-trip
    (npz has no native bfloat16; round 4, needed for mid-scale bf16
    checkpoints)."""
    from vidgraph_tpu.models.captioner import quantize_params

    cfg = CaptionerConfig.tiny()
    bf16 = quantize_params(init_params(cfg, seed=0), jnp.bfloat16)
    path = save_params(bf16, str(tmp_path / "cap16.npz"))
    template = quantize_params(init_params(cfg, seed=7), jnp.bfloat16)
    loaded = load_params(template, path)
    for a, b in zip(jax.tree_util.tree_leaves(bf16),
                    jax.tree_util.tree_leaves(loaded)):
        a, b = np.asarray(a), np.asarray(b)
        assert a.dtype == b.dtype
        assert np.array_equal(a.view(np.uint16) if a.dtype.name == "bfloat16"
                              else a,
                              b.view(np.uint16) if b.dtype.name == "bfloat16"
                              else b)


def test_bf16_loads_into_f32_template(tmp_path):
    """A bf16 checkpoint upcasts into an f32 template (and vice versa) so
    serving code can choose storage dtype independently of the file."""
    cfg = CaptionerConfig.tiny()
    from vidgraph_tpu.models.captioner import quantize_params

    bf16 = quantize_params(init_params(cfg, seed=0), jnp.bfloat16)
    path = save_params(bf16, str(tmp_path / "cap16.npz"))
    loaded = load_params(init_params(cfg, seed=3), path)
    for a, b in zip(jax.tree_util.tree_leaves(bf16),
                    jax.tree_util.tree_leaves(loaded)):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32))


def test_shape_mismatch_raises(tmp_path):
    cfg = CaptionerConfig.tiny()
    params = init_params(cfg, seed=0)
    path = save_params(params, str(tmp_path / "cap.npz"))
    bigger = CaptionerConfig(width=64, layers=2, heads=2, vision_dim=32,
                             num_vision_tokens=2, max_len=64)
    with pytest.raises((ValueError, KeyError)):
        load_params(init_params(bigger, seed=0), path)
