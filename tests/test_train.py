"""Training on the 8-device CPU mesh: loss decreases, shardings honoured."""
import jax.numpy as jnp
import numpy as np
import pytest

from vidgraph_tpu.models.captioner import CaptionerConfig
from vidgraph_tpu.models.tokenizer import batch_encode
from vidgraph_tpu.models.train import TrainState
from vidgraph_tpu.models.vit import ViTConfig


@pytest.fixture  # function scope: step() donates the state's buffers
def state(cpu_mesh):
    vit_cfg = ViTConfig(image_size=64, patch_size=32, width=64, layers=2,
                        heads=2, embed_dim=32, dtype=jnp.float32)
    cap_cfg = CaptionerConfig(width=64, layers=2, heads=2, vision_dim=32,
                              num_vision_tokens=2, max_len=32,
                              dtype=jnp.float32)
    return TrainState.create(vit_cfg, cap_cfg, cpu_mesh,
                             learning_rate=1e-3)


def test_loss_decreases_overfitting_one_batch(state):
    rng = np.random.default_rng(0)
    images = rng.normal(size=(8, 64, 64, 3)).astype(np.float32)
    tokens = batch_encode(["a red square"] * 8, 16)
    images_d, tokens_d = state.shard_batch(images, tokens)
    losses = []
    for _ in range(8):
        state, loss = state.step(images_d, tokens_d)
        losses.append(loss)
    assert losses[-1] < losses[0] * 0.8, losses


def test_param_shardings_on_mesh(state, cpu_mesh):
    qkv = state.params["cap"]["blocks"][0]["qkv_w"]
    assert qkv.sharding.spec == ("None", "model") or \
        tuple(qkv.sharding.spec) == (None, "model")
    fc2 = state.params["cap"]["blocks"][0]["fc2_w"]
    assert tuple(fc2.sharding.spec) == ("model", None)
    # replicated LM head
    head = state.params["cap"]["head_w"]
    assert all(s is None for s in tuple(head.sharding.spec)) or \
        len(tuple(head.sharding.spec)) == 0


def test_sequence_parallel_loss_matches(state):
    """Sequence-sharded tokens must produce the same loss as replicated
    sequence (XLA inserts the gathers; numerics unchanged)."""
    rng = np.random.default_rng(7)
    images = rng.normal(size=(8, 64, 64, 3)).astype(np.float32)
    tokens = batch_encode(["a green circle moves"] * 8, 16)
    from vidgraph_tpu.models.train import caption_loss
    i1, t1 = state.shard_batch(images, tokens, sequence_parallel=False)
    i2, t2 = state.shard_batch(images, tokens, sequence_parallel=True)
    assert tuple(t2.sharding.spec) == ("data", "model")
    with state.mesh:
        l1 = float(caption_loss(state.vit, state.params["vit"],
                                state.params["cap"], state.cap_cfg,
                                i1, t1))
        l2 = float(caption_loss(state.vit, state.params["vit"],
                                state.params["cap"], state.cap_cfg,
                                i2, t2))
    assert abs(l1 - l2) < 1e-4
