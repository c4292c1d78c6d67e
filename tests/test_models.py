import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vidgraph_tpu.models import (CaptionerConfig, HashedNGramEmbedder,
                                 ViTConfig, decode, encode, forward, generate,
                                 init_params, init_vision_tower)
from vidgraph_tpu.models.tokenizer import EOS_ID, batch_encode


def test_tokenizer_roundtrip():
    s = "Person holds a Beaker — café 12"
    assert decode(encode(s)) == s
    b = batch_encode(["ab", "xyz!"], 10)
    assert b.shape == (2, 10)
    assert decode(b[1]) == "xyz!"


def test_vision_tower_tiny():
    cfg = ViTConfig.tiny()
    model, params = init_vision_tower(cfg, seed=0)
    imgs = jnp.asarray(np.random.default_rng(0).normal(
        size=(3, cfg.image_size, cfg.image_size, 3)).astype(np.float32))
    out = model.apply(params, imgs)
    assert out.shape == (3, cfg.embed_dim)
    norms = np.linalg.norm(np.asarray(out), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-3)


def test_captioner_forward_and_generate_consistency():
    cfg = CaptionerConfig.tiny()
    params = init_params(cfg, seed=0)
    rng = np.random.default_rng(1)
    vis = jnp.asarray(rng.normal(size=(2, cfg.num_vision_tokens,
                                       cfg.vision_dim)).astype(np.float32))
    toks = jnp.asarray(rng.integers(0, 255, size=(2, 5)).astype(np.int32))
    logits = forward(params, cfg, vis, toks)
    assert logits.shape == (2, 5, cfg.vocab)

    out = generate(params, cfg, vis, max_new=8)
    assert out.shape == (2, 8)
    # greedy decode is deterministic
    out2 = generate(params, cfg, vis, max_new=8)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))


def test_generate_matches_forward_greedy():
    """The KV-cache decode must produce exactly the tokens that repeated
    full-sequence forward greedy decoding would."""
    cfg = CaptionerConfig.tiny()
    params = init_params(cfg, seed=3)
    rng = np.random.default_rng(2)
    vis = jnp.asarray(rng.normal(size=(1, cfg.num_vision_tokens,
                                       cfg.vision_dim)).astype(np.float32))
    got = np.asarray(generate(params, cfg, vis, max_new=6))[0]

    from vidgraph_tpu.models.tokenizer import BOS_ID
    toks = [BOS_ID]
    ref = []
    for _ in range(6):
        logits = forward(params, cfg, vis,
                         jnp.asarray([toks], jnp.int32))
        nxt = int(jnp.argmax(logits[0, -1]))
        ref.append(nxt)
        if nxt == EOS_ID:
            break
        toks.append(nxt)
    np.testing.assert_array_equal(got[:len(ref)], ref)


def test_hash_embedder_similarity_ordering():
    e = HashedNGramEmbedder(dim=128, n_buckets=1024)
    vecs = e.embed([
        "the person wears blue nitrile gloves in the laboratory",
        "a person wearing blue gloves in a lab",
        "the stock market closed higher on tuesday",
    ])
    assert vecs.shape == (3, 128)
    np.testing.assert_allclose(np.linalg.norm(vecs, axis=1), 1.0, atol=1e-5)
    sim_close = float(vecs[0] @ vecs[1])
    sim_far = float(vecs[0] @ vecs[2])
    assert sim_close > sim_far + 0.1


def test_hash_embedder_deterministic_and_empty():
    e1 = HashedNGramEmbedder(dim=64, n_buckets=512)
    e2 = HashedNGramEmbedder(dim=64, n_buckets=512)
    np.testing.assert_array_equal(e1.embed(["abc"]), e2.embed(["abc"]))
    z = e1.embed([""])
    assert z.shape == (1, 64)
    assert e1.embed([]).shape == (0, 64)
