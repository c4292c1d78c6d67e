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


# -- trained text embedder (round 2) -----------------------------------------

def test_transformer_embedder_checkpoint_roundtrip(tmp_path):
    import numpy as np
    from vidgraph_tpu.models.checkpoint import save_params
    from vidgraph_tpu.models.text_embedder import TransformerTextEmbedder

    a = TransformerTextEmbedder(dim=32, width=32, layers=1, heads=2,
                                max_len=32, seed=3)
    path = tmp_path / "emb.npz"
    save_params(a._params, str(path))
    b = TransformerTextEmbedder(dim=32, width=32, layers=1, heads=2,
                                max_len=32, seed=99,
                                checkpoint_path=str(path))
    va = a.embed(["a red beaker", "the person measures"])
    vb = b.embed(["a red beaker", "the person measures"])
    assert np.allclose(va, vb, atol=1e-5)
    # L2-normalised
    assert np.allclose(np.linalg.norm(va, axis=1), 1.0, atol=1e-3)


def test_transformer_embedder_pad_invariance():
    # the pad mask must make embeddings independent of batch padding
    import numpy as np
    from vidgraph_tpu.models.text_embedder import TransformerTextEmbedder

    e = TransformerTextEmbedder(dim=32, width=32, layers=1, heads=2,
                                max_len=32, seed=0)
    solo = e.embed(["short text"])
    e._cache.clear()
    batch = e.embed(["short text", "a much longer sentence that fills "
                                   "more of the window"])
    assert np.allclose(solo[0], batch[0], atol=1e-4)


def test_hybrid_embedder_composition():
    import numpy as np
    from vidgraph_tpu.models.text_embedder import (HashedNGramEmbedder,
                                                   HybridEmbedder)

    h = HybridEmbedder(dim=32, ctx_weight=0.25, width=32, layers=1,
                       heads=2, max_len=32)
    v = h.embed(["the beaker on the balance"])
    assert v.shape == (1, 64)
    # cosine decomposes: hash channel carries (1-w) of the norm
    hn = np.linalg.norm(v[0, :32]) ** 2
    cn = np.linalg.norm(v[0, 32:]) ** 2
    assert abs(hn - 0.75) < 0.02 and abs(cn - 0.25) < 0.02
    # identical text -> cosine 1; hash channel dominates lexical overlap
    ref = HashedNGramEmbedder(dim=32).embed(["the beaker on the balance"])
    assert np.allclose(v[0, :32] / np.sqrt(0.75), ref[0], atol=1e-4)


def test_int8_vit_matches_f32_tower():
    # documented-dead-end module (see vit_quant.py docstring): numerics
    # must stay faithful even though it is not wired into any backend
    import numpy as np
    from vidgraph_tpu.models.vit import ViTConfig, init_vision_tower
    from vidgraph_tpu.models.vit_quant import (quantize_vit_params,
                                               vit_forward_int8)

    cfg = ViTConfig(image_size=64, patch_size=32, width=64, layers=2,
                    heads=2, embed_dim=32, dtype=jnp.float32)
    model, params = init_vision_tower(cfg, seed=0)
    qp = quantize_vit_params(params, cfg)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.normal(size=(3, 64, 64, 3)).astype(np.float32))
    ref = np.asarray(model.apply(params, imgs))
    got = np.asarray(vit_forward_int8(qp, cfg, imgs))
    cos = (ref * got).sum(axis=1)
    assert cos.min() > 0.995, cos
