"""Vision tower: CLIP-style ViT in Flax, MXU-friendly.

Replaces the reference's HTTP round-trip to an external VLM server for frame
understanding (reference: src/pipeline/vlm_extractor.py:130-192).  Frames are
preprocessed by ops.preprocess, patchified into a matmul-ready matrix, and
run batched per chunk; all matmuls are bf16-compute / f32-accumulate.

Tensor-parallel sharding: attention heads and MLP hidden are split along the
mesh "model" axis (see param_shardings()), batch along "data".
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..ops.preprocess import patchify


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    image_size: int = 224
    patch_size: int = 32
    width: int = 768
    layers: int = 12
    heads: int = 12
    embed_dim: int = 512          # output projection dim
    mlp_ratio: int = 4
    dtype: Any = jnp.bfloat16     # compute dtype
    #: attention implementation: "einsum" (reference path), "packed"
    #: (XLA head-pair packing), "fused" (Pallas QK^T+softmax+V kernel)
    #: — all exact; see ops/short_attention.py for why N=50 wants this
    attn_impl: str = "einsum"

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @classmethod
    def b32(cls) -> "ViTConfig":
        return cls()

    @classmethod
    def tiny(cls) -> "ViTConfig":
        """Small config for CPU tests."""
        return cls(image_size=64, patch_size=32, width=64, layers=2,
                   heads=2, embed_dim=32, dtype=jnp.float32)


class MHA(nn.Module):
    cfg: ViTConfig

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = self.cfg
        d = c.width
        hd = d // c.heads
        qkv = nn.Dense(3 * d, dtype=c.dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        b, n, _ = x.shape
        q = q.reshape(b, n, c.heads, hd)
        k = k.reshape(b, n, c.heads, hd)
        v = v.reshape(b, n, c.heads, hd)
        impl = c.attn_impl if c.heads % 2 == 0 else "einsum"
        if impl in ("packed", "fused"):
            from ..ops.short_attention import (fused_short_attention,
                                               packed_attention)
            qh = jnp.swapaxes(q, 1, 2)       # [b, h, n, hd]
            kh = jnp.swapaxes(k, 1, 2)
            vh = jnp.swapaxes(v, 1, 2)
            if impl == "fused":
                oh = fused_short_attention(
                    qh, kh, vh,
                    interpret=jax.default_backend() != "tpu")
            else:
                oh = packed_attention(qh, kh, vh)
            out = jnp.swapaxes(oh, 1, 2)
        else:
            att = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                             preferred_element_type=jnp.float32)
            att = att / jnp.sqrt(hd).astype(att.dtype)
            att = jax.nn.softmax(att, axis=-1).astype(c.dtype)
            out = jnp.einsum("bhqk,bkhd->bqhd", att, v,
                             preferred_element_type=jnp.float32)
        out = out.reshape(b, n, d).astype(c.dtype)
        return nn.Dense(d, dtype=c.dtype, name="proj")(out)


class Block(nn.Module):
    cfg: ViTConfig

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = self.cfg
        y = nn.LayerNorm(dtype=c.dtype, name="ln1")(x)
        x = x + MHA(c, name="attn")(y)
        y = nn.LayerNorm(dtype=c.dtype, name="ln2")(x)
        h = nn.Dense(c.width * c.mlp_ratio, dtype=c.dtype, name="fc1")(y)
        h = jax.nn.gelu(h)
        x = x + nn.Dense(c.width, dtype=c.dtype, name="fc2")(h)
        return x


class VisionTower(nn.Module):
    """images [B,H,W,3] f32 (already normalised) -> embeddings [B, embed_dim]."""
    cfg: ViTConfig

    @nn.compact
    def __call__(self, images: jax.Array,
                 return_tokens: bool = False) -> jax.Array:
        c = self.cfg
        patches = patchify(images, c.patch_size).astype(c.dtype)
        x = nn.Dense(c.width, dtype=c.dtype, name="patch_embed")(patches)
        b, n, _ = x.shape
        cls = self.param("cls", nn.initializers.normal(0.02), (1, 1, c.width))
        pos = self.param("pos", nn.initializers.normal(0.02),
                         (1, n + 1, c.width))
        x = jnp.concatenate([jnp.tile(cls.astype(c.dtype), (b, 1, 1)), x],
                            axis=1)
        x = x + pos.astype(c.dtype)
        for i in range(c.layers):
            x = Block(c, name=f"block_{i}")(x)
        x = nn.LayerNorm(dtype=c.dtype, name="ln_post")(x)
        if return_tokens:
            return nn.Dense(c.embed_dim, dtype=c.dtype, name="proj")(x)
        cls_out = x[:, 0]
        out = nn.Dense(c.embed_dim, dtype=c.dtype, name="proj")(cls_out)
        out = out.astype(jnp.float32)
        return out * jax.lax.rsqrt(
            jnp.sum(out * out, axis=-1, keepdims=True) + 1e-12)


def init_vision_tower(cfg: ViTConfig, seed: int = 0):
    model = VisionTower(cfg)
    dummy = jnp.zeros((1, cfg.image_size, cfg.image_size, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(seed), dummy)
    return model, params


def param_shardings(params: Dict, mesh) -> Dict:
    """Tensor-parallel specs: split attention qkv/MLP hidden on 'model'."""
    from jax.sharding import NamedSharding

    def spec_for(path: str, leaf) -> P:
        if leaf.ndim != 2:
            return P()
        if any(k in path for k in ("qkv", "fc1")):
            return P(None, "model")      # column parallel
        if any(k in path for k in ("proj", "fc2")):
            return P("model", None)      # row parallel
        return P()

    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def assign(path, leaf):
        name = "/".join(str(p.key) for p in path if hasattr(p, "key"))
        return NamedSharding(mesh, spec_for(name, leaf))

    return jax.tree_util.tree_map_with_path(assign, params)
