"""MasQCLIP adapter: CLIP ViT with trainable Mask Class Tokens.

Rebuild of ``MasQCLIPAdapter``
(``openvis/modeling/clip_adapter/masqclip_adapter.py:45-265``): the CLIP
vision transformer gains ``Q`` extra "mask class tokens" (cls-token
positional embedding + class embedding); in every attention layer the
ORIGINAL tokens run frozen standard self-attention among themselves
(detached inputs), while each mask token queries the original tokens
through a NEW trainable ``new_q_proj`` with a boolean mask restricting
attention to its instance's patches (+ the cls token)
(``masqclip_adapter.py:53-91,177-183``).  Only ``new_q_proj`` (and the
mask-token embedding) train (``:207-208``).

Param layout matches ``CLIPVisionTransformer`` exactly, plus
``resblock{i}/attn/new_q_proj`` — converted CLIP weights graft directly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from openvis_tpu.models.clip.model import (
    CLIP_PIXEL_MEAN,
    CLIP_PIXEL_STD,
    LayerNormF32,
    quick_gelu,
    resize_pos_embed,
)
from openvis_tpu.utils.image import (
    resize_bicubic_torch,
    resize_bilinear_torch_hw,
)


class MasQAttention(nn.Module):
    width: int
    heads: int

    @nn.compact
    def __call__(self, x, nq: int, allow: jax.Array):
        """x: (B, nq+1+L, C); allow: (B, nq, 1+L) bool — True = may attend."""
        c, h = self.width, self.heads
        dh = c // h
        b = x.shape[0]
        clip_tok = jax.lax.stop_gradient(x[:, nq:])  # (B, 1+L, C) detached
        lk = clip_tok.shape[1]

        q = nn.Dense(c, name="q_proj")(clip_tok).reshape(b, lk, h, dh)
        k = nn.Dense(c, name="k_proj")(clip_tok).reshape(b, lk, h, dh)
        v = nn.Dense(c, name="v_proj")(clip_tok).reshape(b, lk, h, dh)
        scale = 1.0 / jnp.sqrt(jnp.asarray(dh, x.dtype))
        clip_logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
        clip_out = jnp.einsum(
            "bhqk,bkhd->bqhd",
            jax.nn.softmax(clip_logits, axis=-1), v,
        ).reshape(b, lk, c)

        new_q = nn.Dense(c, name="new_q_proj")(x[:, :nq]).reshape(b, nq, h, dh)
        mask_logits = jnp.einsum("bqhd,bkhd->bhqk", new_q, k) * scale
        bias = jnp.where(allow[:, None], 0.0, -jnp.inf).astype(x.dtype)
        mask_out = jnp.einsum(
            "bhqk,bkhd->bqhd",
            jax.nn.softmax(mask_logits + bias, axis=-1), v,
        ).reshape(b, nq, c)

        out = jnp.concatenate([mask_out, clip_out], axis=1)
        return nn.Dense(c, name="out_proj")(out)


class MasQBlock(nn.Module):
    width: int
    heads: int

    @nn.compact
    def __call__(self, x, nq, allow):
        y = LayerNormF32(name="ln_1")(x)
        x = x + MasQAttention(self.width, self.heads, name="attn")(y, nq, allow)
        y = LayerNormF32(name="ln_2")(x)
        h = nn.Dense(self.width * 4, name="mlp_c_fc")(y)
        return x + nn.Dense(self.width, name="mlp_c_proj")(quick_gelu(h))


class MasQCLIPVisual(nn.Module):
    """CLIP visual tower + mask class tokens; same param names as
    ``CLIPVisionTransformer`` plus per-block ``new_q_proj``."""

    patch_size: int = 16
    width: int = 768
    layers: int = 12
    heads: int = 12
    embed_dim: int = 512
    image_size: int = 224

    @nn.compact
    def __call__(self, images: jax.Array, masks: jax.Array) -> jax.Array:
        """images: (B, S, S, 3) CLIP-normalized at input resolution;
        masks: (B, Q, S, S) mask logits at input resolution.
        -> (B, Q, D) normalized mask-token features."""
        b, q = masks.shape[:2]
        x = nn.Conv(self.width, (self.patch_size,) * 2,
                    strides=(self.patch_size,) * 2, use_bias=False,
                    name="conv1")(images)
        h, w = x.shape[1:3]
        x = x.reshape(b, h * w, self.width)
        cls_emb = self.param(
            "class_embedding", nn.initializers.normal(0.02), (self.width,)
        )
        pos = self.param(
            "positional_embedding", nn.initializers.normal(0.01),
            (1 + (self.image_size // self.patch_size) ** 2, self.width),
        )
        mask_tok_emb = self.param(
            "mask_embeddings", nn.initializers.normal(0.01), (self.width,)
        )
        cls = jnp.broadcast_to(cls_emb, (b, 1, self.width)).astype(x.dtype)
        clip_tok = jnp.concatenate([cls, x], axis=1) + resize_pos_embed(
            pos, (h, w)
        )[None].astype(x.dtype)
        mask_tok = jnp.broadcast_to(
            (mask_tok_emb + cls_emb), (b, q, self.width)
        ).astype(x.dtype)
        tokens = jnp.concatenate([mask_tok, clip_tok], axis=1)
        tokens = LayerNormF32(name="ln_pre")(tokens)

        # attention allow-mask: patch inside the (max-pooled) mask, cls free
        # (exact torch bilinear — identity when masks already arrive at the
        # CLIP input resolution, the usual case)
        m = resize_bilinear_torch_hw(
            masks, (h * self.patch_size, w * self.patch_size)
        )
        m = nn.max_pool(
            m[..., None].reshape(b * q, h * self.patch_size, w * self.patch_size, 1),
            (self.patch_size,) * 2, strides=(self.patch_size,) * 2,
        ).reshape(b, q, h * w)
        allow = jnp.concatenate(
            [jnp.ones((b, q, 1), bool), m > 0.0], axis=-1
        )  # (B, Q, 1+hw)
        # fully-empty masks would softmax over -inf only -> allow cls always
        for i in range(self.layers):
            tokens = MasQBlock(self.width, self.heads, name=f"resblock{i}")(
                tokens, q, allow
            )
        feats = LayerNormF32(name="ln_post")(tokens[:, :q])
        proj = self.param(
            "proj", nn.initializers.normal(self.width ** -0.5),
            (self.width, self.embed_dim),
        )
        feats = feats @ proj
        return feats / (jnp.linalg.norm(feats, axis=-1, keepdims=True) + 1e-6)


def preprocess_frames(frames_raw: jax.Array, size: int) -> jax.Array:
    """(N, H, W, 3) raw 0-255 -> CLIP-normalized at ``size`` with the
    reference's exact bicubic (masqclip_adapter.py:229 interpolate
    mode="bicubic"; see utils/image.py for the torch-kernel rationale)."""
    x = resize_bicubic_torch(frames_raw / 255.0, (size, size))
    mean = jnp.asarray(CLIP_PIXEL_MEAN, x.dtype)
    std = jnp.asarray(CLIP_PIXEL_STD, x.dtype)
    return (x - mean) / std
