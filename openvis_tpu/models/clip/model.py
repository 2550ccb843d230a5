"""CLIP text + vision towers in flax, TPU-native.

Functional rebuild of the OpenAI CLIP architecture the reference consumes via
the ``clip`` pip package (``openvis/modeling/clip_adapter/adapter.py:15-16``)
and splits apart for SAN (``openvis/modeling/clip_adapter/side_adapter.py``):

  * QuickGELU activations, LayerNorm computed in fp32 (OpenAI numerics);
  * text tower: token emb + learned positional emb, causal transformer,
    ``ln_final``, features at the EOT (argmax token) position, projected by
    ``text_projection``;
  * vision tower (ViT): 16px patch conv, class token, learned positional
    embedding **bilinearly resized** to the input grid for non-224 inputs
    (``side_adapter.py:41-67``), ``ln_pre`` / blocks / ``ln_post`` / ``proj``;
  * block-level API: ``embed`` -> ``run_blocks(lo, hi, attn_bias, taps)`` ->
    ``finalize``, so SAN can run blocks 0..broken_id-1, tap features at
    ``merge_ids``, then drive blocks broken_id.. with per-head attention
    biases and appended "sos" query tokens (``side_adapter.py:147-209``);
  * everything is batch-major (B, L, C); biases are additive logits.

Weights convert 1:1 from an OpenAI CLIP state dict (tools/convert_weights.py).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from openvis_tpu.utils.image import resize_bicubic_torch

NEG_INF = -1e9


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class LayerNormF32(nn.Module):
    """LayerNorm computed in float32 then cast back (CLIP ``LayerNorm``)."""

    @nn.compact
    def __call__(self, x):
        orig = x.dtype
        y = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln")(
            x.astype(jnp.float32)
        )
        return y.astype(orig)


class CLIPAttention(nn.Module):
    width: int
    heads: int

    @nn.compact
    def __call__(self, x, attn_mask=None, attn_bias=None, kv=None, sos_q=0):
        """x: (B, Lq, C) queries; kv defaults to x.  attn_mask: (Lq, Lk)
        additive; attn_bias: (B, H, Lq, Lk) additive per-head.

        ``sos_q > 0`` selects SAN's sos-split structure
        (``side_adapter.py:237-270``): the first ``sos_q`` tokens are sos
        queries, the rest is the ctx (cls+patch) sequence.  By the
        reference bias's own construction ctx rows carry -100 on every sos
        column, i.e. ctx attention is standard CLIP attention (e^-100
        relative weight is below f32 resolution), and a sos row sees only
        itself (bias 0) plus the ctx columns.  ``attn_bias`` is then the
        (B, H, sos_q, Lk-sos_q) additive bias on the sos->ctx logits only —
        the dense (B, H, S, S) bias is never materialized."""
        kv = x if kv is None else kv
        b, lq, c = x.shape
        lk = kv.shape[1]
        h = self.heads
        dh = c // h
        q = nn.Dense(c, name="q_proj")(x).reshape(b, lq, h, dh)
        k = nn.Dense(c, name="k_proj")(kv).reshape(b, lk, h, dh)
        v = nn.Dense(c, name="v_proj")(kv).reshape(b, lk, h, dh)
        scale = jnp.sqrt(jnp.asarray(dh, q.dtype))
        if sos_q:
            assert attn_mask is None and kv is x
            q_s, q_c = q[:, :sos_q], q[:, sos_q:]
            k_s, k_c = k[:, :sos_q], k[:, sos_q:]
            v_s, v_c = v[:, :sos_q], v[:, sos_q:]
            # ctx rows: plain self-attention over ctx tokens
            lc = jnp.einsum("bqhd,bkhd->bhqk", q_c, k_c) / scale
            ac = jax.nn.softmax(lc.astype(jnp.float32), axis=-1).astype(x.dtype)
            out_c = jnp.einsum("bhqk,bkhd->bqhd", ac, v_c)
            # sos rows: [self | ctx] columns (other sos tokens and any
            # -100-biased ctx columns live in attn_bias)
            l_self = jnp.einsum("bqhd,bqhd->bhq", q_s, k_s)[..., None] / scale
            l_ctx = jnp.einsum("bqhd,bkhd->bhqk", q_s, k_c) / scale
            if attn_bias is not None:
                l_ctx = l_ctx + attn_bias
            ls = jnp.concatenate([l_self, l_ctx], axis=-1)
            asm = jax.nn.softmax(ls.astype(jnp.float32), axis=-1).astype(x.dtype)
            a_self = jnp.transpose(asm[..., 0], (0, 2, 1))[..., None]  # (b,q,h,1)
            out_s = a_self * v_s + jnp.einsum(
                "bhqk,bkhd->bqhd", asm[..., 1:], v_c
            )
            out = jnp.concatenate([out_s, out_c], axis=1).reshape(b, lq, c)
            return nn.Dense(c, name="out_proj")(out)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / scale
        if attn_mask is not None:
            logits = logits + attn_mask
        if attn_bias is not None:
            logits = logits + attn_bias
        attn = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, lq, c)
        return nn.Dense(c, name="out_proj")(out)


class ResidualAttentionBlock(nn.Module):
    """CLIP transformer block; supports SAN's biased-attention variant
    (``side_adapter.py:70``): per-head additive ``attn_bias`` on the logits."""

    width: int
    heads: int

    @nn.compact
    def __call__(self, x, attn_mask=None, attn_bias=None, sos_q=0):
        y = LayerNormF32(name="ln_1")(x)
        x = x + CLIPAttention(self.width, self.heads, name="attn")(
            y, attn_mask=attn_mask, attn_bias=attn_bias, sos_q=sos_q
        )
        y = LayerNormF32(name="ln_2")(x)
        h = nn.Dense(self.width * 4, name="mlp_c_fc")(y)
        x = x + nn.Dense(self.width, name="mlp_c_proj")(quick_gelu(h))
        return x


class CLIPTextEncoder(nn.Module):
    """Causal text transformer -> EOT feature @ text_projection."""

    vocab_size: int = 49408
    context_length: int = 77
    width: int = 512
    heads: int = 8
    layers: int = 12
    embed_dim: int = 512

    @nn.compact
    def __call__(self, tokens: jax.Array) -> jax.Array:  # (B, 77) int32
        emb = nn.Embed(self.vocab_size, self.width, name="token_embedding")
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(0.01),
            (self.context_length, self.width),
        )
        x = emb(tokens) + pos[None]
        l = tokens.shape[1]
        causal = jnp.triu(jnp.full((l, l), NEG_INF, x.dtype), k=1)
        for i in range(self.layers):
            x = ResidualAttentionBlock(
                self.width, self.heads, name=f"resblock{i}"
            )(x, attn_mask=causal)
        x = LayerNormF32(name="ln_final")(x)
        eot = jnp.argmax(tokens, axis=-1)  # EOT has the highest token id
        feats = jnp.take_along_axis(x, eot[:, None, None], axis=1)[:, 0]
        proj = self.param(
            "text_projection",
            nn.initializers.normal(self.width ** -0.5),
            (self.width, self.embed_dim),
        )
        return feats @ proj


def resize_pos_embed(
    pos: jax.Array, grid_hw: Tuple[int, int], src_grid: Optional[int] = None
) -> jax.Array:
    """Resize a (1+G*G, C) ViT positional embedding to a new (H', W') patch
    grid with the reference's exact interpolation — BICUBIC, antialias=False
    (``side_adapter.py:41-67`` resize_pos_embed2d defaults).  Returns
    (1+H'*W', C)."""
    n, c = pos.shape
    g = src_grid or int(round((n - 1) ** 0.5))
    cls, grid = pos[:1], pos[1:]
    if (g, g) == tuple(grid_hw):
        return pos
    grid = resize_bicubic_torch(grid.reshape(g, g, c), tuple(grid_hw))
    return jnp.concatenate([cls, grid.reshape(-1, c)], axis=0)


class CLIPVisionTransformer(nn.Module):
    """ViT vision tower with block-level access for adapter surgery."""

    patch_size: int = 16
    width: int = 768
    layers: int = 12
    heads: int = 12
    embed_dim: int = 512
    image_size: int = 224  # pretrain grid (pos-embed native size)

    def setup(self):
        g = self.image_size // self.patch_size
        self.conv1 = nn.Conv(
            self.width,
            (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            use_bias=False,
            name="conv1",
        )
        self.class_embedding = self.param(
            "class_embedding", nn.initializers.normal(0.02), (self.width,)
        )
        self.positional_embedding = self.param(
            "positional_embedding",
            nn.initializers.normal(0.01),
            (1 + g * g, self.width),
        )
        self.ln_pre = LayerNormF32(name="ln_pre")
        self.blocks = [
            ResidualAttentionBlock(self.width, self.heads, name=f"resblock{i}")
            for i in range(self.layers)
        ]
        self.ln_post = LayerNormF32(name="ln_post")
        self.proj = self.param(
            "proj", nn.initializers.normal(self.width ** -0.5),
            (self.width, self.embed_dim),
        )

    def embed(self, images: jax.Array) -> Tuple[jax.Array, Tuple[int, int]]:
        """images: (B, H, W, 3) normalized. -> ((B, 1+hw, C), grid_hw)."""
        x = self.conv1(images)  # (B, h, w, width)
        b, h, w, c = x.shape
        x = x.reshape(b, h * w, c)
        cls = jnp.broadcast_to(self.class_embedding, (b, 1, c)).astype(x.dtype)
        x = jnp.concatenate([cls, x], axis=1)
        pos = resize_pos_embed(self.positional_embedding, (h, w))
        x = x + pos[None].astype(x.dtype)
        return self.ln_pre(x), (h, w)

    def run_blocks(
        self,
        x: jax.Array,
        lo: int,
        hi: int,
        attn_bias: Optional[Sequence[Optional[jax.Array]]] = None,
        taps: Sequence[int] = (),
        sos_q: int = 0,
    ) -> Tuple[jax.Array, Dict[int, jax.Array]]:
        """Run blocks [lo, hi). ``taps``: 1-based block indices whose OUTPUT
        to record (SAN's merge_ids count blocks from 1, side_adapter.py:162).
        ``attn_bias``: per-block additive (B, H, L, L) biases or None; with
        ``sos_q > 0`` they are sos-row (B, H, sos_q, L-sos_q) biases instead
        (see CLIPAttention)."""
        tapped: Dict[int, jax.Array] = {}
        for i in range(lo, hi):
            bias = attn_bias[i - lo] if attn_bias is not None else None
            x = self.blocks[i](x, attn_bias=bias, sos_q=sos_q)
            if (i + 1) in taps:
                tapped[i + 1] = x
        return x, tapped

    def finalize(self, x: jax.Array, project: bool = True) -> jax.Array:
        """ln_post on the cls token (or all tokens) + projection."""
        y = self.ln_post(x)
        return y @ self.proj if project else y

    def __call__(self, images: jax.Array) -> jax.Array:
        x, _ = self.embed(images)
        x, _ = self.run_blocks(x, 0, self.layers)
        return self.finalize(x[:, 0])


class CLIP(nn.Module):
    """Full dual tower (for the mask-crop adapters and parity tests)."""

    embed_dim: int = 512
    vision_patch: int = 16
    vision_width: int = 768
    vision_layers: int = 12
    vision_heads: int = 12
    image_size: int = 224
    text_width: int = 512
    text_heads: int = 8
    text_layers: int = 12
    vocab_size: int = 49408
    context_length: int = 77

    def setup(self):
        self.visual = CLIPVisionTransformer(
            patch_size=self.vision_patch,
            width=self.vision_width,
            layers=self.vision_layers,
            heads=self.vision_heads,
            embed_dim=self.embed_dim,
            image_size=self.image_size,
            name="visual",
        )
        self.text = CLIPTextEncoder(
            vocab_size=self.vocab_size,
            context_length=self.context_length,
            width=self.text_width,
            heads=self.text_heads,
            layers=self.text_layers,
            embed_dim=self.embed_dim,
            name="text",
        )
        self.logit_scale = self.param(
            "logit_scale", lambda k, s: jnp.full(s, np.log(1 / 0.07)), ()
        )

    def encode_image(self, images):
        return self.visual(images)

    def encode_text(self, tokens):
        return self.text(tokens)

    def __call__(self, images, tokens):
        img = self.encode_image(images)
        txt = self.encode_text(tokens)
        img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
        txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
        scale = jnp.exp(self.logit_scale)
        return scale * img @ txt.T


# OpenAI CLIP preprocessing constants (RGB in [0,1])
CLIP_PIXEL_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_PIXEL_STD = (0.26862954, 0.26130258, 0.27577711)

_MODEL_SHAPES = {
    "ViT-B/16": dict(embed_dim=512, vision_patch=16, vision_width=768,
                     vision_layers=12, vision_heads=12, image_size=224,
                     text_width=512, text_heads=8, text_layers=12),
    "ViT-B/32": dict(embed_dim=512, vision_patch=32, vision_width=768,
                     vision_layers=12, vision_heads=12, image_size=224,
                     text_width=512, text_heads=8, text_layers=12),
    "ViT-L/14": dict(embed_dim=768, vision_patch=14, vision_width=1024,
                     vision_layers=24, vision_heads=16, image_size=224,
                     text_width=768, text_heads=12, text_layers=12),
    "ViT-L/14@336px": dict(embed_dim=768, vision_patch=14, vision_width=1024,
                           vision_layers=24, vision_heads=16, image_size=336,
                           text_width=768, text_heads=12, text_layers=12),
    # ModifiedResNet towers (vision_layers is a TUPLE -> RN dispatch; used
    # by the mask-adapted fork, mask_adapted_clip/model.py:387-401)
    "RN50": dict(embed_dim=1024, vision_patch=None, vision_width=64,
                 vision_layers=(3, 4, 6, 3), vision_heads=32, image_size=224,
                 text_width=512, text_heads=8, text_layers=12),
    "RN101": dict(embed_dim=512, vision_patch=None, vision_width=64,
                  vision_layers=(3, 4, 23, 3), vision_heads=32,
                  image_size=224, text_width=512, text_heads=8,
                  text_layers=12),
    # tiny shape for tests/smoke runs (not a real OpenAI checkpoint)
    "test-tiny": dict(embed_dim=32, vision_patch=8, vision_width=64,
                      vision_layers=4, vision_heads=4, image_size=64,
                      text_width=64, text_heads=4, text_layers=2,
                      vocab_size=512, context_length=16),
    "test-tiny-rn": dict(embed_dim=32, vision_patch=None, vision_width=8,
                         vision_layers=(1, 1, 1, 1), vision_heads=4,
                         image_size=64, text_width=64, text_heads=4,
                         text_layers=2, vocab_size=512, context_length=16),
}


def build_clip(model_name: str = "ViT-B/16") -> CLIP:
    if model_name not in _MODEL_SHAPES:
        raise ValueError(f"unknown CLIP model {model_name!r}")
    shape = _MODEL_SHAPES[model_name]
    if isinstance(shape["vision_layers"], tuple):
        raise ValueError(
            f"{model_name!r} is a ModifiedResNet tower — build the vision "
            "side via openvis_tpu.models.clip_mask_adapted."
            "MaskAdaptedModifiedResNet (engine.build_clip_visual dispatches)"
        )
    return CLIP(**shape)
