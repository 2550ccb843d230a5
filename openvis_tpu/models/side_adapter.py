"""SAN side adapter: frozen CLIP ViT split with attention-bias steering.

Rebuild of ``SideAdapter``
(``openvis/modeling/clip_adapter/side_adapter.py:81-270``):

  * ``front_encode``: input frames resized to the CLIP resolution (bicubic,
    /255 + CLIP normalize), patch-embedded with the positional embedding
    resized to the token grid, then CLIP blocks ``0..broken_idx-1``; block
    outputs at ``merge_ids`` (1-based) are 1x1-projected to the pixel
    decoder width and returned as ``extra_features`` (``:147-174``);
  * ``post_encode``: appends ``num_queries`` "sos" tokens (copies of the cls
    token) and runs blocks ``broken_idx..`` with a per-head additive
    attention bias assembled from the decoder's predicted attn-bias maps —
    sos->patch logits get the (max-pooled) bias, patch/cls->sos
    interactions are cut at -100, sos self-interaction allowed
    (``:176-209``, ``_build_attn_biases`` ``:237-270``);
  * text encoding with a learned normalized bg row (``:211-232``); logits =
    ``logit_scale.exp() * img @ text.T`` (``:234``).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from openvis_tpu.models.clip.model import (
    CLIP_PIXEL_MEAN,
    CLIP_PIXEL_STD,
    CLIPVisionTransformer,
    _MODEL_SHAPES,
)
from openvis_tpu.utils.image import resize_bicubic_torch


def _pow2_table_select(h: int, dst: int):
    """Static plan for exact adaptive-max along one axis of length ``h`` to
    ``dst`` cells (torch window [floor(i*h/dst), ceil((i+1)*h/dst))): a
    power-of-2 shift-max sparse table T = [M_1; M_2; M_4; ...] (M_k[j] =
    max over x[j:j+k]) and TWO one-hot row-selection matrices A, B so that
    ``out[i] = max((A @ T)[i], (B @ T)[i])`` — max over [s, e) equals
    max(M_k[s], M_k[e-k]) for k = largest pow2 <= e-s (k <= len <= 2k
    always holds).  Row selection as a matmul keeps everything on the MXU:
    TPU gathers of small rows serialize."""
    ys = (np.arange(dst) * h) // dst
    ye = np.ceil((np.arange(dst) + 1) * h / dst).astype(int)
    lens = ye - ys
    levels = []
    k = 1
    while k <= lens.max():
        levels.append(k)
        k *= 2
    lvl_of = {k: i for i, k in enumerate(levels)}
    A = np.zeros((dst, len(levels) * h), np.float32)
    B = np.zeros((dst, len(levels) * h), np.float32)
    for i in range(dst):
        k = 1 << (int(lens[i]).bit_length() - 1)       # largest pow2 <= len
        off = lvl_of[k] * h
        A[i, off + ys[i]] = 1.0
        B[i, off + ye[i] - k] = 1.0
    return levels, A, B


def _axis_adaptive_max(x: jax.Array, dst: int) -> jax.Array:
    """Exact adaptive max over the LAST axis -> (..., dst)."""
    h = x.shape[-1]
    levels, A, B = _pow2_table_select(h, dst)
    tables = [x]
    for prev, k in zip(levels, levels[1:]):
        m = tables[-1]
        # M_{2k}[j] = max(M_k[j], M_k[j+k]); tail rows clamp (never selected
        # beyond h-k by construction)
        shifted = jnp.concatenate([m[..., prev:], m[..., -prev:]], axis=-1)
        tables.append(jnp.maximum(m, shifted))
    T = jnp.concatenate(tables, axis=-1)               # (..., L*h)
    a = jnp.einsum("...h,dh->...d", T, jnp.asarray(A, T.dtype))
    b = jnp.einsum("...h,dh->...d", T, jnp.asarray(B, T.dtype))
    return jnp.maximum(a, b)


def adaptive_max_pool(x: jax.Array, out_hw: Tuple[int, int]) -> jax.Array:
    """(..., H, W) -> (..., th, tw) adaptive max pool (torch semantics:
    window [floor(i*H/th), ceil((i+1)*H/th))), gather-free: separable
    pow2 shift-max tables + one-hot matmul selection per axis."""
    h, w = x.shape[-2:]
    th, tw = out_hw
    if (h, w) == (th, tw):
        return x
    y = _axis_adaptive_max(x, tw)                      # pool W
    y = jnp.swapaxes(y, -1, -2)
    y = _axis_adaptive_max(y, th)                      # pool H
    return jnp.swapaxes(y, -1, -2)


class SideAdapter(nn.Module):
    """Frozen CLIP with split execution + biased post blocks.  Vision params
    live under ``visual``; the text tower is shared via
    ``openvis_tpu.models.clip`` (text encoding happens offline in the text
    bank; the bg row is this module's only trainable text-side param)."""

    clip_model_name: str = "ViT-B/16"
    out_dims: int = 256
    broken_idx: int = 9
    merge_ids: Tuple[int, ...] = (3, 6, 9)
    num_queries: int = 100

    def setup(self):
        shape = _MODEL_SHAPES[self.clip_model_name]
        self.visual = CLIPVisionTransformer(
            patch_size=shape["vision_patch"],
            width=shape["vision_width"],
            layers=shape["vision_layers"],
            heads=shape["vision_heads"],
            embed_dim=shape["embed_dim"],
            image_size=shape["image_size"],
            name="visual",
        )
        self.input_resolution = shape["image_size"]
        self.clip_heads = shape["vision_heads"]
        self.embed_dim = shape["embed_dim"]
        self.attn_projs = [
            nn.Conv(self.out_dims, (1, 1), name=f"attn_proj{i}")
            for i in range(len(self.merge_ids))
        ]
        self.bg_embed = self.param(
            "bg_embed",
            nn.initializers.normal(self.embed_dim ** -0.5),
            (1, self.embed_dim),
        )
        self.logit_scale = self.param(
            "logit_scale", lambda k, s: jnp.full(s, np.log(1 / 0.07)), ()
        )

    def preprocess(self, frames_raw: jax.Array) -> jax.Array:
        """(N, H, W, 3) in [0,255] -> CLIP-normalized at input_resolution
        (side_adapter.py:150-154); the resize is the reference's exact
        bicubic (torch kernel a=-0.75, no antialias — see utils/image.py)."""
        s = self.input_resolution
        x = resize_bicubic_torch(frames_raw / 255.0, (s, s))
        mean = jnp.asarray(CLIP_PIXEL_MEAN, x.dtype)
        std = jnp.asarray(CLIP_PIXEL_STD, x.dtype)
        return (x - mean) / std

    def front_encode(self, frames_raw: jax.Array):
        """-> (mg_feats: list of (N, h, w, out_dims), bk_tokens (N, 1+L, W),
        grid_hw)."""
        x = self.preprocess(frames_raw)
        tokens, grid = self.visual.embed(x)
        tokens, tapped = self.visual.run_blocks(
            tokens, 0, self.broken_idx, taps=self.merge_ids
        )
        h, w = grid
        mg_feats = []
        for i, mid in enumerate(self.merge_ids):
            f = tapped[mid][:, 1:]  # patch tokens (N, L, W)
            f = f.reshape(f.shape[0], h, w, f.shape[-1])
            mg_feats.append(self.attn_projs[i](f))
        return mg_feats, tokens, grid

    def post_encode(
        self,
        bk_tokens: jax.Array,    # (N, 1+L, W) from front_encode
        attn_biases: jax.Array,  # (N, nH, Q, h', w') raw decoder bias maps
        grid_hw: Tuple[int, int],
    ) -> jax.Array:
        """Run blocks broken_idx.. with sos tokens + bias. -> (N, Q, D)
        normalized sos features (side_adapter.py:176-209)."""
        n, l1, wdt = bk_tokens.shape
        q = self.num_queries
        h, w = grid_hw
        L = h * w

        # bias assembly (_build_attn_biases, :237-270) — sos-split form.
        # The reference's dense (S, S) base bias cuts every patch/cls->sos
        # interaction at -100 (e^-100: below f32 softmax resolution), so
        # ctx rows are standard CLIP attention and only the Q sos rows need
        # a bias: [-100 on the cls column | pooled decoder maps on patches].
        # The (N, nH, S, S) bias is never materialized (CLIPAttention sos_q).
        nH = attn_biases.shape[1]
        ab = adaptive_max_pool(attn_biases, (h, w))      # (N, nH, Q, h, w)
        ab = ab.reshape(n, nH, q, L).astype(bk_tokens.dtype)
        neg_cls = jnp.full((n, nH, q, 1), -100.0, bk_tokens.dtype)
        sos_bias = jnp.concatenate([neg_cls, ab], axis=-1)  # (N, nH, Q, 1+L)

        sos = jnp.broadcast_to(bk_tokens[:, :1], (n, q, wdt))
        x = jnp.concatenate([sos, bk_tokens], axis=1)    # (N, Q+1+L, W)
        x, _ = self.visual.run_blocks(
            x, self.broken_idx, self.visual.layers,
            attn_bias=[sos_bias] * (self.visual.layers - self.broken_idx),
            sos_q=q,
        )
        sos_out = self.visual.finalize(x[:, :q], project=True)  # (N, Q, D)
        return sos_out / (jnp.linalg.norm(sos_out, axis=-1, keepdims=True) + 1e-6)

    def text_with_bg(self, text_feats: jax.Array) -> jax.Array:
        bg = self.bg_embed / (
            jnp.linalg.norm(self.bg_embed, axis=-1, keepdims=True) + 1e-6
        )
        return jnp.concatenate([text_feats, bg.astype(text_feats.dtype)], axis=0)

    def sim_logits(self, text_feats: jax.Array, img_feats: jax.Array) -> jax.Array:
        return jnp.exp(self.logit_scale) * img_feats @ text_feats.T
