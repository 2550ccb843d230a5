"""Swin Transformer backbone (T/S/B/L), NHWC flax.

Rebuild of the reference's vendored Swin
(``openvis/modeling/backbone/swin.py:498-769``: standard Microsoft Swin +
a wrapper exposing res2..res5): 4x4 patch embed, [W-MSA | SW-MSA]
alternating blocks with 7x7 windows and relative position bias, patch
merging between stages, per-output-stage LayerNorm.  Feature dims are
(C, 2C, 4C, 8C) at strides (4, 8, 16, 32).

TPU notes: everything is static-shape — feature maps are padded up to
window multiples per stage; the shifted-window attention mask is built from
numpy at trace time.  Stochastic depth is applied only when a ``dropout``
rng is provided (training).
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from openvis_tpu.models.amp import amp_norm, softmax_f32


def window_partition(x: jax.Array, ws: int) -> jax.Array:
    """(B, H, W, C) -> (B*nW, ws*ws, C); H, W divisible by ws."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    return jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(-1, ws * ws, c)


def window_reverse(wins: jax.Array, ws: int, h: int, w: int) -> jax.Array:
    b = wins.shape[0] // ((h // ws) * (w // ws))
    x = wins.reshape(b, h // ws, w // ws, ws, ws, -1)
    return jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(b, h, w, -1)


def _relative_position_index(ws: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0) + (ws - 1)
    return (rel[:, :, 0] * (2 * ws - 1) + rel[:, :, 1]).astype(np.int32)


def _shift_attn_mask(h: int, w: int, ws: int, shift: int) -> np.ndarray:
    """(nW, ws*ws, ws*ws) additive mask for SW-MSA (-100 across regions)."""
    img = np.zeros((1, h, w, 1), np.float32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wsl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[:, hs, wsl, :] = cnt
            cnt += 1
    wins = np.asarray(window_partition(jnp.asarray(img), ws))[:, :, 0]
    mask = wins[:, None, :] - wins[:, :, None]
    return np.where(mask != 0, -100.0, 0.0).astype(np.float32)


class WindowAttention(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    qkv_bias: bool = True

    @nn.compact
    def __call__(self, x, attn_mask=None):
        bnw, n, c = x.shape
        h = self.num_heads
        dh = c // h
        ws = self.window_size
        qkv = nn.Dense(c * 3, use_bias=self.qkv_bias, name="qkv")(x)
        q, k, v = jnp.split(qkv.reshape(bnw, n, 3, h, dh), 3, axis=2)
        q, k, v = q[:, :, 0], k[:, :, 0], v[:, :, 0]
        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k) / jnp.sqrt(
            jnp.asarray(dh, x.dtype)
        )
        table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * ws - 1) ** 2, h),
        )
        idx = jnp.asarray(_relative_position_index(ws).reshape(-1))
        bias = table[idx].reshape(n, n, h).transpose(2, 0, 1)
        attn = attn + bias[None].astype(attn.dtype)
        if attn_mask is not None:  # (nW, n, n)
            nw = attn_mask.shape[0]
            attn = attn.reshape(bnw // nw, nw, h, n, n) + attn_mask[
                None, :, None
            ].astype(attn.dtype)
            attn = attn.reshape(bnw, h, n, n)
        attn = softmax_f32(attn, axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(bnw, n, c)
        return nn.Dense(c, name="proj")(out)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int = 7
    shift: int = 0
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_path: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        b, h, w, c = x.shape
        ws = self.window_size
        ph = -(-h // ws) * ws
        pw = -(-w // ws) * ws

        def drop_path(y):
            # stochastic depth is active exactly when the caller supplies a
            # "dropout" rng stream (the train loss_fn does; eval/init/parity
            # paths don't) — no train-flag threading through the meta-archs
            if self.drop_path == 0.0 or not self.has_rng("dropout"):
                return y
            keep = 1.0 - self.drop_path
            rng = self.make_rng("dropout")
            mask = jax.random.bernoulli(rng, keep, (y.shape[0], 1, 1, 1))
            return y * mask.astype(y.dtype) / keep

        shortcut = x
        y = amp_norm(nn.LayerNorm(name="norm1"), x)
        y = jnp.pad(y, ((0, 0), (0, ph - h), (0, pw - w), (0, 0)))
        mask = None
        if self.shift > 0:
            y = jnp.roll(y, (-self.shift, -self.shift), axis=(1, 2))
            mask = jnp.asarray(_shift_attn_mask(ph, pw, ws, self.shift))
        wins = window_partition(y, ws)
        wins = WindowAttention(
            self.dim, self.num_heads, ws, self.qkv_bias, name="attn"
        )(wins, mask)
        y = window_reverse(wins, ws, ph, pw)
        if self.shift > 0:
            y = jnp.roll(y, (self.shift, self.shift), axis=(1, 2))
        y = y[:, :h, :w]
        x = shortcut + drop_path(y)

        y = amp_norm(nn.LayerNorm(name="norm2"), x)
        y = nn.Dense(int(self.dim * self.mlp_ratio), name="mlp_fc1")(y)
        # exact (erf) GELU: torch nn.GELU default; flax's default is the
        # tanh approximation, which would drift from pretrained weights
        y = nn.Dense(self.dim, name="mlp_fc2")(nn.gelu(y, approximate=False))
        return x + drop_path(y)


class PatchMerging(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        ph, pw = h + (h % 2), w + (w % 2)
        x = jnp.pad(x, ((0, 0), (0, ph - h), (0, pw - w), (0, 0)))
        x = x.reshape(b, ph // 2, 2, pw // 2, 2, c)
        # torch order: x0=(0::2,0::2), x1=(1::2,0::2), x2=(0::2,1::2), x3=(1::2,1::2)
        x = jnp.concatenate(
            [x[:, :, 0, :, 0], x[:, :, 1, :, 0], x[:, :, 0, :, 1], x[:, :, 1, :, 1]],
            axis=-1,
        )
        x = amp_norm(nn.LayerNorm(name="norm"), x)
        return nn.Dense(2 * self.dim, use_bias=False, name="reduction")(x)


class SwinTransformer(nn.Module):
    embed_dim: int = 96
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    num_heads: Tuple[int, ...] = (3, 6, 12, 24)
    window_size: int = 7
    mlp_ratio: float = 4.0
    patch_size: int = 4
    qkv_bias: bool = True
    drop_path_rate: float = 0.0
    patch_norm: bool = True
    ape: bool = False                 # absolute position embedding
    pretrain_img_size: int = 224      # APE grid at pretraining time
    out_features: Sequence[str] = ("res2", "res3", "res4", "res5")

    @nn.compact
    def __call__(self, x, deterministic: bool = True) -> Dict[str, jax.Array]:
        x = nn.Conv(
            self.embed_dim, (self.patch_size,) * 2,
            strides=(self.patch_size,) * 2, name="patch_embed",
        )(x)
        if self.patch_norm:
            x = amp_norm(nn.LayerNorm(name="patch_norm"), x)
        if self.ape:
            # absolute position embedding, torch-exact bicubic-resized from
            # the pretraining patch grid to the current feature grid
            # (reference swin.py:560-571 F.interpolate(..., 'bicubic'))
            from openvis_tpu.utils.image import resize_bicubic_torch

            g = self.pretrain_img_size // self.patch_size
            pe = self.param(
                "absolute_pos_embed",
                nn.initializers.truncated_normal(0.02),
                (1, g, g, self.embed_dim),
            )
            pe = resize_bicubic_torch(
                pe.astype(jnp.float32), x.shape[1:3]
            )
            x = x + pe.astype(x.dtype)

        total = sum(self.depths)
        dpr = np.linspace(0, self.drop_path_rate, total)
        outs = {}
        cur = 0
        dim = self.embed_dim
        for si, depth in enumerate(self.depths):
            for bi in range(depth):
                x = SwinBlock(
                    dim, self.num_heads[si], self.window_size,
                    shift=0 if bi % 2 == 0 else self.window_size // 2,
                    mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
                    drop_path=float(dpr[cur + bi]),
                    name=f"stage{si}_block{bi}",
                )(x, deterministic)
            cur += depth
            name = f"res{si + 2}"
            if name in self.out_features:
                outs[name] = amp_norm(nn.LayerNorm(name=f"out_norm{si}"), x)
            if si < len(self.depths) - 1:
                x = PatchMerging(dim, name=f"downsample{si}")(x)
                dim *= 2
        return outs


SWIN_SHAPES = {
    "tiny": dict(embed_dim=96, depths=(2, 2, 6, 2), num_heads=(3, 6, 12, 24)),
    "small": dict(embed_dim=96, depths=(2, 2, 18, 2), num_heads=(3, 6, 12, 24)),
    "base": dict(embed_dim=128, depths=(2, 2, 18, 2), num_heads=(4, 8, 16, 32)),
    "large": dict(embed_dim=192, depths=(2, 2, 18, 2), num_heads=(6, 12, 24, 48)),
}
