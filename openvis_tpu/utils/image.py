"""Torch-exact bicubic resize as static weight matmuls.

The reference preprocesses CLIP inputs with ``F.interpolate(x, (s, s),
mode="bicubic")`` (``openvis/modeling/clip_adapter/side_adapter.py:150``,
``masqclip_adapter.py`` same pattern): the Keys cubic kernel with
``a = -0.75``, NO antialiasing, half-pixel coordinate transform, and
border-clamped taps.  ``jax.image.resize(method="cubic")`` differs twice —
it uses ``a = -0.5`` and antialiases when downscaling — which would shift
every CLIP logit computed from pretrained weights.

Since the resize is separable and the shapes are static, the exact torch
operator is two small dense matmuls: ``out = Wy @ img @ Wx^T`` with 4-tap
weight rows computed in numpy at trace time.  On TPU this is also faster
than a gather-based resample (MXU instead of serialized gathers).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax.numpy as jnp
import numpy as np


def _cubic_kernel(x: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Keys cubic convolution kernel, torch/OpenCV flavor (a=-0.75)."""
    ax = np.abs(x)
    in1 = ((a + 2.0) * ax - (a + 3.0)) * ax * ax + 1.0
    in2 = (((ax - 5.0) * ax + 8.0) * ax - 4.0) * a
    return np.where(ax <= 1.0, in1, np.where(ax < 2.0, in2, 0.0))


@functools.lru_cache(maxsize=None)
def _bicubic_matrix(src: int, dst: int) -> np.ndarray:
    """(dst, src) matrix of torch ``interpolate(mode="bicubic",
    align_corners=False)`` weights: half-pixel transform
    ``s = (d + 0.5) * src/dst - 0.5``, 4 taps at ``floor(s)-1..+2`` with
    border-clamped indices (clamped taps accumulate onto the edge)."""
    # f32 coordinate transform to match torch's scalar-type math (see
    # _bilinear_matrix)
    scale = np.float32(src) / np.float32(dst)
    d32 = np.arange(dst, dtype=np.float32)
    s = (scale * (d32 + np.float32(0.5)) - np.float32(0.5)).astype(np.float64)
    i0 = np.floor(s).astype(np.int64)
    w = np.zeros((dst, src), np.float64)
    di = np.arange(dst, dtype=np.int64)
    for t in range(-1, 3):
        j = i0 + t
        wt = _cubic_kernel(s - j)
        jc = np.clip(j, 0, src - 1)
        np.add.at(w, (di, jc), wt)
    return w.astype(np.float32)


def resize_bicubic_torch(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """NHWC bicubic resize, bit-for-bit the torch semantics above.

    x: (..., H, W, C) -> (..., th, tw, C); identity when sizes match."""
    h, w = x.shape[-3], x.shape[-2]
    th, tw = size
    if (h, w) == (th, tw):
        return x
    wy = jnp.asarray(_bicubic_matrix(h, th), x.dtype)    # (th, H)
    wx = jnp.asarray(_bicubic_matrix(w, tw), x.dtype)    # (tw, W)
    y = jnp.einsum("th,...hwc->...twc", wy, x)
    return jnp.einsum("uw,...twc->...tuc", wx, y)


@functools.lru_cache(maxsize=None)
def _bilinear_matrix(src: int, dst: int) -> np.ndarray:
    """(dst, src) matrix of torch ``interpolate(mode="bilinear",
    align_corners=False)`` weights: half-pixel transform, 2 border-clamped
    taps, and — crucially — NO antialiasing.  ``jax.image.resize`` widens
    the kernel when downscaling (antialias=True is not even exposed off for
    its linear path pre-0.4.31 semantics we rely on), which flips the SIGN
    of resized mask logits near boundaries — and the reference's masked
    attention reads exactly that sign (``F.interpolate`` at
    video_mask2former_transformer_decoder.py:419)."""
    # torch computes the coordinate transform in the tensor's scalar type
    # (f32): scale = src/dst, s = scale*(d+0.5)-0.5 — emulate in f32 or the
    # weights drift ~1e-5 from torch's on larger sizes
    scale = np.float32(src) / np.float32(dst)
    d = np.arange(dst, dtype=np.float32)
    s = np.maximum(scale * (d + np.float32(0.5)) - np.float32(0.5),
                   np.float32(0.0))
    i0 = np.floor(s).astype(np.int64)
    frac = (s - i0.astype(np.float32)).astype(np.float64)
    w = np.zeros((dst, src), np.float64)
    di = np.arange(dst, dtype=np.int64)
    np.add.at(w, (di, np.clip(i0, 0, src - 1)), 1.0 - frac)
    np.add.at(w, (di, np.clip(i0 + 1, 0, src - 1)), frac)
    return w.astype(np.float32)


def resize_bilinear_torch(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """NHWC bilinear resize with exact torch semantics (no antialias).

    x: (..., H, W, C) -> (..., th, tw, C); identity when sizes match."""
    h, w = x.shape[-3], x.shape[-2]
    th, tw = size
    if (h, w) == (th, tw):
        return x
    wy = jnp.asarray(_bilinear_matrix(h, th), x.dtype)
    wx = jnp.asarray(_bilinear_matrix(w, tw), x.dtype)
    y = jnp.einsum("th,...hwc->...twc", wy, x)
    return jnp.einsum("uw,...twc->...tuc", wx, y)


def resize_bilinear_torch_np(x: np.ndarray, size: Tuple[int, int]) -> np.ndarray:
    """Host-side numpy twin of :func:`resize_bilinear_torch_hw` (trailing
    (H, W) axes).  The evaluator's FINAL logit resize before ``> 0``
    thresholding (reference ``retry_if_cuda_oom(F.interpolate)``,
    video_maskformer.py:263-298) must keep torch bilinear semantics: PIL
    antialiases downscales, flipping thresholded boundary pixels."""
    h, w = x.shape[-2], x.shape[-1]
    th, tw = size
    if (h, w) == (th, tw):
        return np.asarray(x, np.float32)
    wy = _bilinear_matrix(h, th)
    wx = _bilinear_matrix(w, tw)
    # accumulate in f64 (correctly-rounded result; stays within 1 ulp of
    # torch's f32 per-pixel 2x2 accumulation), return f32
    out = np.einsum(
        "th,...hw,uw->...tu", wy, np.asarray(x, np.float64), wx,
        optimize=True,
    )
    return out.astype(np.float32)


def resize_bilinear_torch_hw(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """Trailing-(H, W) variant (mask stacks with no channel axis).

    x: (..., H, W) -> (..., th, tw); identity when sizes match."""
    h, w = x.shape[-2], x.shape[-1]
    th, tw = size
    if (h, w) == (th, tw):
        return x
    wy = jnp.asarray(_bilinear_matrix(h, th), x.dtype)
    wx = jnp.asarray(_bilinear_matrix(w, tw), x.dtype)
    y = jnp.einsum("th,...hw->...tw", wy, x)
    return jnp.einsum("uw,...tw->...tu", wx, y)
