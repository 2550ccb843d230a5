"""Mask-crop CLIP adapter (open-vocabulary classification), TPU-native.

Rebuild of ``ClipAdapter`` / ``BgClipAdapter``
(``openvis/modeling/clip_adapter/adapter.py:34-161``): binarize predicted
masks -> per-(frame, query) bounding boxes -> top-left-anchored square crops
-> bilinear 224^2 resample of frame and soft mask -> background zero-blend
-> frozen CLIP image encode -> cosine * 100 against prompt-ensembled text
embeddings.

TPU deltas (fixed shapes, no host round-trips):
  * bboxes from masked index reductions instead of ``BitMasks
    .get_bounding_boxes`` (adapter.py:93-99);
  * ``roi_align`` becomes a vectorized bilinear gather on a 224-point grid
    (output pixel center sampling, matching roi_align(sampling_ratio=1));
  * every (frame, query) slot is processed with a validity mask instead of
    ``torch.nonzero`` compaction (adapter.py:86-90); invalid slots are
    zero images whose logits are masked out downstream.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from openvis_tpu.models.clip.model import CLIP_PIXEL_MEAN, CLIP_PIXEL_STD


def mask_square_boxes(masks: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """masks: (R, H, W) soft [0,1].  Returns (boxes (R, 4) xyxy float,
    valid (R,)).  Box = bbox of mask>0.5, extended to a square from the
    top-left corner (adapter.py:93-99's sboxes)."""
    h, w = masks.shape[-2:]
    binm = masks > 0.5
    valid = jnp.any(binm, axis=(-1, -2))
    cols = jnp.any(binm, axis=-2)  # (R, W)
    rows = jnp.any(binm, axis=-1)  # (R, H)
    xs = jnp.arange(w)
    ys = jnp.arange(h)
    x0 = jnp.min(jnp.where(cols, xs, w), axis=-1)
    x1 = jnp.max(jnp.where(cols, xs + 1, 0), axis=-1)
    y0 = jnp.min(jnp.where(rows, ys, h), axis=-1)
    y1 = jnp.max(jnp.where(rows, ys + 1, 0), axis=-1)
    side = jnp.maximum(x1 - x0, y1 - y0)
    boxes = jnp.stack(
        [x0, y0, x0 + side, y0 + side], axis=-1
    ).astype(jnp.float32)
    boxes = jnp.where(valid[:, None], boxes, jnp.asarray([0, 0, 1, 1], jnp.float32))
    return boxes, valid


def roi_crop(
    images: jax.Array,   # (R, H, W, C) — image per region (pre-gathered)
    boxes: jax.Array,    # (R, 4) xyxy
    out_size: int,
    sampling_ratio: int = 1,
) -> jax.Array:
    """Bilinear crop-resize each region to (out_size, out_size).

    Matches torchvision ``roi_align(aligned=False)`` — the reference's call
    (``adapter.py:108``, no half-pixel correction; samples at
    ``x0 + (j + (k+0.5)/sr) * bin_w`` on the integer pixel grid, clamped
    inside [-1, size] and zero outside, averaged over the sr*sr sub-samples
    per bin) — with a STATIC ``sampling_ratio`` (the reference's adaptive
    per-roi grid count ``ceil(roi/out)`` (adapter.py:106-111) is
    data-dependent and cannot trace with static shapes; ``sampling_ratio=2``
    halves the sampling-density gap on large crops)."""
    r, h, w, c = images.shape
    sr = sampling_ratio
    s = out_size
    x0, y0, x1, y1 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    sx = (x1 - x0) / s
    sy = (y1 - y0) / s
    # sub-sample positions in bin units: idx = j*sr + k -> (idx + 0.5)/sr
    grid = (jnp.arange(s * sr, dtype=jnp.float32) + 0.5) / sr
    cx = x0[:, None] + grid[None, :] * sx[:, None]         # (R, S*sr)
    cy = y0[:, None] + grid[None, :] * sy[:, None]
    # roi_align: samples beyond 1px outside are zero; within, clamp to edge
    inb = ((cy[:, :, None] >= -1.0) & (cy[:, :, None] <= h)
           & (cx[:, None, :] >= -1.0) & (cx[:, None, :] <= w))
    cx = jnp.clip(cx, 0.0, w - 1)
    cy = jnp.clip(cy, 0.0, h - 1)

    x0i = jnp.floor(cx).astype(jnp.int32)
    y0i = jnp.floor(cy).astype(jnp.int32)
    lx = (cx - x0i).astype(images.dtype)
    ly = (cy - y0i).astype(images.dtype)

    def gather(yy, xx):
        yy = jnp.clip(yy, 0, h - 1)
        xx = jnp.clip(xx, 0, w - 1)
        # (R, S*sr, S*sr, C) via advanced indexing per region
        ridx = jnp.arange(r)[:, None, None]
        return images[ridx, yy[:, :, None], xx[:, None, :], :]

    g00 = gather(y0i, x0i)
    g01 = gather(y0i, x0i + 1)
    g10 = gather(y0i + 1, x0i)
    g11 = gather(y0i + 1, x0i + 1)
    ly_ = ly[:, :, None, None]
    lx_ = lx[:, None, :, None]
    out = (
        g00 * (1 - ly_) * (1 - lx_)
        + g01 * (1 - ly_) * lx_
        + g10 * ly_ * (1 - lx_)
        + g11 * ly_ * lx_
    )
    out = jnp.where(inb[..., None], out, 0.0)
    if sr == 1:
        return out
    # average the sr*sr sub-samples per output bin (torchvision divides by
    # the full count, including zeroed out-of-bounds samples).  Strided
    # slices, NOT reshape(r, s, sr, s, sr, c).mean((2, 4)): the 6-D form's
    # trailing (sr, c) dims tile to (8, 128) on TPU — a ~170x padded
    # layout that OOM'd at 1000 regions (25.7 GB for a 400 MB array).
    acc = out[:, ::sr, ::sr, :]
    for i in range(sr):
        for j in range(sr):
            if i or j:
                acc = acc + out[:, i::sr, j::sr, :]
    return acc / float(sr * sr)


def clip_crop_classify(
    visual_apply,          # fn(images (R, S, S, 3) normalized) -> (R, D)
    frames_raw: jax.Array, # (T, H, W, 3) RGB in [0, 255]
    masks: jax.Array,      # (T, Q, h, w) sigmoid probabilities
    text_feats: jax.Array, # (K, D) normalized (may include bg row)
    input_resolution: int = 224,
    temperature: float = 100.0,
    mask_stride: int = 1,  # masks may live on a coarser grid (e.g. 1/4):
                           # boxes scale by stride for the frame crop, so the
                           # reference's full-res mask upsample is avoided
    sampling_ratio: int = 1,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (logits (T, Q, K), valid (T, Q)).  Mirrors
    ``ClipAdapter.forward`` + ``_preprocess_image`` (adapter.py:56-116).

    Regions are processed ONE FRAME AT A TIME (``lax.map`` over T): the
    all-at-once form gathers (T*Q, H, W, 3) source images plus four
    (T*Q, S*sr, S*sr, 3) corner planes — ~9 GB live at T=10, Q=100 window
    shapes, which OOM'd the 16 GB chip.  Per-frame, the live set is Q
    regions (~0.8 GB) and the per-region math is exactly the same."""
    t, q, h, w = masks.shape
    mean = jnp.asarray(CLIP_PIXEL_MEAN, frames_raw.dtype)
    std = jnp.asarray(CLIP_PIXEL_STD, frames_raw.dtype)

    def per_frame(args):
        frame, masks_f = args                            # (H,W,3), (Q,h,w)
        boxes, valid = mask_square_boxes(masks_f)
        imgs = jnp.broadcast_to(frame, (q,) + frame.shape)
        crops = roi_crop(imgs, boxes * mask_stride, input_resolution,
                         sampling_ratio=sampling_ratio)
        mask_crops = roi_crop(
            masks_f[..., None], boxes, input_resolution,
            sampling_ratio=sampling_ratio,
        )                                                # (Q, S, S, 1)
        blended = crops * mask_crops                     # bg -> 0 (adapter.py:115)
        clip_in = (blended / 255.0 - mean) / std
        feats = visual_apply(clip_in)                    # (Q, D)
        feats = feats / (
            jnp.linalg.norm(feats, axis=-1, keepdims=True) + 1e-6
        )
        return temperature * feats @ text_feats.T, valid  # (Q, K), (Q,)

    logits, valid = jax.lax.map(per_frame, (frames_raw, masks))
    return logits, valid


def frame_average_scores(
    clip_logits: jax.Array,  # (T, Q, K)
    valid: jax.Array,        # (T, Q)
    mode: str = "logits_then_softmax",
    drop_last: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Per-query frame average over valid frames.  Two reference orders:
      * OpenVIS (openvis.py:138-142): mean of raw LOGITS over frames, then
        one softmax -> mode="logits_then_softmax";
      * SimpleBSL ensemble (simplebsl.py:139-152): drop bg column, softmax
        per frame, then mean of PROBS -> mode="softmax_then_mean".
    Returns (scores (Q, K'), query_valid (Q,))."""
    x = clip_logits[..., :-1] if drop_last else clip_logits
    v = valid[..., None].astype(x.dtype)
    cnt = jnp.maximum(v.sum(axis=0), 1.0)
    if mode == "logits_then_softmax":
        mean_logits = (x * v).sum(axis=0) / cnt
        scores = jax.nn.softmax(mean_logits, axis=-1)
    elif mode == "softmax_then_mean":
        probs = jax.nn.softmax(x, axis=-1)
        scores = (probs * v).sum(axis=0) / cnt
    else:
        raise ValueError(mode)
    return scores, valid.any(axis=0)
