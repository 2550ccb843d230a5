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


def _axis_taps(
    lo: jax.Array,       # (R,) box start on this axis
    hi: jax.Array,       # (R,) box end
    size: int,           # source extent on this axis
    s: int,              # out_size
    sr: int,             # sampling_ratio
    tk: int,             # static tap-window width
) -> Tuple[jax.Array, jax.Array]:
    """Per-axis fold of roi_align's sub-sample average into a ``tk``-wide
    tap window: returns (base (R, s) int32 first source index, weights
    (R, s, tk) f32 — sub-sample tents x in-bounds indicator, pre-divided by
    sr).  Bilinear sampling, the sr-average, the [-1, size] zero cut and
    the edge clamp all factor per-axis, so the 2-D sample mean is EXACTLY
    the outer product of these 1-D windows (see roi_crop)."""
    scale = (hi - lo) / s                                   # (R,)
    # sub-sample positions: (j*sr + k + 0.5)/sr bins, k in [0, sr)
    grid = (jnp.arange(s * sr, dtype=jnp.float32) + 0.5) / sr
    cx = lo[:, None] + grid[None, :] * scale[:, None]       # (R, s*sr)
    inb = (cx >= -1.0) & (cx <= size)
    cx = jnp.clip(cx, 0.0, size - 1)
    fx = jnp.floor(cx)
    lx = cx - fx
    fi = fx.astype(jnp.int32)
    fi = fi.reshape(-1, s, sr)
    lx = lx.reshape(-1, s, sr)
    inb = inb.reshape(-1, s, sr)
    base = fi[:, :, 0]                                      # (R, s)
    off = fi - base[:, :, None]                             # (R, s, sr) >= 0
    wts = jnp.zeros(base.shape + (tk,), jnp.float32)
    contrib = jnp.where(inb, 1.0, 0.0) / sr
    for j in range(tk):
        wts = wts.at[..., j].add(jnp.where(
            off == j, (1.0 - lx) * contrib, 0.0
        ).sum(-1))
        if j:
            wts = wts.at[..., j].add(jnp.where(
                off == j - 1, lx * contrib, 0.0
            ).sum(-1))
    return base, wts


def _tap_width(size: int, s: int, sr: int) -> int:
    """Static tap-window bound: sub-samples of one output bin spread
    ``scale*(sr-1)/sr`` source pixels; bilinear adds one tap each side.

    CONTRACT: box spans must not exceed ``size`` (callers pass
    ``size = max(H, W)`` and boxes from :func:`mask_square_boxes`, whose
    square side is at most the larger image extent).  A larger span would
    need taps beyond the static window and silently drop weight."""
    max_scale = max(1.0, size / s)
    import math

    return 2 + int(math.ceil(max_scale * (sr - 1) / sr))


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
    halves the sampling-density gap on large crops).

    TPU form: the 2-D sample mean factorizes exactly into per-axis tap
    windows (bilinear tents, the sr-average, the [-1, size] zero cut and
    the edge clamp are all separable), so each output pixel is a
    ``tk x tk`` stencil instead of ``(2*sr)^2`` point samples.  Each axis
    is then applied as ``tk`` WHOLE-ROW gathers + tent FMAs (x first, on a
    once-transposed image, then y on the x-resampled intermediate).  The
    naive form — 4 advanced-indexing gathers of (1, 1, 1, C) elements —
    serializes on TPU (~20M descriptors per eval frame, measured 27 s per
    10-frame window); row gathers move the same bytes in ~1000x fewer,
    4 KB-wide fetches.

    ``images`` may have leading dim 1 with many boxes (one shared source
    image): rows are then fetched with unbatched flat gathers and the
    (R, W, H, C) broadcast-transpose never materializes."""
    _, h, w, c = images.shape
    r = boxes.shape[0]
    sr = sampling_ratio
    s = out_size

    # square boxes: either axis's span can reach max(h, w) (mask_square_boxes
    # sides), so both tap windows are bounded by the larger extent
    tk = _tap_width(max(h, w), s, sr)
    bx, wx = _axis_taps(boxes[:, 0], boxes[:, 2], w, s, sr, tk)
    by, wy = _axis_taps(boxes[:, 1], boxes[:, 3], h, s, sr, tk)
    wx = wx.astype(images.dtype)
    wy = wy.astype(images.dtype)

    # x pass on the transposed image: out columns become gatherable ROWS
    imt = jnp.swapaxes(images, 1, 2)                        # (R|1, W, H, C)
    shared = images.shape[0] == 1
    acc = None
    for j in range(wx.shape[-1]):
        idx = jnp.clip(bx + j, 0, w - 1)                    # (R, s)
        if shared:
            rows = jnp.take(imt[0], idx.reshape(-1), axis=0).reshape(
                r, s, h, c
            )
        else:
            rows = jnp.take_along_axis(imt, idx[:, :, None, None], axis=1)
        term = rows * wx[:, :, None, j : j + 1]
        acc = term if acc is None else acc + term
    acc = jnp.swapaxes(acc, 1, 2)                           # (R, H, s, C)

    out = None
    for j in range(wy.shape[-1]):
        idx = jnp.clip(by + j, 0, h - 1)                    # (R, s)
        rows = jnp.take_along_axis(acc, idx[:, :, None, None], axis=1)
        term = rows * wy[:, :, None, j : j + 1]
        out = term if out is None else out + term
    return out                                              # (R, s, s, C)


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
        crops = roi_crop(frame[None], boxes * mask_stride, input_resolution,
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
