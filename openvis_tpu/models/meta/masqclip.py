"""MasQCLIP meta-architecture.

Rebuild of ``openvis/masqclip.py:100-236``: a FROZEN closed-vocab segmenter
provides mask proposals; the MasQCLIP adapter classifies each proposal with
mask-class-token attention; per-frame logits are averaged over T.  Training
supervises ONLY the adapter's ``new_q_proj``/mask-token params with CE
against ``LabelAssigner`` pseudo-labels: each query whose best point-dice
against any GT is < 0.4 takes that GT's class, all others no-object
(``masqclip.py:24-97``).  Inference fuses objectness and CLIP scores in
log space: ``exp(log_softmax(base)[..., :1] + log_softmax(clip))[:, :-1]``
(``masqclip.py:213-216``).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from openvis_tpu.config import ModelConfig
from openvis_tpu.models.clip.model import _MODEL_SHAPES
from openvis_tpu.models.clip_masq import MasQCLIPVisual, preprocess_frames
from openvis_tpu.models.segmenter import Segmenter
from openvis_tpu.utils.image import resize_bilinear_torch_hw
from openvis_tpu.ops.point_sample import (
    sample_maps_shared,
    sorted_uniform_points,
)
from openvis_tpu.structures import ClipTargets


class MasQCLIPModel(nn.Module):
    cfg: ModelConfig

    @nn.compact
    def __call__(
        self,
        frames: jax.Array,      # (B*T, H, W, 3) dataset-normalized
        num_frames: int,
        text_feats: jax.Array,  # (K+1, D) incl. trailing "Background" row
    ) -> Dict[str, Any]:
        cfg = self.cfg
        t = num_frames
        out = Segmenter(cfg, name="segmenter")(frames, t)
        out = jax.tree.map(
            lambda x: jax.lax.stop_gradient(x) if isinstance(x, jax.Array) else x,
            out,
        )
        masks = out["pred_masks"]          # (B, Q, T, h, w) 1/4-res logits
        b, q = masks.shape[:2]

        shape = _MODEL_SHAPES[cfg.clip_adapter.clip_model_name]
        visual = MasQCLIPVisual(
            patch_size=shape["vision_patch"], width=shape["vision_width"],
            layers=shape["vision_layers"], heads=shape["vision_heads"],
            embed_dim=shape["embed_dim"], image_size=shape["image_size"],
            name="clip_adapter",
        )

        mean = jnp.asarray(cfg.pixel_mean, frames.dtype)
        std = jnp.asarray(cfg.pixel_std, frames.dtype)
        frames_raw = frames * std + mean
        s = shape["image_size"]
        clip_in = preprocess_frames(frames_raw, s)

        # per-frame masks at CLIP resolution: (B*T, Q, s, s)
        m = jnp.swapaxes(masks, 1, 2).reshape(b * t, q, *masks.shape[-2:])
        # exact torch bilinear, no antialias (masqclip_adapter.py:179)
        m = resize_bilinear_torch_hw(m, (s, s))

        feats = visual(clip_in, m)                       # (B*T, Q, D)
        logits = 100.0 * jnp.einsum("nqd,kd->nqk", feats, text_feats)
        logits = logits.reshape(b, t, q, -1).mean(axis=1)  # (B, Q, K+1)

        out["clip_logits"] = logits
        out["base_logits"] = out["pred_logits_all"][-1]   # frozen class head
        return out


def label_assign(
    rng: jax.Array,
    pred_masks: jax.Array,   # (B, Q, T, H, W) logits
    targets: ClipTargets,
    num_points: int = 12544,
    dice_threshold: float = 0.40,
):
    """LabelAssigner (masqclip.py:24-97): per query, the min point-dice GT;
    valid if dice < threshold.  Returns (pseudo_labels (B, Q) with
    num-classes sentinel handled by caller, valid (B, Q), gt_idx (B, Q))."""
    b, qn, t, h, w = pred_masks.shape
    n = targets.labels.shape[1]
    # rows share one y-sorted point set per item (set semantics — only
    # reductions below): the TPU tent-matmul sampler, see criterion
    coords = sorted_uniform_points(rng, (b,), num_points)
    pm = pred_masks.reshape(b, qn * t, h, w)
    tm = targets.masks.astype(jnp.float32).reshape(b, n * t, *targets.masks.shape[-2:])
    out_pts = sample_maps_shared(pm, coords)
    tgt_pts = sample_maps_shared(tm, coords)
    out_pts = out_pts.reshape(b, qn, t * num_points)
    tgt_pts = tgt_pts.reshape(b, n, t * num_points)
    sig = jax.nn.sigmoid(out_pts)
    numer = 2.0 * jnp.einsum("bqp,bnp->bqn", sig, tgt_pts)
    denom = sig.sum(-1)[:, :, None] + tgt_pts.sum(-1)[:, None, :]
    dice = 1.0 - (numer + 1.0) / (denom + 1.0)           # (B, Q, N)
    dice = jnp.where(targets.valid[:, None, :], dice, jnp.inf)
    gt_idx = jnp.argmin(dice, axis=-1)
    min_dice = jnp.min(dice, axis=-1)
    valid = min_dice < dice_threshold
    labels = jnp.take_along_axis(targets.labels, gt_idx, axis=1)
    return labels, valid, gt_idx


def masqclip_loss(
    rng: jax.Array,
    outputs: Dict[str, Any],
    targets: ClipTargets,
    cfg: ModelConfig,
    num_text_classes: int,
) -> Dict[str, jax.Array]:
    """CE over (K + background) with pseudo labels; only the adapter's
    new-query params receive gradients (optimizer freeze handles the rest)."""
    labels, valid, _ = label_assign(
        rng, outputs["pred_masks"], targets, cfg.criterion.train_num_points
    )
    logits = outputs["clip_logits"]                      # (B, Q, K+1)
    k = logits.shape[-1] - 1
    tc = jnp.where(valid, labels, k)                     # bg class = last row
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, tc[..., None], axis=-1)[..., 0]
    w = jnp.where(tc == k, cfg.criterion.no_object_weight, 1.0)
    loss = (w * nll).sum() / w.sum()
    return {"loss_ce": loss[None], "total": loss,
            "loss_mask": jnp.zeros((1,)), "loss_dice": jnp.zeros((1,))}


def masqclip_eval_scores(outputs: Dict[str, Any]) -> jax.Array:
    """(B, Q, K) fused scores (masqclip.py:213-216)."""
    base = outputs["base_logits"]
    if base.ndim == 4:  # (B, T, Q, C) frame head -> mean over T
        base = base.mean(axis=1)
    obj = jax.nn.log_softmax(base, axis=-1)[..., :1]
    clip = jax.nn.log_softmax(outputs["clip_logits"], axis=-1)
    return jnp.exp(obj + clip)[..., :-1]
