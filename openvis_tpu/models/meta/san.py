"""SAN / SANOnline meta-architecture.

Rebuild of ``openvis/san.py:24-307``: frozen CLIP runs once per frame —
blocks 0..broken_idx-1 produce tapped features merged into the pixel
decoder (``extra_feats``), the side-adapter decoder predicts per-query
attention-bias maps, and CLIP blocks broken_idx.. re-run with "sos" tokens
steered by those biases to produce per-query CLIP features; classification
logits are text-similarity with a learned bg row, trained end-to-end
including every aux decoder layer (``san.py:230-237``).

The raw (0-255) frames CLIP needs are reconstructed from the normalized
input inside the module (the reference keeps a second unnormalized
ImageList, ``san.py:212-219``).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from openvis_tpu.config import ModelConfig
from openvis_tpu.losses.criterion import CriterionSettings, set_criterion
from openvis_tpu.models.meta.simple_baseline import (
    frame_reshape_outputs,
    frame_reshape_targets,
)
from openvis_tpu.models.segmenter import Segmenter
from openvis_tpu.models.side_adapter import SideAdapter
from openvis_tpu.structures import ClipTargets


class SANModel(nn.Module):
    cfg: ModelConfig
    supervise_aux_logits: bool = True  # CLIP logits for every aux layer

    @nn.compact
    def __call__(
        self,
        frames: jax.Array,      # (B*T, H, W, 3) dataset-normalized
        num_frames: int,
        text_feats: jax.Array,  # (K, D) normalized
    ) -> Dict[str, Any]:
        cfg = self.cfg
        ca = cfg.clip_adapter
        adapter = SideAdapter(
            clip_model_name=ca.clip_model_name,
            out_dims=cfg.pixel_decoder.conv_dim,
            broken_idx=ca.broken_id,
            merge_ids=tuple(ca.merge_ids),
            num_queries=cfg.transformer_decoder.num_queries,
            name="clip_adapter",
        )

        # reconstruct raw 0-255 frames for CLIP (san.py:212-219 keeps both)
        mean = jnp.asarray(cfg.pixel_mean, frames.dtype)
        std = jnp.asarray(cfg.pixel_std, frames.dtype)
        frames_raw = frames * std + mean

        mg_feats, bk_tokens, grid = adapter.front_encode(frames_raw)
        # pixel decoder consumes extra feats top-down (res5, res4, res3) =
        # reversed merge order deepest-first (msdeformattn.py:338-344)
        out = Segmenter(cfg, name="segmenter")(
            frames, num_frames, extra_features=list(mg_feats)[::-1]
        )

        text_full = adapter.text_with_bg(text_feats)  # (K+1, D)

        biases_all = out["class_attn_biases_all"]  # (L, B, T, nH, Q, h, w)
        l, b, t, nh, q, hh, ww = biases_all.shape

        if self.supervise_aux_logits:
            # CLIP logits for every decoder layer (san.py:230-237).  All L
            # layers go through post-CLIP as ONE batch — one trace, MXU-sized
            # matmuls, instead of the reference's per-layer python loop.
            flat = biases_all.reshape(l * b * t, nh, q, hh, ww)
            toks = jnp.broadcast_to(
                bk_tokens[None], (l, *bk_tokens.shape)
            ).reshape(l * b * t, *bk_tokens.shape[1:])
            feats = adapter.post_encode(toks, flat, grid)       # (LBT, Q, D)
            logits_all = adapter.sim_logits(text_full, feats).reshape(
                l, b, t, q, -1
            )
        else:
            flat = biases_all[-1].reshape(b * t, nh, q, hh, ww)
            feats = adapter.post_encode(bk_tokens, flat, grid)
            logits = adapter.sim_logits(text_full, feats).reshape(b, t, q, -1)
            logits_all = jnp.broadcast_to(
                logits[None], (l, b, t, q, text_full.shape[0])
            )
        out["pred_logits_all"] = logits_all
        out["pred_logits"] = logits_all[-1]
        return out


def san_loss(
    rng: jax.Array,
    outputs: Dict[str, Any],
    targets: ClipTargets,
    cfg: ModelConfig,
    num_text_classes: int,
    online: bool = True,
    axis_name: Optional[str] = None,
) -> Dict[str, jax.Array]:
    c = cfg.criterion
    s = CriterionSettings(
        num_classes=num_text_classes,
        class_weight=c.class_weight,
        mask_weight=c.mask_weight,
        dice_weight=c.dice_weight,
        eos_coef=c.no_object_weight,
        num_points=c.train_num_points,
        oversample_ratio=c.oversample_ratio,
        importance_sample_ratio=c.importance_sample_ratio,
        bf16_sampling=c.bf16_masks,
        packed_targets=c.packed_targets,
        deep_supervision=c.deep_supervision,
    )
    logits_all = outputs["pred_logits_all"]
    masks_all = outputs["pred_masks_all"]
    if online:
        logits_all, masks_all = frame_reshape_outputs(logits_all, masks_all)
        targets = frame_reshape_targets(targets)
    losses, _ = set_criterion(rng, logits_all, masks_all, targets, s, axis_name)
    return losses
