"""OpenVIS / OpenVISOnline meta-architecture.

Rebuild of ``openvis/openvis.py:21-281``: a class-agnostic proposal
segmenter (decoder class head = Linear(hidden, 2) objectness,
``frame_mask2former_transformer_decoder.py:199-207``; training labels all
zeroed with ``NUM_CLASSES == 1``, ``openvis.py:35,71-72``) whose
open-vocabulary classification happens only at inference: every predicted
mask is mask-cropped and classified by frozen CLIP in frame chunks, with
per-query frame-averaged logits replacing the objectness scores
(``open_vocabulary_inference``, ``openvis.py:110-147,244-281``).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from openvis_tpu.config import ModelConfig
from openvis_tpu.losses.criterion import CriterionSettings, set_criterion
from openvis_tpu.models.clip_adapter import clip_crop_classify, frame_average_scores
from openvis_tpu.models.meta.simple_baseline import (
    frame_reshape_outputs,
    frame_reshape_targets,
)
from openvis_tpu.models.segmenter import Segmenter
from openvis_tpu.structures import ClipTargets


class OpenVISModel(nn.Module):
    """Segmenter with a binary proposal head (open-vocab via CLIP crops at
    inference, outside this module)."""

    cfg: ModelConfig

    @nn.compact
    def __call__(
        self,
        frames: jax.Array,
        num_frames: int,
        text_feats: Optional[jax.Array] = None,  # unused in the segmenter
    ) -> Dict[str, Any]:
        return Segmenter(self.cfg, name="segmenter")(frames, num_frames)


def openvis_loss(
    rng: jax.Array,
    outputs: Dict[str, Any],
    targets: ClipTargets,
    cfg: ModelConfig,
    online: bool = True,
    axis_name: Optional[str] = None,
) -> Dict[str, jax.Array]:
    """Class-agnostic training: all labels -> 0 (openvis.py:71-72)."""
    c = cfg.criterion
    s = CriterionSettings(
        num_classes=1,
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
    targets = ClipTargets(
        labels=jnp.zeros_like(targets.labels),
        masks=targets.masks,
        valid=targets.valid,
        frame_valid=targets.frame_valid,
    )
    logits_all = outputs["pred_logits_all"]
    masks_all = outputs["pred_masks_all"]
    if online:
        logits_all, masks_all = frame_reshape_outputs(logits_all, masks_all)
        targets = frame_reshape_targets(targets)
    losses, _ = set_criterion(rng, logits_all, masks_all, targets, s, axis_name)
    return losses


def openvis_ov_scores(
    visual_apply,
    frames_raw: jax.Array,   # (T, H, W, 3) in [0, 255]
    mask_logits: jax.Array,  # (Q, T, H, W) at input resolution
    text_feats: jax.Array,   # (K, D)
    chunk: int = 5,
    input_resolution: int = 224,
    sampling_ratio: int = 1,
) -> Tuple[jax.Array, jax.Array]:
    """Open-vocabulary inference scores (openvis.py:110-147): chunked CLIP
    crop classification, frame-averaged logits -> softmax.  Returns
    (scores (Q, K), query_valid (Q,))."""
    t = frames_raw.shape[0]
    masks = jax.nn.sigmoid(jnp.swapaxes(mask_logits, 0, 1))  # (T, Q, H, W)
    logits_parts = []
    valid_parts = []
    for i in range(0, t, chunk):  # static python chunking (fixed T per trace)
        lg, va = clip_crop_classify(
            visual_apply, frames_raw[i : i + chunk], masks[i : i + chunk],
            text_feats, input_resolution=input_resolution,
            sampling_ratio=sampling_ratio,
        )
        logits_parts.append(lg)
        valid_parts.append(va)
    logits = jnp.concatenate(logits_parts, axis=0)
    valid = jnp.concatenate(valid_parts, axis=0)
    return frame_average_scores(logits, valid, mode="logits_then_softmax")
