"""VideoMaskFormer (offline) and MinVIS (online) closed-vocabulary
meta-architectures.

Rebuild of ``openvis/modeling/video_maskformer.py:23-298`` and
``openvis/modeling/minvis.py:76-368``: plain Mask2Former video segmenters
with a fixed (num_classes + 1) linear class head — the base classes every
open-vocab variant extends.  The online variant adds the MinVIS embedding
tracker at inference (handled by ``openvis_tpu.models.tracking``).
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
from openvis_tpu.structures import ClipTargets


class VideoMaskFormerModel(nn.Module):
    """Closed-vocab segmenter; decoder head must be 'video'/'frame'
    (class head).  ``text_feats`` is accepted and ignored so every
    meta-arch shares one call signature."""

    cfg: ModelConfig

    @nn.compact
    def __call__(
        self,
        frames: jax.Array,
        num_frames: int,
        text_feats: Optional[jax.Array] = None,
    ) -> Dict[str, Any]:
        return Segmenter(self.cfg, name="segmenter")(frames, num_frames)


def video_maskformer_loss(
    rng: jax.Array,
    outputs: Dict[str, Any],
    targets: ClipTargets,
    cfg: ModelConfig,
    online: bool = False,
    axis_name: Optional[str] = None,
) -> Dict[str, jax.Array]:
    c = cfg.criterion
    s = CriterionSettings(
        num_classes=cfg.num_classes,
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
