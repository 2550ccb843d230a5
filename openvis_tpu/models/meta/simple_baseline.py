"""SimpleBaseline / SimpleBaselineOnline meta-architecture.

Rebuild of ``openvis/simplebsl.py:21-344``: a Mask2Former segmenter whose
class head is an *embedding* head projecting queries into CLIP text space;
classification logits are ``100 * normalize(embeds) @ text_embeds.T`` with a
learned, normalized no-object row appended (BgClipAdapter,
``clip_adapter/adapter.py:150-161``; ``cal_sim_logits``, ``adapter.py:146``).

Offline variant: video decoder over the whole clip.  Online variant
(``SimpleBaselineOnline``, MinVIS-style): frame decoder + embedding tracking
at inference; training treats every frame as an independent sample
(``minvis.py:244-268`` frame_decoder_loss_reshape).

Text embeddings arrive as a precomputed (K, D) constant
(``openvis_tpu.models.clip.text_bank``); the class axis K is static per
trace, so per-dataset class counts never mutate the model (the reference
overwrites ``sem_seg_head.num_classes`` at runtime, ``simplebsl.py:57``).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from openvis_tpu.config import ModelConfig
from openvis_tpu.losses.criterion import CriterionSettings, set_criterion
from openvis_tpu.models.segmenter import Segmenter
from openvis_tpu.structures import ClipTargets


def _normalize(x, eps=1e-6):
    return x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + eps)


class SimpleBaselineModel(nn.Module):
    """Segmenter with CLIP-dim embedding head + text-similarity logits."""

    cfg: ModelConfig
    temperature: float = 100.0

    @nn.compact
    def __call__(
        self,
        frames: jax.Array,      # (B*T, H, W, 3) normalized
        num_frames: int,
        text_feats: jax.Array,  # (K, D) normalized rows (zero rows = padding)
    ) -> Dict[str, Any]:
        out = Segmenter(self.cfg, name="segmenter")(frames, num_frames)

        # BgClipAdapter's learned no-object embedding (adapter.py:154-161)
        d = self.cfg.transformer_decoder.clip_embed_dim
        bg = self.param(
            "non_object_embedding",
            nn.initializers.normal(self.cfg.transformer_decoder.hidden_dim ** -0.5),
            (1, d),
        )
        text_full = jnp.concatenate([text_feats, _normalize(bg)], axis=0)  # (K+1, D)

        embeds_all = out["pred_logits_all"]  # (L, B[,T], Q, D)
        logits_all = self.temperature * jnp.einsum(
            "...d,kd->...k", _normalize(embeds_all), text_full
        )
        out["pred_embeds_clip_all"] = embeds_all
        out["pred_logits_all"] = logits_all
        out["pred_logits"] = logits_all[-1]
        return out


def frame_reshape_outputs(
    pred_logits_all: jax.Array,  # (L, B, T, Q, C)
    pred_masks_all: jax.Array,   # (L, B, Q, T, H, W)
) -> Tuple[jax.Array, jax.Array]:
    """MinVIS frame_decoder_loss_reshape (minvis.py:244-268): each frame
    becomes a batch item with a single-frame mask axis."""
    l, b, t, q, c = pred_logits_all.shape
    logits = pred_logits_all.reshape(l, b * t, q, c)
    masks = jnp.swapaxes(pred_masks_all, 2, 3)  # (L, B, T, Q, H, W)
    h, w = masks.shape[-2:]
    masks = masks.reshape(l, b * t, q, 1, h, w)
    return logits, masks


def frame_reshape_targets(targets: ClipTargets) -> ClipTargets:
    b, n, t = targets.frame_valid.shape
    h, w = targets.masks.shape[-2:]
    # per-frame copies: (B, N, ...) -> (B*T, N, ...)
    labels = jnp.broadcast_to(targets.labels[:, None], (b, t, n)).reshape(b * t, n)
    valid = jnp.broadcast_to(targets.valid[:, None], (b, t, n)).reshape(b * t, n)
    masks = jnp.swapaxes(targets.masks, 1, 2)  # (B, T, N, H, W)
    masks = masks.reshape(b * t, n, 1, h, w)
    frame_valid = jnp.broadcast_to(
        targets.valid[:, None, :, None], (b, t, n, 1)
    ).reshape(b * t, n, 1)
    return ClipTargets(labels=labels, masks=masks, valid=valid, frame_valid=frame_valid)


def simple_baseline_loss(
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
    else:
        # offline video decoder: logits (L, B, Q, C) already clip-level
        pass
    losses, _ = set_criterion(rng, logits_all, masks_all, targets, s, axis_name)
    return losses


def eval_scores(
    pred_logits: jax.Array,  # online: (B, T, Q, K+1) aligned; offline: (B, Q, K+1)
    online: bool = True,
) -> jax.Array:
    """-> (B, Q, K) softmax probabilities without the bg column
    (simplebsl.py:100-101; logits averaged over frames for online,
    minvis post_processing mean over T)."""
    if online:
        pred_logits = pred_logits.mean(axis=1)
    probs = jax.nn.softmax(pred_logits, axis=-1)
    return probs[..., :-1]
