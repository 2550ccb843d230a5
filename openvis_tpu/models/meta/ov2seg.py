"""OV2Seg meta-architecture.

Rebuild of ``openvis/ov2seg.py:533-985`` (from the LVVIS repo): an online
per-frame segmenter whose decoder carries TWO heads — a zero-shot classifier
embedding (MLP hidden -> D/2 -> D, logits = ``50 * normalize(e) @ [text;
0].T`` with an all-zero background row, ``ov2seg.py:489-529``) and a 2-way
objectness head.  Training (``Criterion``, ``ov2seg.py:307-470``):

  * matcher prob = ``[sqrt(sigmoid(cls) * p_obj[0]), p_obj[1]]``
    (``:211-213``), plus the usual point mask/dice costs;
  * losses: weighted CE over K+1 on the zs logits (eos 0.1) + CE over the
    2-way objectness with empty weight 0.4 + point mask losses.  (The
    reference also computes a federated sigmoid-BCE class term but
    immediately overwrites it, ``ov2seg.py:361-367`` — dead code, not
    replicated.)

Inference: EMA (alpha 0.7) embedding tracker, video score =
``sqrt(sigmoid(mean cls) * softmax(mean obj)[0])``, and per-frame gating —
frames whose per-frame score falls below 10% of the video score get their
masks suppressed (``:867-868``).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from openvis_tpu.config import ModelConfig
from openvis_tpu.losses.criterion import (
    CriterionSettings,
    _loss_masks,
    num_masks_normalizer,
)
from openvis_tpu.models.meta.simple_baseline import (
    _normalize,
    frame_reshape_targets,
)
from openvis_tpu.models.segmenter import Segmenter
from openvis_tpu.ops.hungarian import batched_hungarian
from openvis_tpu.ops.point_sample import (
    sample_maps_shared,
    sorted_uniform_points,
)
from openvis_tpu.structures import ClipTargets

NORM_TEMP = 50.0


class OV2SegModel(nn.Module):
    cfg: ModelConfig

    @nn.compact
    def __call__(
        self,
        frames: jax.Array,
        num_frames: int,
        text_feats: jax.Array,  # (K, D)
    ) -> Dict[str, Any]:
        out = Segmenter(self.cfg, name="segmenter")(frames, num_frames)
        d = self.cfg.transformer_decoder.clip_embed_dim
        packed = out["pred_logits_all"]            # (L, B, T, Q, D+2)
        emb, obj = packed[..., :d], packed[..., d:]
        text_bg = jnp.concatenate(
            [text_feats, jnp.zeros_like(text_feats[:1])], axis=0
        )  # zero bg row (ov2seg.py:524)
        cls = NORM_TEMP * jnp.einsum(
            "...d,kd->...k", _normalize(emb), text_bg
        )
        out["pred_logits_all"] = cls               # (L, B, T, Q, K+1)
        out["pred_object_logits_all"] = obj        # (L, B, T, Q, 2)
        out["pred_logits"] = cls[-1]
        out["pred_object_logits"] = obj[-1]
        return out


def _fused_prob(cls_logits, obj_logits):
    """[sqrt(sigmoid(cls) * p_obj0), p_obj1] (ov2seg.py:211-213)."""
    p_obj = jax.nn.softmax(obj_logits, axis=-1)
    cls_p = jnp.sqrt(
        jax.nn.sigmoid(cls_logits[..., :-1]) * p_obj[..., :1] + 1e-12
    )
    return jnp.concatenate([cls_p, p_obj[..., 1:]], axis=-1)


def ov2seg_loss(
    rng: jax.Array,
    outputs: Dict[str, Any],
    targets: ClipTargets,
    cfg: ModelConfig,
    num_text_classes: int,
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
    )
    # frame reshape: every frame a sample
    la = outputs["pred_logits_all"]
    oa = outputs["pred_object_logits_all"]
    ma = outputs["pred_masks_all"]
    l, b, t, q, k1 = la.shape
    la = la.reshape(l, b * t, q, k1)
    oa = oa.reshape(l, b * t, q, 2)
    h, w = ma.shape[-2:]
    ma = jnp.swapaxes(ma, 2, 3).reshape(l, b * t, q, 1, h, w)
    tg = frame_reshape_targets(targets)
    nm = num_masks_normalizer(tg, axis_name)
    n = tg.labels.shape[1]

    rngs = jax.random.split(rng, l * 2).reshape(l, 2, -1)

    def layer(xs):
        cls_l, obj_l, masks_l, keys = xs
        if not s.bf16_sampling:  # f32 sampling policy; see criterion
            masks_l = masks_l.astype(jnp.float32)
        # matching cost with the fused probability
        # shared y-sorted points per item -> tent-matmul sampler on TPU
        # (see criterion; matching is stop-gradient so no bwd cost)
        coords = sorted_uniform_points(keys[0], (b * t,), s.num_points)
        pm = masks_l.reshape(b * t, q, h, w)
        tm = tg.masks.astype(jnp.float32).reshape(b * t, n, *tg.masks.shape[-2:])
        op = sample_maps_shared(pm, coords)
        tp = sample_maps_shared(tm, coords)
        pos = jax.nn.softplus(-op)
        neg = jax.nn.softplus(op)
        cost_mask = (
            jnp.einsum("bqp,bnp->bqn", pos, tp)
            + jnp.einsum("bqp,bnp->bqn", neg, 1.0 - tp)
        ) / s.num_points
        sig = jax.nn.sigmoid(op)
        numer = 2.0 * jnp.einsum("bqp,bnp->bqn", sig, tp)
        denom = sig.sum(-1)[:, :, None] + tp.sum(-1)[:, None, :]
        cost_dice = 1.0 - (numer + 1.0) / (denom + 1.0)
        prob = _fused_prob(cls_l, obj_l)                 # (BT, Q, K+1)
        labels = jnp.clip(tg.labels, 0, prob.shape[-1] - 1)
        cost_class = -jnp.take_along_axis(
            prob, labels[:, None, :].repeat(q, axis=1), axis=-1
        )
        cost = (
            s.mask_weight * cost_mask
            + s.dice_weight * cost_dice
            + s.class_weight * cost_class
        )
        cost = jnp.where(
            tg.valid[:, :, None], jnp.transpose(cost, (0, 2, 1)), 0.0
        )
        a = jax.lax.stop_gradient(batched_hungarian(cost))  # (BT, N)

        # class + objectness CE (effective reference behavior)
        tc = jnp.full((b * t, q), num_text_classes, jnp.int32)
        upd = jnp.where(tg.valid, a, q)
        tc = tc.at[jnp.arange(b * t)[:, None], upd].set(tg.labels, mode="drop")
        logp = jax.nn.log_softmax(cls_l.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, tc[..., None], axis=-1)[..., 0]
        wce = jnp.where(tc == num_text_classes, s.eos_coef, 1.0)
        loss_ce = (wce * nll).sum() / wce.sum()

        t_obj = (tc == num_text_classes).astype(jnp.int32)
        logp_o = jax.nn.log_softmax(obj_l.astype(jnp.float32), axis=-1)
        nll_o = -jnp.take_along_axis(logp_o, t_obj[..., None], axis=-1)[..., 0]
        wobj = jnp.where(t_obj == 1, 0.4, 1.0)  # empty_object_weight
        loss_obj = (wobj * nll_o).sum() / wobj.sum()

        lm, ld = _loss_masks(keys[1], masks_l, a, tg, nm, s)
        return loss_ce, loss_obj, lm, ld

    def scan_body(_, xs):
        return None, layer(xs)

    _, (lce, lobj, lm, ld) = jax.lax.scan(
        scan_body, None, (la, oa, ma, rngs)
    )
    total = (
        s.class_weight * (lce.sum() + lobj.sum())
        + s.mask_weight * lm.sum()
        + s.dice_weight * ld.sum()
    )
    return {
        "loss_ce": lce, "loss_object_ce": lobj,
        "loss_mask": lm, "loss_dice": ld, "total": total,
    }


def ov2seg_eval_scores(
    cls_logits: jax.Array,  # (T, Q, K+1) aligned
    obj_logits: jax.Array,  # (T, Q, 2) aligned
) -> Tuple[jax.Array, jax.Array]:
    """Returns (video scores (Q, K), per_frame scores (T, Q, K)):
    ``sqrt(sigmoid(cls) * p_obj[0])`` of the frame-mean / per-frame logits
    (ov2seg.py:853-856, 926-940)."""
    mean_cls = cls_logits.mean(0)[..., :-1]
    mean_obj = jax.nn.softmax(obj_logits.mean(0), axis=-1)[..., :1]
    video = jnp.sqrt(jax.nn.sigmoid(mean_cls) * mean_obj + 1e-12)
    pf_obj = jax.nn.softmax(obj_logits, axis=-1)[..., :1]
    per_frame = jnp.sqrt(
        jax.nn.sigmoid(cls_logits[..., :-1]) * pf_obj + 1e-12
    )
    return video, per_frame


def ov2seg_frame_gate(
    mask_logits: jax.Array,   # (topk, T, h, w)
    video_scores: jax.Array,  # (topk,)
    per_frame_scores: jax.Array,  # (T, topk) for the selected labels
) -> jax.Array:
    """Suppress masks in frames scoring < 10% of the video score
    (ov2seg.py:867-868)."""
    gate = per_frame_scores.T < (video_scores[:, None] * 0.1)  # (topk, T)
    return jnp.where(gate[:, :, None, None], -1.0, mask_logits)
