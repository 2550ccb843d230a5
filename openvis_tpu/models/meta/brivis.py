"""BriVIS meta-architecture (stage 2 on top of SANOnline).

Rebuild of ``openvis/brivis.py:27-316``: the SAN per-frame segmenter runs
FROZEN (``brivis.py:36-41,155-161``; here ``stop_gradient`` + the optimizer's
frozen mask), its per-frame queries are MinVIS-aligned
(``batch_video_match_via_embeds``, ``:173-174``), and the
``TemporalResampler`` refines the aligned tracks over T.  Losses:

  * tracking set criterion on "tall image" masks — the T frames stacked on
    the height axis as one pseudo-frame (``frame_decoder_loss_reshape``,
    ``:213-229``); resampler logits per layer = (first + last frame)/2,
    frozen image logits = mean over T;
  * matching indices come from the frozen image outputs for the first half
    of training and from the resampler outputs afterwards (``:183-190``),
    reused across all aux layers (VideoSetTrackingCriterion);
  * the frozen per-frame outputs are appended as an extra aux layer
    (``:183``);
  * Brownian-bridge contrastive + head-tail matching on the resampler's
    projected frame embeds (``:198``).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from openvis_tpu.config import ModelConfig
from openvis_tpu.losses.brownian import brownian_bridge_loss
from openvis_tpu.losses.criterion import CriterionSettings, match, set_criterion
from openvis_tpu.models.meta.simple_baseline import _normalize
from openvis_tpu.models.resampler import (
    DecoupledTemporalResampler,
    RawTemporalResampler,
    TemporalResampler,
)
from openvis_tpu.models.segmenter import Segmenter
from openvis_tpu.models.side_adapter import SideAdapter
from openvis_tpu.models.tracking import apply_track_indices, track_by_embeds
from openvis_tpu.structures import ClipTargets


class BriVISModel(nn.Module):
    cfg: ModelConfig
    # train: CLIP post-encode for every resampler layer (aux supervision,
    # brivis.py:178-182); eval only reads the final layer, so the engine
    # clones the model with False to cut (L+1)x CLIP cost to 1x.
    supervise_aux_logits: bool = True

    def setup(self):
        cfg = self.cfg
        ca = cfg.clip_adapter
        self.adapter = SideAdapter(
            clip_model_name=ca.clip_model_name,
            out_dims=cfg.pixel_decoder.conv_dim,
            broken_idx=ca.broken_id,
            merge_ids=tuple(ca.merge_ids),
            num_queries=cfg.transformer_decoder.num_queries,
            name="clip_adapter",
        )
        self.segmenter = Segmenter(cfg, name="segmenter")
        rs_kw = dict(
            hidden_dim=cfg.transformer_decoder.hidden_dim,
            feed_dim=cfg.transformer_decoder.dim_feedforward,
            nheads=cfg.transformer_decoder.nheads,
            nlayers=cfg.resampler.num_layers,
            conv_kernels=tuple(cfg.resampler.conv_kernels),
            name="resampler",
        )
        if cfg.resampler.name == "decoupled":
            self.resampler = DecoupledTemporalResampler(
                nqueries=cfg.transformer_decoder.num_queries, **rs_kw
            )
        elif cfg.resampler.name == "raw":
            self.resampler = RawTemporalResampler(**rs_kw)
        else:
            self.resampler = TemporalResampler(**rs_kw)
        self.brownian_dense = nn.Dense(
            cfg.transformer_decoder.hidden_dim, name="brownian_proj"
        )

    def _frame_stack(self, frames: jax.Array, num_frames: int):
        """Frozen stage-1 per-frame stack: front CLIP + segmenter."""
        cfg = self.cfg
        mean = jnp.asarray(cfg.pixel_mean, frames.dtype)
        std = jnp.asarray(cfg.pixel_std, frames.dtype)
        frames_raw = frames * std + mean
        mg_feats, bk_tokens, grid = self.adapter.front_encode(frames_raw)
        image_out = self.segmenter(
            frames, num_frames, extra_features=list(mg_feats)[::-1]
        )
        # frozen stage-1 (brivis.py:155-161)
        image_out = jax.tree.map(
            lambda x: jax.lax.stop_gradient(x) if isinstance(x, jax.Array) else x,
            image_out,
        )
        return image_out, jax.lax.stop_gradient(bk_tokens), grid

    def __call__(
        self,
        frames: jax.Array,      # (B*T, H, W, 3) dataset-normalized
        num_frames: int,
        text_feats: jax.Array,  # (K, D)
    ) -> Dict[str, Any]:
        t = num_frames
        image_out, bk_tokens, grid = self._frame_stack(frames, t)

        bt = frames.shape[0]
        b = bt // t
        text_full = jax.lax.stop_gradient(self.adapter.text_with_bg(text_feats))

        # frozen per-frame CLIP logits (brivis.py:166-169)
        biases = image_out["class_attn_biases"]  # (B, T, nH, Q, h, w)
        nh, q = biases.shape[2], biases.shape[3]
        img_feats = self.adapter.post_encode(
            bk_tokens, biases.reshape(bt, nh, q, *biases.shape[-2:]), grid
        )
        image_logits = self.adapter.sim_logits(text_full, img_feats).reshape(
            b, t, q, -1
        )
        image_logits = jax.lax.stop_gradient(image_logits)

        # MinVIS alignment (brivis.py:173-174, 231-240)
        pred_embeds = image_out["pred_embeds"]            # (B, T, Q, C)
        indices = track_by_embeds(pred_embeds)            # (B, T, Q)
        frame_embeds = apply_track_indices(pred_embeds, indices)
        image_logits = apply_track_indices(image_logits, indices)
        image_masks = apply_track_indices(
            jnp.swapaxes(image_out["pred_masks"], 1, 2), indices
        )
        image_masks = jnp.swapaxes(image_masks, 1, 2)     # (B, Q, T, H, W)

        if self.cfg.resampler.name == "raw":
            res = self.resampler(
                frame_embeds, image_out["mask_feats"],
                image_out["attn_feats"], image_out["ms_feats"],
                image_out["ms_pos"],
            )
        else:
            res = self.resampler(
                frame_embeds, image_out["mask_feats"], image_out["attn_feats"]
            )

        # CLIP logits for all resampler layers in one batched post-encode
        ab = res["attn_biases_all"]  # (L+1, B*T, nH, Q, h, w)
        l1 = ab.shape[0]
        if self.supervise_aux_logits:
            toks = jnp.broadcast_to(
                bk_tokens[None], (l1, *bk_tokens.shape)
            ).reshape(l1 * bt, *bk_tokens.shape[1:])
            feats = self.adapter.post_encode(
                toks, ab.reshape(l1 * bt, *ab.shape[2:]), grid
            )
            logits_all = self.adapter.sim_logits(text_full, feats).reshape(
                l1, b, t, q, -1
            )
        else:  # eval: final layer only, broadcast for shape parity
            feats = self.adapter.post_encode(bk_tokens, ab[-1], grid)
            logits = self.adapter.sim_logits(text_full, feats).reshape(
                b, t, q, -1
            )
            logits_all = jnp.broadcast_to(
                logits[None], (l1, b, t, q, logits.shape[-1])
            )

        # brownian projection (brownian_criterion.py:64-70)
        brownian = self.brownian_dense(res["pred_embeds"])

        return {
            "pred_logits_all": logits_all,          # (L+1, B, T, Q, K+1)
            "pred_masks_all": res["pred_masks_all"],  # (L+1, B, Q, T, H, W)
            "pred_logits": logits_all[-1],
            "pred_masks": res["pred_masks_all"][-1],
            "pred_embeds": res["pred_embeds"],
            "brownian_embeds": brownian,
            "image_logits": image_logits,           # (B, T, Q, K+1) frozen
            "image_masks": image_masks,             # (B, Q, T, H, W) frozen
        }

    # ---- windowed long-video inference (resolves the reference's
    # inconsistent BriVIS window path, brivis.py:267-316 / SURVEY §3.3:
    # per-frame stack runs per window; the resampler's temporal attention
    # runs ONCE over the full concatenated (B, T, Q, C) embeds; the heads +
    # biased CLIP post-encode run per window again) ----

    def frame_stack(self, frames: jax.Array, num_frames: int) -> Dict[str, Any]:
        """One window of the frozen per-frame stack -> small/pixel artifacts
        for later full-sequence resampling.  The raw resampler additionally
        needs the decoder's multi-scale token maps for its per-frame
        cross-attention (``resampler.py:406-470``)."""
        image_out, bk_tokens, _ = self._frame_stack(frames, num_frames)
        out = {
            "pred_embeds": image_out["pred_embeds"],   # (B, T, Q, C)
            "mask_feats": image_out["mask_feats"],     # (B*T, H, W, C)
            "attn_feats": image_out["attn_feats"],     # (B*T, nH, h, w, C)
            "bk_tokens": bk_tokens,                    # (B*T, 1+L, W)
        }
        if self.cfg.resampler.name == "raw":
            for lvl, (f, p) in enumerate(
                zip(image_out["ms_feats"], image_out["ms_pos"])
            ):
                out[f"ms_feats{lvl}"] = f                # (B*T, hw_l, C)
                out[f"ms_pos{lvl}"] = p                  # (1, hw_l, C)
        return out

    # raw-resampler windowed inference (reference resampler.py:406-516):
    # per layer, the temporal half runs over the FULL sequence while the
    # per-frame half runs window-by-window against that window's tokens
    def raw_temporal(self, x: jax.Array, i: int) -> jax.Array:
        return self.resampler.temporal_half(x, i)

    def raw_frame(self, pf, ms_feat, ms_pos, i: int) -> jax.Array:
        return self.resampler.frame_half(pf, ms_feat, ms_pos, i)

    def raw_finalize(self, pf: jax.Array) -> jax.Array:
        return self.resampler.finalize_embeds(pf)

    def resample(self, aligned_embeds: jax.Array) -> jax.Array:
        """Temporal transform over the FULL sequence: (B, T, Q, C) aligned
        -> final-layer per-frame embeds (B, T, Q, C)."""
        return self.resampler.final_embeds(aligned_embeds)

    def predict_window(
        self,
        embeds: jax.Array,      # (N, Q, C) final per-frame embeds (window)
        mask_feats: jax.Array,  # (N, H, W, C)
        attn_feats: jax.Array,  # (N, nH, h, w, C)
        bk_tokens: jax.Array,   # (N, 1+L, W)
        text_feats: jax.Array,  # (K, D)
    ):
        """Final-layer heads + biased CLIP for one window ->
        (masks (N, Q, H, W), logits (N, Q, K+1))."""
        masks, biases = self.resampler.predict_frames(
            embeds, mask_feats, attn_feats
        )
        g = int(round((bk_tokens.shape[1] - 1) ** 0.5))  # square CLIP grid
        feats = self.adapter.post_encode(bk_tokens, biases, (g, g))
        text_full = self.adapter.text_with_bg(text_feats)
        logits = self.adapter.sim_logits(text_full, feats)
        return masks, logits


def _tall(masks: jax.Array) -> jax.Array:
    """(B, Q|N, T, H, W) -> (B, Q|N, 1, T*H, W) (brivis.py:216-226)."""
    b, n, t, h, w = masks.shape
    return masks.reshape(b, n, 1, t * h, w)


def brivis_loss(
    rng: jax.Array,
    outputs: Dict[str, Any],
    targets: ClipTargets,
    cfg: ModelConfig,
    num_text_classes: int,
    image_matcher: bool = True,
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
    # resampler layer logits: (first + last frame)/2 (brivis.py:217)
    la = outputs["pred_logits_all"]
    layer_logits = (la[:, :, 0] + la[:, :, -1]) / 2.0      # (L+1, B, Q, K+1)
    layer_masks = jax.vmap(_tall)(outputs["pred_masks_all"])

    # frozen image outputs appended as an extra aux layer (brivis.py:183)
    img_logits = outputs["image_logits"].mean(axis=1)       # (B, Q, K+1)
    img_masks = _tall(outputs["image_masks"])
    logits_all = jnp.concatenate([img_logits[None], layer_logits], axis=0)
    # order: put the image layer first so the FINAL entry stays the
    # resampler's last layer (the reference appends to aux, same effect)
    masks_all = jnp.concatenate([img_masks[None], layer_masks], axis=0)

    tall_targets = ClipTargets(
        labels=targets.labels,
        masks=_tall(targets.masks),
        valid=targets.valid,
        frame_valid=jnp.ones(
            (*targets.valid.shape, 1), bool
        ),
    )

    rng_m, rng_l, rng_b = jax.random.split(rng, 3)
    if image_matcher:
        assignment = match(rng_m, img_logits, img_masks, tall_targets, s)
    else:
        assignment = match(
            rng_m, layer_logits[-1], layer_masks[-1], tall_targets, s
        )
    losses, _ = set_criterion(
        rng_l, logits_all, masks_all, tall_targets, s, axis_name,
        fixed_assignment=assignment,
    )
    bc, htm = brownian_bridge_loss(
        rng_b, outputs["brownian_embeds"], neg_log=c.brownian_neg_log
    )
    losses["bc_loss"] = bc
    losses["htm_loss"] = htm
    losses["total"] = losses["total"] + bc + htm
    return losses
