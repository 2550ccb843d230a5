"""Training/eval step assembly for the meta-architectures.

Equivalent of the reference's ``Trainer`` + meta-arch ``forward`` glue
(``train_net.py:63-253``; ``simplebsl.py:49-120``): builds the flax model
for a config, the loss closure the sharded train step differentiates, and
the jitted eval forward (tracking + top-k postprocess).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from openvis_tpu.config import Config
from openvis_tpu.models.meta.simple_baseline import (
    SimpleBaselineModel,
    eval_scores,
    simple_baseline_loss,
)
from openvis_tpu.models.postprocess import inference_video_topk


def build_model(cfg: Config):
    name = cfg.model.meta_architecture
    if name in ("SimpleBaseline", "SimpleBaselineOnline"):
        return SimpleBaselineModel(cfg.model)
    if name in ("OpenVIS", "OpenVISOnline"):
        from openvis_tpu.models.meta.openvis import OpenVISModel

        return OpenVISModel(cfg.model)
    if name in ("SAN", "SANOnline"):
        from openvis_tpu.models.meta.san import SANModel

        return SANModel(cfg.model)
    if name == "BriVIS":
        from openvis_tpu.models.meta.brivis import BriVISModel

        return BriVISModel(cfg.model)
    if name in ("VideoMaskFormer", "MinVIS"):
        from openvis_tpu.models.meta.video_maskformer import VideoMaskFormerModel

        return VideoMaskFormerModel(cfg.model)
    if name in ("MasQCLIP",):
        from openvis_tpu.models.meta.masqclip import MasQCLIPModel

        return MasQCLIPModel(cfg.model)
    if name in ("OV2Seg", "OV2SegOnline"):
        from openvis_tpu.models.meta.ov2seg import OV2SegModel

        return OV2SegModel(cfg.model)
    raise ValueError(f"unknown meta architecture {name!r}")


def is_online(cfg: Config) -> bool:
    return cfg.model.transformer_decoder.name.startswith(
        ("frame", "side_adapter_frame")
    )


def init_model(cfg: Config, rng, sample_batch) -> Any:
    model = build_model(cfg)
    b, t, h, w, _ = sample_batch["pixels"].shape
    frames = sample_batch["pixels"].reshape(b * t, h, w, 3)
    variables = model.init(rng, frames, t, sample_batch["text_feats"])
    return model, variables["params"]


def make_loss_fn(
    cfg: Config, model, num_text_classes: int, brivis_image_matcher: bool = True
):
    online = is_online(cfg)
    amp = cfg.solver.amp
    arch = cfg.model.meta_architecture

    def compute_losses(rng, out, targets):
        if arch == "BriVIS":
            from openvis_tpu.models.meta.brivis import brivis_loss

            return brivis_loss(
                rng, out, targets, cfg.model, num_text_classes,
                image_matcher=brivis_image_matcher,
            )
        if arch.startswith("OpenVIS"):
            from openvis_tpu.models.meta.openvis import openvis_loss

            return openvis_loss(rng, out, targets, cfg.model, online)
        if arch.startswith("SAN"):
            from openvis_tpu.models.meta.san import san_loss

            return san_loss(
                rng, out, targets, cfg.model, num_text_classes, online
            )
        if arch.startswith("OV2Seg"):
            from openvis_tpu.models.meta.ov2seg import ov2seg_loss

            return ov2seg_loss(rng, out, targets, cfg.model, num_text_classes)
        if arch == "MasQCLIP":
            from openvis_tpu.models.meta.masqclip import masqclip_loss

            return masqclip_loss(rng, out, targets, cfg.model, num_text_classes)
        if arch in ("VideoMaskFormer", "MinVIS"):
            from openvis_tpu.models.meta.video_maskformer import (
                video_maskformer_loss,
            )

            return video_maskformer_loss(rng, out, targets, cfg.model, online)
        return simple_baseline_loss(
            rng, out, targets, cfg.model, num_text_classes, online
        )

    def loss_fn(params, batch, rng) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        from openvis_tpu.parallel.train_step import stop_frozen_gradients

        pixels = batch["pixels"]  # (B, T, H, W, 3)
        b, t, h, w, _ = pixels.shape
        frames = pixels.reshape(b * t, h, w, 3)
        # requires_grad=False analog: frozen subtrees' backward DCEs away
        # and the grad-clip norm sees exact zeros for them (see
        # train_step.stop_frozen_gradients)
        params = stop_frozen_gradients(cfg, params)
        apply_params = params
        if amp:
            # torch.cuda.amp analog (reference train_net.py AMP=True): run
            # the forward in bf16 by casting the f32 master params at use
            # time — the cast is differentiable, so grads come back f32
            # against the masters.  Norm-layer params (LayerNorm/GroupNorm
            # scales/biases) stay f32, mirroring autocast's fp32 policy for
            # normalization ops; everything else (incl. matmul biases, as
            # under autocast) runs bf16.  Losses below are computed in f32.
            frames = frames.astype(jnp.bfloat16)

            def cast(path, x):
                if x.dtype != jnp.float32:
                    return x
                comps = [
                    str(getattr(k, "key", k)).lower() for k in path
                ]
                if any("norm" in c or c.startswith("ln") for c in comps):
                    return x
                return x.astype(jnp.bfloat16)

            apply_params = jax.tree_util.tree_map_with_path(cast, params)
        # split: criterion point-sampling draws stay decorrelated from the
        # "dropout" stream (Swin stochastic depth activates iff this rng is
        # supplied — see backbone/swin.py drop_path)
        rng, drop_rng = jax.random.split(rng)
        out = model.apply(
            {"params": apply_params}, frames, t, batch["text_feats"],
            rngs={"dropout": drop_rng},
        )
        # losses run in f32, but the LAYER-STACKED mask logits stay bf16 in
        # HBM: set_criterion's scan upcasts each layer's slice right after
        # reading it (exact — bf16->f32 is lossless), halving the dominant
        # scan-carried traffic while keeping the reference f32 grid_sample
        # policy.  criterion.bf16_masks additionally opts the SAMPLING into
        # bf16 (CriterionSettings.bf16_sampling).
        out = {
            k: (
                v if (amp and "masks_all" in k)
                else (v.astype(jnp.float32) if isinstance(v, jax.Array) else v)
            )
            for k, v in out.items()
        }
        losses = compute_losses(rng, out, batch["targets"])
        metrics = {
            "loss_ce": losses["loss_ce"].sum(),
            "loss_mask": losses["loss_mask"].sum(),
            "loss_dice": losses["loss_dice"].sum(),
        }
        return losses["total"], metrics

    return loss_fn


def make_eval_fn(cfg: Config, model):
    """Returns f(params, frames (T,H,W,3), text_feats) -> topk dict for one
    video clip (B=1), fixed shapes."""
    online = is_online(cfg)
    topk = cfg.model.test.topk_per_video

    def eval_fn(params, frames, text_feats):
        t = frames.shape[0]
        out = model.apply({"params": params}, frames, t, text_feats)
        logits = out["pred_logits"]
        masks = out["pred_masks"]
        track_idx = None
        if online:
            # align logits only; mask alignment fuses into the topk gather
            from openvis_tpu.models.tracking import (
                apply_track_indices,
                track_by_embeds,
            )

            indices = track_by_embeds(out["pred_embeds"])
            logits = apply_track_indices(logits, indices)
            track_idx = indices[0]
        scores = eval_scores(logits, online)[0]  # (Q, K)
        return inference_video_topk(scores, masks[0], topk,
                                    track_indices=track_idx)

    return eval_fn
