"""CLIP tower construction + mask-crop score paths for the eval engine.

Split out of ``engine.py`` (which keeps the eval loops): everything here
builds or drives the FROZEN CLIP towers used at inference — the mask-crop
classifier (OpenVIS ``open_vocabulary_inference``, ``openvis.py:110-147``),
the SimpleBSL geometric-mean ensemble (``simplebsl.py:122-163``), and the
mask-adapted variants (``third_parties/mask_adapted_clip``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from openvis_tpu.config import Config


def eval_dtype(cfg: Config):
    """Array dtype for the eval path: bf16 under AMP eval (``test.amp``,
    mirroring the reference's autocast evaluation, train_net.py:241-242)."""
    return jnp.bfloat16 if cfg.model.test.amp else jnp.float32


def amp_cast(cfg: Config, tree):
    """Cast every f32 leaf of ``tree`` (param trees and host arrays alike)
    to bf16 when AMP eval is on; other dtypes pass through.  The model's
    f32-sensitive islands (CLIP LayerNormF32, attention softmaxes) upcast
    internally regardless of param dtype."""
    if not cfg.model.test.amp:
        return tree
    return jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        tree,
    )


def build_clip_visual(cfg: Config):
    """Frozen CLIP visual tower for the mask-crop scoring paths (OpenVIS
    inference, SimpleBSL ensemble), dispatching on ``clip_adapter.name``
    like the reference's ``build_clip_adapter``
    (``openvis/modeling/clip_adapter/__init__.py:9-15``):

      * "clip" / "bg_clip": plain ViT tower -> ``visual_apply(imgs)``;
      * "adapted" / "bg_adapted": mask-prompted tower
        (``third_parties/mask_adapted_clip/.../model.py:288-363``) ->
        ``visual_apply(imgs, soft_masks_or_None)``.

    Returns ``(visual_apply, adapted)``.  ``clip_adapter.weights`` may be a
    converted msgpack, a torch ``.pt``, an OpenAI model name, or a URL
    (rank-0 fetch + barrier, ``models/clip/build.py``); a plain OpenAI
    conversion grafts into the adapted tower with a zero ``mask_embedding``
    — exactly the reference's ``torch.zeros`` init (``model.py:325``)."""
    from openvis_tpu.models.clip.model import (
        CLIPVisionTransformer,
        _MODEL_SHAPES,
    )
    from openvis_tpu.models.clip.build import build_clip_params

    ca = cfg.model.clip_adapter
    shape = _MODEL_SHAPES[ca.clip_model_name]
    vtree = build_clip_params(ca.weights)["visual"]
    if isinstance(shape["vision_layers"], tuple):
        # ModifiedResNet tower (RN50/RN101): the mask routes into the
        # attention pool's key padding — one module serves both the plain
        # and the mask-adapted adapters (mask_adapted_clip/model.py:73-221)
        from openvis_tpu.models.clip_mask_adapted import (
            MaskAdaptedModifiedResNet,
        )

        vis = MaskAdaptedModifiedResNet(
            layers=shape["vision_layers"], width=shape["vision_width"],
            embed_dim=shape["embed_dim"], heads=shape["vision_heads"],
            image_size=shape["image_size"],
        )
        vtree = amp_cast(cfg, vtree)
        if ca.name in ("adapted", "bg_adapted"):
            return (
                lambda imgs, masks=None: vis.apply(
                    {"params": vtree}, imgs, masks
                ),
                True,
            )
        return (lambda imgs: vis.apply({"params": vtree}, imgs)), False
    if ca.name in ("adapted", "bg_adapted"):
        from openvis_tpu.models.clip_mask_adapted import MaskAdaptedVisual

        vis = MaskAdaptedVisual(
            patch_size=shape["vision_patch"], width=shape["vision_width"],
            layers=shape["vision_layers"], heads=shape["vision_heads"],
            embed_dim=shape["embed_dim"], image_size=shape["image_size"],
            mask_prompt_depth=cfg.model.clip_adapter.mask_prompt_depth,
        )
        if "mask_embedding" not in vtree:
            g = shape["image_size"] // shape["vision_patch"]
            vtree = dict(vtree, mask_embedding=np.zeros(
                (ca.mask_prompt_depth, g * g, shape["vision_width"]),
                np.float32,
            ))
        vtree = amp_cast(cfg, vtree)
        return (
            lambda imgs, masks=None: vis.apply({"params": vtree}, imgs, masks),
            True,
        )
    vis = CLIPVisionTransformer(
        patch_size=shape["vision_patch"], width=shape["vision_width"],
        layers=shape["vision_layers"], heads=shape["vision_heads"],
        embed_dim=shape["embed_dim"], image_size=shape["image_size"],
    )
    vtree = amp_cast(cfg, vtree)
    return (lambda imgs: vis.apply({"params": vtree}, imgs)), False


def crop_text_with_bg(cfg: Config, params, text: jax.Array):
    """Text rows for the mask-crop CLIP classifier in the SimpleBSL
    ensemble: the Bg adapters classify against the class rows PLUS the
    learned, normalized no-object row (``BgClipAdapter.encode_text``,
    ``adapter.py:150-161``) — the same ``non_object_embedding`` parameter
    the SimpleBSL similarity head uses.  Returns ``(rows, has_bg)``;
    ``has_bg`` drives the ensemble's drop-last column."""
    if not cfg.model.clip_adapter.name.startswith("bg"):
        return text, False
    bg = params.get("non_object_embedding") if hasattr(params, "get") else None
    if bg is None:
        return text, False
    bg = jnp.asarray(bg, jnp.float32)
    bg = bg / (jnp.linalg.norm(bg, axis=-1, keepdims=True) + 1e-6)
    bg = bg.astype(text.dtype)  # keep the bank's (AMP) dtype
    return jnp.concatenate([text, bg.reshape(1, -1)], axis=0), True


def apply_clip_ensemble(
    scores: jax.Array,       # (Q, K) softmaxed text-matching scores
    clip_logits: jax.Array,  # (T, Q, K+1) mask-crop CLIP logits (bg row last)
    valid: jax.Array,        # (T, Q)
    weight: float,
    drop_last: bool = True,
) -> jax.Array:
    """SimpleBSL's open_vocabulary_ensemble (simplebsl.py:122-163):
    geometric mean ``scores^(1-w) * clip^w`` with softmax-then-frame-mean
    CLIP probs; queries never valid in any frame keep their scores
    (map-back ones).  ``drop_last`` removes the BgClipAdapter no-object row
    before the softmax (the reference slices ``[..., :-1]`` unconditionally,
    ``simplebsl.py:136`` — pass False for a non-bg adapter so a real class
    is not dropped)."""
    from openvis_tpu.models.clip_adapter import frame_average_scores

    clip_scores, qvalid = frame_average_scores(
        clip_logits, valid, mode="softmax_then_mean", drop_last=drop_last
    )
    clip_scores = jnp.where(qvalid[:, None], clip_scores, 1.0)
    if weight <= 0:
        return jnp.where(qvalid[:, None], clip_scores, scores)
    return jnp.power(scores, 1.0 - weight) * jnp.power(clip_scores, weight)


def make_openvis_score_fn(cfg: Config, clip_visual_apply, adapted=None):
    """Per-window CLIP crop classification on ALIGNED 1/4-res masks
    (openvis.py:110-147 after post_processing).  ``adapted`` routes through
    the mask-prompted tower (AdaptedClipAdapter,
    ``mask_adapted_adapter.py:59-76``); None derives it from the config."""
    from openvis_tpu.models.clip.model import _MODEL_SHAPES
    from openvis_tpu.models.clip_adapter import clip_crop_classify

    ca = cfg.model.clip_adapter
    if adapted is None:
        adapted = ca.name in ("adapted", "bg_adapted")
    # crops resample to the tower's own resolution (the reference reads
    # clip_model.visual.input_resolution, adapter.py:40)
    res = _MODEL_SHAPES[ca.clip_model_name]["image_size"]

    def fn(frames_raw, masks_q, text_feats):
        # frames_raw (W,H,Wd,3) 0-255; masks_q (W,Q,h,w) logits at 1/4
        if adapted:
            from openvis_tpu.models.clip_mask_adapted import (
                adapted_clip_crop_classify,
            )

            return adapted_clip_crop_classify(
                clip_visual_apply, frames_raw, jax.nn.sigmoid(masks_q),
                text_feats, input_resolution=res,
                mask_prompt_fwd=ca.mask_prompt_fwd,
                mask_stride=cfg.model.pixel_decoder.common_stride,
                sampling_ratio=ca.crop_sampling_ratio,
            )
        return clip_crop_classify(
            clip_visual_apply, frames_raw, jax.nn.sigmoid(masks_q),
            text_feats, input_resolution=res,
            mask_stride=cfg.model.pixel_decoder.common_stride,
            sampling_ratio=ca.crop_sampling_ratio,
        )

    return fn


def clip_crop_scores(
    score_fn, raw_frames: np.ndarray, masks_tq: np.ndarray,
    text_crop: jax.Array, window: int, t: int,
):
    """Chunked mask-crop CLIP scoring over the real frames (the reference's
    ``part_len`` frame chunks, ``openvis.py:113-122`` /
    ``simplebsl.py:127-136``).  ``masks_tq`` is (Tb, Q, h, w) mask logits in
    per-video-consistent query order; returns ``(logits (T, Q, K'),
    valid (T, Q))`` over the REAL frames only."""
    lgs, vds = [], []
    # masks may arrive BUCKET-padded past the real frame count (the engine
    # aligns (Tb, Q, h, w) stacks); truncate to t so every chunk pairs each
    # mask with ITS frame — the pre-r5 gather path silently clamped the
    # phantom frames' image indices instead (harmless only because [:keep]
    # dropped those rows)
    masks_tq = masks_tq[:t]
    for i in range(0, t, window):
        chunk = raw_frames[i : i + window]
        pad = window - len(chunk)
        if pad:
            chunk = np.concatenate([chunk, chunk[-1:].repeat(pad, 0)])
        m = masks_tq[i : i + window]
        if pad:
            m = np.concatenate([m, m[-1:].repeat(pad, 0)])
        lg, vd = score_fn(jnp.asarray(chunk), jnp.asarray(m), text_crop)
        keep = window - pad
        lgs.append(np.asarray(lg[:keep]))
        vds.append(np.asarray(vd[:keep]))
    return jnp.asarray(np.concatenate(lgs)), jnp.asarray(np.concatenate(vds))


def raw_frames(cfg: Config, pixels: np.ndarray) -> np.ndarray:
    """Undo the model normalization: CLIP crops sample the ORIGINAL 0-255
    frames (the reference feeds ``batched_inputs[0]["image"]``,
    ``simplebsl.py:297``)."""
    raw = pixels * np.asarray(cfg.model.pixel_std) + np.asarray(
        cfg.model.pixel_mean
    )
    return raw.astype(eval_dtype(cfg))
