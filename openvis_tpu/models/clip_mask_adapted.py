"""Mask-adapted CLIP: mask-prompted vision tower (AdaptedClipAdapter).

Rebuild of the vendored fork the reference ships under
``third_parties/mask_adapted_clip`` (``model.py:288-363``) and its adapter
(``modeling/clip_adapter/mask_adapted_adapter.py:35-165``): the ViT takes
the instance mask, average-pools it to the patch grid (ceil -> {0,1}), and
for the first ``mask_prompt_depth`` layers replaces BACKGROUND patch tokens
with a learned per-depth ``mask_embedding`` — instead of zero-blending the
pixels like the plain ClipAdapter.

Param layout matches ``CLIPVisionTransformer`` plus ``mask_embedding``
(depth, grid^2, width), so converted OpenAI/mask-adapted weights graft in.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from openvis_tpu.models.clip.model import (
    CLIP_PIXEL_MEAN,
    CLIP_PIXEL_STD,
    LayerNormF32,
    ResidualAttentionBlock,
    resize_pos_embed,
)
from openvis_tpu.models.clip_adapter import mask_square_boxes, roi_crop


class MaskAdaptedVisual(nn.Module):
    patch_size: int = 16
    width: int = 768
    layers: int = 12
    heads: int = 12
    embed_dim: int = 512
    image_size: int = 224
    mask_prompt_depth: int = 3

    @nn.compact
    def __call__(self, images: jax.Array, masks: Optional[jax.Array] = None):
        """images: (N, S, S, 3) CLIP-normalized; masks: (N, S, S) in [0,1].
        -> (N, D) cls features."""
        n = images.shape[0]
        g = self.image_size // self.patch_size
        x = nn.Conv(self.width, (self.patch_size,) * 2,
                    strides=(self.patch_size,) * 2, use_bias=False,
                    name="conv1")(images)
        h, w = x.shape[1:3]
        x = x.reshape(n, h * w, self.width)

        mask_embedding = self.param(
            "mask_embedding", nn.initializers.zeros,
            (self.mask_prompt_depth, g * g, self.width),
        )
        m = None
        if masks is not None:
            # avg-pool to grid, ceil -> any covered pixel marks the patch
            mp = nn.avg_pool(
                masks[..., None], (self.patch_size,) * 2,
                strides=(self.patch_size,) * 2,
            )
            m = jnp.ceil(jnp.clip(mp.reshape(n, h * w, 1), 0.0, 1.0))
            me = mask_embedding.astype(x.dtype)
            if me.shape[1] != h * w:  # resized input: broadcast first token
                me = jnp.broadcast_to(
                    me[:, :1], (self.mask_prompt_depth, h * w, self.width)
                )
            x = x * m + me[0][None] * (1.0 - m)

        cls_emb = self.param(
            "class_embedding", nn.initializers.normal(0.02), (self.width,)
        )
        pos = self.param(
            "positional_embedding", nn.initializers.normal(0.01),
            (1 + g * g, self.width),
        )
        cls = jnp.broadcast_to(cls_emb, (n, 1, self.width)).astype(x.dtype)
        x = jnp.concatenate([cls, x], axis=1)
        x = x + resize_pos_embed(pos, (h, w))[None].astype(x.dtype)
        x = LayerNormF32(name="ln_pre")(x)
        for i in range(self.layers):
            x = ResidualAttentionBlock(
                self.width, self.heads, name=f"resblock{i}"
            )(x)
            if m is not None and (i + 1) < self.mask_prompt_depth:
                me = mask_embedding[i + 1].astype(x.dtype)
                if me.shape[0] != h * w:
                    me = jnp.broadcast_to(me[:1], (h * w, self.width))
                patches = x[:, 1:] * m + me[None] * (1.0 - m)
                x = jnp.concatenate([x[:, :1], patches], axis=1)
        feats = LayerNormF32(name="ln_post")(x[:, 0])
        proj = self.param(
            "proj", nn.initializers.normal(self.width ** -0.5),
            (self.width, self.embed_dim),
        )
        return feats @ proj


def adapted_clip_crop_classify(
    visual_apply,          # fn(imgs (R,S,S,3), masks (R,S,S)|None) -> (R, D)
    frames_raw: jax.Array, # (T, H, W, 3) in [0,255]
    masks: jax.Array,      # (T, Q, H, W) sigmoid
    text_feats: jax.Array, # (K, D)
    input_resolution: int = 224,
    temperature: float = 100.0,
    mask_prompt_fwd: bool = True,
    mask_stride: int = 1,  # masks may live on a coarser grid (see
                           # clip_adapter.clip_crop_classify)
) -> Tuple[jax.Array, jax.Array]:
    """AdaptedClipAdapter.forward (mask_adapted_adapter.py:59-121): the same
    square-crop + mask-blend pipeline as the plain adapter (the reference
    blends unconditionally, ``_preprocess_image`` :117-121), and when
    ``mask_prompt_fwd`` the SOFT mask crop is additionally forwarded to the
    mask-prompted tower (``forward`` :68-71; the tower ceils its patch
    pooling, ``model.py:330-334``, so any covered pixel marks the patch)."""
    t, q, h, w = masks.shape
    r = t * q
    flat_masks = masks.reshape(r, h, w)
    boxes, valid = mask_square_boxes(flat_masks)
    frame_ids = jnp.repeat(jnp.arange(t), q)
    crops = roi_crop(
        frames_raw[frame_ids], boxes * mask_stride, input_resolution
    )
    mask_crops = roi_crop(flat_masks[..., None], boxes, input_resolution)[..., 0]

    mean = jnp.asarray(CLIP_PIXEL_MEAN, crops.dtype)
    std = jnp.asarray(CLIP_PIXEL_STD, crops.dtype)
    blended = crops * mask_crops[..., None]
    clip_in = (blended / 255.0 - mean) / std
    feats = visual_apply(clip_in, mask_crops if mask_prompt_fwd else None)
    feats = feats / (jnp.linalg.norm(feats, axis=-1, keepdims=True) + 1e-6)
    logits = temperature * feats @ text_feats.T
    return logits.reshape(t, q, -1), valid.reshape(t, q)
