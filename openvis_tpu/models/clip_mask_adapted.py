"""Mask-adapted CLIP: mask-prompted vision towers (AdaptedClipAdapter).

Rebuild of the vendored fork the reference ships under
``third_parties/mask_adapted_clip`` (``model.py:288-363``) and its adapter
(``modeling/clip_adapter/mask_adapted_adapter.py:35-165``): the ViT takes
the instance mask, average-pools it to the patch grid (ceil -> {0,1}), and
for the first ``mask_prompt_depth`` layers replaces BACKGROUND patch tokens
with a learned per-depth ``mask_embedding`` — instead of zero-blending the
pixels like the plain ClipAdapter.

Param layout matches ``CLIPVisionTransformer`` plus ``mask_embedding``
(depth, grid^2, width), so converted OpenAI/mask-adapted weights graft in.

Also here: the fork's RN50/RN101 tower — ``ModifiedResNet`` with the
maskable ``AttentionPool2d`` (``model.py:73-221``); the mask routes into the
pool's key-padding instead of mask embeddings.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from openvis_tpu.models.backbone.resnet import FrozenAffine
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


class _RNBottleneck(nn.Module):
    """CLIP ModifiedResNet bottleneck (``mask_adapted_clip/model.py:14-71``):
    all convs stride 1; an avg-pool runs after conv2 when stride > 1
    (anti-aliased downsample); the shortcut is avg-pool + 1x1 conv.  BNs are
    eval-mode with pretrained running stats, folded to affines at weight
    conversion (the tower is frozen — exact)."""

    planes: int
    stride: int = 1
    has_downsample: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        out_ch = self.planes * 4
        y = nn.Conv(self.planes, (1, 1), use_bias=False, name="conv1")(x)
        y = nn.relu(FrozenAffine(self.planes, name="bn1")(y))
        y = nn.Conv(self.planes, (3, 3), padding=[(1, 1), (1, 1)],
                    use_bias=False, name="conv2")(y)
        y = nn.relu(FrozenAffine(self.planes, name="bn2")(y))
        if self.stride > 1:
            y = nn.avg_pool(y, (self.stride,) * 2, strides=(self.stride,) * 2)
        y = nn.Conv(out_ch, (1, 1), use_bias=False, name="conv3")(y)
        y = FrozenAffine(out_ch, name="bn3")(y)
        if self.has_downsample:
            idn = x
            if self.stride > 1:
                idn = nn.avg_pool(idn, (self.stride,) * 2,
                                  strides=(self.stride,) * 2)
            idn = nn.Conv(out_ch, (1, 1), use_bias=False,
                          name="downsample_conv")(idn)
            idn = FrozenAffine(out_ch, name="downsample_bn")(idn)
        else:
            idn = x
        return nn.relu(y + idn)


def _nearest_pool_mask(masks: jax.Array, gh: int, gw: int) -> jax.Array:
    """torch ``F.interpolate(mode='nearest')`` of (N, H, W) to (N, gh, gw):
    index = floor(i * in/out), statically computed."""
    h, w = masks.shape[-2:]
    yi = np.minimum((np.arange(gh) * h) // gh, h - 1)
    xi = np.minimum((np.arange(gw) * w) // gw, w - 1)
    return masks[..., yi[:, None], xi[None, :]]


class MaskAdaptedModifiedResNet(nn.Module):
    """CLIP ``ModifiedResNet`` with maskable ``AttentionPool2d``
    (``third_parties/mask_adapted_clip/mask_adapted_clip/model.py:73-221``):
    3-conv stem + avg-pool, 4 bottleneck stages, and a QKV attention pool
    whose query row is the patch mean; the instance mask (nearest-resized to
    the final grid, > 0.5) enters as the pool's key-padding vector with a
    True appended — replicated VERBATIM from the fork (``model.py:88-96``),
    including its token/mask alignment (tokens are [mean; patches] while the
    padding vector is [patch flags; True]; True = key excluded, torch
    ``key_padding_mask`` semantics)."""

    layers: Sequence[int] = (3, 4, 6, 3)
    width: int = 64
    embed_dim: int = 1024    # attn-pool output dim
    heads: int = 32
    image_size: int = 224

    @nn.compact
    def __call__(self, images: jax.Array, masks: Optional[jax.Array] = None):
        """images: (N, S, S, 3) CLIP-normalized; masks: (N, S, S) in [0,1]
        (soft crop masks).  -> (N, embed_dim) pooled features."""
        w = self.width
        x = images
        # 3-layer stem (model.py:165-180), avg-pool 2 at the end
        for i, (ch, stride) in enumerate(((w // 2, 2), (w // 2, 1), (w, 1))):
            x = nn.Conv(ch, (3, 3), strides=(stride,) * 2,
                        padding=[(1, 1), (1, 1)], use_bias=False,
                        name=f"stem_conv{i + 1}")(x)
            x = nn.relu(FrozenAffine(ch, name=f"stem_bn{i + 1}")(x))
        x = nn.avg_pool(x, (2, 2), strides=(2, 2))

        for si, n_blocks in enumerate(self.layers):
            planes = w * (2 ** si)
            for b in range(n_blocks):
                stride = 2 if (b == 0 and si > 0) else 1
                has_ds = b == 0 and (stride > 1 or
                                     x.shape[-1] != planes * 4)
                x = _RNBottleneck(planes, stride, has_ds,
                                  name=f"layer{si + 1}_block{b}")(x)

        # AttentionPool2d (model.py:73-148)
        n, gh, gw, c = x.shape
        L = gh * gw
        toks = x.reshape(n, L, c)
        toks = jnp.concatenate([toks.mean(axis=1, keepdims=True), toks], 1)

        grid = self.image_size // 32
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(c ** -0.5), (grid * grid + 1, c),
        )
        pos = resize_pos_embed(pos, (gh, gw), src_grid=grid)
        toks = toks + pos[None].astype(toks.dtype)

        q = nn.Dense(c, name="q_proj")(toks).reshape(n, L + 1, self.heads, -1)
        k = nn.Dense(c, name="k_proj")(toks).reshape(n, L + 1, self.heads, -1)
        v = nn.Dense(c, name="v_proj")(toks).reshape(n, L + 1, self.heads, -1)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(
            jnp.asarray(q.shape[-1], q.dtype)
        )
        if masks is not None:
            mflat = _nearest_pool_mask(masks, gh, gw).reshape(n, L) > 0.5
            kp = jnp.concatenate(
                [mflat, jnp.ones((n, 1), bool)], axis=1
            )  # fork's exact vector (model.py:92-96)
            logits = jnp.where(kp[:, None, None, :], -jnp.inf, logits)
        attn = jax.nn.softmax(
            logits.astype(jnp.float32), axis=-1
        ).astype(toks.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(n, L + 1, c)
        out = nn.Dense(self.embed_dim, name="c_proj")(out)
        return out[:, 0]


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
    sampling_ratio: int = 1,
) -> Tuple[jax.Array, jax.Array]:
    """AdaptedClipAdapter.forward (mask_adapted_adapter.py:59-121): the same
    square-crop + mask-blend pipeline as the plain adapter (the reference
    blends unconditionally, ``_preprocess_image`` :117-121), and when
    ``mask_prompt_fwd`` the SOFT mask crop is additionally forwarded to the
    mask-prompted tower (``forward`` :68-71; the tower ceils its patch
    pooling, ``model.py:330-334``, so any covered pixel marks the patch)."""
    t, q, h, w = masks.shape
    mean = jnp.asarray(CLIP_PIXEL_MEAN, frames_raw.dtype)
    std = jnp.asarray(CLIP_PIXEL_STD, frames_raw.dtype)

    # one frame at a time (lax.map over T) — the all-at-once region form
    # gathers ~9 GB of corner planes at window shapes and OOMs; see
    # clip_adapter.clip_crop_classify
    def per_frame(args):
        frame, masks_f = args                            # (H,W,3), (Q,h,w)
        boxes, valid = mask_square_boxes(masks_f)
        crops = roi_crop(frame[None], boxes * mask_stride, input_resolution,
                         sampling_ratio=sampling_ratio)
        mask_crops = roi_crop(masks_f[..., None], boxes, input_resolution,
                              sampling_ratio=sampling_ratio)[..., 0]
        blended = crops * mask_crops[..., None]
        clip_in = (blended / 255.0 - mean) / std
        feats = visual_apply(clip_in, mask_crops if mask_prompt_fwd else None)
        feats = feats / (
            jnp.linalg.norm(feats, axis=-1, keepdims=True) + 1e-6
        )
        return temperature * feats @ text_feats.T, valid

    logits, valid = jax.lax.map(per_frame, (frames_raw, masks))
    return logits, valid
