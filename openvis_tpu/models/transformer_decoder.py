"""Mask2Former-style masked transformer decoders (video + frame), TPU-native.

Rebuild of the reference decoders:
  * ``VideoMultiScaleMaskedTransformerDecoder``
    (``openvis/modeling/transformer_decoder/video_mask2former_transformer_decoder.py:220-484``)
  * ``FrameMultiScaleMaskedTransformerDecoder`` and its Embedding/Proposal
    variants (``frame_mask2former_transformer_decoder.py:13-207``).

Behavioral contract preserved from the reference:
  * ``dec_layers`` decoder layers round-robin over 3 feature scales
    (level ``i % 3``), each = masked cross-attention -> self-attention -> FFN
    (post-norm by default);
  * prediction heads run on the learnable queries *before* layer 0 and after
    every layer (``num_layers + 1`` prediction sets, all supervised);
  * masked cross-attention: tokens where the previous layer's predicted mask
    has ``sigmoid < 0.5`` are disallowed, except that a query whose mask is
    entirely off attends everywhere (the ``sum == full -> unmask`` fix-up,
    reference ``:419``); the mask is ``stop_gradient``-ed;
  * head variants: ``class`` (Linear to C+1), ``embedding`` (2-layer MLP to
    CLIP dims — EmbeddingFrame..., ``frame_...py:163-196``), ``proposal``
    (Linear to 2 — ProposalFrame..., ``frame_...py:199-207``), ``none``.

TPU-first deltas: batch-major ``(B, L, C)`` layout instead of torch's
``(L, B, C)``; all ``num_layers + 1`` prediction sets are returned **stacked
on a leading layer axis** so the criterion vmaps one fused loss over layers
instead of looping a python list of aux dicts; boolean attention masks become
additive ``-inf`` biases fused into the attention softmax.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from openvis_tpu.models.amp import amp_norm, softmax_f32
from openvis_tpu.models.position_encoding import (
    position_encoding_2d,
    position_encoding_3d,
)
from openvis_tpu.utils.image import (
    resize_bilinear_torch,
    resize_bilinear_torch_hw,
)

NEG_INF = -1e9


class MLP(nn.Module):
    """N-layer perceptron with ReLU (reference ``MLP``, video_...py:204)."""

    hidden_dim: int
    output_dim: int
    num_layers: int

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers - 1):
            x = nn.relu(nn.Dense(self.hidden_dim, name=f"layer{i}")(x))
        return nn.Dense(self.output_dim, name=f"layer{self.num_layers - 1}")(x)


class MultiheadAttention(nn.Module):
    """Batch-major MHA with optional additive attention bias.

    Matches torch ``nn.MultiheadAttention`` semantics (shared scale 1/sqrt(dh),
    separate out proj). ``attn_bias``: (B, 1|H, Lq, Lk) added to the logits.
    """

    d_model: int
    num_heads: int

    @nn.compact
    def __call__(self, q, k, v, attn_bias: Optional[jax.Array] = None):
        d, h = self.d_model, self.num_heads
        dh = d // h
        b, lq, _ = q.shape
        lk = k.shape[1]
        qp = nn.Dense(d, name="q_proj")(q).reshape(b, lq, h, dh)
        kp = nn.Dense(d, name="k_proj")(k).reshape(b, lk, h, dh)
        vp = nn.Dense(d, name="v_proj")(v).reshape(b, lk, h, dh)
        logits = jnp.einsum("bqhd,bkhd->bhqk", qp, kp) / jnp.sqrt(
            jnp.asarray(dh, qp.dtype)
        )
        if attn_bias is not None:
            logits = logits + attn_bias
        # f32 softmax (autocast policy); cast to the value dtype so an f32
        # attn_bias can't promote the value einsum (and everything after)
        attn = softmax_f32(logits, axis=-1).astype(vp.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, vp).reshape(b, lq, d)
        return nn.Dense(d, name="out_proj")(out)


class SelfAttentionLayer(nn.Module):
    """Reference ``SelfAttentionLayer`` (video_...py:29): post/pre-norm MHA."""

    d_model: int
    nhead: int
    pre_norm: bool = False

    @nn.compact
    def __call__(self, tgt, query_pos):
        def attn(x):
            qk = x + query_pos
            return MultiheadAttention(self.d_model, self.nhead, name="self_attn")(
                qk, qk, x
            )

        if self.pre_norm:
            return tgt + attn(amp_norm(nn.LayerNorm(name="norm"), tgt))
        return amp_norm(nn.LayerNorm(name="norm"), tgt + attn(tgt))


class CrossAttentionLayer(nn.Module):
    """Reference ``CrossAttentionLayer`` (video_...py:87) with additive bias."""

    d_model: int
    nhead: int
    pre_norm: bool = False

    @nn.compact
    def __call__(self, tgt, memory, pos, query_pos, attn_bias=None):
        def attn(x):
            return MultiheadAttention(self.d_model, self.nhead, name="multihead_attn")(
                x + query_pos, memory + pos, memory, attn_bias
            )

        if self.pre_norm:
            return tgt + attn(amp_norm(nn.LayerNorm(name="norm"), tgt))
        return amp_norm(nn.LayerNorm(name="norm"), tgt + attn(tgt))


class FFNLayer(nn.Module):
    """Reference ``FFNLayer`` (video_...py:150)."""

    d_model: int
    dim_feedforward: int
    pre_norm: bool = False

    @nn.compact
    def __call__(self, tgt):
        def ff(x):
            return nn.Dense(self.d_model, name="linear2")(
                nn.relu(nn.Dense(self.dim_feedforward, name="linear1")(x))
            )

        if self.pre_norm:
            return tgt + ff(amp_norm(nn.LayerNorm(name="norm"), tgt))
        return amp_norm(nn.LayerNorm(name="norm"), tgt + ff(tgt))


def _resize_mask(m: jax.Array, size: Tuple[int, int]) -> jax.Array:
    """(..., H, W) bilinear resize with the reference's exact torch
    semantics (align_corners=False, NO antialias): the attn bias below reads
    the SIGN of the resized logits, and jax.image.resize's antialiased
    downscale flips signs near mask boundaries (utils/image.py)."""
    return resize_bilinear_torch_hw(m, size)


def attn_bias_from_mask_logits(
    mask_logits: jax.Array, size: Tuple[int, int]
) -> jax.Array:
    """Build the masked-cross-attention additive bias.

    ``mask_logits``: (B, Q, H, W) or (B, Q, T, H, W). Returns
    (B, 1, Q, HW) / (B, 1, Q, T*HW) with 0 where attention is allowed and
    ``NEG_INF`` where disallowed.  Implements the reference's
    ``sigmoid < 0.5`` rule + the all-masked fix-up (video_...py:419,468).
    """
    r = _resize_mask(mask_logits, size)
    flat = r.reshape(*r.shape[:2], -1)  # (B, Q, [T*]HW); sigmoid<0.5 <=> logit<0
    disallowed = flat < 0.0
    all_masked = jnp.all(disallowed, axis=-1, keepdims=True)
    disallowed = jnp.logical_and(disallowed, jnp.logical_not(all_masked))
    bias = jnp.where(disallowed, NEG_INF, 0.0).astype(mask_logits.dtype)
    return jax.lax.stop_gradient(bias)[:, None]  # broadcast over heads


class PredictionHeads(nn.Module):
    """decoder_norm -> class head + mask-embed MLP (reference
    ``forward_prediction_heads``, video_...py:456-474).  The
    ``side_adapter`` head instead emits per-CLIP-head attention-bias maps
    ``einsum(attn_embed, attn_features)`` (side_adapter_frame_...py:151-169)."""

    hidden_dim: int
    mask_dim: int
    head: str  # "class" | "embedding" | "proposal" | "side_adapter" | "none"
    num_classes: int = 0
    clip_dim: int = 512
    clip_heads: int = 12

    @nn.compact
    def __call__(self, output, mask_features, video: bool, attn_features=None):
        x = amp_norm(nn.LayerNorm(name="decoder_norm"), output)  # (B, Q, C)
        if self.head == "class":
            logits = nn.Dense(self.num_classes + 1, name="class_embed")(x)
        elif self.head == "embedding":
            logits = MLP(self.clip_dim * 2, self.clip_dim, 2, name="class_embed")(x)
        elif self.head == "proposal":
            logits = nn.Dense(2, name="class_embed")(x)
        elif self.head == "side_adapter":
            attn_embed = MLP(self.hidden_dim, self.hidden_dim, 3, name="attn_embed")(x)
            if video:
                # video decoder: queries are per-CLIP (B, Q, C) but attn
                # features are per-frame — biases (B, T, nH, Q, h, w)
                # (side_adapter_video_...py:128: "bqc,btnchw->btnqhw")
                b = x.shape[0]
                af = attn_features.reshape(b, -1, *attn_features.shape[1:])
                logits = jnp.einsum("bqc,btnhwc->btnqhw", attn_embed, af)
            else:
                # frame decoder: (B*T, nH, h, w, C) -> (B*T, nH, Q, h, w)
                logits = jnp.einsum(
                    "bqc,bnhwc->bnqhw", attn_embed, attn_features
                )
        elif self.head == "zero_shot":
            # ZeroShotMultiScaleMaskedTransformerDecoder (zero_shot_...py:
            # 246-266): "logits" are the normalized decoder embeddings
            # themselves (matched against text externally) packed with a
            # 2-layer objectness head, [embed (hidden) | obj (2)]
            obj = MLP(self.hidden_dim, 2, 2, name="object_embed")(x)
            logits = jnp.concatenate([x, obj], axis=-1)
        elif self.head == "ov2seg":
            # OV2Seg (ov2seg.py:489-529 + object head): zero-shot classifier
            # MLP hidden -> D/2 -> D plus a 2-way objectness head, packed on
            # the last axis as [zs_embed (D) | obj (2)]
            e = nn.Dense(self.clip_dim // 2, name="zs_fc1")(x)
            e = nn.Dense(self.clip_dim, name="zs_fc2")(nn.relu(e))
            obj = nn.Dense(2, name="object_embed")(x)
            logits = jnp.concatenate([e, obj], axis=-1)
        else:
            logits = None
        mask_embed = MLP(self.hidden_dim, self.mask_dim, 3, name="mask_embed")(x)
        if video:  # mask_features (B, T, H, W, C)
            masks = jnp.einsum("bqc,bthwc->bqthw", mask_embed, mask_features)
        else:  # (B, H, W, C)
            masks = jnp.einsum("bqc,bhwc->bqhw", mask_embed, mask_features)
        return logits, masks, x


class MaskedTransformerDecoder(nn.Module):
    """Shared decoder body for frame/video variants.

    ``mode``: "frame" runs each frame as a batch item with 2D PE; "video"
    attends over (T*HW) tokens per level with 3D PE.
    """

    mode: str = "frame"
    head: str = "class"
    hidden_dim: int = 256
    num_queries: int = 100
    nheads: int = 8
    dim_feedforward: int = 2048
    dec_layers: int = 9
    pre_norm: bool = False
    mask_dim: int = 256
    num_classes: int = 0
    clip_dim: int = 512
    clip_heads: int = 12
    in_channels: int = 256
    enforce_input_project: bool = False

    @nn.compact
    def __call__(
        self,
        x: Sequence[jax.Array],      # 3 NHWC maps, top-down (1/32, 1/16, 1/8);
                                     # frame mode: N = B*T
        mask_features: jax.Array,    # frame: (B*T, H, W, Cm); video: (B,T,H,W,Cm)
        num_frames: int,
    ) -> Dict[str, Any]:
        video = self.mode == "video"
        nlvl = 3
        t = num_frames

        level_embed = self.param(
            "level_embed", nn.initializers.normal(1.0), (nlvl, self.hidden_dim)
        )
        query_feat = self.param(
            "query_feat", nn.initializers.normal(1.0), (self.num_queries, self.hidden_dim)
        )
        query_embed = self.param(
            "query_embed", nn.initializers.normal(1.0), (self.num_queries, self.hidden_dim)
        )

        if video:
            bs = mask_features.shape[0]
        else:
            bt = x[0].shape[0]
            bs = bt // t

        srcs: List[jax.Array] = []
        poses: List[jax.Array] = []
        size_list: List[Tuple[int, int]] = []
        for i in range(nlvl):
            f = x[i]
            h, w = f.shape[1], f.shape[2]
            size_list.append((h, w))
            if self.in_channels != self.hidden_dim or self.enforce_input_project:
                f = nn.Conv(self.hidden_dim, (1, 1), name=f"input_proj{i}")(f)
            if video:
                # (B*T, h, w, C) -> (B, T*hw, C), t-major token order
                pe = position_encoding_3d(t, h, w, self.hidden_dim).astype(f.dtype)
                poses.append(pe.reshape(1, t * h * w, self.hidden_dim))
                srcs.append(
                    f.reshape(bs, t * h * w, self.hidden_dim) + level_embed[i]
                )
            else:
                pe = position_encoding_2d(h, w, self.hidden_dim // 2).astype(f.dtype)
                poses.append(pe.reshape(1, h * w, self.hidden_dim))
                srcs.append(f.reshape(bs * t, h * w, self.hidden_dim) + level_embed[i])

        nb = bs if video else bs * t
        output = jnp.broadcast_to(query_feat[None], (nb, self.num_queries, self.hidden_dim))
        qpos = jnp.broadcast_to(query_embed[None], (nb, self.num_queries, self.hidden_dim))

        mf = mask_features  # video: (B, T, H, W, Cm); frame: (B*T, H, W, Cm)

        attn_features = None
        if self.head == "side_adapter":
            # Attention-bias branch (side_adapter_frame_...py:48,70-75):
            # 1/4-downsampled mask features -> 3x 1x1-conv MLP ->
            # (N, clip_heads, h, w, C)
            base = mf if not video else mf.reshape(bs * t, *mf.shape[2:])
            n_, hm, wm, cm = base.shape
            # exact torch bilinear (no antialias), like the reference's
            # F.interpolate(scale_factor=0.25) — see utils/image.py
            af = resize_bilinear_torch(base, (hm // 4, wm // 4))
            af = nn.relu(nn.Conv(self.hidden_dim, (1, 1), name="attn_mlp0")(af))
            af = nn.relu(nn.Conv(self.hidden_dim, (1, 1), name="attn_mlp1")(af))
            af = nn.Conv(self.hidden_dim * self.clip_heads, (1, 1), name="attn_mlp2")(af)
            h4, w4 = af.shape[1:3]
            attn_features = jnp.transpose(
                af.reshape(n_, h4, w4, self.clip_heads, self.hidden_dim),
                (0, 3, 1, 2, 4),
            )  # (N, nH, h, w, C)

        heads = PredictionHeads(
            self.hidden_dim, self.mask_dim, self.head, self.num_classes,
            self.clip_dim, self.clip_heads, name="heads",
        )

        all_logits, all_masks = [], []
        logits, masks, _ = heads(output, mf, video, attn_features)
        all_logits.append(logits)
        all_masks.append(masks)
        attn_bias = attn_bias_from_mask_logits(masks, size_list[0])

        for i in range(self.dec_layers):
            lvl = i % nlvl
            output = CrossAttentionLayer(
                self.hidden_dim, self.nheads, self.pre_norm,
                name=f"cross_attn{i}",
            )(output, srcs[lvl], poses[lvl], qpos, attn_bias)
            output = SelfAttentionLayer(
                self.hidden_dim, self.nheads, self.pre_norm, name=f"self_attn{i}"
            )(output, qpos)
            output = FFNLayer(
                self.hidden_dim, self.dim_feedforward, self.pre_norm, name=f"ffn{i}"
            )(output)
            logits, masks, dec_out = heads(output, mf, video, attn_features)
            all_logits.append(logits)
            all_masks.append(masks)
            attn_bias = attn_bias_from_mask_logits(
                masks, size_list[(i + 1) % nlvl]
            )

        out: Dict[str, Any] = {"size_list": size_list}
        if attn_features is not None:
            out["attn_feats"] = attn_features
        if video:
            # masks already (B, Q, T, H, W); logits (B, Q, C)
            out["pred_masks_all"] = jnp.stack(all_masks)        # (L+1, B, Q, T, H, W)
            if self.head == "side_adapter":
                # biases (B*T?, nH, Q, h, w) — video side decoder keeps B
                out["class_attn_biases_all"] = jnp.stack(all_logits)
            elif self.head != "none":
                out["pred_logits_all"] = jnp.stack(all_logits)  # (L+1, B, Q, C)
        else:
            # reshape (b t) -> b, t like the reference (frame_...py:113-123)
            def to_video_masks(m):  # (B*T, Q, h, w) -> (B, Q, T, h, w)
                btq = m.shape
                return m.reshape(bs, t, *btq[1:]).transpose(0, 2, 1, 3, 4)

            def to_video_logits(l):  # (B*T, Q, ...) -> (B, T, Q, ...)
                return l.reshape(bs, t, *l.shape[1:])

            out["pred_masks_all"] = jnp.stack([to_video_masks(m) for m in all_masks])
            if self.head == "side_adapter":
                # (B*T, nH, Q, h, w) -> (B, T, nH, Q, h, w)
                out["class_attn_biases_all"] = jnp.stack(
                    [to_video_logits(l) for l in all_logits]
                )
            elif self.head != "none":
                out["pred_logits_all"] = jnp.stack(
                    [to_video_logits(l) for l in all_logits]
                )
            # per-frame query embeddings for tracking (frame_...py:125-126);
            # dec_out is decoder_norm(output) from the last prediction heads.
            out["pred_embeds"] = dec_out.reshape(bs, t, self.num_queries, self.hidden_dim)
            out["mask_feats"] = mf
            out["ms_feats"] = srcs
            out["ms_pos"] = poses
        if "pred_logits_all" in out:
            out["pred_logits"] = out["pred_logits_all"][-1]
        if "class_attn_biases_all" in out:
            out["class_attn_biases"] = out["class_attn_biases_all"][-1]
        out["pred_masks"] = out["pred_masks_all"][-1]
        return out
