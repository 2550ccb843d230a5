"""MSDeformAttn pixel decoder (deformable encoder + FPN tail), TPU-native.

Rebuild of the reference's ``MSDeformAttnPixelDecoder``
(``openvis/modeling/pixel_decoder/msdeformattn.py:38-380``) and the
``MSDeformAttn`` module (``ops/modules/ms_deform_attn.py:34-125``):

  * 1x1 input projections (+GroupNorm-32) on {res3,res4,res5};
  * 6 deformable self-attention encoder layers over the flattened 3-level
    token sequence (post-norm, FFN 1024, ReLU), with per-level learned
    ``level_embed`` added to the sine PE;
  * FPN lateral fusion down to stride-4 ``mask_features`` (1x1 lateral +
    bilinear top-down + 3x3 output conv, GroupNorm-32);
  * SAN hook: ``extra_features`` (CLIP taps) are bilinearly resized and added
    onto the projected sources (``msdeformattn.py:338-344``).

All feature maps are NHWC; level spatial shapes are static per trace.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from openvis_tpu.models.position_encoding import position_encoding_2d
from openvis_tpu.models.amp import amp_norm, softmax_f32
from openvis_tpu.ops.msda import ms_deform_attn
from openvis_tpu.utils.image import resize_bilinear_torch


def _ring_bias_init(n_heads: int, n_levels: int, n_points: int):
    """Reference ``MSDeformAttn._reset_parameters``: initial sampling offsets
    lay each head's points on a ring, scaled by point index."""
    thetas = np.arange(n_heads, dtype=np.float64) * (2.0 * math.pi / n_heads)
    grid = np.stack([np.cos(thetas), np.sin(thetas)], axis=-1)  # (nh, 2)
    grid = grid / np.abs(grid).max(axis=-1, keepdims=True)
    grid = np.tile(grid[:, None, None, :], (1, n_levels, n_points, 1))
    for i in range(n_points):
        grid[:, :, i, :] *= i + 1

    def init(key, shape, dtype=jnp.float32):
        return jnp.asarray(grid.reshape(-1), dtype=dtype)

    return init


class MSDeformAttnModule(nn.Module):
    """Deformable attention module: value proj + offset/weight heads + op."""

    d_model: int = 256
    n_levels: int = 3
    n_heads: int = 8
    n_points: int = 4

    @nn.compact
    def __call__(
        self,
        query: jax.Array,            # (B, Lq, C) — content + positional
        reference_points: jax.Array, # (B, Lq, n_levels, 2) normalized
        value_src: jax.Array,        # (B, Len_in, C)
        spatial_shapes: Sequence[Tuple[int, int]],
    ) -> jax.Array:
        b, lq, _ = query.shape
        nh, nl, p = self.n_heads, self.n_levels, self.n_points
        ch = self.d_model // nh

        value = nn.Dense(self.d_model, name="value_proj")(value_src)
        value = value.reshape(b, -1, nh, ch)

        offsets = nn.Dense(
            nh * nl * p * 2,
            kernel_init=nn.initializers.zeros,
            bias_init=_ring_bias_init(nh, nl, p),
            name="sampling_offsets",
        )(query).reshape(b, lq, nh, nl, p, 2)
        attn = nn.Dense(
            nh * nl * p,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="attention_weights",
        )(query).reshape(b, lq, nh, nl * p)
        attn = softmax_f32(attn, axis=-1).reshape(b, lq, nh, nl, p)

        # offsets normalized by each level's (W, H).  Sampling LOCATIONS are
        # always f32: a bf16 coordinate is only ~8 mantissa bits (~2px error
        # at W=864) and torch autocast keeps them f32 too (bf16 linear
        # output + f32 reference points promote; grid_sample is pinned f32).
        offsets = offsets.astype(jnp.float32)
        normalizer = jnp.asarray(
            [[w, h] for (h, w) in spatial_shapes], dtype=jnp.float32
        )  # (nl, 2)
        ref = reference_points.astype(jnp.float32)
        loc = ref[:, :, None, :, None, :] + offsets / normalizer[None, None, None, :, None, :]
        out = ms_deform_attn(value, spatial_shapes, loc, attn)
        return nn.Dense(self.d_model, name="output_proj")(out)


class MSDeformAttnEncoderLayer(nn.Module):
    d_model: int = 256
    d_ffn: int = 1024
    n_levels: int = 3
    n_heads: int = 8
    n_points: int = 4

    @nn.compact
    def __call__(self, src, pos, reference_points, spatial_shapes):
        attn_out = MSDeformAttnModule(
            self.d_model, self.n_levels, self.n_heads, self.n_points, name="self_attn"
        )(src + pos, reference_points, src, spatial_shapes)
        src = amp_norm(nn.LayerNorm(name="norm1"), src + attn_out)
        ff = nn.Dense(self.d_ffn, name="linear1")(src)
        ff = nn.Dense(self.d_model, name="linear2")(nn.relu(ff))
        return amp_norm(nn.LayerNorm(name="norm2"), src + ff)


def encoder_reference_points(spatial_shapes, dtype=jnp.float32) -> jnp.ndarray:
    """(Len_in, n_levels, 2) normalized (x, y) reference point per token,
    broadcast across levels (valid ratios are 1: one padded canvas per batch)."""
    pts = []
    for (h, w) in spatial_shapes:
        ys = (jnp.arange(h, dtype=dtype) + 0.5) / h
        xs = (jnp.arange(w, dtype=dtype) + 0.5) / w
        yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
        pts.append(jnp.stack([xx.reshape(-1), yy.reshape(-1)], axis=-1))
    ref = jnp.concatenate(pts, axis=0)  # (Len_in, 2)
    nl = len(spatial_shapes)
    return jnp.broadcast_to(ref[:, None, :], (ref.shape[0], nl, 2))


class MSDeformAttnEncoder(nn.Module):
    num_layers: int = 6
    d_model: int = 256
    d_ffn: int = 1024
    n_levels: int = 3
    n_heads: int = 8
    n_points: int = 4

    @nn.compact
    def __call__(self, src, pos, spatial_shapes):
        b = src.shape[0]
        # reference points stay f32 regardless of the AMP compute dtype —
        # they are sampling coordinates (see MSDeformAttnModule)
        ref = encoder_reference_points(spatial_shapes, jnp.float32)
        ref = jnp.broadcast_to(ref[None], (b, *ref.shape))
        for i in range(self.num_layers):
            src = MSDeformAttnEncoderLayer(
                self.d_model, self.d_ffn, self.n_levels, self.n_heads,
                self.n_points, name=f"layer{i}",
            )(src, pos, ref, spatial_shapes)
        return src


def resize_bilinear(x: jax.Array, size: Tuple[int, int]) -> jax.Array:
    """NHWC bilinear resize, exact torch align_corners=False semantics in
    BOTH directions (jax.image.resize antialiases downscales — the SAN
    extra-feature merge can downscale CLIP taps onto res5; utils/image.py)."""
    return resize_bilinear_torch(x, size)


class BasePixelDecoder(nn.Module):
    """FPN pixel decoder (reference ``BasePixelDecoder`` /
    ``TransformerEncoderPixelDecoder``, ``modeling/pixel_decoder/fpn.py``):
    top-down 1x1 lateral + 3x3 output convs from res5 down to res2, with the
    3 deepest maps returned as multi-scale features.

    ``transformer_enc_layers > 0`` selects the TransformerEncoderPixelDecoder
    variant: res5 is input-projected and run through a plain DETR transformer
    encoder (self-attn + FFN over HW tokens with 2D sine PE — the encoder
    half of the reference's ``pixel_decoder/transformer.py:19``; its decoder
    half is never instantiated by any shipped config and is deliberately
    omitted) before becoming the FPN top."""

    conv_dim: int = 256
    mask_dim: int = 256
    transformer_enc_layers: int = 0
    nheads: int = 8
    dim_feedforward: int = 2048

    @nn.compact
    def __call__(self, features, extra_features=None):
        from openvis_tpu.models.position_encoding import position_encoding_2d
        from openvis_tpu.models.transformer_decoder import (
            FFNLayer,
            SelfAttentionLayer,
        )

        names = ["res5", "res4", "res3", "res2"]
        outs = []
        y = None
        for idx, f in enumerate(names):
            x = features[f]
            if idx == 0 and self.transformer_enc_layers > 0:
                # DETR encoder over res5 tokens (fpn.py TransformerEncoder
                # path): input_proj -> N x [self-attn(+PE) -> FFN], post-norm
                n, h, w, _ = x.shape
                tok = nn.Conv(self.conv_dim, (1, 1), name="input_proj")(x)
                tok = tok.reshape(n, h * w, self.conv_dim)
                pe = position_encoding_2d(h, w, self.conv_dim // 2).astype(
                    tok.dtype
                ).reshape(1, h * w, self.conv_dim)
                for li in range(self.transformer_enc_layers):
                    tok = SelfAttentionLayer(
                        self.conv_dim, self.nheads, name=f"enc_attn{li}"
                    )(tok, pe)
                    tok = FFNLayer(
                        self.conv_dim, self.dim_feedforward,
                        name=f"enc_ffn{li}",
                    )(tok)
                y = tok.reshape(n, h, w, self.conv_dim)
            else:
                lat = nn.Conv(self.conv_dim, (1, 1), use_bias=False,
                              name=f"adapter{idx}_conv")(x)
                lat = amp_norm(nn.GroupNorm(num_groups=32, name=f"adapter{idx}_norm"), lat)
                if y is None:
                    y = lat
                else:
                    y = lat + resize_bilinear(y, (x.shape[1], x.shape[2]))
            z = nn.Conv(self.conv_dim, (3, 3), padding=1, use_bias=False,
                        name=f"layer{idx}_conv")(y)
            z = amp_norm(nn.GroupNorm(num_groups=32, name=f"layer{idx}_norm"), z)
            y = nn.relu(z)
            outs.append(y)
        mask_features = nn.Conv(self.mask_dim, (1, 1), name="mask_features")(outs[-1])
        return mask_features, outs[0], outs[:3]


class DETRTransformerEncoderLayer(nn.Module):
    """Vanilla DETR encoder layer (reference
    ``pixel_decoder/transformer.py:154-227``): self-attn with PE added to
    q/k only, then FFN; post- or pre-norm."""

    d_model: int
    nhead: int
    dim_feedforward: int = 2048
    pre_norm: bool = False
    activation: str = "relu"

    @nn.compact
    def __call__(self, src, pos):
        from openvis_tpu.models.transformer_decoder import MultiheadAttention

        act = {"relu": nn.relu, "gelu": nn.gelu}[self.activation]

        def attn(x):
            qk = x + pos
            return MultiheadAttention(
                self.d_model, self.nhead, name="self_attn"
            )(qk, qk, x)

        def ffn(x):
            return nn.Dense(self.d_model, name="linear2")(
                act(nn.Dense(self.dim_feedforward, name="linear1")(x))
            )

        if self.pre_norm:
            src = src + attn(amp_norm(nn.LayerNorm(name="norm1"), src))
            return src + ffn(amp_norm(nn.LayerNorm(name="norm2"), src))
        src = amp_norm(nn.LayerNorm(name="norm1"), src + attn(src))
        return amp_norm(nn.LayerNorm(name="norm2"), src + ffn(src))


class DETRTransformerDecoderLayer(nn.Module):
    """Vanilla DETR decoder layer (reference
    ``pixel_decoder/transformer.py:230-354``): self-attn (+query PE) ->
    cross-attn (query PE on q, sine PE on k) -> FFN; post- or pre-norm."""

    d_model: int
    nhead: int
    dim_feedforward: int = 2048
    pre_norm: bool = False
    activation: str = "relu"

    @nn.compact
    def __call__(self, tgt, memory, pos, query_pos):
        from openvis_tpu.models.transformer_decoder import MultiheadAttention

        act = {"relu": nn.relu, "gelu": nn.gelu}[self.activation]

        def sattn(x):
            qk = x + query_pos
            return MultiheadAttention(
                self.d_model, self.nhead, name="self_attn"
            )(qk, qk, x)

        def cattn(x):
            return MultiheadAttention(
                self.d_model, self.nhead, name="multihead_attn"
            )(x + query_pos, memory + pos, memory)

        def ffn(x):
            return nn.Dense(self.d_model, name="linear2")(
                act(nn.Dense(self.dim_feedforward, name="linear1")(x))
            )

        if self.pre_norm:
            tgt = tgt + sattn(amp_norm(nn.LayerNorm(name="norm1"), tgt))
            tgt = tgt + cattn(amp_norm(nn.LayerNorm(name="norm2"), tgt))
            return tgt + ffn(amp_norm(nn.LayerNorm(name="norm3"), tgt))
        tgt = amp_norm(nn.LayerNorm(name="norm1"), tgt + sattn(tgt))
        tgt = amp_norm(nn.LayerNorm(name="norm2"), tgt + cattn(tgt))
        return amp_norm(nn.LayerNorm(name="norm3"), tgt + ffn(tgt))


class DETRTransformer(nn.Module):
    """Plain DETR transformer, encoder + decoder halves (reference
    ``pixel_decoder/transformer.py:19-151``): the vanilla enc/dec kept for
    the ``BasePixelDecoder``/``transformer_encoder`` config path.  The
    decoder returns the stack of per-layer activations, each through the
    shared final LayerNorm (``return_intermediate_dec`` semantics,
    ``transformer.py:126-149``); the encoder gets a final LayerNorm only
    under pre-norm (``transformer.py:37``).  Dropout is omitted like the
    rest of the package (shipped reference recipes train with dropout 0).

    src/pos_embed are NHWC ``(B, H, W, C)`` (pos broadcastable over B);
    query_embed is ``(Q, C)``.  Returns ``(hs, memory)`` with hs
    ``(n_dec_layers, B, Q, C)`` and memory ``(B, H, W, C)``.
    """

    d_model: int = 256
    nhead: int = 8
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    dim_feedforward: int = 2048
    pre_norm: bool = False
    activation: str = "relu"

    @nn.compact
    def __call__(self, src, query_embed, pos_embed):
        b, h, w, c = src.shape
        x = src.reshape(b, h * w, c)
        pos = pos_embed.reshape(pos_embed.shape[0], h * w, c).astype(x.dtype)

        for i in range(self.num_encoder_layers):
            x = DETRTransformerEncoderLayer(
                self.d_model, self.nhead, self.dim_feedforward,
                self.pre_norm, self.activation, name=f"encoder_layer{i}",
            )(x, pos)
        if self.pre_norm:
            x = amp_norm(nn.LayerNorm(name="encoder_norm"), x)
        memory = x

        q = query_embed.shape[0]
        qpos = jnp.broadcast_to(
            query_embed[None].astype(x.dtype), (b, q, c)
        )
        tgt = jnp.zeros_like(qpos)
        decoder_norm = nn.LayerNorm(name="decoder_norm")
        inter = []
        for i in range(self.num_decoder_layers):
            tgt = DETRTransformerDecoderLayer(
                self.d_model, self.nhead, self.dim_feedforward,
                self.pre_norm, self.activation, name=f"decoder_layer{i}",
            )(tgt, memory, pos, qpos)
            inter.append(amp_norm(decoder_norm, tgt))
        hs = jnp.stack(inter, axis=0)                     # (L, B, Q, C)
        return hs, memory.reshape(b, h, w, c)


class MSDeformAttnPixelDecoder(nn.Module):
    """Returns (mask_features, transformer_encoder_feature, multi_scale_features).

    multi_scale_features are the 3 encoder output levels in top-down order
    (stride 32, 16, 8) as NHWC maps; mask_features is the stride-4 map.
    """

    conv_dim: int = 256
    mask_dim: int = 256
    transformer_in_features: Sequence[str] = ("res3", "res4", "res5")
    enc_layers: int = 6
    n_heads: int = 8
    n_points: int = 4
    d_ffn: int = 1024
    common_stride: int = 4

    @nn.compact
    def __call__(
        self,
        features: Dict[str, jax.Array],
        extra_features: Optional[List[jax.Array]] = None,
    ):
        nl = len(self.transformer_in_features)
        # top-down order: res5, res4, res3
        tif = list(self.transformer_in_features)[::-1]

        level_embed = self.param(
            "level_embed", nn.initializers.normal(1.0), (nl, self.conv_dim)
        )
        srcs, poses, shapes = [], [], []
        for idx, f in enumerate(tif):
            x = features[f]
            h, w = x.shape[1], x.shape[2]
            s = nn.Conv(self.conv_dim, (1, 1), name=f"input_proj{idx}_conv")(x)
            s = amp_norm(nn.GroupNorm(num_groups=32, name=f"input_proj{idx}_norm"), s)
            if extra_features is not None:
                ex = extra_features[idx]
                if ex.shape[1:3] != (h, w):
                    ex = resize_bilinear(ex, (h, w))
                s = s + ex
            pe = position_encoding_2d(h, w, self.conv_dim // 2).astype(s.dtype)
            srcs.append(s.reshape(s.shape[0], h * w, self.conv_dim))
            poses.append((pe.reshape(1, h * w, self.conv_dim) + level_embed[idx]))
            shapes.append((h, w))

        src = jnp.concatenate(srcs, axis=1)
        pos = jnp.concatenate(poses, axis=1)
        y = MSDeformAttnEncoder(
            self.enc_layers, self.conv_dim, self.d_ffn, nl, self.n_heads,
            self.n_points, name="encoder",
        )(src, pos, shapes)

        # split back to maps (top-down: 1/32, 1/16, 1/8)
        outs = []
        start = 0
        for (h, w) in shapes:
            outs.append(y[:, start : start + h * w].reshape(-1, h, w, self.conv_dim))
            start += h * w

        # FPN tail down to common_stride (res2 @ 1/4)
        fpn_features = [f for f in ("res2", "res3", "res4") if f not in self.transformer_in_features][::-1]
        for idx, f in enumerate(fpn_features):
            x = features[f]
            lat = nn.Conv(self.conv_dim, (1, 1), use_bias=False, name=f"adapter{idx}_conv")(x)
            lat = amp_norm(nn.GroupNorm(num_groups=32, name=f"adapter{idx}_norm"), lat)
            topdown = resize_bilinear(outs[-1], (x.shape[1], x.shape[2]))
            z = lat + topdown
            z = nn.Conv(self.conv_dim, (3, 3), padding=1, use_bias=False, name=f"layer{idx}_conv")(z)
            z = amp_norm(nn.GroupNorm(num_groups=32, name=f"layer{idx}_norm"), z)
            outs.append(nn.relu(z))

        mask_features = nn.Conv(self.mask_dim, (1, 1), name="mask_features")(outs[-1])
        multi_scale_features = outs[:3]
        return mask_features, outs[0], multi_scale_features
