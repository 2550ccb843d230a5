"""Temporal instance resampler (BriVIS core).

Rebuild of ``TemporalInstanceResampler``
(``openvis/modeling/resampler.py:189-323``): L layers of
[temporal self-attention over T ("long") -> replicate-padded conv1d k5+k3
over T ("short", residual) -> LayerNorm -> FFN] applied to the MinVIS-aligned
per-frame query embeddings ``(B, T, Q, C)`` viewed as length-T sequences per
(batch, query); after every layer the per-frame embeds predict masks
(``mask_embed x mask_feats``) and side-adapter attention biases
(``attn_embed x attn_feats``) whose CLIP logits the meta-arch computes.

TPU delta: the per-layer prediction heads don't feed back into the next
layer (no masked attention here), so all L+1 layer outputs are stacked and
the heads + the expensive biased-CLIP post-encode run ONCE over the stacked
layer axis — one trace, MXU-shaped batches, instead of the reference's
python loop of per-layer CLIP calls.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from openvis_tpu.models.transformer_decoder import (
    FFNLayer,
    MLP,
    MultiheadAttention,
)


class TemporalResampler(nn.Module):
    hidden_dim: int = 256
    feed_dim: int = 2048
    nheads: int = 8
    nlayers: int = 6

    @nn.compact
    def __call__(
        self,
        frame_embeds: jax.Array,  # (B, T, Q, C) aligned
        mask_feats: jax.Array,    # (B*T, H, W, C)
        attn_feats: jax.Array,    # (B*T, nH, h, w, C)
    ) -> Dict[str, jax.Array]:
        b, t, q, c = frame_embeds.shape

        # (B*Q, T, C): temporal sequences per query
        x = jnp.transpose(frame_embeds, (0, 2, 1, 3)).reshape(b * q, t, c)

        layer_outputs = [x]
        for i in range(self.nlayers):
            # long: post-norm self-attn over T (resampler.py:262-266)
            attn = MultiheadAttention(self.hidden_dim, self.nheads,
                                      name=f"long{i}")(x, x, x)
            x = nn.LayerNorm(name=f"long_norm{i}")(x + attn)
            # short: replicate-pad conv1d k5 -> relu -> k3, residual
            y = jnp.pad(x, ((0, 0), (2, 2), (0, 0)), mode="edge")
            y = nn.Conv(self.hidden_dim, (5,), padding="VALID",
                        name=f"short{i}_conv1")(y)
            y = nn.relu(y)
            y = jnp.pad(y, ((0, 0), (1, 1), (0, 0)), mode="edge")
            y = nn.Conv(self.hidden_dim, (3,), padding="VALID",
                        name=f"short{i}_conv2")(y)
            x = nn.LayerNorm(name=f"agg_norm{i}")(y + x)
            x = FFNLayer(self.hidden_dim, self.feed_dim, name=f"ffn{i}")(x)
            layer_outputs.append(x)

        stacked = jnp.stack(layer_outputs)  # (L+1, B*Q, T, C)
        l1 = stacked.shape[0]
        normed = nn.LayerNorm(name="decode_norm")(stacked)
        # per-frame query embeds: (L+1, B*T, Q, C)
        per_frame = jnp.transpose(
            normed.reshape(l1, b, q, t, c), (0, 1, 3, 2, 4)
        ).reshape(l1, b * t, q, c)

        mask_embed = MLP(self.hidden_dim, self.hidden_dim, 3, name="mask_embed")(per_frame)
        attn_embed = MLP(self.hidden_dim, self.hidden_dim, 3, name="attn_embed")(per_frame)
        masks = jnp.einsum("lnqc,nhwc->lnqhw", mask_embed, mask_feats)
        attn_biases = jnp.einsum("lnqc,nmhwc->lnmqhw", attn_embed, attn_feats)

        h, w = mask_feats.shape[1:3]
        out = {
            # (L+1, B, Q, T, H, W)
            "pred_masks_all": jnp.transpose(
                masks.reshape(l1, b, t, q, h, w), (0, 1, 3, 2, 4, 5)
            ),
            # (L+1, B*T, nH, Q, h', w') for the CLIP post-encode
            "attn_biases_all": attn_biases,
            # final-layer per-frame embeds for brownian/tracking (B, T, Q, C)
            "pred_embeds": per_frame[-1].reshape(b, t, q, c),
        }
        return out
