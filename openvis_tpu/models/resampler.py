"""Temporal instance resampler (BriVIS core).

Rebuild of ``TemporalInstanceResampler``
(``openvis/modeling/resampler.py:189-323``): L layers of
[temporal self-attention over T ("long") -> replicate-padded conv1d k5+k3
over T ("short", residual) -> LayerNorm -> FFN] applied to the MinVIS-aligned
per-frame query embeddings ``(B, T, Q, C)`` viewed as length-T sequences per
(batch, query); after every layer the per-frame embeds predict masks
(``mask_embed x mask_feats``) and side-adapter attention biases
(``attn_embed x attn_feats``) whose CLIP logits the meta-arch computes.

TPU deltas:
  * the per-layer prediction heads don't feed back into the next layer (no
    masked attention here), so all L+1 layer outputs are stacked and the
    heads + the expensive biased-CLIP post-encode run ONCE over the stacked
    layer axis — one trace, MXU-shaped batches, instead of the reference's
    python loop of per-layer CLIP calls;
  * the temporal transform (:meth:`final_embeds`) and the per-frame heads
    (:meth:`predict_frames`) are separately callable so long-video inference
    can run the frame stack in windows, resample the (small) concatenated
    embeds over the FULL sequence, and apply the heads window-by-window —
    the windowed path the reference sketches inconsistently
    (``brivis.py:267-316`` calls the Raw resampler's 9-arg signature on the
    6-arg Temporal resampler, SURVEY §3.3).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from openvis_tpu.models.amp import amp_norm

from openvis_tpu.models.transformer_decoder import (
    CrossAttentionLayer,
    FFNLayer,
    MLP,
    MultiheadAttention,
    SelfAttentionLayer,
)


def _check_odd_kernels(ks: Tuple[int, int]) -> None:
    # replicate-pad k//2 per side + VALID width-k conv preserves T only for
    # odd k; even k yields T-1 frames and the residual add shape-errors
    if any(k % 2 == 0 for k in ks):
        raise ValueError(
            f"resampler.conv_kernels={ks}: all entries must be odd "
            "(replicate-pad + VALID conv must preserve the frame count)"
        )


class TemporalResampler(nn.Module):
    hidden_dim: int = 256
    feed_dim: int = 2048
    nheads: int = 8
    nlayers: int = 6
    conv_kernels: Tuple[int, int] = (5, 3)  # short-term temporal conv widths

    def setup(self):
        _check_odd_kernels(self.conv_kernels)
        n = self.nlayers
        self.longs = [
            MultiheadAttention(self.hidden_dim, self.nheads, name=f"long{i}")
            for i in range(n)
        ]
        self.long_norms = [nn.LayerNorm(name=f"long_norm{i}") for i in range(n)]
        self.short_conv1s = [
            nn.Conv(self.hidden_dim, (self.conv_kernels[0],), padding="VALID",
                    name=f"short{i}_conv1")
            for i in range(n)
        ]
        self.short_conv2s = [
            nn.Conv(self.hidden_dim, (self.conv_kernels[1],), padding="VALID",
                    name=f"short{i}_conv2")
            for i in range(n)
        ]
        self.agg_norms = [nn.LayerNorm(name=f"agg_norm{i}") for i in range(n)]
        self.ffns = [
            FFNLayer(self.hidden_dim, self.feed_dim, name=f"ffn{i}")
            for i in range(n)
        ]
        self.decode_norm = nn.LayerNorm(name="decode_norm")
        self.mask_embed_mlp = MLP(
            self.hidden_dim, self.hidden_dim, 3, name="mask_embed"
        )
        self.attn_embed_mlp = MLP(
            self.hidden_dim, self.hidden_dim, 3, name="attn_embed"
        )

    def _encode_layers(self, frame_embeds: jax.Array):
        """(B, T, Q, C) -> normed stacked layer outputs (L+1, B*Q, T, C)."""
        b, t, q, c = frame_embeds.shape
        # (B*Q, T, C): temporal sequences per query
        x = jnp.transpose(frame_embeds, (0, 2, 1, 3)).reshape(b * q, t, c)
        layer_outputs = [x]
        for i in range(self.nlayers):
            # long: post-norm self-attn over T (resampler.py:262-266)
            attn = self.longs[i](x, x, x)
            x = amp_norm(self.long_norms[i], x + attn)
            # short: replicate-pad conv1d k5 -> relu -> k3, residual
            k0 = self.conv_kernels[0] // 2
            y = jnp.pad(x, ((0, 0), (k0, k0), (0, 0)), mode="edge")
            y = self.short_conv1s[i](y)
            y = nn.relu(y)
            k1 = self.conv_kernels[1] // 2
            y = jnp.pad(y, ((0, 0), (k1, k1), (0, 0)), mode="edge")
            y = self.short_conv2s[i](y)
            x = amp_norm(self.agg_norms[i], y + x)
            x = self.ffns[i](x)
            layer_outputs.append(x)
        stacked = jnp.stack(layer_outputs)  # (L+1, B*Q, T, C)
        return amp_norm(self.decode_norm, stacked), (b, t, q, c)

    def final_embeds(self, frame_embeds: jax.Array) -> jax.Array:
        """Temporal transform only: (B, T, Q, C) -> final-layer normed
        per-frame embeds (B, T, Q, C).  Windowed-inference entry: the heads
        run per window via :meth:`predict_frames`."""
        normed, (b, t, q, c) = self._encode_layers(frame_embeds)
        return jnp.transpose(
            normed[-1].reshape(b, q, t, c), (0, 2, 1, 3)
        )

    def predict_frames(
        self,
        per_frame_embeds: jax.Array,  # (N, Q, C) final-layer normed embeds
        mask_feats: jax.Array,        # (N, H, W, C)
        attn_feats: jax.Array,        # (N, nH, h, w, C)
    ) -> Tuple[jax.Array, jax.Array]:
        """Heads for a window of frames -> (masks (N, Q, H, W),
        attn_biases (N, nH, Q, h, w))."""
        me = self.mask_embed_mlp(per_frame_embeds)
        ae = self.attn_embed_mlp(per_frame_embeds)
        masks = jnp.einsum("nqc,nhwc->nqhw", me, mask_feats)
        biases = jnp.einsum("nqc,nmhwc->nmqhw", ae, attn_feats)
        return masks, biases

    def __call__(
        self,
        frame_embeds: jax.Array,  # (B, T, Q, C) aligned
        mask_feats: jax.Array,    # (B*T, H, W, C)
        attn_feats: jax.Array,    # (B*T, nH, h, w, C)
    ) -> Dict[str, jax.Array]:
        normed, (b, t, q, c) = self._encode_layers(frame_embeds)
        l1 = normed.shape[0]
        # per-frame query embeds: (L+1, B*T, Q, C)
        per_frame = jnp.transpose(
            normed.reshape(l1, b, q, t, c), (0, 1, 3, 2, 4)
        ).reshape(l1, b * t, q, c)

        mask_embed = self.mask_embed_mlp(per_frame)
        attn_embed = self.attn_embed_mlp(per_frame)
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


class DecoupledTemporalResampler(nn.Module):
    """``DecoupledTemporalInstanceResampler`` (``resampler.py:9-186``):
    a fresh set of LEARNABLE queries decodes from the temporally-refined
    frame embeds — per layer the frame embeds go through the same
    long/short/FFN temporal stack, then the learnable queries cross-attend
    to their frame's refined embeds, self-attend, and FFN; heads after every
    layer (plus the pre-layer queries).  Registered-but-unused by shipped
    reference configs; the reference forward's einops memory construction is
    internally inconsistent for t>1 (mixes the q and t axes), so this
    rebuild uses the per-frame memory its structure implies.

    Same TPU delta as :class:`TemporalResampler`: all L+1 layer outputs are
    stacked and the heads run once."""

    hidden_dim: int = 256
    feed_dim: int = 2048
    nheads: int = 8
    nlayers: int = 6
    conv_kernels: Tuple[int, int] = (5, 3)  # short-term temporal conv widths
    nqueries: int = 100

    def setup(self):
        _check_odd_kernels(self.conv_kernels)
        n = self.nlayers
        self.longs = [
            MultiheadAttention(self.hidden_dim, self.nheads, name=f"long{i}")
            for i in range(n)
        ]
        self.long_norms = [nn.LayerNorm(name=f"long_norm{i}") for i in range(n)]
        self.short_conv1s = [
            nn.Conv(self.hidden_dim, (self.conv_kernels[0],), padding="VALID",
                    name=f"short{i}_conv1") for i in range(n)
        ]
        self.short_conv2s = [
            nn.Conv(self.hidden_dim, (self.conv_kernels[1],), padding="VALID",
                    name=f"short{i}_conv2") for i in range(n)
        ]
        self.agg_norms = [nn.LayerNorm(name=f"agg_norm{i}") for i in range(n)]
        self.ffns = [
            FFNLayer(self.hidden_dim, self.feed_dim, name=f"ffn{i}")
            for i in range(n)
        ]
        self.tgt_cas = [
            CrossAttentionLayer(self.hidden_dim, self.nheads,
                                name=f"tgt_ca{i}") for i in range(n)
        ]
        self.tgt_sas = [
            SelfAttentionLayer(self.hidden_dim, self.nheads,
                               name=f"tgt_sa{i}") for i in range(n)
        ]
        self.tgt_ffns = [
            FFNLayer(self.hidden_dim, self.feed_dim, name=f"tgt_ffn{i}")
            for i in range(n)
        ]
        self.query_emb = self.param(
            "query_emb", nn.initializers.normal(1.0),
            (self.nqueries, self.hidden_dim),
        )
        self.query_pos = self.param(
            "query_pos", nn.initializers.normal(1.0),
            (self.nqueries, self.hidden_dim),
        )
        self.decode_norm = nn.LayerNorm(name="decode_norm")
        self.mask_embed_mlp = MLP(
            self.hidden_dim, self.hidden_dim, 3, name="mask_embed"
        )
        self.attn_embed_mlp = MLP(
            self.hidden_dim, self.hidden_dim, 3, name="attn_embed"
        )

    def _tgt_layers(self, frame_embeds: jax.Array):
        """Shared layer loop: (B, T, Q, C) -> list of L+1 (B*T, nQ, C)
        learnable-query states (pre decode_norm)."""
        b, t, q, c = frame_embeds.shape
        bt = b * t
        x = jnp.transpose(frame_embeds, (0, 2, 1, 3)).reshape(b * q, t, c)
        tgt = jnp.broadcast_to(
            self.query_emb[None], (bt, self.nqueries, c)
        )
        qpos = self.query_pos[None]
        tgt_layers = [tgt]
        for i in range(self.nlayers):
            attn = self.longs[i](x, x, x)
            x = amp_norm(self.long_norms[i], x + attn)
            k0 = self.conv_kernels[0] // 2
            y = jnp.pad(x, ((0, 0), (k0, k0), (0, 0)), mode="edge")
            y = self.short_conv1s[i](y)
            y = nn.relu(y)
            k1 = self.conv_kernels[1] // 2
            y = jnp.pad(y, ((0, 0), (k1, k1), (0, 0)), mode="edge")
            y = self.short_conv2s[i](y)
            x = amp_norm(self.agg_norms[i], y + x)
            x = self.ffns[i](x)
            # per-frame memory: each frame's q refined embeds (B*T, Q, C)
            mem = jnp.transpose(
                x.reshape(b, q, t, c), (0, 2, 1, 3)
            ).reshape(bt, q, c)
            tgt = self.tgt_cas[i](tgt, mem, jnp.zeros_like(mem[:1]), qpos)
            tgt = self.tgt_sas[i](tgt, qpos)
            tgt = self.tgt_ffns[i](tgt)
            tgt_layers.append(tgt)
        return tgt_layers, (b, t, q, c)

    def final_embeds(self, frame_embeds: jax.Array) -> jax.Array:
        """Windowed-inference entry (exact decomposition — the heads never
        feed back into the layers): (B, T, Q, C) frame embeds -> final-layer
        normed learnable-query embeds (B, T, nQ, C).  Heads run per window
        via :meth:`predict_frames`."""
        tgt_layers, (b, t, _, c) = self._tgt_layers(frame_embeds)
        out = amp_norm(self.decode_norm, tgt_layers[-1])
        return out.reshape(b, t, self.nqueries, c)

    def predict_frames(
        self,
        per_frame_embeds: jax.Array,  # (N, nQ, C) final-layer normed embeds
        mask_feats: jax.Array,        # (N, H, W, C)
        attn_feats: jax.Array,        # (N, nH, h, w, C)
    ) -> Tuple[jax.Array, jax.Array]:
        """Heads for a window -> (masks (N, nQ, H, W),
        attn_biases (N, nH, nQ, h, w))."""
        me = self.mask_embed_mlp(per_frame_embeds)
        ae = self.attn_embed_mlp(per_frame_embeds)
        masks = jnp.einsum("nqc,nhwc->nqhw", me, mask_feats)
        biases = jnp.einsum("nqc,nmhwc->nmqhw", ae, attn_feats)
        return masks, biases

    def __call__(self, frame_embeds, mask_feats, attn_feats):
        tgt_layers, (b, t, q, c) = self._tgt_layers(frame_embeds)
        stacked = amp_norm(self.decode_norm, jnp.stack(tgt_layers))  # (L+1, B*T, nQ, C)
        l1 = stacked.shape[0]
        me = self.mask_embed_mlp(stacked)
        ae = self.attn_embed_mlp(stacked)
        masks = jnp.einsum("lnqc,nhwc->lnqhw", me, mask_feats)
        biases = jnp.einsum("lnqc,nmhwc->lnmqhw", ae, attn_feats)
        h, w = mask_feats.shape[1:3]
        return {
            "pred_masks_all": jnp.transpose(
                masks.reshape(l1, b, t, self.nqueries, h, w),
                (0, 1, 3, 2, 4, 5),
            ),
            "attn_biases_all": biases,
            "pred_embeds": stacked[-1].reshape(b, t, self.nqueries, c),
        }


class RawTemporalResampler(nn.Module):
    """``RawTemporalInstanceResampler`` (``resampler.py:326-626``): the
    temporal stack plus, per layer, per-frame CROSS-ATTENTION back into the
    multi-scale pixel features (level ``i % 3``, round-robin like the main
    decoder), then query self-attention and FFN; heads after every layer.

    The reference computes a masked-attention ``attn_mask`` per layer but
    passes ``memory_mask=None`` to the cross-attention (``resampler.py:
    504-516``) — the mask is dead code, so this rebuild omits it.  The
    reference's windowed-inference path for this class lives in the engine
    instead (the frame stack runs per window; this module sees the full
    concatenated sequence — ``engine._evaluate_brivis_windowed``)."""

    hidden_dim: int = 256
    feed_dim: int = 2048
    nheads: int = 8
    nlayers: int = 6
    conv_kernels: Tuple[int, int] = (5, 3)  # short-term temporal conv widths

    def setup(self):
        _check_odd_kernels(self.conv_kernels)
        n = self.nlayers
        self.longs = [
            MultiheadAttention(self.hidden_dim, self.nheads, name=f"long{i}")
            for i in range(n)
        ]
        self.long_norms = [nn.LayerNorm(name=f"long_norm{i}") for i in range(n)]
        self.short_conv1s = [
            nn.Conv(self.hidden_dim, (self.conv_kernels[0],), padding="VALID",
                    name=f"short{i}_conv1") for i in range(n)
        ]
        self.short_conv2s = [
            nn.Conv(self.hidden_dim, (self.conv_kernels[1],), padding="VALID",
                    name=f"short{i}_conv2") for i in range(n)
        ]
        self.agg_norms = [nn.LayerNorm(name=f"agg_norm{i}") for i in range(n)]
        self.crosses = [
            CrossAttentionLayer(self.hidden_dim, self.nheads,
                                name=f"cross{i}") for i in range(n)
        ]
        self.selfs = [
            SelfAttentionLayer(self.hidden_dim, self.nheads,
                               name=f"self{i}") for i in range(n)
        ]
        self.ffns = [
            FFNLayer(self.hidden_dim, self.feed_dim, name=f"ffn{i}")
            for i in range(n)
        ]
        self.decode_norm = nn.LayerNorm(name="decode_norm")
        self.mask_embed_mlp = MLP(
            self.hidden_dim, self.hidden_dim, 3, name="mask_embed"
        )
        self.attn_embed_mlp = MLP(
            self.hidden_dim, self.hidden_dim, 3, name="attn_embed"
        )

    def temporal_half(self, x: jax.Array, i: int) -> jax.Array:
        """Layer ``i``'s long/short temporal stack over (B*Q, T, C) — runs
        over the FULL concatenated sequence in the windowed path (the
        reference's ``forward`` window branch, ``resampler.py:406-470``)."""
        attn = self.longs[i](x, x, x)
        x = amp_norm(self.long_norms[i], x + attn)
        k0 = self.conv_kernels[0] // 2
        y = jnp.pad(x, ((0, 0), (k0, k0), (0, 0)), mode="edge")
        y = self.short_conv1s[i](y)
        y = nn.relu(y)
        k1 = self.conv_kernels[1] // 2
        y = jnp.pad(y, ((0, 0), (k1, k1), (0, 0)), mode="edge")
        y = self.short_conv2s[i](y)
        return amp_norm(self.agg_norms[i], y + x)

    def frame_half(
        self, pf: jax.Array, ms_feat: jax.Array, ms_pos: jax.Array, i: int
    ) -> jax.Array:
        """Layer ``i``'s per-frame half: cross-attn into this frame's pixel
        tokens at level ``i % nlevels`` (caller selects the level slice) +
        self-attn + FFN over (N, Q, C).  Frames never mix here, so the
        windowed decomposition is exact (``resample_infer``,
        ``resampler.py:496-516``; its ``attn_mask`` is dead — passed as
        ``memory_mask=None``)."""
        q, c = pf.shape[1:]
        pf = self.crosses[i](pf, ms_feat, ms_pos, jnp.zeros((1, q, c), pf.dtype))
        pf = self.selfs[i](pf, jnp.zeros((1, q, c), pf.dtype))
        return self.ffns[i](pf)

    def finalize_embeds(self, pf: jax.Array) -> jax.Array:
        """decode_norm for head inputs — heads consume NORMED embeds in
        both the single-shot stack and the windowed path."""
        return amp_norm(self.decode_norm, pf)

    def predict_frames(
        self,
        per_frame_embeds: jax.Array,  # (N, Q, C) final-layer NORMED embeds
        mask_feats: jax.Array,        # (N, H, W, C)
        attn_feats: jax.Array,        # (N, nH, h, w, C)
    ) -> Tuple[jax.Array, jax.Array]:
        """Heads for a window -> (masks (N, Q, H, W),
        attn_biases (N, nH, Q, h, w))."""
        me = self.mask_embed_mlp(per_frame_embeds)
        ae = self.attn_embed_mlp(per_frame_embeds)
        masks = jnp.einsum("nqc,nhwc->nqhw", me, mask_feats)
        biases = jnp.einsum("nqc,nmhwc->nmqhw", ae, attn_feats)
        return masks, biases

    def __call__(self, frame_embeds, mask_feats, attn_feats, ms_feats, ms_pos):
        """ms_feats/ms_pos: the frame decoder's 3 token maps
        ((B*T, hw_l, C), (1, hw_l, C)) top-down — ``Segmenter`` outputs
        ``ms_feats``/``ms_pos``."""
        b, t, q, c = frame_embeds.shape
        bt = b * t
        nlvl = len(ms_feats)
        x = jnp.transpose(frame_embeds, (0, 2, 1, 3)).reshape(b * q, t, c)
        per_frame0 = frame_embeds.reshape(bt, q, c)
        layer_outputs = [per_frame0]
        for i in range(self.nlayers):
            x = self.temporal_half(x, i)
            # per-frame cross-attn into pixel features at level i % 3
            pf = jnp.transpose(
                x.reshape(b, q, t, c), (0, 2, 1, 3)
            ).reshape(bt, q, c)
            lvl = i % nlvl
            pf = self.frame_half(pf, ms_feats[lvl], ms_pos[lvl], i)
            layer_outputs.append(pf)
            x = jnp.transpose(
                pf.reshape(b, t, q, c), (0, 2, 1, 3)
            ).reshape(b * q, t, c)

        stacked = amp_norm(self.decode_norm, jnp.stack(layer_outputs))  # (L+1, B*T, Q, C)
        l1 = stacked.shape[0]
        me = self.mask_embed_mlp(stacked)
        ae = self.attn_embed_mlp(stacked)
        masks = jnp.einsum("lnqc,nhwc->lnqhw", me, mask_feats)
        biases = jnp.einsum("lnqc,nmhwc->lnmqhw", ae, attn_feats)
        h, w = mask_feats.shape[1:3]
        return {
            "pred_masks_all": jnp.transpose(
                masks.reshape(l1, b, t, q, h, w), (0, 1, 3, 2, 4, 5)
            ),
            "attn_biases_all": biases,
            "pred_embeds": stacked[-1].reshape(b, t, q, c),
        }
