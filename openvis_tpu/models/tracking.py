"""Query-embedding tracking (MinVIS) — on-device, fixed-shape.

Rebuild of ``batch_video_match_via_embeds`` / ``match_via_embeds``
(``openvis/modeling/minvis.py:28-72``): frame t's queries are aligned to the
running track order by Hungarian assignment on (1 - cosine similarity)
against the previous aligned frame's embeddings, sequentially over time.

The reference loops over batch x time in Python with a CPU scipy solve per
step; here it is one ``lax.scan`` over T with the batched on-device
Hungarian inside — no host round-trips, O(T) kernel launches total under
jit.  Cross-window identity at inference falls out for free: embeddings of
all windows are concatenated on the time axis before tracking (the reference
does the same, ``minvis.py:320-338``).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from openvis_tpu.ops.hungarian import batched_hungarian


def _normalize(x, eps=1e-6):
    return x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + eps)


def track_by_embeds(pred_embeds: jax.Array, ema_alpha: float = 1.0) -> jax.Array:
    """pred_embeds: (B, T, Q, C) -> indices (B, T, Q) int32 such that
    ``aligned[t, k] = raw[t, indices[t, k]]`` keeps identity k consistent
    over time (identity = frame-0 query order, like the reference).

    ``ema_alpha < 1`` blends the carried reference embedding as
    ``alpha * cur + (1 - alpha) * prev`` per step — OV2Seg's tracker
    (``ov2seg.py:926-934``, alpha = 0.7); MinVIS is alpha = 1.
    """
    embeds = jax.lax.stop_gradient(_normalize(pred_embeds))
    b, t, q, c = embeds.shape

    def step(prev_carry, cur):  # prev_carry, cur: (B, Q, C)
        # cost[tgt, cur] = 1 - cos(prev_tgt, cur): rows=targets (prev order)
        cos = jnp.einsum("bqc,bkc->bqk", _normalize(prev_carry), cur)
        idx = batched_hungarian(1.0 - cos)          # (B, Q): col per target row
        aligned = jnp.take_along_axis(cur, idx[..., None], axis=1)
        carry = ema_alpha * aligned + (1.0 - ema_alpha) * prev_carry
        return carry, idx

    embeds_t = jnp.swapaxes(embeds, 0, 1)  # (T, B, Q, C)
    _, indices_t = jax.lax.scan(step, embeds_t[0], embeds_t)
    return jnp.swapaxes(indices_t, 0, 1)  # (B, T, Q)


def apply_track_indices(x: jax.Array, indices: jax.Array) -> jax.Array:
    """Gather per-frame query-axis data into track order.

    x: (B, T, Q, ...); indices: (B, T, Q) -> same shape as x.
    Equivalent of ``utils/index.py:4-20``'s batch_index applied per frame.
    """
    idx = indices.reshape(*indices.shape, *([1] * (x.ndim - 3)))
    idx = jnp.broadcast_to(idx, indices.shape + x.shape[3:])
    return jnp.take_along_axis(x, idx, axis=2)


def align_outputs(
    pred_logits: jax.Array,  # (B, T, Q, C)
    pred_masks: jax.Array,   # (B, Q, T, H, W)
    pred_embeds: jax.Array,  # (B, T, Q, C)
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """MinVIS ``post_processing`` (minvis.py:320-338): track, then align
    logits and masks to track order.  Returns (logits, masks, indices)."""
    indices = track_by_embeds(pred_embeds)
    logits = apply_track_indices(pred_logits, indices)
    masks_btqhw = jnp.swapaxes(pred_masks, 1, 2)  # (B, T, Q, H, W)
    masks = apply_track_indices(masks_btqhw, indices)
    return logits, jnp.swapaxes(masks, 1, 2), indices
