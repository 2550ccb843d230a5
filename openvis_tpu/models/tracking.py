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

    For ``ema_alpha == 1`` (MinVIS) the sequential solve decomposes: the
    carried reference IS the previous raw frame row-permuted, and the
    Hungarian optimum of a row-permuted cost matrix is the permuted optimum.
    So all T-1 raw consecutive-frame assignments solve in ONE batched
    Hungarian kernel call, then a cheap gather-scan composes the
    permutations — ~Tx fewer kernel launches than the sequential path
    (profiled: the 10-frame sequential scan dominated eval postprocess).
    Equivalence to the sequential solve is up to Hungarian tie-breaking:
    with duplicate/degenerate query embeddings both paths return (possibly
    different) equally-optimal permutations; scores are unaffected.
    """
    embeds = jax.lax.stop_gradient(_normalize(pred_embeds))
    b, t, q, c = embeds.shape
    if t == 1:
        return jnp.broadcast_to(jnp.arange(q, dtype=jnp.int32), (b, t, q))

    if ema_alpha == 1.0:
        prev = embeds[:, :-1].reshape(b * (t - 1), q, c)
        cur = embeds[:, 1:].reshape(b * (t - 1), q, c)
        cos = jnp.einsum("bqc,bkc->bqk", prev, cur)
        # r[s, i] = frame-(s+1) column matched to frame-s row i
        r = batched_hungarian(1.0 - cos).reshape(b, t - 1, q)

        def compose(perm, r_s):  # perm (B, Q) carries frame-s track order
            nxt = jnp.take_along_axis(r_s, perm, axis=1)
            return nxt, nxt

        ident = jnp.broadcast_to(jnp.arange(q, dtype=r.dtype), (b, q))
        _, perms = jax.lax.scan(compose, ident, jnp.swapaxes(r, 0, 1))
        return jnp.concatenate(
            [ident[:, None], jnp.swapaxes(perms, 0, 1)], axis=1
        )  # (B, T, Q)

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

    Implemented as a one-hot matmul over the small Q axis: TPU gathers of
    per-query rows serialize through the scalar core (the same pathology the
    MSDA kernel works around), while a (Q, Q) x (Q, prod(rest)) contraction
    rides the MXU.  Exact for any dtype (0/1 weights).
    """
    b, t, q = indices.shape
    onehot = jax.nn.one_hot(indices, q, dtype=x.dtype)       # (B, T, Q, Q)
    flat = x.reshape(b, t, q, -1)
    out = jnp.einsum("btkj,btjr->btkr", onehot, flat)
    return out.reshape(x.shape)


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
