"""Fixed-shape inference postprocessing.

Rebuild of ``VideoMaskFormer.inference_video``
(``openvis/modeling/video_maskformer.py:263-298``): flatten the (Q, K) score
grid, keep the top-10 (query, class) pairs, gather their mask logits, and
report per-prediction entropy.  Cropping the padded canvas and resizing to
the original video resolution are host-side (variable-shape) steps done by
the evaluator; everything here is static-shape device code.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp


def inference_video_topk(
    scores: jax.Array,      # (Q, K) — softmaxed class probs, no bg column
    mask_logits: jax.Array, # (Q, T, H, W)
    topk: int = 10,
    track_indices: jax.Array = None,  # (T, Q): track k -> raw query at frame t
) -> Dict[str, jax.Array]:
    """``track_indices`` fuses tracking alignment into the top-k mask gather:
    ``scores`` are in track order but ``mask_logits`` stay in RAW per-frame
    query order, and only the selected topk masks are gathered (via one-hot
    matmul — aligning all Q masks first costs Q/topk x more HBM traffic)."""
    q, k = scores.shape
    topk = min(topk, q * k)  # tiny configs can have fewer candidates
    flat = scores.reshape(-1)
    top_scores, top_idx = jax.lax.top_k(flat, topk)
    labels = top_idx % k
    query_idx = top_idx // k
    sel_scores = scores[query_idx]                       # (topk, K)
    entropy = -jnp.sum(sel_scores * jnp.log(sel_scores + 1e-12), axis=-1)
    if track_indices is None:
        sel = jax.nn.one_hot(query_idx, q, dtype=mask_logits.dtype)
        masks = jnp.einsum(
            "kq,qthw->kthw", sel, mask_logits
        )                                                # (topk, T, H, W)
    else:
        # raw query of track `query_idx[i]` at frame t
        sel_idx = jnp.take_along_axis(
            track_indices, jnp.broadcast_to(
                query_idx[None, :], (track_indices.shape[0], topk)
            ), axis=1,
        )                                                # (T, topk)
        sel = jax.nn.one_hot(sel_idx, q, dtype=mask_logits.dtype)
        masks = jnp.einsum("tkq,qthw->kthw", sel, mask_logits)
    return {
        "scores": top_scores,
        "labels": labels,
        "query_idx": query_idx,
        "entropy": entropy,
        "mask_logits": masks,
    }
