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
) -> Dict[str, jax.Array]:
    q, k = scores.shape
    flat = scores.reshape(-1)
    top_scores, top_idx = jax.lax.top_k(flat, topk)
    labels = top_idx % k
    query_idx = top_idx // k
    sel_scores = scores[query_idx]                       # (topk, K)
    entropy = -jnp.sum(sel_scores * jnp.log(sel_scores + 1e-12), axis=-1)
    masks = mask_logits[query_idx]                       # (topk, T, H, W)
    return {
        "scores": top_scores,
        "labels": labels,
        "query_idx": query_idx,
        "entropy": entropy,
        "mask_logits": masks,
    }


def upsample_mask_logits(mask_logits: jax.Array, size) -> jax.Array:
    """(..., T, H, W) -> bilinear to (..., T, size[0], size[1])."""
    out_shape = (*mask_logits.shape[:-2], size[0], size[1])
    return jax.image.resize(mask_logits, out_shape, method="bilinear")
