"""Evaluation engine: windowed video inference + evaluator loop.

Rebuild of the reference's eval path (``train_net.py:205-253`` Trainer.test
+ per-model ``run_window_inference``, ``minvis.py:340-362`` /
``san.py:285-307``): long videos are chunked into fixed-size windows, the
per-frame stack runs per window, and the small per-frame artifacts (query
embeddings, logits) plus 1/4-res mask logits are concatenated over windows;
cross-window identity is restored by embedding tracking over the full
concatenated sequence (``minvis.py:320-338``).

TPU deltas: windows are a fixed static shape (the last window is padded by
repeating its final valid frame), so the whole video evaluates with exactly
two traces (window forward + postprocess per T-bucket); masks stay on
device at 1/4 resolution until the final host-side RLE encode.
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from openvis_tpu.config import Config
from openvis_tpu.data import catalog
from openvis_tpu.data.loader import test_videos
from openvis_tpu.evals.ytvis_eval import YTVISEvaluator
from openvis_tpu.models.meta.simple_baseline import eval_scores
from openvis_tpu.models.postprocess import inference_video_topk
from openvis_tpu.models.tracking import apply_track_indices, track_by_embeds
from openvis_tpu.train import is_online

logger = logging.getLogger(__name__)


def make_window_fn(cfg: Config, model):
    """f(params, frames (W,H,Wd,3), text) -> per-window raw outputs."""

    def fn(params, frames, text_feats):
        w = frames.shape[0]
        out = model.apply({"params": params}, frames, w, text_feats)
        return {
            "logits": out["pred_logits"],      # (1, W, Q, K+1) online
            "masks": out["pred_masks"],        # (1, Q, W, h, w)
            "embeds": out.get("pred_embeds"),  # (1, W, Q, C)
        }

    return fn


def make_postprocess_fn(cfg: Config):
    """f(logits (T,Q,K+1), masks (Q,T,h,w), embeds (T,Q,C), frame_valid (T,))
    -> topk dict.  T is the padded bucket length."""
    topk = cfg.model.test.topk_per_video

    def fn(logits, masks, embeds, frame_valid):
        indices = track_by_embeds(embeds[None])            # (1, T, Q)
        logits = apply_track_indices(logits[None], indices)[0]
        masks_t = apply_track_indices(
            jnp.swapaxes(masks, 0, 1)[None], indices
        )[0]                                               # (T, Q, h, w)
        fv = frame_valid[:, None, None].astype(logits.dtype)
        mean_logits = (logits * fv).sum(0) / jnp.maximum(fv.sum(0), 1.0)
        probs = jax.nn.softmax(mean_logits, axis=-1)[..., :-1]  # (Q, K)
        return inference_video_topk(
            probs, jnp.swapaxes(masks_t, 0, 1), topk
        )

    return fn


def _bucket(n: int, step: int = 8) -> int:
    return max(step, -(-n // step) * step)


def evaluate_dataset(
    cfg: Config,
    model,
    params,
    dataset_name: str,
    text_feats: np.ndarray,
    max_videos: Optional[int] = None,
) -> Dict[str, float]:
    info = catalog.get(dataset_name)
    evaluator = YTVISEvaluator(info)
    window = cfg.model.test.window_size
    window_fn = jax.jit(make_window_fn(cfg, model))
    post_fn = jax.jit(make_postprocess_fn(cfg))
    text = jnp.asarray(text_feats)

    n_videos = 0
    for rec, sample in test_videos(cfg, dataset_name):
        if max_videos is not None and n_videos >= max_videos:
            break
        n_videos += 1
        frames = sample["pixels"]  # (T, H, W, 3) numpy
        t = frames.shape[0]
        # fixed-size windows; pad the tail by repeating the last frame
        logits_parts, masks_parts, embeds_parts = [], [], []
        for i in range(0, t, window):
            chunk = frames[i : i + window]
            pad = window - len(chunk)
            if pad:
                chunk = np.concatenate([chunk, chunk[-1:].repeat(pad, 0)])
            out = window_fn(params, jnp.asarray(chunk), text)
            keep = window - pad
            logits_parts.append(np.asarray(out["logits"][0, :keep]))
            masks_parts.append(np.asarray(out["masks"][0, :, :keep]))
            embeds_parts.append(np.asarray(out["embeds"][0, :keep]))
        logits = np.concatenate(logits_parts, axis=0)      # (T, Q, K+1)
        masks = np.concatenate(masks_parts, axis=1)        # (Q, T, h, w)
        embeds = np.concatenate(embeds_parts, axis=0)      # (T, Q, C)

        tb = _bucket(t)
        fv = np.zeros((tb,), bool)
        fv[:t] = True
        if tb > t:  # pad time bucket by repeating last frame's artifacts
            logits = np.concatenate([logits, logits[-1:].repeat(tb - t, 0)])
            embeds = np.concatenate([embeds, embeds[-1:].repeat(tb - t, 0)])
            masks = np.concatenate(
                [masks, masks[:, -1:].repeat(tb - t, 1)], axis=1
            )
        topk_out = post_fn(
            jnp.asarray(logits), jnp.asarray(masks), jnp.asarray(embeds),
            jnp.asarray(fv),
        )
        topk_np = {k: np.asarray(v) for k, v in topk_out.items()}
        # upsample 1/4-res mask logits to the padded input resolution on host
        mk = topk_np["mask_logits"][:, :t]                 # (topk, T, h, w)
        ph, pw = sample["pixels"].shape[1:3]
        up = jax.image.resize(
            jnp.asarray(mk), (mk.shape[0], t, ph, pw), method="bilinear"
        )
        topk_np["mask_logits"] = np.asarray(up)
        evaluator.process(
            rec["video_id"], topk_np, sample["image_size"], sample["orig_size"]
        )

    gt_path = os.path.join(cfg.datasets.root, info.json_file)
    with open(gt_path) as f:
        gt_json = json.load(f)
    if not gt_json.get("annotations"):
        logger.warning("%s has no GT annotations; writing predictions only",
                       dataset_name)
        return {"num_predictions": float(len(evaluator.predictions))}
    return evaluator.evaluate(gt_json)
