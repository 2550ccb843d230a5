"""Component-level timing of the flagship eval path on the current backend.

Breaks the bench.py configuration (SimpleBaselineOnline R50, 10-frame window
@ 384x640 bf16) into stages — backbone / pixel decoder / transformer decoder /
full forward / tracking+topk / full eval — and times each with host
materialization (block_until_ready does not fence through the axon tunnel).

Usage:  python tools/profile_eval.py [--tiny] [--train]
Prints one JSON line per stage: {"stage": ..., "ms": ...}.
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _scalarize(fn):
    """Wrap fn so the jitted computation returns ONE scalar (sum over every
    output leaf) — a 4-byte host transfer fences the full computation without
    timing multi-MB result transfers through the axon tunnel, and summing all
    leaves stops XLA from dead-code-eliminating any output."""

    def wrapped(*args):
        out = fn(*args)
        return sum(
            jnp.sum(jnp.asarray(l, jnp.float32)) for l in jax.tree.leaves(out)
        )

    return jax.jit(wrapped)


def _time(fn, *args, iters=5):
    r = fn(*args)
    np.asarray(jax.tree.leaves(r)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
        np.asarray(jax.tree.leaves(r)[0])
    return (time.perf_counter() - t0) / iters * 1e3


def main(tiny: bool = False, train: bool = False):
    if tiny:
        jax.config.update("jax_platforms", "cpu")
    from openvis_tpu.config import Config
    from openvis_tpu.models.meta.simple_baseline import SimpleBaselineModel
    from openvis_tpu.models.pixel_decoder import MSDeformAttnPixelDecoder
    from openvis_tpu.models.segmenter import build_backbone
    from openvis_tpu.models.tracking import align_outputs
    from openvis_tpu.models.postprocess import inference_video_topk
    from openvis_tpu.models.meta.simple_baseline import eval_scores
    from openvis_tpu.train import build_model, make_eval_fn

    K, D = 40, 512
    cfg = Config()
    cfg = dataclasses.replace(cfg, model=dataclasses.replace(cfg.model, num_classes=K))
    model = build_model(cfg)

    rng = np.random.RandomState(0)
    t, h, w = (2, 96, 160) if tiny else (10, 384, 640)
    frames = jnp.asarray(rng.randn(t, h, w, 3).astype(np.float32))
    text = rng.randn(K, D).astype(np.float32)
    text = jnp.asarray(text / np.linalg.norm(text, axis=-1, keepdims=True))

    params = model.init(jax.random.PRNGKey(0), frames[:2], 2, text)["params"]
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, params
    )
    frames = frames.astype(jnp.bfloat16)
    text_b = text.astype(jnp.bfloat16)
    seg_p = params["segmenter"]

    results = {}

    # --- stage: backbone
    bb = build_backbone(cfg.model)
    bb_fn = jax.jit(lambda p, x: bb.apply({"params": p}, x))
    results["backbone"] = _time(
        _scalarize(lambda p, x: bb.apply({"params": p}, x)),
        seg_p["backbone"], frames,
    )
    feats = bb_fn(seg_p["backbone"], frames)

    # --- stage: pixel decoder (6 deformable encoder layers + FPN)
    pd = cfg.model.pixel_decoder
    pdm = MSDeformAttnPixelDecoder(
        conv_dim=pd.conv_dim, mask_dim=pd.mask_dim,
        transformer_in_features=tuple(pd.transformer_in_features),
        enc_layers=pd.transformer_enc_layers, n_heads=pd.num_heads,
        n_points=pd.num_points, d_ffn=pd.dim_feedforward,
        common_stride=pd.common_stride,
    )
    results["pixel_decoder"] = _time(
        _scalarize(lambda p, f: pdm.apply({"params": p}, f)),
        seg_p["pixel_decoder"], feats,
    )

    # --- stage: full forward
    fwd = jax.jit(lambda p, f, tx: model.apply({"params": p}, f, t, tx))
    results["forward_total"] = _time(
        _scalarize(lambda p, f, tx: model.apply({"params": p}, f, t, tx)),
        params, frames, text_b,
    )
    out = fwd(params, frames, text_b)
    results["decoder_and_heads(residual)"] = (
        results["forward_total"] - results["backbone"] - results["pixel_decoder"]
    )

    # --- stage: tracking + scores + topk (and substages)
    out_small = {k: out[k] for k in ("pred_logits", "pred_masks", "pred_embeds")}

    from openvis_tpu.models.tracking import apply_track_indices, track_by_embeds

    results["track_by_embeds"] = _time(
        _scalarize(lambda o: track_by_embeds(o["pred_embeds"])), out_small
    )
    indices = jax.jit(track_by_embeds)(out_small["pred_embeds"])

    def _align_masks(o, idx):
        return apply_track_indices(jnp.swapaxes(o["pred_masks"], 1, 2), idx)

    results["align_masks_gather"] = _time(
        _scalarize(_align_masks), out_small, indices
    )

    def post(o):
        logits, masks, _ = align_outputs(
            o["pred_logits"], o["pred_masks"], o["pred_embeds"]
        )
        scores = eval_scores(logits, True)[0]
        return inference_video_topk(scores, masks[0], cfg.model.test.topk_per_video)

    results["tracking_topk"] = _time(_scalarize(post), out_small)

    # --- stage: full eval fn
    eval_fn = jax.jit(make_eval_fn(cfg, model))
    results["eval_total"] = _time(
        lambda p, f, tx: eval_fn(p, f, tx)["scores"], params, frames, text_b
    )

    if train:
        from openvis_tpu.train import make_loss_fn
        from openvis_tpu.structures import ClipTargets

        tt, th, tw, n = (2, 96, 160, 8) if tiny else (2, 480, 864, 40)
        pix = jnp.asarray(rng.randn(1, tt, th, tw, 3).astype(np.float32))
        masks = jnp.asarray(
            (rng.rand(1, n, tt, th, tw) > 0.9).astype(np.float32)
        )
        targets = ClipTargets(
            labels=jnp.asarray(rng.randint(0, K, (1, n)), jnp.int32),
            masks=masks,
            valid=jnp.ones((1, n), bool),
            frame_valid=jnp.ones((1, n, tt), bool),
        )
        batch = {"pixels": pix, "text_feats": text, "targets": targets}
        loss_fn = make_loss_fn(cfg, model, K)
        params32 = jax.tree.map(lambda x: x.astype(jnp.float32), params)
        key = jax.random.PRNGKey(0)

        fwd_loss = jax.jit(lambda p, b, r: loss_fn(p, b, r)[0])
        results["train_loss_fwd"] = _time(fwd_loss, params32, batch, key)
        # reduce to an in-graph scalar: fencing on a tree leaf can return a
        # constant-zero grad of an unused param before the bwd finishes
        grad_fn = jax.jit(lambda p, b, r: sum(
            jnp.sum(jnp.square(x.astype(jnp.float32)))
            for x in jax.tree.leaves(
                jax.grad(lambda q: loss_fn(q, b, r)[0])(p)
            )
        ))
        results["train_grad"] = _time(grad_fn, params32, batch, key)

    for k, v in results.items():
        print(json.dumps({"stage": k, "ms": round(float(v), 2)}))


if __name__ == "__main__":
    main(tiny="--tiny" in sys.argv, train="--train" in sys.argv)
