"""Component-level timing of the SANOnline eval path (bench conditions:
10-frame window @ 384x640, bf16, supervise_aux_logits=False).

Stages: CLIP preprocess+front_encode, segmenter (backbone + pixel decoder +
decoder), adaptive-max-pool of the attn-bias maps, bias assembly +
post_encode (3 biased CLIP blocks + sos finalize), full forward, eval total.

Usage:  python tools/profile_san.py [--tiny]
Prints one JSON line per stage: {"stage": ..., "ms": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _scalarize(fn):
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


def main(tiny: bool = False):
    if tiny:
        jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from bench import _bench_cfg

    from openvis_tpu.models.side_adapter import SideAdapter, adaptive_max_pool
    from openvis_tpu.train import build_model, make_eval_fn

    K = 40
    cfg = _bench_cfg("san_online", K)
    model = build_model(cfg).clone(supervise_aux_logits=False)

    rng = np.random.RandomState(0)
    t, h, w = (2, 96, 160) if tiny else (10, 384, 640)
    frames = jnp.asarray(rng.randn(t, h, w, 3).astype(np.float32))
    text = rng.randn(K, 512).astype(np.float32)
    text = jnp.asarray(text / np.linalg.norm(text, axis=-1, keepdims=True))

    params = model.init(jax.random.PRNGKey(0), frames[:2], 2, text)["params"]
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params,
    )
    frames = frames.astype(jnp.bfloat16)
    text_b = text.astype(jnp.bfloat16)

    ca = cfg.model.clip_adapter
    adapter = SideAdapter(
        clip_model_name=ca.clip_model_name,
        out_dims=cfg.model.pixel_decoder.conv_dim,
        broken_idx=ca.broken_id,
        merge_ids=tuple(ca.merge_ids),
        num_queries=cfg.model.transformer_decoder.num_queries,
    )
    p_ca = params["clip_adapter"]

    results = {}

    def front(p, f):
        return adapter.apply({"params": p}, f,
                             method=SideAdapter.front_encode)

    results["front_encode"] = _time(_scalarize(front), p_ca, frames)
    mg_feats, bk_tokens, grid = jax.jit(front)(p_ca, frames)
    grid = (int(grid[0]), int(grid[1]))  # static ints (jit returns arrays)

    # full forward -> grab the bias maps for the sub-stage timings
    fwd = jax.jit(lambda p, f, tx: model.apply({"params": p}, f, t, tx))
    results["forward_total"] = _time(
        _scalarize(lambda p, f, tx: model.apply({"params": p}, f, t, tx)),
        params, frames, text_b,
    )
    out = fwd(params, frames, text_b)
    biases = out["class_attn_biases_all"][-1]      # (B, T, nH, Q, h, w)
    b, tt, nh, q, hh, ww = biases.shape
    flat_biases = biases.reshape(b * tt, nh, q, hh, ww)

    results["bias_adaptive_max_pool"] = _time(
        _scalarize(lambda x: adaptive_max_pool(x, grid)), flat_biases
    )

    def post(p, toks, bi):
        return adapter.apply({"params": p}, toks, bi, grid,
                             method=SideAdapter.post_encode)

    results["post_encode(incl_pool)"] = _time(
        _scalarize(post), p_ca, bk_tokens, flat_biases
    )

    results["segmenter(residual)"] = (
        results["forward_total"] - results["front_encode"]
        - results["post_encode(incl_pool)"]
    )

    eval_fn = jax.jit(make_eval_fn(cfg, model))
    results["eval_total"] = _time(
        lambda p, f, tx: eval_fn(p, f, tx)["scores"], params, frames, text_b
    )

    for k, v in results.items():
        print(json.dumps({"stage": k, "ms": round(float(v), 2)}))


if __name__ == "__main__":
    main(tiny="--tiny" in sys.argv)
