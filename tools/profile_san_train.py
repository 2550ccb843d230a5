"""SANOnline TRAIN-step attribution at bench train shapes.

The r5 bench measured the SAN train step at 431.8 ms vs SimpleBSL's 239.9 —
a ~192 ms marginal for ~1.1 TFLOP of mostly dense CLIP-block matmuls
(XLA-counted), i.e. ~6 TF/s marginal throughput.  Dense 768-wide matmuls
should run far faster; this tool decomposes the gap.

Stages (chained where sub-35 ms resolution matters, composed ablations
otherwise):
  * train_step_full        — the bench train step (reference conditions)
  * train_step_no_aux      — supervise_aux_logits=False (final-layer CLIP
                             logits broadcast to aux layers): isolates the
                             10x-batched aux post-encode's f+b cost
  * loss_fwd / model fwd   — forward-only splits
  * post_encode_fb         — isolated side-adapter post_encode fwd+bwd at
                             the train aux batch shapes
  * front_encode_f         — isolated frozen CLIP front encode (fwd only)

Usage:  python tools/profile_san_train.py [--tiny]
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


def _t(fn, *args, iters=4):
    r = fn(*args)
    np.asarray(jax.tree.leaves(r)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        np.asarray(jax.tree.leaves(fn(*args))[0])
    return (time.perf_counter() - t0) / iters * 1e3


def _gnorm(tree):
    return sum(
        jnp.sum(jnp.square(x.astype(jnp.float32)))
        for x in jax.tree.leaves(tree)
    )


def main(tiny=False):
    if tiny:
        jax.config.update("jax_platforms", "cpu")
    from bench import _bench_cfg
    from openvis_tpu.parallel.train_step import (
        TrainState, make_optimizer, make_train_step,
    )
    from openvis_tpu.structures import ClipTargets
    from openvis_tpu.train import build_model, init_model, make_loss_fn

    K, D = 40, 512
    cfg = _bench_cfg("san_online", K)
    rng = np.random.RandomState(0)
    t, h, w, n = (2, 96, 160, 8) if tiny else (2, 480, 864, 40)
    text = rng.randn(K, D).astype(np.float32)
    text = jnp.asarray(text / np.linalg.norm(text, axis=-1, keepdims=True))
    batch = {
        "pixels": jnp.asarray(rng.randn(1, t, h, w, 3).astype(np.float32)),
        "targets": ClipTargets(
            labels=jnp.asarray(rng.randint(0, K, (1, n)), jnp.int32),
            masks=jnp.asarray(
                (rng.rand(1, n, t, h, w) > 0.9).astype(np.float32)
            ),
            valid=jnp.ones((1, n), bool),
            frame_valid=jnp.ones((1, n, t), bool),
        ),
        "text_feats": text,
    }

    def emit(name, v):
        print(json.dumps({"stage": name, "ms": round(float(v), 2)}),
              flush=True)

    def safe(name, thunk):
        try:
            emit(name, thunk())
        except Exception as e:  # one broken stage must not cost the rest
            print(f"stage {name} failed: {e!r}", file=sys.stderr, flush=True)

    model, params = init_model(cfg, jax.random.PRNGKey(0), batch)
    key = jax.random.PRNGKey(1)

    def step_time(m):
        loss_fn = make_loss_fn(cfg, m, K)
        tx = make_optimizer(cfg, params)
        state = TrainState.create(params, tx)
        step = jax.jit(make_train_step(loss_fn, tx))
        s2, metrics = step(state, batch, key)
        np.asarray(metrics["grad_norm"])
        iters = 2 if tiny else 5
        t0 = time.perf_counter()
        for _ in range(iters):
            state, metrics = step(state, batch, key)
        np.asarray(metrics["grad_norm"])
        return (time.perf_counter() - t0) / iters * 1e3

    safe("train_step_full", lambda: step_time(model))
    safe("train_step_no_aux",
         lambda: step_time(model.clone(supervise_aux_logits=False)))

    loss_fn = make_loss_fn(cfg, model, K)
    safe("loss_fwd", lambda: _t(
        jax.jit(lambda p, b: loss_fn(p, b, key)[0]), params, batch
    ))
    loss_na = make_loss_fn(cfg, model.clone(supervise_aux_logits=False), K)
    safe("loss_fwd_no_aux", lambda: _t(
        jax.jit(lambda p, b: loss_na(p, b, key)[0]), params, batch
    ))

    # isolated side-adapter pieces at the train aux shapes: a STANDALONE
    # SideAdapter with its own (freshly-initialized, bf16-cast) params —
    # timing only, numerics don't matter here
    from openvis_tpu.models.side_adapter import SideAdapter

    ca = cfg.model.clip_adapter
    ad = SideAdapter(
        clip_model_name=ca.clip_model_name,
        out_dims=cfg.model.pixel_decoder.conv_dim,
        broken_idx=ca.broken_id,
        merge_ids=tuple(ca.merge_ids),
        num_queries=cfg.model.transformer_decoder.num_queries,
    )
    frames = batch["pixels"].reshape(t, h, w, 3).astype(jnp.bfloat16)
    mean = jnp.asarray(cfg.model.pixel_mean, frames.dtype)
    std = jnp.asarray(cfg.model.pixel_std, frames.dtype)
    fraw = frames * std + mean
    ap = ad.init(jax.random.PRNGKey(2), fraw, method=SideAdapter.front_encode)
    apbf = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        ap["params"],
    )

    def front_encode(p, fr):
        return ad.apply({"params": p}, fr, method=SideAdapter.front_encode)

    safe("front_encode_f", lambda: _t(jax.jit(
        lambda p, fr: _gnorm(jax.tree.leaves(front_encode(p, fr))[0])
    ), apbf, fraw))

    mg, bk, grid = jax.jit(front_encode)(apbf, fraw)
    grid = tuple(int(g) for g in grid)  # post_encode needs static ints
    l = cfg.model.transformer_decoder.dec_layers + 1
    nh = ca.clip_num_heads
    q = cfg.model.transformer_decoder.num_queries
    h4, w4 = h // 16, w // 16
    biases = jnp.asarray(
        rng.randn(l * t, nh, q, h4, w4).astype(np.float32)
    ).astype(jnp.bfloat16)
    toks = jnp.broadcast_to(bk[None], (l, *bk.shape)).reshape(
        l * t, *bk.shape[1:]
    )

    def post(p, tk, bs):
        return ad.apply(
            {"params": p}, tk, bs, grid, method=SideAdapter.post_encode
        )

    safe("post_encode_f", lambda: _t(jax.jit(
        lambda p, tk, bs: _gnorm(post(p, tk, bs))
    ), apbf, toks, biases))
    safe("post_encode_fb", lambda: _t(jax.jit(
        lambda p, tk, bs: _gnorm(jax.grad(
            lambda pp: jnp.sum(post(pp, tk, bs).astype(jnp.float32))
        )(p))
    ), apbf, toks, biases))


if __name__ == "__main__":
    main(tiny="--tiny" in sys.argv)
