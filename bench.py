"""Benchmark: flagship-model video inference + train-step on one chip.

Prints one JSON line per metric: {"metric", "value", "unit", "vs_baseline"}.
Default run: SimpleBSLOnline R50 inference frames/s + train-step ms.
``--arch san_online`` benches the SAN online path instead (CLIP-post-encode
dominated eval, a different bottleneck profile).

The reference publishes no numbers (BASELINE.md), so ``vs_baseline`` is
reported against the north-star proxy: the PyTorch reference's SimpleBSL
online R50 eval loop runs O(10) frames/s/GPU class hardware; until a real
A100 baseline is measured we report the raw TPU numbers and vs_baseline
null.
"""

import dataclasses
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def _bench_cfg(arch: str, k: int):
    from openvis_tpu.config import Config

    cfg = Config()
    m = dataclasses.replace(cfg.model, num_classes=k)
    if arch == "san_online":
        m = dataclasses.replace(
            m,
            meta_architecture="SANOnline",
            transformer_decoder=dataclasses.replace(
                m.transformer_decoder, name="side_adapter_frame"
            ),
            clip_adapter=dataclasses.replace(
                m.clip_adapter, name="side", clip_model_name="ViT-B/16",
                clip_num_heads=12, merge_ids=(3, 6, 9), broken_id=9,
            ),
        )
    return dataclasses.replace(cfg, model=m)


def _bench_inference(cfg, arch, tiny):
    from openvis_tpu.train import build_model, make_eval_fn

    K, D = cfg.model.num_classes, 512
    model = build_model(cfg)
    # eval never reads aux-layer CLIP logits — mirror the engine's eval
    # clone (engine.py:505-506; san.py:74-92 is train-only) or the SAN
    # bench pays (L+1)x the CLIP post-encode per window
    if getattr(model, "supervise_aux_logits", False):
        model = model.clone(supervise_aux_logits=False)
    rng = np.random.RandomState(0)
    t, h, w = (2, 96, 160) if tiny else (10, 384, 640)
    frames = jnp.asarray(rng.randn(t, h, w, 3).astype(np.float32))
    text = rng.randn(K, D).astype(np.float32)
    text = jnp.asarray(text / np.linalg.norm(text, axis=-1, keepdims=True))

    params = model.init(jax.random.PRNGKey(0), frames[:2], 2, text)["params"]
    # bf16 params for inference (AMP eval, train_net.py:241-242 equivalent)
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params,
    )
    eval_fn = jax.jit(make_eval_fn(cfg, model))

    fb = frames.astype(jnp.bfloat16)
    tb = text.astype(jnp.bfloat16)

    np.asarray(eval_fn(params, fb, tb)["scores"])  # compile + warm
    iters = 3 if tiny else 10
    t0 = time.perf_counter()
    # pipelined dispatch (like engine.evaluate_dataset): enqueue all windows,
    # then materialize — per-call dispatch latency (~35 ms through the
    # remote-TPU tunnel) overlaps with on-device compute.  Materializing to
    # host fences; block_until_ready does not reliably fence the tunnel.
    outs = [eval_fn(params, fb, tb) for _ in range(iters)]
    for o in outs:
        np.asarray(o["scores"])
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": f"{arch}_r50_inference",
        "value": round(iters * t / dt, 2),
        "unit": "frames/s/chip",
        "vs_baseline": None,
    }), flush=True)


def _bench_train_step(cfg, arch, tiny):
    """Full jitted train step (fwd + criterion + bwd + optimizer) at the
    reference train shapes — per-chip B=1, T=2 @ 480x864, N=40, 12544 pts,
    bf16 AMP (Base.yaml:21-45)."""
    from openvis_tpu.parallel.train_step import (
        TrainState,
        make_optimizer,
        make_train_step,
    )
    from openvis_tpu.structures import ClipTargets
    from openvis_tpu.train import init_model, make_loss_fn

    K, D = cfg.model.num_classes, 512
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
    model, params = init_model(cfg, jax.random.PRNGKey(0), batch)
    loss_fn = make_loss_fn(cfg, model, K)
    tx = make_optimizer(cfg, params)
    state = TrainState.create(params, tx)
    step = jax.jit(make_train_step(loss_fn, tx))
    key = jax.random.PRNGKey(1)

    # compile + warm, fenced on grad_norm (depends on EVERY grad leaf —
    # total_loss is a forward-only value and can be ready before the
    # backward finishes)
    state, metrics = step(state, batch, key)
    np.asarray(metrics["grad_norm"])

    iters = 2 if tiny else 5
    t0 = time.perf_counter()
    # pipelined step chain (like a real training loop, which never fences
    # per step — metrics log asynchronously): enqueue all steps, fence the
    # LAST step's grad_norm, which depends on every prior state update
    # through the donated-state chain.  Per-call dispatch latency (~35 ms
    # through the remote-TPU tunnel) overlaps with on-device compute.
    for _ in range(iters):
        state, metrics = step(state, batch, key)
    np.asarray(metrics["grad_norm"])
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(json.dumps({
        "metric": f"{arch}_r50_train_step",
        "value": round(dt, 1),
        "unit": "ms/step",
        "vs_baseline": None,
    }), flush=True)


def main(tiny: bool = False, arch: str = "simplebsl_online"):
    if tiny:  # CPU smoke path (sitecustomize pins JAX_PLATFORMS=axon)
        jax.config.update("jax_platforms", "cpu")
    cfg = _bench_cfg(arch, 40)
    # train-step first, inference LAST: drivers that parse the final JSON
    # line as the headline metric keep the frames/s series (r1: 15.64,
    # r2: 55.43) comparable across rounds.
    if arch == "simplebsl_online":
        _bench_train_step(cfg, arch, tiny)
    _bench_inference(cfg, arch, tiny)


if __name__ == "__main__":
    arch = "simplebsl_online"
    if "--arch" in sys.argv:
        arch = sys.argv[sys.argv.index("--arch") + 1]
    main(tiny="--tiny" in sys.argv, arch=arch)
