"""Benchmark: flagship-model video inference throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no numbers (BASELINE.md), so ``vs_baseline`` is
reported against the north-star proxy: the PyTorch reference's SimpleBSL
online R50 eval loop runs O(10) frames/s/GPU class hardware; until a real
A100 baseline is measured we report the raw TPU frames/s and vs_baseline
null.
"""

import dataclasses
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main(tiny: bool = False):
    if tiny:  # CPU smoke path (sitecustomize pins JAX_PLATFORMS=axon)
        jax.config.update("jax_platforms", "cpu")
    from openvis_tpu.config import Config
    from openvis_tpu.train import build_model, make_eval_fn

    K, D = 40, 512
    cfg = Config()
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, num_classes=K)
    )
    model = build_model(cfg)

    rng = np.random.RandomState(0)
    if tiny:  # CPU smoke: tiny shapes, same code path
        t, h, w = 2, 96, 160
    else:
        t, h, w = 10, 384, 640  # eval window of 10 frames at test short-edge 360
    frames = jnp.asarray(rng.randn(t, h, w, 3).astype(np.float32))
    text = rng.randn(K, D).astype(np.float32)
    text = jnp.asarray(text / np.linalg.norm(text, axis=-1, keepdims=True))

    params = model.init(jax.random.PRNGKey(0), frames[:2], 2, text)["params"]
    # bf16 params for inference (AMP eval, train_net.py:241-242 equivalent)
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, params
    )
    eval_fn = jax.jit(make_eval_fn(cfg, model))

    def run():
        out = eval_fn(
            params, frames.astype(jnp.bfloat16), text.astype(jnp.bfloat16)
        )
        # materialize to host: block_until_ready does not reliably fence
        # through the remote-TPU tunnel
        return np.asarray(out["scores"])

    run()
    iters = 3 if tiny else 10
    t0 = time.perf_counter()
    for _ in range(iters):
        r = run()
    dt = time.perf_counter() - t0
    fps = iters * t / dt

    print(json.dumps({
        "metric": "simplebsl_online_r50_inference",
        "value": round(fps, 2),
        "unit": "frames/s/chip",
        "vs_baseline": None,
    }))


if __name__ == "__main__":
    main(tiny="--tiny" in sys.argv)
