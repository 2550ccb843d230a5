"""Count model FLOPs via XLA cost analysis (CPU compile-only) at the bench
shapes and write ``FLOPS.json`` for ``bench.py``'s MFU fields.

Run: ``python tools/flops_count.py [--tiny]``.  Forces the CPU backend so
the MSDA op lowers through its XLA composition (useful-work count — the
Pallas implicit-matmul formulation deliberately inflates FLOPs for MXU
shape, see BASELINE.md roofline).  Nothing executes: compile + cost
analysis only.

The output maps bench metric names to {"flops": per-call FLOPs, plus the
analytic component breakdown from openvis_tpu.utils.flops}.
"""

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def eval_flops(arch: str, tiny: bool) -> float:
    from bench import _bench_cfg
    from openvis_tpu.train import build_model, make_eval_fn
    from openvis_tpu.utils.flops import xla_cost_flops

    cfg = _bench_cfg(arch, 40)
    K, D = cfg.model.num_classes, 512
    model = build_model(cfg)
    if getattr(model, "supervise_aux_logits", False):
        model = model.clone(supervise_aux_logits=False)
    rng = np.random.RandomState(0)
    t, h, w = (2, 96, 160) if tiny else (10, 384, 640)
    frames = jnp.asarray(rng.randn(t, h, w, 3).astype(np.float32))
    text = rng.randn(K, D).astype(np.float32)
    text = jnp.asarray(text / np.linalg.norm(text, axis=-1, keepdims=True))
    params = model.init(jax.random.PRNGKey(0), frames[:2], 2, text)["params"]
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params,
    )
    eval_fn = make_eval_fn(cfg, model)
    return xla_cost_flops(
        eval_fn, params, frames.astype(jnp.bfloat16), text.astype(jnp.bfloat16)
    )


def staged_eval_flops(arch: str, tiny: bool) -> float:
    """BriVIS / OpenVISOnline eval closures (bench.make_{brivis,openvis}_eval
    — the staged window pipelines, not make_eval_fn)."""
    from bench import _bench_cfg, make_brivis_eval, make_openvis_eval
    from openvis_tpu.utils.flops import xla_cost_flops

    cfg = _bench_cfg(arch, 40)
    mk = make_brivis_eval if arch == "brivis" else make_openvis_eval
    eval_fn, params, fb, tb, _ = mk(cfg, tiny)
    return xla_cost_flops(eval_fn, params, fb, tb)


def train_flops(arch: str, tiny: bool) -> float:
    from bench import _bench_cfg
    from openvis_tpu.parallel.train_step import (
        TrainState, make_optimizer, make_train_step,
    )
    from openvis_tpu.structures import ClipTargets
    from openvis_tpu.train import init_model, make_loss_fn
    from openvis_tpu.utils.flops import xla_cost_flops

    cfg = _bench_cfg(arch, 40)
    K, D = cfg.model.num_classes, 512
    rng = np.random.RandomState(0)
    tt = 3 if arch == "brivis" else 2  # BriVIS trains on T=3 clips (bench)
    t, h, w, n = (tt, 96, 160, 8) if tiny else (tt, 480, 864, 40)
    text = rng.randn(K, D).astype(np.float32)
    text = jnp.asarray(text / np.linalg.norm(text, axis=-1, keepdims=True))
    batch = {
        "pixels": jnp.asarray(rng.randn(1, t, h, w, 3).astype(np.float32)),
        "targets": ClipTargets(
            labels=jnp.asarray(rng.randint(0, K, (1, n)), jnp.int32),
            masks=jnp.asarray((rng.rand(1, n, t, h, w) > 0.9).astype(np.float32)),
            valid=jnp.ones((1, n), bool),
            frame_valid=jnp.ones((1, n, t), bool),
        ),
        "text_feats": text,
    }
    model, params = init_model(cfg, jax.random.PRNGKey(0), batch)
    loss_fn = make_loss_fn(cfg, model, K)
    tx = make_optimizer(cfg, params)
    state = TrainState.create(params, tx)
    step = make_train_step(loss_fn, tx)
    return xla_cost_flops(step, state, batch, jax.random.PRNGKey(1))


def main():
    tiny = "--tiny" in sys.argv
    from openvis_tpu.utils.flops import san_eval_flops, simplebsl_eval_flops

    t, h, w = (2, 96, 160) if tiny else (10, 384, 640)
    out = {
        "shapes": {"eval": [t, h, w], "train": [2, 480, 864]},
        "peak_bf16": 197e12,
        "analytic": {
            "simplebsl_eval": simplebsl_eval_flops(t, h, w),
            "san_eval": san_eval_flops(t, h, w),
        },
    }
    for arch in ("simplebsl_online", "san_online"):
        out[f"{arch}_r50_inference"] = {"flops": eval_flops(arch, tiny)}
        print(f"{arch} eval: {out[f'{arch}_r50_inference']['flops']:.3e}",
              file=sys.stderr, flush=True)
    for arch in ("brivis", "openvis_online"):
        try:
            out[f"{arch}_r50_inference"] = {
                "flops": staged_eval_flops(arch, tiny)
            }
            print(f"{arch} eval: {out[f'{arch}_r50_inference']['flops']:.3e}",
                  file=sys.stderr, flush=True)
        except Exception as e:  # one arch must not cost the file
            print(f"{arch} eval flops failed: {e!r}", file=sys.stderr,
                  flush=True)
    for arch in ("simplebsl_online", "san_online", "brivis"):
        try:
            out[f"{arch}_r50_train_step"] = {"flops": train_flops(arch, tiny)}
            print(f"{arch} train: "
                  f"{out[f'{arch}_r50_train_step']['flops']:.3e}",
                  file=sys.stderr, flush=True)
        except Exception as e:
            print(f"{arch} train flops failed: {e!r}", file=sys.stderr,
                  flush=True)
    dst = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "FLOPS.json")
    if tiny:
        print(json.dumps(out))
    else:
        with open(dst, "w") as f:
            json.dump(out, f, indent=1)
        print(f"wrote {dst}", file=sys.stderr)


if __name__ == "__main__":
    main()
