"""Train-step component timings at the bench train shapes.

Separates model forward / criterion stages / backward so optimization
targets the real bottleneck.  Chained variants subtract the ~35 ms axon
tunnel dispatch latency where it matters.

    python tools/profile_train.py [--tiny]
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


def _t(fn, *args, iters=5):
    r = fn(*args)
    np.asarray(jax.tree.leaves(r)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        np.asarray(jax.tree.leaves(fn(*args))[0])
    return (time.perf_counter() - t0) / iters * 1e3


def main(tiny=False):
    if tiny:
        jax.config.update("jax_platforms", "cpu")
    from openvis_tpu.config import Config
    from openvis_tpu.losses.criterion import (
        CriterionSettings,
        _loss_labels,
        _loss_masks,
        match,
        match_costs,
        set_criterion,
    )
    from openvis_tpu.structures import ClipTargets
    from openvis_tpu.train import build_model, make_loss_fn

    K, D = 40, 512
    cfg = Config()
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, num_classes=K)
    )
    model = build_model(cfg)
    rng = np.random.RandomState(0)
    tt, th, tw, n = (2, 96, 160, 8) if tiny else (2, 480, 864, 40)
    pix = jnp.asarray(rng.randn(1, tt, th, tw, 3).astype(np.float32))
    masks = jnp.asarray((rng.rand(1, n, tt, th, tw) > 0.9).astype(np.float32))
    targets = ClipTargets(
        labels=jnp.asarray(rng.randint(0, K, (1, n)), jnp.int32),
        masks=masks,
        valid=jnp.ones((1, n), bool),
        frame_valid=jnp.ones((1, n, tt), bool),
    )
    text = rng.randn(K, D).astype(np.float32)
    text = jnp.asarray(text / np.linalg.norm(text, axis=-1, keepdims=True))
    batch = {"pixels": pix, "text_feats": text, "targets": targets}
    params = model.init(
        jax.random.PRNGKey(0), pix.reshape(tt, th, tw, 3), tt, text
    )["params"]
    key = jax.random.PRNGKey(1)
    out = {}

    # model forward only (bf16 like AMP)
    pbf = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params,
    )
    fwd = jax.jit(lambda p, f: model.apply(
        {"params": p}, f.astype(jnp.bfloat16), tt, text.astype(jnp.bfloat16)
    ))
    frames = pix.reshape(tt, th, tw, 3)
    ms = _t(
        jax.jit(lambda p, f: jnp.sum(fwd(p, f)["pred_masks"])), pbf, frames
    )
    print(json.dumps({"stage": "model_fwd_bf16", "ms": round(float(ms), 2)}),
          flush=True)
    o = fwd(pbf, frames)
    o = {k: (v.astype(jnp.float32) if isinstance(v, jax.Array) else v)
         for k, v in o.items()}

    # criterion pieces on frame-reshaped outputs (the online loss path)
    from openvis_tpu.models.meta.simple_baseline import (
        frame_reshape_outputs,
        frame_reshape_targets,
    )

    logits_all, masks_all = frame_reshape_outputs(
        o["pred_logits_all"], o["pred_masks_all"]
    )
    tgt_f = frame_reshape_targets(targets)
    c = cfg.model.criterion
    s = CriterionSettings(
        num_classes=K, num_points=c.train_num_points,
        oversample_ratio=c.oversample_ratio,
        importance_sample_ratio=c.importance_sample_ratio,
    )

    def emit(name, v):
        out[name] = v
        print(json.dumps({"stage": name, "ms": round(float(v), 2)}), flush=True)

    l1, m1 = logits_all[-1], masks_all[-1]
    emit("match_costs_1layer", _t(
        jax.jit(lambda ll, mm, tg: match_costs(key, ll, mm, tg, s)),
        l1, m1, tgt_f,
    ))
    emit("match_1layer(costs+hungarian)", _t(
        jax.jit(lambda ll, mm, tg: match(key, ll, mm, tg, s)),
        l1, m1, tgt_f,
    ))
    a1 = jax.jit(lambda ll, mm, tg: match(key, ll, mm, tg, s))(l1, m1, tgt_f)
    nm = jnp.asarray(float(np.asarray(tgt_f.valid).sum()))
    emit("loss_masks_1layer", _t(
        jax.jit(lambda mm, aa, tg, z: jnp.sum(
            jnp.stack(_loss_masks(key, mm, aa, tg, z, s))
        )),
        m1, a1, tgt_f, nm,
    ))
    emit("criterion_all_layers", _t(
        jax.jit(lambda la, ma, tg: set_criterion(
            key, la, ma, tg, s
        )[0]["total"]),
        logits_all, masks_all, tgt_f,
    ))

    # NOTE: every grad stage reduces to an IN-GRAPH scalar — fencing on a
    # tree leaf is wrong twice over: leaf[0] can be a constant-zero grad of
    # an unused param (ready before the computation finishes), and a large
    # leaf pays the axon host-transfer in the measurement.
    def _gnorm(tree):
        return sum(
            jnp.sum(jnp.square(x.astype(jnp.float32)))
            for x in jax.tree.leaves(tree)
        )

    # criterion fwd+bwd alone (grad wrt the mask stack): isolates the
    # criterion's share of the train backward from the model's
    emit("criterion_grad", _t(jax.jit(
        lambda la, ma, tg: _gnorm(jax.grad(
            lambda mm: set_criterion(key, la, mm, tg, s)[0]["total"]
        )(ma))
    ), logits_all, masks_all, tgt_f))

    # model fwd+bwd alone (sum-of-outputs pullback, criterion excluded)
    emit("model_grad_bf16", _t(jax.jit(
        lambda p, f: _gnorm(jax.grad(
            lambda q: jnp.sum(
                fwd(q, f)["pred_masks_all"].astype(jnp.float32)
            )
        )(p))
    ), pbf, frames))

    # full loss fwd + grad
    loss_fn = make_loss_fn(cfg, model, K)
    emit("loss_fwd", _t(
        jax.jit(lambda p, b: loss_fn(p, b, key)[0]), params, batch
    ))
    emit("grad", _t(jax.jit(
        lambda p, b: _gnorm(jax.grad(lambda q: loss_fn(q, b, key)[0])(p))
    ), params, batch))


if __name__ == "__main__":
    main(tiny="--tiny" in sys.argv)
