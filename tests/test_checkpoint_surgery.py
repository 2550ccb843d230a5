"""BriVIS stage-1 -> stage-2 checkpoint surgery.

The reference trains SANOnline first, then points BriVIS's MODEL.WEIGHTS at
that checkpoint (``configs/openvoc_ytvis_coco/brivis_R50_bs16_6000st.yaml:3``,
``train_net.py:290``); d2's checkpointer partial-loads the matching keys
(segmenter + clip adapter) while the resampler/brownian heads start fresh.
Here: train one SAN step, save an orbax checkpoint, graft it into a fresh
BriVIS init, and run one BriVIS train step on the grafted params.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from openvis_tpu.checkpoint import (
    load_params_from_checkpoint,
    merge_pretrained,
    save_checkpoint,
)
from openvis_tpu.parallel.train_step import (
    TrainState,
    make_optimizer,
    make_train_step,
)
from openvis_tpu.train import build_model, make_loss_fn

from test_brivis import _batch as brivis_batch, brivis_tiny_config, K
from test_san import san_tiny_config


def _leaves_equal(a, b):
    fa = jax.tree_util.tree_leaves_with_path(a)
    fb = {jax.tree_util.keystr(p): l for p, l in
          jax.tree_util.tree_leaves_with_path(b)}
    assert fa and len(fa) == len(fb)
    for path, leaf in fa:
        np.testing.assert_array_equal(
            np.asarray(leaf), np.asarray(fb[jax.tree_util.keystr(path)])
        )


def test_san_to_brivis_surgery(tmp_path):
    rng = np.random.RandomState(0)

    # --- stage 1: one SAN train step, save checkpoint ---
    san_cfg = san_tiny_config()
    san_cfg = dataclasses.replace(
        san_cfg, solver=dataclasses.replace(san_cfg.solver, amp=False)
    )
    san_model = build_model(san_cfg)
    b, t, h, w, n = 1, 2, 64, 96, 4
    text = rng.randn(K, 32).astype(np.float32)
    text = jnp.asarray(text / np.linalg.norm(text, axis=-1, keepdims=True))
    frames = jnp.asarray(rng.randn(b * t, h, w, 3).astype(np.float32))
    san_params = san_model.init(jax.random.PRNGKey(0), frames, t, text)["params"]
    assert set(san_params) == {"segmenter", "clip_adapter"}

    from openvis_tpu.structures import ClipTargets

    labels = rng.randint(0, K, (b, n)).astype(np.int32)
    masks = np.zeros((b, n, t, h, w), np.float32)
    masks[:, :2, :, 10:30, 20:50] = 1.0
    valid = np.zeros((b, n), bool)
    valid[:, :2] = True
    batch = {
        "pixels": frames.reshape(b, t, h, w, 3),
        "targets": ClipTargets(
            labels=jnp.asarray(labels), masks=jnp.asarray(masks),
            valid=jnp.asarray(valid),
            frame_valid=jnp.asarray(np.ones((b, n, t), bool)),
        ),
        "text_feats": text,
    }
    tx = make_optimizer(san_cfg, san_params)
    state = TrainState.create(san_params, tx)
    step = jax.jit(make_train_step(make_loss_fn(san_cfg, san_model, K), tx))
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["total_loss"]))

    ckpt_dir = str(tmp_path / "san_ckpt")
    save_checkpoint(ckpt_dir, 1, jax.device_get(state))

    # --- stage 2: graft into a fresh BriVIS init (train_net.py surgery) ---
    bcfg = brivis_tiny_config()
    bmodel = build_model(bcfg)
    bb = brivis_batch(np.random.RandomState(1))
    bframes = bb["pixels"].reshape(-1, *bb["pixels"].shape[2:])
    bparams = bmodel.init(
        jax.random.PRNGKey(2), bframes, bb["pixels"].shape[1], bb["text_feats"]
    )["params"]
    assert set(bparams) >= {"segmenter", "clip_adapter", "resampler",
                            "brownian_proj"}
    fresh_resampler = jax.tree.map(lambda x: np.asarray(x),
                                   bparams["resampler"])

    pre = load_params_from_checkpoint(ckpt_dir)
    assert pre is not None
    graft = {k: v for k, v in pre.items() if k in bparams}
    assert set(graft) == {"segmenter", "clip_adapter"}
    bparams = merge_pretrained(bparams, graft)

    # grafted subtrees == the TRAINED stage-1 values; resampler untouched
    _leaves_equal(bparams["segmenter"], state.params["segmenter"])
    _leaves_equal(bparams["clip_adapter"], state.params["clip_adapter"])
    _leaves_equal(bparams["resampler"], fresh_resampler)

    # one BriVIS train step runs on the grafted tree and keeps stage 1 frozen
    btx = make_optimizer(bcfg, bparams)
    bstate = TrainState.create(bparams, btx)
    bstep = jax.jit(make_train_step(make_loss_fn(bcfg, bmodel, K), btx))
    bstate, bmetrics = bstep(bstate, bb, jax.random.PRNGKey(3))
    assert np.isfinite(float(bmetrics["total_loss"]))
    _leaves_equal(bstate.params["segmenter"], state.params["segmenter"])
