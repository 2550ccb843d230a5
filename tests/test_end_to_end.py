"""End-to-end slice: SimpleBaselineOnline init -> train step -> eval forward
on a tiny config (SURVEY §7 stage 4 artifact)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openvis_tpu.config import Config
from openvis_tpu.parallel.train_step import TrainState, make_optimizer, make_train_step
from openvis_tpu.structures import ClipTargets
from openvis_tpu.train import build_model, init_model, make_eval_fn, make_loss_fn

K, D = 5, 32  # text classes, clip dim
B, T, H, W, N = 1, 2, 64, 96, 4


def tiny_config() -> Config:
    cfg = Config()
    m = dataclasses.replace(
        cfg.model,
        num_classes=K,
        pixel_decoder=dataclasses.replace(
            cfg.model.pixel_decoder,
            conv_dim=64, mask_dim=64, transformer_enc_layers=1,
            dim_feedforward=128, num_heads=4,
        ),
        transformer_decoder=dataclasses.replace(
            cfg.model.transformer_decoder,
            hidden_dim=64, num_queries=8, nheads=4, dim_feedforward=128,
            dec_layers=2, mask_dim=64, clip_embed_dim=D,
        ),
        criterion=dataclasses.replace(
            cfg.model.criterion, train_num_points=128
        ),
    )
    s = dataclasses.replace(cfg.solver, amp=False, warmup_iters=0)
    return dataclasses.replace(cfg, model=m, solver=s)


def _batch(rng):
    labels = rng.randint(0, K, (B, N)).astype(np.int32)
    masks = np.zeros((B, N, T, H, W), np.float32)
    masks[:, :2, :, 10:30, 20:50] = 1.0
    valid = np.zeros((B, N), bool)
    valid[:, :2] = True
    text = rng.randn(K, D).astype(np.float32)
    text /= np.linalg.norm(text, axis=-1, keepdims=True)
    return {
        "pixels": jnp.asarray(rng.randn(B, T, H, W, 3).astype(np.float32)),
        "targets": ClipTargets(
            labels=jnp.asarray(labels),
            masks=jnp.asarray(masks),
            valid=jnp.asarray(valid),
            frame_valid=jnp.asarray(np.ones((B, N, T), bool)),
        ),
        "text_feats": jnp.asarray(text),
    }


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()
    rng = np.random.RandomState(0)
    batch = _batch(rng)
    model, params = init_model(cfg, jax.random.PRNGKey(0), batch)
    return cfg, model, params, batch


def test_train_steps_run_and_losses_finite(setup):
    cfg, model, params, batch = setup
    loss_fn = make_loss_fn(cfg, model, K)
    tx = make_optimizer(cfg, params)
    state = TrainState.create(params, tx)
    step = jax.jit(make_train_step(loss_fn, tx))
    metrics = None
    for i in range(2):
        state, metrics = step(state, batch, jax.random.PRNGKey(42))
    assert np.isfinite(float(metrics["total_loss"]))
    assert float(metrics["grad_norm"]) > 0
    assert int(state.step) == 2
    # frozen backbone affines must not move
    p0 = params["segmenter"]["backbone"]["stem_norm1"]["scale"]
    p1 = state.params["segmenter"]["backbone"]["stem_norm1"]["scale"]
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))
    # but regular params must move
    k0 = params["segmenter"]["predictor"]["query_feat"]
    k1 = state.params["segmenter"]["predictor"]["query_feat"]
    assert np.abs(np.asarray(k1) - np.asarray(k0)).max() > 0


def test_freeze_at_labels(setup):
    """BACKBONE.FREEZE_AT (d2 ResNet.freeze semantics): freeze_at=2 zeroes
    updates for the stem + res2 while res3..res5 stay trainable; freeze_at=0
    freezes nothing beyond the FrozenAffine norms."""
    from openvis_tpu.parallel.train_step import label_params

    cfg, model, params, batch = setup
    labels = label_params(params, freeze_at=2)
    bb = labels["segmenter"]["backbone"]
    assert bb["stem_conv1"]["kernel"] == "frozen"
    assert bb["res2_block0"]["conv1"]["kernel"] == "frozen"
    assert bb["res3_block0"]["conv1"]["kernel"] == "backbone"
    assert bb["res5_block0"]["conv1"]["kernel"] == "backbone"
    labels0 = label_params(params, freeze_at=0)
    bb0 = labels0["segmenter"]["backbone"]
    assert bb0["stem_conv1"]["kernel"] == "backbone"
    assert bb0["res2_block0"]["conv1"]["kernel"] == "backbone"
    # FrozenAffine params frozen regardless of freeze_at
    assert bb0["stem_norm1"]["scale"] == "frozen"


def test_overfit_one_batch(setup):
    """Training correctness beyond 'runs and is finite': 25 optimizer steps
    on one fixed batch must substantially reduce the loss (the reference's
    only equivalent signal is a full training run)."""
    cfg, model, params, batch = setup
    cfg = dataclasses.replace(
        cfg, solver=dataclasses.replace(
            cfg.solver, base_lr=5e-4, clip_value=1.0
        ),
    )
    loss_fn = make_loss_fn(cfg, model, K)
    tx = make_optimizer(cfg, params)
    state = TrainState.create(params, tx)
    # NO donate_argnums here: `params` is the module-scoped fixture's tree
    # and donation would delete its buffers for the sibling tests
    step = jax.jit(make_train_step(loss_fn, tx))
    losses = []
    for i in range(25):
        state, metrics = step(state, batch, jax.random.PRNGKey(7))
        losses.append(float(metrics["total_loss"]))
    assert losses[-1] < 0.7 * losses[0], (
        f"loss did not improve: {losses[0]:.2f} -> {losses[-1]:.2f}"
    )


def test_amp_train_step(setup):
    """solver.amp=True runs the whole forward in bf16 (params cast at use
    time, torch-autocast equivalent); grads must come back f32 and finite."""
    cfg, model, params, batch = setup
    cfg = dataclasses.replace(
        cfg, solver=dataclasses.replace(cfg.solver, amp=True)
    )
    loss_fn = make_loss_fn(cfg, model, K)
    loss, _ = jax.jit(loss_fn)(params, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))
    grads = jax.jit(jax.grad(lambda p, b, r: loss_fn(p, b, r)[0]))(
        params, batch, jax.random.PRNGKey(0)
    )
    leaves = jax.tree.leaves(grads)
    assert all(g.dtype == jnp.float32 for g in leaves)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    # bf16 loss should be close to the f32 loss
    cfg32 = dataclasses.replace(
        cfg, solver=dataclasses.replace(cfg.solver, amp=False)
    )
    loss32, _ = jax.jit(make_loss_fn(cfg32, model, K))(
        params, batch, jax.random.PRNGKey(0)
    )
    assert abs(float(loss) - float(loss32)) / max(abs(float(loss32)), 1e-6) < 0.1


def test_eval_forward(setup):
    cfg, model, params, batch = setup
    eval_fn = jax.jit(make_eval_fn(cfg, model))
    frames = batch["pixels"][0]
    out = eval_fn(params, frames, batch["text_feats"])
    topk = cfg.model.test.topk_per_video
    assert out["scores"].shape == (topk,)
    assert out["labels"].shape == (topk,)
    assert out["mask_logits"].shape == (topk, T, H // 4, W // 4)
    s = np.asarray(out["scores"])
    assert (s >= 0).all() and (s <= 1).all()
    assert (np.asarray(out["labels"]) < K).all()
