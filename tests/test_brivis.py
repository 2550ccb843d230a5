"""BriVIS: frozen SAN + tracking + temporal resampler + brownian loss."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from openvis_tpu.config import Config
from openvis_tpu.losses.brownian import brownian_bridge_loss
from openvis_tpu.models.meta.brivis import BriVISModel, brivis_loss
from openvis_tpu.parallel.train_step import TrainState, make_optimizer, make_train_step
from openvis_tpu.structures import ClipTargets
from openvis_tpu.train import make_loss_fn

K, D = 5, 32
B, T, H, W, N = 1, 3, 64, 96, 4  # T=3: brivis trains with 3 frames


def brivis_tiny_config() -> Config:
    cfg = Config()
    m = dataclasses.replace(
        cfg.model,
        meta_architecture="BriVIS",
        num_classes=K,
        freeze_segmenter=True,
        pixel_decoder=dataclasses.replace(
            cfg.model.pixel_decoder,
            conv_dim=64, mask_dim=64, transformer_enc_layers=1,
            dim_feedforward=128, num_heads=4,
        ),
        transformer_decoder=dataclasses.replace(
            cfg.model.transformer_decoder,
            name="side_adapter_frame",
            hidden_dim=64, num_queries=8, nheads=4, dim_feedforward=128,
            dec_layers=2, mask_dim=64, clip_embed_dim=D,
        ),
        clip_adapter=dataclasses.replace(
            cfg.model.clip_adapter,
            clip_model_name="test-tiny", clip_num_heads=4,
            clip_embed_dims=D, broken_id=3, merge_ids=(1, 2, 3),
        ),
        resampler=dataclasses.replace(cfg.model.resampler, num_layers=2),
        criterion=dataclasses.replace(cfg.model.criterion, train_num_points=128),
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
            labels=jnp.asarray(labels), masks=jnp.asarray(masks),
            valid=jnp.asarray(valid),
            frame_valid=jnp.asarray(np.ones((B, N, T), bool)),
        ),
        "text_feats": jnp.asarray(text),
    }


def test_brownian_loss_shapes_and_sanity():
    rng = np.random.RandomState(0)
    e = jnp.asarray(rng.randn(2, 4, 6, 16).astype(np.float32))
    bc, htm = brownian_bridge_loss(jax.random.PRNGKey(0), e)
    assert np.isfinite(float(bc)) and np.isfinite(float(htm))
    # a perfectly linear bridge scores better (lower -log ratio) than noise
    t = 4
    base = rng.randn(1, 1, 6, 16).astype(np.float32)
    drift = rng.randn(1, 1, 6, 16).astype(np.float32) * 0.05
    lin = jnp.asarray(
        np.concatenate([base + i * drift for i in range(t)], axis=1)
    )
    bc_lin, _ = brownian_bridge_loss(jax.random.PRNGKey(0), lin)
    assert float(bc_lin) < float(bc) + 1e-3


def _brownian_naive(rng, embeds, delta=0.3, topk=5, neg_log=True):
    """Reference-shaped oracle: materializes the (n, n, t, c) negative tensor
    exactly as the round-2 implementation (and the torch reference's
    per-pair expansion) did.  Only usable at small n."""
    b, t, q, c = embeds.shape
    n = b * q
    e = jnp.transpose(embeds, (0, 2, 1, 3)).reshape(n, t, c)
    e = e / (jnp.linalg.norm(e, axis=-1, keepdims=True) + 1e-6)
    mid = jax.random.randint(rng, (n,), 1, t - 1)
    head, tail = e[:, 0], e[:, -1]
    alpha = (mid.astype(jnp.float32) / (t - 1))[:, None]
    sigma = alpha[:, 0] * ((t - 1) - mid.astype(jnp.float32))
    e_mid = jnp.take_along_axis(e, mid[:, None, None].repeat(c, -1), axis=1)[:, 0]
    x_pos = e_mid - (1 - alpha) * head - alpha * tail
    d_pos = -jnp.sum(x_pos ** 2, axis=-1) / (2 * sigma ** 2)
    neg_mid = jnp.take_along_axis(
        jnp.broadcast_to(e[None], (n, n, t, c)),
        mid[:, None, None, None].repeat(n, 1).repeat(c, -1), axis=2,
    )[:, :, 0]
    x_neg = (neg_mid - (1 - alpha[:, None]) * head[:, None]
             - alpha[:, None] * tail[:, None])
    d_neg = -jnp.sum(x_neg ** 2, axis=-1) / (2 * sigma[:, None] ** 2)
    d_neg = d_neg.at[jnp.arange(n), jnp.arange(n)].set(-10000.0)
    d_top, _ = jax.lax.top_k(d_neg, min(topk, n - 1) if n > 1 else 1)
    numer = jnp.exp(d_pos)
    ratio = numer / (numer + jnp.exp(d_top).sum(-1))
    return -jnp.log(ratio + 1e-12).mean() if neg_log else ratio.mean()


def test_brownian_matmul_negatives_match_naive():
    """The matmul-form (n, n) negative distances must match the naive
    (n, n, t, c) expansion the reference implies (brownian_criterion.py:72-90)."""
    rng = np.random.RandomState(7)
    for seed in (0, 1):
        e = jnp.asarray(rng.randn(3, 5, 4, 16).astype(np.float32))
        bc, _ = brownian_bridge_loss(jax.random.PRNGKey(seed), e)
        bc_ref = _brownian_naive(jax.random.PRNGKey(seed), e)
        np.testing.assert_allclose(float(bc), float(bc_ref), rtol=2e-5,
                                   atol=2e-5)


def test_brownian_at_reference_recipe_scale():
    """b=16, q=100, t=3, c=256 -> n=1600 global negative pool: the naive
    form needs ~7.9 GB and OOMs; the matmul form must run (peak ~tens of MB)."""
    rng = np.random.RandomState(1)
    e = jnp.asarray(rng.randn(16, 3, 100, 256).astype(np.float32))
    bc, htm = jax.jit(brownian_bridge_loss)(jax.random.PRNGKey(0), e)
    assert np.isfinite(float(bc)) and np.isfinite(float(htm))


import pytest


@pytest.mark.parametrize("name", ["decoupled", "raw"])
def test_brivis_resampler_variants(name):
    """Decoupled (resampler.py:9-186) and Raw (:326-626) resampler variants:
    forward + loss run with the same output contract as Temporal."""
    cfg = brivis_tiny_config()
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(
            cfg.model,
            resampler=dataclasses.replace(cfg.model.resampler, name=name),
        ),
    )
    rng = np.random.RandomState(0)
    batch = _batch(rng)
    model = BriVISModel(cfg.model)
    frames = batch["pixels"].reshape(B * T, H, W, 3)
    params = model.init(
        jax.random.PRNGKey(0), frames, T, batch["text_feats"]
    )["params"]
    out = model.apply({"params": params}, frames, T, batch["text_feats"])
    L = cfg.model.resampler.num_layers + 1
    q = cfg.model.transformer_decoder.num_queries
    assert out["pred_logits_all"].shape == (L, B, T, q, K + 1)
    assert out["pred_masks_all"].shape[:2] == (L, B)
    losses = brivis_loss(
        jax.random.PRNGKey(1), out, batch["targets"], cfg.model, K
    )
    assert np.isfinite(float(losses["total"]))


def test_raw_resampler_windowed_decomposition_exact():
    """The raw resampler's windowed path (reference resampler.py:406-516:
    temporal half over the FULL sequence, per-frame half per window) must
    match the single-shot forward exactly — frames never mix in the
    cross-attention, so the decomposition is algebraic, not approximate."""
    from openvis_tpu.models.resampler import RawTemporalResampler

    rng = np.random.RandomState(0)
    b, t, q, c, window, nlayers = 1, 8, 4, 16, 4, 2
    hws = (12, 6, 3)
    rs = RawTemporalResampler(hidden_dim=c, feed_dim=32, nheads=2,
                              nlayers=nlayers)
    fe = jnp.asarray(rng.randn(b, t, q, c).astype(np.float32))
    mask_feats = jnp.asarray(rng.randn(t, 4, 4, c).astype(np.float32))
    attn_feats = jnp.asarray(rng.randn(t, 2, 2, 2, c).astype(np.float32))
    ms_feats = [jnp.asarray(rng.randn(t, hw, c).astype(np.float32))
                for hw in hws]
    ms_pos = [jnp.asarray(rng.randn(1, hw, c).astype(np.float32))
              for hw in hws]
    params = rs.init(jax.random.PRNGKey(0), fe, mask_feats, attn_feats,
                     ms_feats, ms_pos)["params"]
    full = rs.apply({"params": params}, fe, mask_feats, attn_feats,
                    ms_feats, ms_pos)

    # windowed decomposition (engine._evaluate_brivis_raw_windowed)
    x = jnp.transpose(fe, (0, 2, 1, 3)).reshape(b * q, t, c)
    for i in range(nlayers):
        x = rs.apply({"params": params}, x, i,
                     method=RawTemporalResampler.temporal_half)
        pf = np.array(jnp.swapaxes(x, 0, 1))            # (T, Q, C) writable
        lvl = i % 3
        for j in range(0, t, window):
            o = rs.apply(
                {"params": params}, jnp.asarray(pf[j : j + window]),
                ms_feats[lvl][j : j + window], ms_pos[lvl], i,
                method=RawTemporalResampler.frame_half,
            )
            pf[j : j + window] = np.asarray(o)
        x = jnp.swapaxes(jnp.asarray(pf), 0, 1)
    final = rs.apply({"params": params}, jnp.swapaxes(x, 0, 1),
                     method=RawTemporalResampler.finalize_embeds)
    masks, biases = rs.apply({"params": params}, final, mask_feats,
                             attn_feats,
                             method=RawTemporalResampler.predict_frames)

    np.testing.assert_allclose(
        np.asarray(jnp.swapaxes(masks, 0, 1)),          # (Q, T, h, w)
        np.asarray(full["pred_masks_all"][-1, 0]), rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(biases), np.asarray(full["attn_biases_all"][-1]),
        rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(final), np.asarray(full["pred_embeds"][0]),
        rtol=1e-5, atol=1e-5,
    )


def test_decoupled_resampler_split_matches_call():
    """Decoupled final_embeds + predict_frames == __call__'s last layer
    (the heads never feed back, so the split is exact)."""
    from openvis_tpu.models.resampler import DecoupledTemporalResampler

    rng = np.random.RandomState(1)
    b, t, q, c, nq = 1, 6, 4, 16, 5
    rs = DecoupledTemporalResampler(hidden_dim=c, feed_dim=32, nheads=2,
                                    nlayers=2, nqueries=nq)
    fe = jnp.asarray(rng.randn(b, t, q, c).astype(np.float32))
    mask_feats = jnp.asarray(rng.randn(t, 4, 4, c).astype(np.float32))
    attn_feats = jnp.asarray(rng.randn(t, 2, 2, 2, c).astype(np.float32))
    params = rs.init(jax.random.PRNGKey(0), fe, mask_feats,
                     attn_feats)["params"]
    full = rs.apply({"params": params}, fe, mask_feats, attn_feats)
    final = rs.apply({"params": params}, fe,
                     method=DecoupledTemporalResampler.final_embeds)
    assert final.shape == (b, t, nq, c)
    masks, biases = rs.apply(
        {"params": params}, final.reshape(t, nq, c), mask_feats, attn_feats,
        method=DecoupledTemporalResampler.predict_frames,
    )
    np.testing.assert_allclose(
        np.asarray(jnp.swapaxes(masks, 0, 1)),
        np.asarray(full["pred_masks_all"][-1, 0]), rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(final[0]), np.asarray(full["pred_embeds"][0]),
        rtol=1e-5, atol=1e-5,
    )


def test_brivis_train_step_freezes_stage1():
    cfg = brivis_tiny_config()
    rng = np.random.RandomState(0)
    batch = _batch(rng)
    model = BriVISModel(cfg.model)
    frames = batch["pixels"].reshape(B * T, H, W, 3)
    params = model.init(
        jax.random.PRNGKey(0), frames, T, batch["text_feats"]
    )["params"]

    out = model.apply({"params": params}, frames, T, batch["text_feats"])
    L = cfg.model.resampler.num_layers + 1
    q = cfg.model.transformer_decoder.num_queries
    assert out["pred_logits_all"].shape == (L, B, T, q, K + 1)
    assert out["pred_masks_all"].shape[0] == L
    assert out["brownian_embeds"].shape == (B, T, q, 64)

    losses = brivis_loss(
        jax.random.PRNGKey(1), out, batch["targets"], cfg.model, K,
        image_matcher=True,
    )
    assert np.isfinite(float(losses["total"]))

    loss_fn = make_loss_fn(cfg, model, K)
    tx = make_optimizer(cfg, params)
    state = TrainState.create(params, tx)
    step = jax.jit(make_train_step(loss_fn, tx))
    state, metrics = step(state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["total_loss"]))

    # stage-1 (segmenter + clip adapter) params must be untouched
    def flat(p):
        return jax.tree_util.tree_leaves_with_path(p)

    for path, leaf in flat(params["segmenter"]):
        new = state.params["segmenter"]
        for k in path:
            new = new[k.key]
        np.testing.assert_array_equal(np.asarray(leaf), np.asarray(new))
    # resampler must move
    moved = jax.tree_util.tree_reduce(
        lambda a, x: a + float(jnp.abs(x).sum()),
        jax.tree.map(
            lambda a, b: a - b,
            state.params["resampler"], params["resampler"],
        ),
        0.0,
    )
    assert moved > 0
