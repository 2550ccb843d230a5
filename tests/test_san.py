"""SAN: side-adapter decoder + biased CLIP post-encode end-to-end (tiny)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openvis_tpu.config import Config
from openvis_tpu.models.meta.san import SANModel, san_loss
from openvis_tpu.models.side_adapter import adaptive_max_pool
from openvis_tpu.structures import ClipTargets

K, D = 5, 32
B, T, H, W, N = 1, 2, 64, 96, 4


def san_tiny_config() -> Config:
    cfg = Config()
    m = dataclasses.replace(
        cfg.model,
        meta_architecture="SANOnline",
        num_classes=K,
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
            name="side", clip_model_name="test-tiny", clip_num_heads=4,
            clip_embed_dims=D, broken_id=3, merge_ids=(1, 2, 3),
        ),
        criterion=dataclasses.replace(cfg.model.criterion, train_num_points=128),
    )
    return dataclasses.replace(cfg, model=m)


def test_adaptive_max_pool_matches_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.RandomState(0)
    for (h, w, th, tw) in [(30, 54, 8, 8), (14, 14, 14, 14), (7, 9, 3, 4)]:
        x = rng.randn(2, 3, h, w).astype(np.float32)
        ours = np.asarray(adaptive_max_pool(jnp.asarray(x), (th, tw)))
        ref = F.adaptive_max_pool2d(torch.from_numpy(x), (th, tw)).numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-6)


def test_post_encode_sos_split_matches_dense_bias():
    """The sos-split post-encode (no (N, nH, S, S) bias materialization)
    matches the reference's dense-bias formulation
    (side_adapter.py:176-209, _build_attn_biases :237-270)."""
    from openvis_tpu.models.side_adapter import SideAdapter

    adapter = SideAdapter(clip_model_name="test-tiny", out_dims=16,
                          broken_idx=3, merge_ids=(1, 2, 3), num_queries=8)
    rng = np.random.RandomState(3)
    n, q, nH = 2, 8, 4
    frames = jnp.asarray(rng.rand(n, 48, 64, 3).astype(np.float32) * 255)
    # test-tiny: patch 8, input_resolution 64 -> 8x8 grid
    biases = jnp.asarray(rng.randn(n, nH, q, 16, 16).astype(np.float32))

    def full(mdl, frames, biases):
        _, bk, grid = mdl.front_encode(frames)
        return bk, grid, mdl.post_encode(bk, biases, grid)

    params = adapter.init(jax.random.PRNGKey(0), frames, biases,
                          method=full)["params"]
    bk_tokens, grid, got = adapter.apply({"params": params}, frames, biases,
                                         method=full)

    # dense reference path: run the post blocks with the full (S, S) bias
    def dense(mdl, bk_tokens, attn_biases, grid_hw):
        from openvis_tpu.models.side_adapter import adaptive_max_pool as amp_
        n_, l1, wdt = bk_tokens.shape
        h_, w_ = grid_hw
        L = h_ * w_
        ab = amp_(attn_biases, (h_, w_)).reshape(n_, nH, q, L)
        S = q + 1 + L
        base = jnp.zeros((S, S), bk_tokens.dtype)
        base = base.at[:, :q].set(-100.0)
        base = base.at[jnp.arange(q), jnp.arange(q)].set(0.0)
        base = base.at[:q, q].set(-100.0)
        bias = jnp.broadcast_to(base, (n_, nH, S, S))
        bias = bias.at[:, :, :q, q + 1:].set(ab.astype(bk_tokens.dtype))
        sos = jnp.broadcast_to(bk_tokens[:, :1], (n_, q, wdt))
        x = jnp.concatenate([sos, bk_tokens], axis=1)
        x, _ = mdl.visual.run_blocks(
            x, mdl.broken_idx, mdl.visual.layers,
            attn_bias=[bias] * (mdl.visual.layers - mdl.broken_idx),
        )
        out = mdl.visual.finalize(x[:, :q], project=True)
        return out / (jnp.linalg.norm(out, axis=-1, keepdims=True) + 1e-6)

    ref = adapter.apply({"params": params}, bk_tokens, biases, grid,
                        method=dense)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)


def test_san_forward_and_loss():
    cfg = san_tiny_config()
    model = SANModel(cfg.model)
    rng = np.random.RandomState(0)
    frames = jnp.asarray(rng.randn(B * T, H, W, 3).astype(np.float32))
    text = rng.randn(K, D).astype(np.float32)
    text = jnp.asarray(text / np.linalg.norm(text, axis=-1, keepdims=True))

    params = model.init(jax.random.PRNGKey(0), frames, T, text)["params"]
    out = model.apply({"params": params}, frames, T, text)

    q = cfg.model.transformer_decoder.num_queries
    L = cfg.model.transformer_decoder.dec_layers + 1
    assert out["pred_logits_all"].shape == (L, B, T, q, K + 1)
    assert out["pred_masks_all"].shape[0] == L
    assert out["class_attn_biases_all"].shape[:4] == (L, B, T, 4)
    assert np.isfinite(np.asarray(out["pred_logits_all"])).all()

    labels = rng.randint(0, K, (B, N)).astype(np.int32)
    masks = np.zeros((B, N, T, H, W), np.float32)
    masks[:, :2, :, 10:30, 20:50] = 1.0
    valid = np.zeros((B, N), bool)
    valid[:, :2] = True
    tg = ClipTargets(
        labels=jnp.asarray(labels), masks=jnp.asarray(masks),
        valid=jnp.asarray(valid),
        frame_valid=jnp.asarray(np.ones((B, N, T), bool)),
    )
    losses = san_loss(jax.random.PRNGKey(1), out, tg, cfg.model, K, online=True)
    assert np.isfinite(float(losses["total"]))

    # gradients flow into both the decoder and the side-adapter bg embed
    def f(p):
        o = model.apply({"params": p}, frames, T, text)
        return san_loss(jax.random.PRNGKey(1), o, tg, cfg.model, K, True)["total"]

    g = jax.grad(f)(params)
    assert float(jnp.abs(g["clip_adapter"]["bg_embed"]).sum()) > 0
    assert float(jnp.abs(g["segmenter"]["predictor"]["heads"]["attn_embed"]["layer0"]["kernel"]).sum()) > 0


def test_san_clip_frozen_stop_gradient():
    """SAN freezes the whole CLIP tower (reference freeze_params,
    side_adapter.py:101): through make_loss_fn, clip_adapter/visual grads
    must be EXACT zeros (stop_gradient — so the global grad-clip norm
    matches torch clip_grad_norm_ over requires-grad params and the frozen
    backward DCEs away) while attn_projs / bg_embed keep training."""
    from openvis_tpu.parallel.train_step import config_labels
    from openvis_tpu.train import make_loss_fn

    cfg = san_tiny_config()
    model = SANModel(cfg.model)
    rng = np.random.RandomState(0)
    text = rng.randn(K, D).astype(np.float32)
    text = jnp.asarray(text / np.linalg.norm(text, axis=-1, keepdims=True))
    batch = {
        "pixels": jnp.asarray(rng.randn(B, T, H, W, 3).astype(np.float32)),
        "targets": ClipTargets(
            labels=jnp.asarray(rng.randint(0, K, (B, N)), jnp.int32),
            masks=jnp.asarray(
                (rng.rand(B, N, T, H, W) > 0.9).astype(np.float32)
            ),
            valid=jnp.ones((B, N), bool),
            frame_valid=jnp.ones((B, N, T), bool),
        ),
        "text_feats": text,
    }
    frames = batch["pixels"].reshape(B * T, H, W, 3)
    params = model.init(jax.random.PRNGKey(0), frames, T, text)["params"]

    labels = config_labels(cfg, params)
    assert labels["clip_adapter"]["visual"]["class_embedding"] == "frozen"
    assert labels["clip_adapter"]["attn_proj0"]["kernel"] != "frozen"
    assert labels["clip_adapter"]["bg_embed"] != "frozen"

    loss_fn = make_loss_fn(cfg, model, K)
    g = jax.grad(lambda p: loss_fn(p, batch, jax.random.PRNGKey(1))[0])(
        params
    )
    assert all(
        float(jnp.abs(x).max()) == 0.0
        for x in jax.tree.leaves(g["clip_adapter"]["visual"])
    )
    assert float(jnp.abs(g["clip_adapter"]["attn_proj0"]["kernel"]).max()) > 0
    assert float(jnp.abs(g["clip_adapter"]["bg_embed"]).max()) > 0
