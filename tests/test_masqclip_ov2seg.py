"""MasQCLIP and OV2Seg meta-architectures (tiny shapes)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from openvis_tpu.config import Config
from openvis_tpu.models.meta.masqclip import (
    MasQCLIPModel,
    label_assign,
    masqclip_eval_scores,
    masqclip_loss,
)
from openvis_tpu.models.meta.ov2seg import (
    OV2SegModel,
    ov2seg_eval_scores,
    ov2seg_frame_gate,
    ov2seg_loss,
)
from openvis_tpu.structures import ClipTargets

K, D = 5, 32
B, T, H, W, N = 1, 2, 64, 96, 4


def _base_model(meta, decoder):
    cfg = Config()
    m = dataclasses.replace(
        cfg.model,
        meta_architecture=meta,
        num_classes=K,
        pixel_decoder=dataclasses.replace(
            cfg.model.pixel_decoder, conv_dim=64, mask_dim=64,
            transformer_enc_layers=1, dim_feedforward=128, num_heads=4,
        ),
        transformer_decoder=dataclasses.replace(
            cfg.model.transformer_decoder, name=decoder,
            hidden_dim=64, num_queries=8, nheads=4, dim_feedforward=128,
            dec_layers=2, mask_dim=64, clip_embed_dim=D,
        ),
        clip_adapter=dataclasses.replace(
            cfg.model.clip_adapter, clip_model_name="test-tiny",
        ),
        criterion=dataclasses.replace(cfg.model.criterion, train_num_points=128),
    )
    return dataclasses.replace(cfg, model=m)


def _targets(rng):
    labels = rng.randint(0, K, (B, N)).astype(np.int32)
    masks = np.zeros((B, N, T, H, W), np.float32)
    masks[:, 0, :, 5:20, 5:30] = 1.0
    masks[:, 1, :, 35:55, 50:85] = 1.0
    valid = np.zeros((B, N), bool)
    valid[:, :2] = True
    return ClipTargets(
        labels=jnp.asarray(labels), masks=jnp.asarray(masks),
        valid=jnp.asarray(valid),
        frame_valid=jnp.asarray(np.ones((B, N, T), bool)),
    )


def test_label_assign():
    rng = np.random.RandomState(0)
    tg = _targets(rng)
    # query 0 reproduces GT 1, others empty
    pm = np.full((B, 8, T, H, W), -10.0, np.float32)
    pm[:, 0] = np.where(np.asarray(tg.masks[:, 1]) > 0.5, 10.0, -10.0)
    labels, valid, gt_idx = label_assign(
        jax.random.PRNGKey(0), jnp.asarray(pm), tg, num_points=512
    )
    assert bool(valid[0, 0])
    assert int(gt_idx[0, 0]) == 1
    assert int(labels[0, 0]) == int(tg.labels[0, 1])
    assert not bool(valid[0, 3])  # empty query -> dice ~1 -> invalid


def test_masqclip_forward_and_loss():
    cfg = _base_model("MasQCLIP", "frame")
    rng = np.random.RandomState(0)
    frames = jnp.asarray(rng.randn(B * T, H, W, 3).astype(np.float32))
    text = rng.randn(K + 1, D).astype(np.float32)  # + Background row
    text = jnp.asarray(text / np.linalg.norm(text, axis=-1, keepdims=True))
    model = MasQCLIPModel(cfg.model)
    params = model.init(jax.random.PRNGKey(0), frames, T, text)["params"]
    out = model.apply({"params": params}, frames, T, text)
    assert out["clip_logits"].shape == (B, 8, K + 1)
    losses = masqclip_loss(jax.random.PRNGKey(1), out, _targets(rng), cfg.model, K)
    assert np.isfinite(float(losses["total"]))
    scores = masqclip_eval_scores(out)
    assert scores.shape == (B, 8, K)
    # only new_q_proj/mask_embeddings may receive gradients via clip_logits
    def f(p):
        o = model.apply({"params": p}, frames, T, text)
        return masqclip_loss(
            jax.random.PRNGKey(1), o, _targets(np.random.RandomState(0)),
            cfg.model, K,
        )["total"]

    g = jax.grad(f)(params)
    gq = g["clip_adapter"]["resblock0"]["attn"]["new_q_proj"]["kernel"]
    gk = g["clip_adapter"]["resblock0"]["attn"]["k_proj"]["kernel"]
    assert float(jnp.abs(gq).sum()) > 0
    # frozen CLIP k_proj sees gradients only through the (detached) clip
    # stream -> must be zero except via mask-token path key/values
    assert np.isfinite(np.asarray(gk)).all()


def test_ov2seg_forward_loss_eval():
    cfg = _base_model("OV2Seg", "ov2seg_frame")
    rng = np.random.RandomState(0)
    frames = jnp.asarray(rng.randn(B * T, H, W, 3).astype(np.float32))
    text = rng.randn(K, D).astype(np.float32)
    text = jnp.asarray(text / np.linalg.norm(text, axis=-1, keepdims=True))
    model = OV2SegModel(cfg.model)
    params = model.init(jax.random.PRNGKey(0), frames, T, text)["params"]
    out = model.apply({"params": params}, frames, T, text)
    L = cfg.model.transformer_decoder.dec_layers + 1
    assert out["pred_logits_all"].shape == (L, B, T, 8, K + 1)
    assert out["pred_object_logits_all"].shape == (L, B, T, 8, 2)

    losses = ov2seg_loss(
        jax.random.PRNGKey(1), out, _targets(rng), cfg.model, K
    )
    for k in ("loss_ce", "loss_object_ce", "loss_mask", "loss_dice"):
        assert np.isfinite(np.asarray(losses[k])).all(), k
    assert np.isfinite(float(losses["total"]))

    video, per_frame = ov2seg_eval_scores(
        out["pred_logits"][0], out["pred_object_logits"][0]
    )
    assert video.shape == (8, K) and per_frame.shape == (T, 8, K)
    assert (np.asarray(video) >= 0).all() and (np.asarray(video) <= 1).all()

    gated = ov2seg_frame_gate(
        jnp.zeros((3, T, 4, 4)), jnp.asarray([0.9, 0.5, 0.1]),
        jnp.asarray(np.array([[0.5, 0.9], [0.001, 0.9], [0.5, 0.9]]).T),
    )
    assert float(gated[1, 0, 0, 0]) == -1.0  # gated frame suppressed
    assert float(gated[0, 0, 0, 0]) == 0.0
