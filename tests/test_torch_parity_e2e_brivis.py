"""Composed end-to-end golden trace #3: BriVIS forward vs a torch
re-typing of the REFERENCE pipeline.

On top of the SAN stage-1 re-typings (test_torch_parity_e2e_san.py) this
pins the stage-2 wiring of ``/root/reference/openvis/brivis.py:100-211``:
the frozen per-frame CLIP logits, the MinVIS embedding alignment
(``minvis.py:320-338`` via scipy assignment), the temporal instance
resampler (``resampler.py:189-323`` — long attention + replicate-padded
short convs + FFN per layer, shared decode norm, per-layer mask/attn-bias
heads), the per-layer biased post-CLIP classification, and the brownian
projection (``brownian_criterion.py:64-70``).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402
from scipy.optimize import linear_sum_assignment  # noqa: E402

from openvis_tpu.models.clip import model as clip_model  # noqa: E402
from openvis_tpu.models.meta.brivis import BriVISModel  # noqa: E402

from test_torch_parity_e2e import (  # noqa: E402
    _lin,
    _ln,
    _mha,
    _mlp,
    _pixel_decoder,
    _resnet50,
    _t,
)
from test_torch_parity_e2e_san import (  # noqa: E402
    B,
    DEC_LAYERS,
    HID,
    K,
    NHEADS,
    Q,
    T,
    TINY_CLIP,
    H,
    W,
    randomize_norm_affines,
    san_cfg,
    san_front_torch,
    san_post_logits_torch,
    side_decoder_torch,
    text_with_bg_torch,
)

RS_LAYERS = 2


def _brivis_cfg():
    cfg = san_cfg()
    m = dataclasses.replace(
        cfg.model,
        meta_architecture="BriVIS",
        resampler=dataclasses.replace(
            cfg.model.resampler, name="temporal", num_layers=RS_LAYERS
        ),
    )
    return dataclasses.replace(cfg, model=m)


def _track_indices_torch(pred_embeds):
    """MinVIS alignment (minvis.py:320-338): per consecutive-frame cosine
    costs solved by scipy assignment, permutations composed so identity k =
    frame-0 query order (models/tracking.py semantics)."""
    e = pred_embeds / (np.linalg.norm(pred_embeds, axis=-1, keepdims=True)
                       + 1e-6)
    b, t, q, _ = e.shape
    indices = np.zeros((b, t, q), np.int64)
    for bi in range(b):
        perm = np.arange(q)
        indices[bi, 0] = perm
        for s in range(t - 1):
            cos = e[bi, s] @ e[bi, s + 1].T               # (Q, Q)
            _, cols = linear_sum_assignment(1.0 - cos)    # r_s[i] = col of i
            perm = cols[perm]
            indices[bi, s + 1] = perm
    return indices


def _resampler_torch(rp, frame_embeds):
    """TemporalInstanceResampler encode (resampler.py:240-280): per layer
    long self-attn (post-norm) -> replicate-padded conv1d k5/k3 (residual)
    -> norm -> FFN; all layer outputs stacked under one decode norm.
    frame_embeds: torch (B, T, Q, C) -> normed (L+1, B*Q, T, C)."""
    b, t, q, c = frame_embeds.shape
    x = frame_embeds.permute(0, 2, 1, 3).reshape(b * q, t, c)
    outs = [x]
    for i in range(RS_LAYERS):
        attn = _mha(x, x, x, rp[f"long{i}"], NHEADS)
        x = _ln(x + attn, rp[f"long_norm{i}"])
        w1 = _t(np.asarray(rp[f"short{i}_conv1"]["kernel"]).transpose(2, 1, 0))
        w2 = _t(np.asarray(rp[f"short{i}_conv2"]["kernel"]).transpose(2, 1, 0))
        y = F.pad(x.transpose(1, 2), (2, 2), mode="replicate")
        y = F.conv1d(y, w1, _t(rp[f"short{i}_conv1"]["bias"]))
        y = F.relu(y)
        y = F.pad(y, (1, 1), mode="replicate")
        y = F.conv1d(y, w2, _t(rp[f"short{i}_conv2"]["bias"])).transpose(1, 2)
        x = _ln(y + x, rp[f"agg_norm{i}"])
        fp = rp[f"ffn{i}"]
        ff = _lin(F.relu(_lin(x, fp["linear1"])), fp["linear2"])
        x = _ln(x + ff, fp["norm"])
        outs.append(x)
    return _ln(torch.stack(outs), rp["decode_norm"])


def test_brivis_forward_matches_torch_retyping(monkeypatch):
    monkeypatch.setitem(clip_model._MODEL_SHAPES, "TINY/8", TINY_CLIP)
    cfg = _brivis_cfg()
    model = BriVISModel(cfg.model)
    rng = np.random.RandomState(0)
    frames = rng.randn(B * T, H, W, 3).astype(np.float32)
    text = rng.randn(K, TINY_CLIP["embed_dim"]).astype(np.float32)
    text /= np.linalg.norm(text, axis=-1, keepdims=True)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(frames), T, jnp.asarray(text)
    )
    params = randomize_norm_affines(variables["params"], rng)
    out = model.apply({"params": params}, jnp.asarray(frames), T,
                      jnp.asarray(text))

    ca = params["clip_adapter"]
    seg = params["segmenter"]
    rp = params["resampler"]
    with torch.no_grad():
        # --- frozen SAN stage 1 (brivis.py:155-169)
        bk_tokens, grid, extra = san_front_torch(
            ca, frames, cfg.model.pixel_mean, cfg.model.pixel_std
        )
        feats = _resnet50(seg["backbone"], frames)
        mask_features, ms = _pixel_decoder(seg["pixel_decoder"], feats, extra)
        all_biases, all_masks, dec_out, af = side_decoder_torch(
            seg["predictor"], ms, mask_features
        )
        text_full = text_with_bg_torch(ca, text)
        image_logits = san_post_logits_torch(
            ca, bk_tokens, all_biases[-1], text_full, grid
        ).view(B, T, Q, K + 1)

        # --- MinVIS alignment (brivis.py:173-174)
        pred_embeds = dec_out.view(B, T, Q, HID).numpy()
        idx = _track_indices_torch(pred_embeds)
        gather = torch.from_numpy(idx)
        frame_embeds = torch.from_numpy(pred_embeds)[
            torch.arange(B)[:, None, None],
            torch.arange(T)[None, :, None], gather,
        ]
        image_logits_al = image_logits[
            torch.arange(B)[:, None, None],
            torch.arange(T)[None, :, None], gather,
        ]
        last_masks = all_masks[-1].view(B, T, Q, *all_masks[-1].shape[-2:])
        image_masks = last_masks[
            torch.arange(B)[:, None, None],
            torch.arange(T)[None, :, None], gather,
        ].permute(0, 2, 1, 3, 4)                          # (B, Q, T, H, W)

        # --- temporal resampler + per-layer heads (resampler.py:282-323)
        normed = _resampler_torch(rp, frame_embeds)       # (L+1, B*Q, T, C)
        l1 = normed.shape[0]
        per_frame = normed.view(l1, B, Q, T, HID).permute(
            0, 1, 3, 2, 4
        ).reshape(l1, B * T, Q, HID)
        mf_nhwc = mask_features.permute(0, 2, 3, 1)
        masks_l, logits_l = [], []
        for li in range(l1):
            me = _mlp(per_frame[li], rp["mask_embed"], 3)
            ae = _mlp(per_frame[li], rp["attn_embed"], 3)
            masks = torch.einsum("nqc,nhwc->nqhw", me, mf_nhwc)
            biases = torch.einsum("nqc,nmhwc->nmqhw", ae, af)
            masks_l.append(masks)
            logits_l.append(san_post_logits_torch(
                ca, bk_tokens, biases, text_full, grid
            ))
        brownian = _lin(per_frame[-1].view(B, T, Q, HID),
                        params["brownian_proj"])

    ref_logits = torch.stack(logits_l).view(l1, B, T, Q, K + 1).numpy()
    ref_masks = torch.stack(masks_l).view(
        l1, B, T, Q, *masks_l[0].shape[-2:]
    ).permute(0, 1, 3, 2, 4, 5).numpy()
    np.testing.assert_allclose(
        np.asarray(out["image_logits"]), image_logits_al.numpy(),
        rtol=2e-3, atol=2e-3, err_msg="image_logits",
    )
    np.testing.assert_allclose(
        np.asarray(out["image_masks"]), image_masks.numpy(),
        rtol=2e-3, atol=2e-3, err_msg="image_masks",
    )
    np.testing.assert_allclose(
        np.asarray(out["pred_logits_all"]), ref_logits, rtol=2e-3, atol=2e-3,
        err_msg="pred_logits_all",
    )
    np.testing.assert_allclose(
        np.asarray(out["pred_masks_all"]), ref_masks, rtol=2e-3, atol=2e-3,
        err_msg="pred_masks_all",
    )
    np.testing.assert_allclose(
        np.asarray(out["brownian_embeds"]), brownian.numpy(),
        rtol=2e-3, atol=2e-3, err_msg="brownian_embeds",
    )
