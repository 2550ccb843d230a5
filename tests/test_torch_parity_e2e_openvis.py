"""Composed end-to-end golden trace: OpenVISOnline vs a torch/numpy
re-typing of the REFERENCE pipeline.

Covers the wiring the other composed traces don't:
  * the class-agnostic binary PROPOSAL head — Linear(hidden, 2) objectness
    (``/root/reference/openvis/modeling/transformer_decoder/
    frame_mask2former_transformer_decoder.py:199-207``, selected by
    ``openvis.py:35`` with NUM_CLASSES == 1);
  * the full open-vocabulary inference chain
    (``/root/reference/openvis/openvis.py:110-147`` +
    ``modeling/clip_adapter/adapter.py:56-147``): sigmoid masks ->
    bin>0.5 validity + square top-left boxes -> roi_align frame/mask crops
    (numpy oracle transcribed from the documented roi_align semantics,
    sampling_ratio=1 — the repo's recorded deviation from the reference's
    adaptive grids, see ``clip_adapter.py:53``) -> mask-blended crops ->
    /255 + CLIP normalize -> frozen CLIP image encode -> 100*cosine logits
    -> per-query frame-averaged LOGITS over valid frames -> one softmax.

Stage 1 reuses the SimpleBSL re-typings (test_torch_parity_e2e) with the
proposal head; the CLIP tower re-typings come from the SAN trace
(test_torch_parity_e2e_san) and the roi_align oracle from
test_clip_adapters — each independently parity-tested.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from openvis_tpu.config import Config  # noqa: E402
from openvis_tpu.models.clip.model import (  # noqa: E402
    CLIP_PIXEL_MEAN,
    CLIP_PIXEL_STD,
    CLIPVisionTransformer,
)
from openvis_tpu.models.meta.openvis import (  # noqa: E402
    OpenVISModel,
    openvis_ov_scores,
)

from test_clip_adapters import _np_roi_align  # noqa: E402
from test_torch_parity_e2e import (  # noqa: E402
    B,
    DEC_LAYERS,
    H,
    HID,
    NHEADS,
    NPOINTS,
    ENC_LAYERS,
    Q,
    T,
    W,
    _frame_decoder,
    _pixel_decoder,
    _resnet50,
    _t,
)
from test_torch_parity_e2e_san import (  # noqa: E402
    TINY_CLIP,
    _clip_block,
    _clip_embed,
    _clip_ln,
)

K = 5  # open-vocabulary class count at inference


def _cfg() -> Config:
    cfg = Config()
    m = dataclasses.replace(
        cfg.model,
        num_classes=1,  # class-agnostic training (openvis.py:35)
        meta_architecture="OpenVISOnline",
        pixel_decoder=dataclasses.replace(
            cfg.model.pixel_decoder,
            conv_dim=HID, mask_dim=HID, transformer_enc_layers=ENC_LAYERS,
            dim_feedforward=128, num_heads=NHEADS, num_points=NPOINTS,
        ),
        transformer_decoder=dataclasses.replace(
            cfg.model.transformer_decoder,
            name="frame_proposal", hidden_dim=HID, num_queries=Q,
            nheads=NHEADS, dim_feedforward=128, dec_layers=DEC_LAYERS,
            mask_dim=HID,
        ),
    )
    return dataclasses.replace(cfg, model=m)


def _randomize_norms(params, rng):
    return jax.tree_util.tree_map_with_path(
        lambda p, v: jnp.asarray(
            rng.randn(*v.shape).astype(np.float32) * 0.1 + 1.0
        ) if "norm" in "/".join(
            str(getattr(k, "key", k)) for k in p
        ).lower() else v,
        params,
    )


def test_openvis_online_forward_matches_torch_retyping():
    """Backbone -> pixel decoder -> frame decoder with the binary proposal
    head: pred_logits_all must be the Linear(hidden, 2) objectness of the
    reference (frame_...py:199-207), not an MLP."""
    cfg = _cfg()
    model = OpenVISModel(cfg.model)
    rng = np.random.RandomState(0)
    frames = rng.randn(B * T, H, W, 3).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(frames), T)
    params = _randomize_norms(variables["params"], rng)
    out = model.apply({"params": params}, jnp.asarray(frames), T)

    seg = params["segmenter"]
    with torch.no_grad():
        feats = _resnet50(seg["backbone"], frames)
        mask_features, ms = _pixel_decoder(seg["pixel_decoder"], feats)
        logits_l, masks_l, dec_out = _frame_decoder(
            seg["predictor"], ms, mask_features, head="proposal"
        )

    l1 = DEC_LAYERS + 1
    ref_logits = torch.stack(logits_l).view(l1, B, T, Q, 2).numpy()
    ref_masks = torch.stack(masks_l).view(
        l1, B, T, Q, *masks_l[0].shape[-2:]
    ).permute(0, 1, 3, 2, 4, 5).numpy()
    np.testing.assert_allclose(
        np.asarray(out["pred_logits_all"]), ref_logits, rtol=2e-3, atol=2e-3,
        err_msg="pred_logits_all (proposal head)",
    )
    np.testing.assert_allclose(
        np.asarray(out["pred_masks_all"]), ref_masks, rtol=2e-3, atol=2e-3,
        err_msg="pred_masks_all",
    )
    np.testing.assert_allclose(
        np.asarray(out["pred_embeds"]),
        dec_out.view(B, T, Q, HID).numpy(), rtol=2e-3, atol=2e-3,
        err_msg="pred_embeds",
    )


# ---------------- torch/numpy re-typing of the OV inference chain --------


def _np_square_boxes(bin_masks):
    """BitMasks.get_bounding_boxes (x1/y1 exclusive) + top-left square
    extension (adapter.py:93-99).  bin_masks: (R, H, W) bool ->
    (boxes (R, 4), valid (R,))."""
    r, h, w = bin_masks.shape
    boxes = np.zeros((r, 4), np.float32)
    valid = bin_masks.any(axis=(-1, -2))
    for i in range(r):
        if not valid[i]:
            boxes[i] = [0.0, 0.0, 1.0, 1.0]
            continue
        ys, xs = np.nonzero(bin_masks[i])
        x0, x1 = xs.min(), xs.max() + 1
        y0, y1 = ys.min(), ys.max() + 1
        side = max(x1 - x0, y1 - y0)
        boxes[i] = [x0, y0, x0 + side, y0 + side]
    return boxes, valid


def _torch_clip_encode(vp, crops_np):
    """Tiny CLIP image encode (model.py CLIPVisionTransformer.__call__):
    patch embed + blocks + ln_post(cls) @ proj.  crops_np: (R, S, S, 3)
    already CLIP-normalized."""
    heads = TINY_CLIP["vision_heads"]
    x_nchw = torch.from_numpy(crops_np.transpose(0, 3, 1, 2))
    x, _ = _clip_embed(vp, x_nchw)
    for i in range(TINY_CLIP["vision_layers"]):
        x = _clip_block(x, vp[f"resblock{i}"], heads)
    y = _clip_ln(x[:, 0], vp["ln_post"])
    return y @ _t(vp["proj"])


def test_openvis_ov_scores_match_torch_retyping():
    """openvis_ov_scores (chunked clip_crop_classify + frame-averaged
    logits + softmax) vs the transcribed reference chain
    (openvis.py:110-147, adapter.py:56-147)."""
    s = TINY_CLIP["image_size"]
    t, q, hh, ww = 3, 4, 40, 56
    rng = np.random.RandomState(7)

    vt = CLIPVisionTransformer(
        patch_size=TINY_CLIP["vision_patch"], width=TINY_CLIP["vision_width"],
        layers=TINY_CLIP["vision_layers"], heads=TINY_CLIP["vision_heads"],
        embed_dim=TINY_CLIP["embed_dim"], image_size=s,
    )
    vp = vt.init(jax.random.PRNGKey(1), jnp.zeros((1, s, s, 3)))["params"]
    vp = _randomize_norms(vp, rng)

    frames_raw = (rng.rand(t, hh, ww, 3) * 255.0).astype(np.float32)
    # blobby mask logits: mostly-negative + a positive square per (q, t);
    # one slot left all-negative to exercise the invalid path
    mask_logits = (rng.randn(q, t, hh, ww) * 0.3 - 3.0).astype(np.float32)
    for qi in range(q):
        for ti in range(t):
            if qi == 2 and ti == 1:
                continue  # invalid slot
            y0 = 3 + 5 * qi + ti
            x0 = 4 + 7 * qi
            mask_logits[qi, ti, y0:y0 + 9 + qi, x0:x0 + 6 + 2 * ti] = 2.5
    text = rng.randn(K, TINY_CLIP["embed_dim"]).astype(np.float32)
    text /= np.linalg.norm(text, axis=-1, keepdims=True)

    def visual_apply(imgs):
        return vt.apply({"params": vp}, imgs)

    scores, qvalid = jax.jit(
        lambda f, m, tx: openvis_ov_scores(
            visual_apply, f, m, tx, chunk=2, input_resolution=s
        )
    )(jnp.asarray(frames_raw), jnp.asarray(mask_logits), jnp.asarray(text))

    # ---- reference transcription ----
    probs = 1.0 / (1.0 + np.exp(-mask_logits.transpose(1, 0, 2, 3)))
    flat = probs.reshape(t * q, hh, ww)
    boxes, valid = _np_square_boxes(flat > 0.5)
    crops = np.zeros((t * q, s, s, 3), np.float32)
    mask_crops = np.zeros((t * q, s, s, 1), np.float32)
    for i in range(t * q):
        crops[i] = _np_roi_align(frames_raw[i // q], boxes[i].tolist(), s)
        mask_crops[i] = _np_roi_align(
            flat[i][..., None], boxes[i].tolist(), s
        )
    blended = crops * mask_crops  # bg -> 0 (adapter.py:115)
    mean = np.asarray(CLIP_PIXEL_MEAN, np.float32)
    std = np.asarray(CLIP_PIXEL_STD, np.float32)
    clip_in = (blended / 255.0 - mean) / std
    with torch.no_grad():
        feats = _torch_clip_encode(vp, clip_in).numpy()
    feats /= np.linalg.norm(feats, axis=-1, keepdims=True) + 1e-6
    logits = 100.0 * feats @ text.T                    # (T*Q, K)
    logits = logits.reshape(t, q, K)
    v = valid.reshape(t, q).astype(np.float32)
    ref_qvalid = v.any(axis=0) if v.dtype == bool else v.sum(axis=0) > 0
    cnt = np.maximum(v.sum(axis=0), 1.0)
    mean_logits = (logits * v[..., None]).sum(axis=0) / cnt[:, None]
    e = np.exp(mean_logits - mean_logits.max(axis=-1, keepdims=True))
    ref_scores = e / e.sum(axis=-1, keepdims=True)

    np.testing.assert_array_equal(np.asarray(qvalid), ref_qvalid > 0)
    got = np.asarray(scores)
    np.testing.assert_allclose(
        got[np.asarray(ref_qvalid > 0)], ref_scores[ref_qvalid > 0],
        rtol=2e-3, atol=2e-3, err_msg="frame-averaged OV scores",
    )
