"""Composed end-to-end golden trace #2: SANOnline forward vs a torch
re-typing of the REFERENCE pipeline.

Covers the inter-module wiring the SimpleBSL trace cannot: the frozen-CLIP
front/post split with tapped features merged into the pixel decoder
(``/root/reference/openvis/san.py:84-147`` +
``clip_adapter/side_adapter.py:147-209``), the side-adapter decoder's
attention-bias heads
(``side_adapter_frame_mask2former_transformer_decoder.py:48-169``), the
bias assembly into the post-CLIP blocks (``_build_attn_biases``,
``side_adapter.py:237-270``), and the sos-token classification logits.

Runs on a TINY CLIP shape injected into ``_MODEL_SHAPES`` so the whole
trace stays CPU-cheap; all torch primitives (bicubic/bilinear interpolate,
adaptive_max_pool2d) are the real reference ops — our resize kernels must
match them exactly (utils/image.py, tests/test_image.py).

The torch re-typings are module-level functions so the BriVIS composed
trace (test_torch_parity_e2e_brivis.py) reuses the whole SAN stage 1.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from openvis_tpu.config import Config  # noqa: E402
from openvis_tpu.models.clip import model as clip_model  # noqa: E402
from openvis_tpu.models.clip.model import (  # noqa: E402
    CLIP_PIXEL_MEAN,
    CLIP_PIXEL_STD,
)
from openvis_tpu.models.meta.san import SANModel  # noqa: E402

from test_torch_parity_e2e import (  # noqa: E402
    _attn_bias,
    _conv,
    _lin,
    _ln,
    _mha,
    _mlp,
    _pe2d,
    _pixel_decoder,
    _resnet50,
    _t,
)

K = 5
B, T, H, W = 1, 2, 64, 96
HID = 64
NHEADS = 4
NPOINTS = 4
ENC_LAYERS = 2
DEC_LAYERS = 2
Q = 8

TINY_CLIP = dict(
    embed_dim=32, vision_patch=8, vision_width=64, vision_layers=4,
    vision_heads=4, image_size=32, text_width=32, text_heads=4,
    text_layers=2,
)
BROKEN = 3
MERGE = (1, 2, 3)


def san_cfg() -> Config:
    cfg = Config()
    m = dataclasses.replace(
        cfg.model,
        num_classes=K,
        meta_architecture="SANOnline",
        pixel_decoder=dataclasses.replace(
            cfg.model.pixel_decoder,
            conv_dim=HID, mask_dim=HID, transformer_enc_layers=ENC_LAYERS,
            dim_feedforward=128, num_heads=NHEADS, num_points=NPOINTS,
        ),
        transformer_decoder=dataclasses.replace(
            cfg.model.transformer_decoder,
            name="side_adapter_frame", hidden_dim=HID, num_queries=Q,
            nheads=NHEADS, dim_feedforward=128, dec_layers=DEC_LAYERS,
            mask_dim=HID, clip_embed_dim=TINY_CLIP["embed_dim"],
        ),
        clip_adapter=dataclasses.replace(
            cfg.model.clip_adapter,
            name="side", clip_model_name="TINY/8",
            clip_num_heads=TINY_CLIP["vision_heads"],
            merge_ids=MERGE, broken_id=BROKEN,
        ),
    )
    return dataclasses.replace(cfg, model=m)


# ---------------- torch re-typing of the tiny CLIP visual tower ----------


def _clip_ln(x, p):
    # LayerNormF32 wraps an inner LayerNorm named "ln"; CLIP eps is 1e-5
    # (model.py LayerNormF32), not the flax-default 1e-6 of _ln
    q = p["ln"]
    mu = x.mean(-1, keepdim=True)
    var = x.var(-1, unbiased=False, keepdim=True)
    return (x - mu) / torch.sqrt(var + 1e-5) * _t(q["scale"]) + _t(q["bias"])


def _clip_attn(x, p, heads, bias=None):
    b, l, c = x.shape
    dh = c // heads
    q = _lin(x, p["q_proj"]).view(b, l, heads, dh)
    k = _lin(x, p["k_proj"]).view(b, l, heads, dh)
    v = _lin(x, p["v_proj"]).view(b, l, heads, dh)
    logits = torch.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(dh)
    if bias is not None:
        logits = logits + bias
    attn = torch.softmax(logits, dim=-1)
    out = torch.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, l, c)
    return _lin(out, p["out_proj"])


def _clip_block(x, p, heads, bias=None):
    x = x + _clip_attn(_clip_ln(x, p["ln_1"]), p["attn"], heads, bias)
    y = _clip_ln(x, p["ln_2"])
    h = _lin(y, p["mlp_c_fc"])
    h = h * torch.sigmoid(1.702 * h)                      # QuickGELU
    return x + _lin(h, p["mlp_c_proj"])


def _clip_preprocess(frames_raw):
    s = TINY_CLIP["image_size"]
    x = F.interpolate(frames_raw.permute(0, 3, 1, 2) / 255.0, (s, s),
                      mode="bicubic")
    mean = torch.tensor(CLIP_PIXEL_MEAN).view(1, 3, 1, 1)
    std = torch.tensor(CLIP_PIXEL_STD).view(1, 3, 1, 1)
    return (x - mean) / std                               # NCHW


def _clip_embed(vp, x_nchw):
    """conv1 + cls + pos + ln_pre (side_adapter.py:152-162)."""
    x = _conv(x_nchw, {"kernel": vp["conv1"]["kernel"]},
              stride=TINY_CLIP["vision_patch"])
    n, c, h, w = x.shape
    x = x.flatten(2).transpose(1, 2)                      # (N, hw, C)
    cls = _t(vp["class_embedding"]).view(1, 1, c).expand(n, 1, c)
    x = torch.cat([cls, x], dim=1)
    x = x + _t(vp["positional_embedding"])[None]          # native grid
    return _clip_ln(x, vp["ln_pre"]), (h, w)


# ---------------- reusable SAN stage-1 torch re-typings ------------------


def san_front_torch(ca, frames_np, pixel_mean, pixel_std):
    """Raw frames + CLIP front blocks with taps + 1x1 projections
    (san.py:212-219 + side_adapter.py:147-174).
    -> (bk_tokens, (gh, gw), extra feats NCHW top-down)."""
    vp = ca["visual"]
    heads = TINY_CLIP["vision_heads"]
    mean = torch.tensor(np.asarray(pixel_mean, np.float32))
    std = torch.tensor(np.asarray(pixel_std, np.float32))
    frames_raw = torch.from_numpy(frames_np) * std + mean
    x, (gh, gw) = _clip_embed(vp, _clip_preprocess(frames_raw))
    tapped = {}
    for i in range(BROKEN):
        x = _clip_block(x, vp[f"resblock{i}"], heads)
        if (i + 1) in MERGE:
            tapped[i + 1] = x
    mg = []
    for i, mid in enumerate(MERGE):
        f = tapped[mid][:, 1:].view(frames_np.shape[0], gh, gw, -1)
        f = _lin(f, {"kernel": ca[f"attn_proj{i}"]["kernel"][0, 0],
                     "bias": ca[f"attn_proj{i}"]["bias"]})
        mg.append(f.permute(0, 3, 1, 2))
    return x, (gh, gw), mg[::-1]


def side_decoder_torch(pp, ms, mask_features):
    """Side-adapter frame decoder
    (side_adapter_frame_mask2former_transformer_decoder.py:48-169).
    -> (all_biases (each (N, nH, Q, h4, w4)), all_masks, dec_out, af)."""
    heads = TINY_CLIP["vision_heads"]
    level_embed = _t(pp["level_embed"])
    query_feat = _t(pp["query_feat"])
    query_embed = _t(pp["query_embed"])
    srcs, poses, sizes = [], [], []
    for i, f in enumerate(ms):
        n, c, hh, ww = f.shape
        sizes.append((hh, ww))
        pe = _pe2d(hh, ww, c // 2).reshape(hh * ww, c)
        srcs.append(f.flatten(2).transpose(1, 2) + level_embed[i])
        poses.append(pe[None])
    n = ms[0].shape[0]
    output = query_feat[None].expand(n, -1, -1)
    qpos = query_embed[None].expand(n, -1, -1)
    mf_nhwc = mask_features.permute(0, 2, 3, 1)

    # attn features: 0.25x mask features -> 3-layer 1x1-conv MLP
    af = F.interpolate(mask_features,
                       size=(mask_features.shape[-2] // 4,
                             mask_features.shape[-1] // 4),
                       mode="bilinear", align_corners=False)
    af = af.permute(0, 2, 3, 1)
    for li, act in (("attn_mlp0", True), ("attn_mlp1", True),
                    ("attn_mlp2", False)):
        af = _lin(af, {"kernel": pp[li]["kernel"][0, 0],
                       "bias": pp[li]["bias"]})
        if act:
            af = F.relu(af)
    h4, w4 = af.shape[1:3]
    af = af.view(n, h4, w4, heads, HID).permute(0, 3, 1, 2, 4)

    def dec_heads(output):
        xh = _ln(output, pp["heads"]["decoder_norm"])
        attn_embed = _mlp(xh, pp["heads"]["attn_embed"], 3)
        biases = torch.einsum("bqc,bnhwc->bnqhw", attn_embed, af)
        mask_embed = _mlp(xh, pp["heads"]["mask_embed"], 3)
        masks = torch.einsum("bqc,bhwc->bqhw", mask_embed, mf_nhwc)
        return biases, masks, xh

    all_biases, all_masks = [], []
    biases, masks, dec_out = dec_heads(output)
    all_biases.append(biases)
    all_masks.append(masks)
    bias = _attn_bias(masks, sizes[0])
    for i in range(DEC_LAYERS):
        lvl = i % 3
        cp = pp[f"cross_attn{i}"]
        o = _mha(output + qpos, srcs[lvl] + poses[lvl], srcs[lvl],
                 cp["multihead_attn"], NHEADS, bias)
        output = _ln(output + o, cp["norm"])
        sp = pp[f"self_attn{i}"]
        o = _mha(output + qpos, output + qpos, output,
                 sp["self_attn"], NHEADS)
        output = _ln(output + o, sp["norm"])
        fp = pp[f"ffn{i}"]
        ff = _lin(F.relu(_lin(output, fp["linear1"])), fp["linear2"])
        output = _ln(output + ff, fp["norm"])
        biases, masks, dec_out = dec_heads(output)
        all_biases.append(biases)
        all_masks.append(masks)
        bias = _attn_bias(masks, sizes[(i + 1) % 3])
    return all_biases, all_masks, dec_out, af


def san_post_logits_torch(ca, bk_tokens, biases, text_full, grid_hw):
    """Bias assembly + biased post blocks + sos classification
    (side_adapter.py:176-270 + :234).  biases: (N, nH, Q, h', w')."""
    vp = ca["visual"]
    heads = TINY_CLIP["vision_heads"]
    gh, gw = grid_hw
    L = gh * gw
    lscale = float(np.exp(np.asarray(ca["logit_scale"])))
    nb, nH, q_, hb, wb = biases.shape
    ab = F.adaptive_max_pool2d(
        biases.reshape(nb * nH * q_, 1, hb, wb), (gh, gw)
    ).reshape(nb, nH, q_, L)
    S = q_ + 1 + L
    base = torch.zeros(S, S)
    base[:, :q_] = -100.0
    base[torch.arange(q_), torch.arange(q_)] = 0.0
    base[:q_, q_] = -100.0
    full = base.expand(nb, nH, S, S).clone()
    full[:, :, :q_, q_ + 1:] = ab
    sos = bk_tokens[:, :1].expand(nb, q_, -1)
    xt = torch.cat([sos, bk_tokens], dim=1)
    for i in range(BROKEN, TINY_CLIP["vision_layers"]):
        xt = _clip_block(xt, vp[f"resblock{i}"], heads, full)
    sos_out = _clip_ln(xt[:, :q_], vp["ln_post"]) @ _t(vp["proj"])
    sos_out = sos_out / (sos_out.norm(dim=-1, keepdim=True) + 1e-6)
    return lscale * sos_out @ text_full.T


def text_with_bg_torch(ca, text_np):
    bg = _t(ca["bg_embed"])
    bg = bg / (bg.norm(dim=-1, keepdim=True) + 1e-6)
    return torch.cat([torch.from_numpy(text_np), bg], dim=0)


def randomize_norm_affines(params, rng):
    """Replace 1/0 norm affines with random values (init hides order bugs)."""
    return jax.tree_util.tree_map_with_path(
        lambda p, v: jnp.asarray(
            rng.randn(*v.shape).astype(np.float32) * 0.1 + 1.0
        ) if "norm" in "/".join(
            str(getattr(k, "key", k)) for k in p
        ).lower() else v,
        params,
    )


def test_san_online_forward_matches_torch_retyping(monkeypatch):
    monkeypatch.setitem(clip_model._MODEL_SHAPES, "TINY/8", TINY_CLIP)
    cfg = san_cfg()
    model = SANModel(cfg.model)
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
    with torch.no_grad():
        bk_tokens, grid, extra = san_front_torch(
            ca, frames, cfg.model.pixel_mean, cfg.model.pixel_std
        )
        feats = _resnet50(seg["backbone"], frames)
        mask_features, ms = _pixel_decoder(seg["pixel_decoder"], feats, extra)
        all_biases, all_masks, _, _ = side_decoder_torch(
            seg["predictor"], ms, mask_features
        )
        text_full = text_with_bg_torch(ca, text)
        logits_layers = [
            san_post_logits_torch(ca, bk_tokens, biases, text_full, grid)
            for biases in all_biases
        ]

    l1 = DEC_LAYERS + 1
    ref_logits = torch.stack(logits_layers).view(l1, B, T, Q, K + 1).numpy()
    ref_masks = torch.stack(all_masks).view(
        l1, B, T, Q, *all_masks[0].shape[-2:]
    ).permute(0, 1, 3, 2, 4, 5).numpy()
    np.testing.assert_allclose(
        np.asarray(out["pred_logits_all"]), ref_logits, rtol=2e-3, atol=2e-3,
        err_msg="pred_logits_all",
    )
    np.testing.assert_allclose(
        np.asarray(out["pred_masks_all"]), ref_masks, rtol=2e-3, atol=2e-3,
        err_msg="pred_masks_all",
    )
