"""Composed end-to-end golden trace: SimpleBSLOnline forward vs a torch
re-typing of the REFERENCE pipeline.

Per-module parity (tests/test_torch_parity.py) cannot catch inter-module
wiring bugs: feature ordering into the predictor
(``/root/reference/openvis/modeling/mask_former_head.py:119-135``),
pixel-decoder input order + offset normalizer + FPN tail
(``pixel_decoder/msdeformattn.py:280-380``), the decoder's level
round-robin/attn-mask schedule
(``transformer_decoder/frame_mask2former_transformer_decoder.py:34-123``),
or the text-similarity logit scale (``simplebsl.py:49-69`` +
``clip_adapter/adapter.py:154-170``).  This test re-types the reference's
control flow in torch — grid_sample MSDA oracle included
(``pixel_decoder/ops/functions/ms_deform_attn_func.py:52-72``) — binds OUR
init params into it, and compares the full forward on one fixed input.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from openvis_tpu.config import Config  # noqa: E402
from openvis_tpu.models.meta.simple_baseline import SimpleBaselineModel  # noqa: E402

K, D = 5, 32
B, T, H, W = 1, 2, 64, 96
HID = 64
NHEADS = 4
NPOINTS = 4
ENC_LAYERS = 2
DEC_LAYERS = 2
Q = 8
EPS = 1e-6  # flax LayerNorm/GroupNorm default


def _cfg() -> Config:
    cfg = Config()
    m = dataclasses.replace(
        cfg.model,
        num_classes=K,
        pixel_decoder=dataclasses.replace(
            cfg.model.pixel_decoder,
            conv_dim=HID, mask_dim=HID, transformer_enc_layers=ENC_LAYERS,
            dim_feedforward=128, num_heads=NHEADS, num_points=NPOINTS,
        ),
        transformer_decoder=dataclasses.replace(
            cfg.model.transformer_decoder,
            name="frame_embedding", hidden_dim=HID, num_queries=Q,
            nheads=NHEADS, dim_feedforward=128, dec_layers=DEC_LAYERS,
            mask_dim=HID, clip_embed_dim=D,
        ),
    )
    return dataclasses.replace(cfg, model=m)


def _t(x):
    return torch.from_numpy(np.asarray(x))


def _lin(x, p):
    return x @ _t(p["kernel"]) + _t(p["bias"])


def _ln(x, p):
    mu = x.mean(-1, keepdim=True)
    var = x.var(-1, unbiased=False, keepdim=True)
    return (x - mu) / torch.sqrt(var + EPS) * _t(p["scale"]) + _t(p["bias"])


def _gn(x, p, groups=32):  # x NCHW
    return F.group_norm(x, groups, _t(p["scale"]), _t(p["bias"]), eps=EPS)


def _conv(x, p, stride=1, pad=0):  # x NCHW, kernel HWIO
    w = _t(np.asarray(p["kernel"]).transpose(3, 2, 0, 1))
    b = _t(p["bias"]) if "bias" in p else None
    return F.conv2d(x, w, b, stride=stride, padding=pad)


def _mha(q, k, v, p, nheads, bias=None):
    """torch re-typing of nn.MultiheadAttention with explicit projections
    (video_mask2former_transformer_decoder.py uses nn.MultiheadAttention;
    per-layer equivalence vs the real torch module is pinned in
    test_torch_parity.test_decoder_layer_matches_torch)."""
    b, lq, d = q.shape
    lk = k.shape[1]
    dh = d // nheads
    qp = _lin(q, p["q_proj"]).view(b, lq, nheads, dh)
    kp = _lin(k, p["k_proj"]).view(b, lk, nheads, dh)
    vp = _lin(v, p["v_proj"]).view(b, lk, nheads, dh)
    logits = torch.einsum("bqhd,bkhd->bhqk", qp, kp) / np.sqrt(dh)
    if bias is not None:
        logits = logits + bias
    attn = torch.softmax(logits, dim=-1)
    out = torch.einsum("bhqk,bkhd->bqhd", attn, vp).reshape(b, lq, d)
    return _lin(out, p["out_proj"])


def _mlp(x, p, n):
    for i in range(n - 1):
        x = F.relu(_lin(x, p[f"layer{i}"]))
    return _lin(x, p[f"layer{n - 1}"])


def _pe2d(h, w, feats):
    """Reference sine PE, cumsum-over-valid-mask form
    (position_encoding.py:61-116)."""
    not_mask = np.ones((h, w), np.float32)
    y_embed = not_mask.cumsum(0)
    x_embed = not_mask.cumsum(1)
    scale = 2 * np.pi
    y_embed = y_embed / (y_embed[-1:, :] + 1e-6) * scale
    x_embed = x_embed / (x_embed[:, -1:] + 1e-6) * scale
    dim_t = 10000.0 ** (2 * (np.arange(feats) // 2) / feats)
    px = x_embed[..., None] / dim_t
    py = y_embed[..., None] / dim_t
    px = np.stack([np.sin(px[..., 0::2]), np.cos(px[..., 1::2])], -1
                  ).reshape(h, w, feats)
    py = np.stack([np.sin(py[..., 0::2]), np.cos(py[..., 1::2])], -1
                  ).reshape(h, w, feats)
    return _t(np.concatenate([py, px], axis=-1).astype(np.float32))


def _resnet50(params, x_nhwc):
    """d2 R50 trunk (stride_in_1x1=False), as proven in
    test_torch_parity.test_resnet50_matches_torch_retyping."""
    from openvis_tpu.models.backbone.resnet import _STAGE_BLOCKS

    def aff(y, p):
        s = _t(p["scale"])[None, :, None, None]
        b = _t(p["bias"])[None, :, None, None]
        return y * s + b

    y = _t(np.asarray(x_nhwc).transpose(0, 3, 1, 2))
    y = F.relu(aff(_conv(y, params["stem_conv1"], 2, 3), params["stem_norm1"]))
    y = F.max_pool2d(y, 3, stride=2, padding=1)
    feats = {}
    for si, nb in enumerate(_STAGE_BLOCKS[50]):
        name = f"res{si + 2}"
        for bi in range(nb):
            p = params[f"{name}_block{bi}"]
            stride = 2 if (bi == 0 and si > 0) else 1
            short = y
            if bi == 0:
                short = aff(_conv(y, p["shortcut_conv"], stride),
                            p["shortcut_norm"])
            z = F.relu(aff(_conv(y, p["conv1"], 1), p["norm1"]))
            z = F.relu(aff(_conv(z, p["conv2"], stride, 1), p["norm2"]))
            z = aff(_conv(z, p["conv3"], 1), p["norm3"])
            y = F.relu(z + short)
        feats[name] = y
    return feats


def _msda_grid_sample(value, shapes, loc, attn):
    """Reference CUDA-op oracle via grid_sample
    (ms_deform_attn_func.py:52-72): zero padding, align_corners=False."""
    b, _, nh, ch = value.shape
    lq, p = loc.shape[1], loc.shape[-2]
    out = torch.zeros(b * nh, ch, lq)
    start = 0
    for lvl, (h, w) in enumerate(shapes):
        v = value[:, start : start + h * w]              # (B, hw, nh, ch)
        start += h * w
        v = v.permute(0, 2, 3, 1).reshape(b * nh, ch, h, w)
        grid = loc[:, :, :, lvl] * 2 - 1                 # (B, Lq, nh, P, 2)
        grid = grid.permute(0, 2, 1, 3, 4).reshape(b * nh, lq, p, 2)
        sampled = F.grid_sample(
            v, grid, mode="bilinear", padding_mode="zeros",
            align_corners=False,
        )                                                # (B*nh, ch, Lq, P)
        a = attn[:, :, :, lvl].permute(0, 2, 1, 3).reshape(b * nh, 1, lq, p)
        out = out + (sampled * a).sum(-1)
    # (B*nh, ch, Lq) -> (B, Lq, nh*ch) head-major
    return out.reshape(b, nh, ch, lq).permute(0, 3, 1, 2).reshape(
        b, lq, nh * ch
    )


def _pixel_decoder(params, feats, extra=None):
    """MSDeformAttnPixelDecoder forward, re-typed from
    msdeformattn.py:280-380 (top-down input projs + level_embed, deformable
    encoder, FPN tail to stride 4).  ``extra``: optional per-level NCHW maps
    (SAN's CLIP taps, top-down order) added onto the projected inputs after
    a bilinear resize (msdeformattn.py:338-344)."""
    level_embed = _t(params["level_embed"])
    srcs, poses, shapes = [], [], []
    for idx, f in enumerate(["res5", "res4", "res3"]):
        x = feats[f]
        s = _gn(_conv(x, params[f"input_proj{idx}_conv"]),
                params[f"input_proj{idx}_norm"])
        n, c, h, w = s.shape
        if extra is not None:
            ex = extra[idx]
            if ex.shape[-2:] != (h, w):
                ex = F.interpolate(ex, size=(h, w), mode="bilinear",
                                   align_corners=False)
            s = s + ex
        pe = _pe2d(h, w, c // 2).reshape(h * w, c)
        srcs.append(s.flatten(2).transpose(1, 2))        # (N, hw, C)
        poses.append(pe[None] + level_embed[idx])
        shapes.append((h, w))
    src = torch.cat(srcs, dim=1)
    pos = torch.cat(poses, dim=1)

    # encoder reference points: per-token center, broadcast across levels
    pts = []
    for (h, w) in shapes:
        ys = (np.arange(h) + 0.5) / h
        xs = (np.arange(w) + 0.5) / w
        yy, xx = np.meshgrid(ys, xs, indexing="ij")
        pts.append(np.stack([xx.ravel(), yy.ravel()], -1))
    ref = _t(np.concatenate(pts, 0).astype(np.float32))  # (L, 2)
    normalizer = _t(np.asarray(
        [[w, h] for (h, w) in shapes], np.float32
    ))

    enc = params["encoder"]
    nl = len(shapes)
    for li in range(ENC_LAYERS):
        lp = enc[f"layer{li}"]
        ap = lp["self_attn"]
        query = src + pos
        b, lq, c = query.shape
        ch = c // NHEADS
        value = _lin(src, ap["value_proj"]).view(b, lq, NHEADS, ch)
        offsets = _lin(query, ap["sampling_offsets"]).view(
            b, lq, NHEADS, nl, NPOINTS, 2
        )
        attn = _lin(query, ap["attention_weights"]).view(
            b, lq, NHEADS, nl * NPOINTS
        )
        attn = torch.softmax(attn, dim=-1).view(b, lq, NHEADS, nl, NPOINTS)
        loc = ref[None, :, None, None, None, :] + offsets / normalizer[
            None, None, None, :, None, :
        ]
        out = _msda_grid_sample(value, shapes, loc, attn)
        out = _lin(out, ap["output_proj"])
        src = _ln(src + out, lp["norm1"])
        ff = _lin(F.relu(_lin(src, lp["linear1"])), lp["linear2"])
        src = _ln(src + ff, lp["norm2"])

    outs = []
    start = 0
    for (h, w) in shapes:
        outs.append(
            src[:, start : start + h * w].transpose(1, 2).reshape(-1, HID, h, w)
        )
        start += h * w

    for idx, f in enumerate(["res2"]):
        x = feats[f]
        lat = _gn(_conv(x, params[f"adapter{idx}_conv"]),
                  params[f"adapter{idx}_norm"])
        topdown = F.interpolate(outs[-1], size=x.shape[-2:], mode="bilinear",
                                align_corners=False)
        z = _conv(lat + topdown, params[f"layer{idx}_conv"], 1, 1)
        outs.append(F.relu(_gn(z, params[f"layer{idx}_norm"])))
    mask_features = _conv(outs[-1], params["mask_features"])
    return mask_features, outs[:3]


def _heads(params, output, mask_features_nhwc, head="embedding"):
    hp = params["heads"]
    x = _ln(output, hp["decoder_norm"])
    if head == "embedding":
        embeds = _mlp(x, hp["class_embed"], 2)
    else:  # "proposal": Linear(hidden, 2) objectness (frame_...py:199-207)
        embeds = _lin(x, hp["class_embed"])
    mask_embed = _mlp(x, hp["mask_embed"], 3)
    masks = torch.einsum("bqc,bhwc->bqhw", mask_embed, mask_features_nhwc)
    return embeds, masks, x


def _attn_bias(masks, size):
    """sigmoid<0.5 disallowed + all-masked fix-up (video_...py:419,468);
    our additive-bias form uses NEG_INF=-1e9."""
    r = F.interpolate(masks, size=size, mode="bilinear", align_corners=False)
    flat = r.flatten(2)
    dis = flat < 0.0
    allm = dis.all(-1, keepdim=True)
    dis = dis & ~allm
    return torch.where(dis, -1e9, 0.0)[:, None]          # (N, 1, Q, HW)


def _frame_decoder(params, ms_feats, mask_features, head="embedding"):
    """FrameMultiScaleMaskedTransformerDecoder (frame_...py:34-126): heads
    before layer 0 + after each layer, level round-robin i%3."""
    level_embed = _t(params["level_embed"])
    query_feat = _t(params["query_feat"])
    query_embed = _t(params["query_embed"])

    srcs, poses, sizes = [], [], []
    for i, f in enumerate(ms_feats):
        n, c, h, w = f.shape
        sizes.append((h, w))
        pe = _pe2d(h, w, c // 2).reshape(h * w, c)
        srcs.append(f.flatten(2).transpose(1, 2) + level_embed[i])
        poses.append(pe[None])
    n = ms_feats[0].shape[0]
    output = query_feat[None].expand(n, -1, -1)
    qpos = query_embed[None].expand(n, -1, -1)
    mf = mask_features.permute(0, 2, 3, 1)               # NHWC

    all_embeds, all_masks = [], []
    embeds, masks, _ = _heads(params, output, mf, head)
    all_embeds.append(embeds)
    all_masks.append(masks)
    bias = _attn_bias(masks, sizes[0])

    for i in range(DEC_LAYERS):
        lvl = i % 3
        cp = params[f"cross_attn{i}"]
        out = _mha(output + qpos, srcs[lvl] + poses[lvl], srcs[lvl],
                   cp["multihead_attn"], NHEADS, bias)
        output = _ln(output + out, cp["norm"])
        sp = params[f"self_attn{i}"]
        out = _mha(output + qpos, output + qpos, output,
                   sp["self_attn"], NHEADS)
        output = _ln(output + out, sp["norm"])
        fp = params[f"ffn{i}"]
        ff = _lin(F.relu(_lin(output, fp["linear1"])), fp["linear2"])
        output = _ln(output + ff, fp["norm"])
        embeds, masks, dec_out = _heads(params, output, mf, head)
        all_embeds.append(embeds)
        all_masks.append(masks)
        bias = _attn_bias(masks, sizes[(i + 1) % 3])

    return all_embeds, all_masks, dec_out


def test_simplebsl_online_forward_matches_torch_retyping():
    cfg = _cfg()
    model = SimpleBaselineModel(cfg.model)
    rng = np.random.RandomState(0)
    frames = rng.randn(B * T, H, W, 3).astype(np.float32)
    text = rng.randn(K, D).astype(np.float32)
    text /= np.linalg.norm(text, axis=-1, keepdims=True)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(frames), T, jnp.asarray(text)
    )
    params = variables["params"]
    # randomize norm affines (init 1/0 hides order bugs)
    params = jax.tree_util.tree_map_with_path(
        lambda p, v: jnp.asarray(
            rng.randn(*v.shape).astype(np.float32) * 0.1 + 1.0
        ) if "norm" in "/".join(
            str(getattr(k, "key", k)) for k in p
        ).lower() else v,
        params,
    )
    out = model.apply({"params": params}, jnp.asarray(frames), T,
                      jnp.asarray(text))

    seg = params["segmenter"]
    with torch.no_grad():
        feats = _resnet50(seg["backbone"], frames)
        mask_features, ms = _pixel_decoder(seg["pixel_decoder"], feats)
        embeds_l, masks_l, dec_out = _frame_decoder(
            seg["predictor"], ms, mask_features
        )
        # SimpleBSL text-similarity logits (simplebsl.py:49-69 +
        # BgClipAdapter.cal_sim_logits temperature 100, adapter.py:154-170)
        bg = _t(params["non_object_embedding"])
        bg = bg / (bg.norm(dim=-1, keepdim=True) + 1e-6)
        text_full = torch.cat([_t(text), bg], dim=0)     # (K+1, D)
        logits_l = []
        for e in embeds_l:
            en = e / (e.norm(dim=-1, keepdim=True) + 1e-6)
            logits_l.append(100.0 * en @ text_full.T)

    # ---- compare (frame outputs reshaped (b t) -> b, t) ----
    l1 = DEC_LAYERS + 1
    ref_logits = torch.stack(logits_l).view(l1, B, T, Q, K + 1).numpy()
    ref_masks = torch.stack(masks_l).view(
        l1, B, T, Q, *masks_l[0].shape[-2:]
    ).permute(0, 1, 3, 2, 4, 5).numpy()
    np.testing.assert_allclose(
        np.asarray(out["pred_logits_all"]), ref_logits, rtol=2e-3, atol=2e-3,
        err_msg="pred_logits_all",
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
