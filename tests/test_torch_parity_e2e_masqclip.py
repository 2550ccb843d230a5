"""Composed end-to-end golden trace #4: MasQCLIP forward vs a torch
re-typing of the REFERENCE pipeline.

Pins the stage wiring of ``/root/reference/openvis/masqclip.py:100-216``:
the frozen closed-vocab segmenter (R50 -> pixel decoder -> frame decoder
with a class head), per-frame mask proposals resized to the CLIP input,
and the MasQCLIP adapter (``clip_adapter/masqclip_adapter.py:45-265``) —
mask class tokens with per-block ``new_q_proj`` attention restricted to
each instance's (max-pooled) patches while the original CLIP tokens run
frozen self-attention — ending in text-similarity logits averaged over T.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from openvis_tpu.config import Config  # noqa: E402
from openvis_tpu.models.clip.model import (  # noqa: E402
    CLIP_PIXEL_MEAN,
    CLIP_PIXEL_STD,
    _MODEL_SHAPES,
)
from openvis_tpu.models.meta.masqclip import MasQCLIPModel  # noqa: E402

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
from test_torch_parity_e2e_san import _clip_ln  # noqa: E402

K = 5
B, T, H, W = 1, 2, 64, 96
HID = 64
NHEADS = 4
ENC_LAYERS = 2
DEC_LAYERS = 2
Q = 8
TINY = _MODEL_SHAPES["test-tiny"]


def _cfg() -> Config:
    cfg = Config()
    m = dataclasses.replace(
        cfg.model,
        num_classes=K,
        meta_architecture="MasQCLIP",
        pixel_decoder=dataclasses.replace(
            cfg.model.pixel_decoder,
            conv_dim=HID, mask_dim=HID, transformer_enc_layers=ENC_LAYERS,
            dim_feedforward=128, num_heads=NHEADS,
        ),
        transformer_decoder=dataclasses.replace(
            cfg.model.transformer_decoder,
            name="frame", hidden_dim=HID, num_queries=Q,
            nheads=NHEADS, dim_feedforward=128, dec_layers=DEC_LAYERS,
            mask_dim=HID, clip_embed_dim=TINY["embed_dim"],
        ),
        clip_adapter=dataclasses.replace(
            cfg.model.clip_adapter, clip_model_name="test-tiny",
        ),
    )
    return dataclasses.replace(cfg, model=m)


def _frame_decoder_class(pp, ms, mask_features):
    """Frame decoder with the closed-vocab CLASS head
    (frame_mask2former_transformer_decoder.py:34-126 + the plain
    ``class_embed`` linear of video_...py:456-474)."""
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
    mf = mask_features.permute(0, 2, 3, 1)

    def heads(output):
        xh = _ln(output, pp["heads"]["decoder_norm"])
        logits = _lin(xh, pp["heads"]["class_embed"])
        mask_embed = _mlp(xh, pp["heads"]["mask_embed"], 3)
        masks = torch.einsum("bqc,bhwc->bqhw", mask_embed, mf)
        return logits, masks

    all_logits, all_masks = [], []
    logits, masks = heads(output)
    all_logits.append(logits)
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
        logits, masks = heads(output)
        all_logits.append(logits)
        all_masks.append(masks)
        bias = _attn_bias(masks, sizes[(i + 1) % 3])
    return all_logits, all_masks


def _masq_visual_torch(vp, clip_in, masks):
    """MasQCLIPVisual re-typing (masqclip_adapter.py:53-91,177-208).
    clip_in: (N, 3, s, s) normalized; masks: (N, Q, s, s) logits."""
    heads = TINY["vision_heads"]
    ps = TINY["vision_patch"]
    width = TINY["vision_width"]
    nb, q = masks.shape[:2]
    x = _conv(clip_in, {"kernel": vp["conv1"]["kernel"]}, stride=ps)
    _, c, gh, gw = x.shape
    x = x.flatten(2).transpose(1, 2)                      # (N, hw, C)
    cls_emb = _t(vp["class_embedding"])
    clip_tok = torch.cat(
        [cls_emb.view(1, 1, c).expand(nb, 1, c), x], dim=1
    ) + _t(vp["positional_embedding"])[None]
    mask_tok = (
        _t(vp["mask_embeddings"]) + cls_emb
    ).view(1, 1, c).expand(nb, q, c)
    tokens = torch.cat([mask_tok, clip_tok], dim=1)
    tokens = _clip_ln(tokens, vp["ln_pre"])

    # allow mask: identity-size bilinear + patch max-pool + cls always free
    m = F.max_pool2d(masks.reshape(nb * q, 1, *masks.shape[-2:]), ps, ps)
    m = m.reshape(nb, q, gh * gw)
    allow = torch.cat([torch.ones(nb, q, 1, dtype=torch.bool), m > 0.0], -1)
    bias = torch.where(allow[:, None], 0.0, -torch.inf)   # (N, 1, Q, 1+L)

    dh = width // heads
    scale = 1.0 / np.sqrt(dh)
    for i in range(TINY["vision_layers"]):
        bp = vp[f"resblock{i}"]
        y = _clip_ln(tokens, bp["ln_1"])
        ap = bp["attn"]
        ct = y[:, q:]                                     # (N, 1+L, C)
        lk = ct.shape[1]
        qq = _lin(ct, ap["q_proj"]).view(nb, lk, heads, dh)
        kk = _lin(ct, ap["k_proj"]).view(nb, lk, heads, dh)
        vv = _lin(ct, ap["v_proj"]).view(nb, lk, heads, dh)
        cl = torch.einsum("bqhd,bkhd->bhqk", qq, kk) * scale
        clip_out = torch.einsum(
            "bhqk,bkhd->bqhd", torch.softmax(cl, -1), vv
        ).reshape(nb, lk, c)
        nq = _lin(y[:, :q], ap["new_q_proj"]).view(nb, q, heads, dh)
        ml = torch.einsum("bqhd,bkhd->bhqk", nq, kk) * scale + bias
        mask_out = torch.einsum(
            "bhqk,bkhd->bqhd", torch.softmax(ml, -1), vv
        ).reshape(nb, q, c)
        out = _lin(torch.cat([mask_out, clip_out], 1), ap["out_proj"])
        tokens = tokens + out
        y = _clip_ln(tokens, bp["ln_2"])
        hmid = _lin(y, bp["mlp_c_fc"])
        hmid = hmid * torch.sigmoid(1.702 * hmid)
        tokens = tokens + _lin(hmid, bp["mlp_c_proj"])
    feats = _clip_ln(tokens[:, :q], vp["ln_post"]) @ _t(vp["proj"])
    return feats / (feats.norm(dim=-1, keepdim=True) + 1e-6)


def test_masqclip_forward_matches_torch_retyping():
    cfg = _cfg()
    model = MasQCLIPModel(cfg.model)
    rng = np.random.RandomState(0)
    frames = rng.randn(B * T, H, W, 3).astype(np.float32)
    text = rng.randn(K + 1, TINY["embed_dim"]).astype(np.float32)
    text /= np.linalg.norm(text, axis=-1, keepdims=True)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(frames), T, jnp.asarray(text)
    )
    # randomize norm affines (init 1/0 hides order bugs)
    params = jax.tree_util.tree_map_with_path(
        lambda p, v: jnp.asarray(
            rng.randn(*v.shape).astype(np.float32) * 0.1 + 1.0
        ) if "norm" in "/".join(
            str(getattr(k, "key", k)) for k in p
        ).lower() else v,
        variables["params"],
    )
    out = model.apply({"params": params}, jnp.asarray(frames), T,
                      jnp.asarray(text))

    seg = params["segmenter"]
    vp = params["clip_adapter"]
    with torch.no_grad():
        feats = _resnet50(seg["backbone"], frames)
        mask_features, ms = _pixel_decoder(seg["pixel_decoder"], feats)
        all_logits, all_masks = _frame_decoder_class(
            seg["predictor"], ms, mask_features
        )

        # CLIP input + proposals at CLIP resolution (masqclip.py:177-186)
        mean = torch.tensor(np.asarray(cfg.model.pixel_mean, np.float32))
        std = torch.tensor(np.asarray(cfg.model.pixel_std, np.float32))
        raw = torch.from_numpy(frames) * std + mean
        s = TINY["image_size"]
        clip_in = F.interpolate(raw.permute(0, 3, 1, 2) / 255.0, (s, s),
                                mode="bicubic")
        cmean = torch.tensor(CLIP_PIXEL_MEAN).view(1, 3, 1, 1)
        cstd = torch.tensor(CLIP_PIXEL_STD).view(1, 3, 1, 1)
        clip_in = (clip_in - cmean) / cstd
        masks = all_masks[-1]                             # (B*T, Q, h, w)
        m = F.interpolate(masks, (s, s), mode="bilinear",
                          align_corners=False)
        feats_q = _masq_visual_torch(vp, clip_in, m)      # (B*T, Q, D)
        logits = 100.0 * feats_q @ torch.from_numpy(text).T
        clip_logits = logits.view(B, T, Q, K + 1).mean(dim=1)
        base_logits = all_logits[-1].view(B, T, Q, K + 1)

    ref_masks = torch.stack(all_masks).view(
        DEC_LAYERS + 1, B, T, Q, *all_masks[0].shape[-2:]
    ).permute(0, 1, 3, 2, 4, 5).numpy()
    np.testing.assert_allclose(
        np.asarray(out["pred_masks_all"]), ref_masks, rtol=2e-3, atol=2e-3,
        err_msg="pred_masks_all",
    )
    np.testing.assert_allclose(
        np.asarray(out["base_logits"]), base_logits.numpy(),
        rtol=2e-3, atol=2e-3, err_msg="base_logits",
    )
    np.testing.assert_allclose(
        np.asarray(out["clip_logits"]), clip_logits.numpy(),
        rtol=2e-3, atol=2e-3, err_msg="clip_logits",
    )
