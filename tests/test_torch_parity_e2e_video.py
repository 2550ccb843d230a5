"""Composed end-to-end golden trace #6: VideoMaskFormer forward vs a torch
re-typing of the REFERENCE pipeline — the VIDEO-mode decoder.

The five other composed traces all run frame-mode decoders; this one pins
the video decoder's distinct wiring
(``/root/reference/openvis/modeling/transformer_decoder/
video_mask2former_transformer_decoder.py:340-474``): t-major (T*hw) token
flattening, the 3D sine position encoding (spatial concat + temporal add,
``position_encoding.py:118-164``), video mask einsum over (T, H, W), and
the masked-attention bias over T*hw tokens."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from openvis_tpu.config import Config  # noqa: E402
from openvis_tpu.models.meta.video_maskformer import (  # noqa: E402
    VideoMaskFormerModel,
)

from test_torch_parity_e2e import (  # noqa: E402
    _lin,
    _ln,
    _mha,
    _mlp,
    _pixel_decoder,
    _resnet50,
)

K = 5
B, T, H, W = 1, 2, 64, 96
HID = 64
NHEADS = 4
ENC_LAYERS = 2
DEC_LAYERS = 2
Q = 8


def _cfg() -> Config:
    cfg = Config()
    m = dataclasses.replace(
        cfg.model,
        num_classes=K,
        meta_architecture="VideoMaskFormer",
        pixel_decoder=dataclasses.replace(
            cfg.model.pixel_decoder,
            conv_dim=HID, mask_dim=HID, transformer_enc_layers=ENC_LAYERS,
            dim_feedforward=128, num_heads=NHEADS,
        ),
        transformer_decoder=dataclasses.replace(
            cfg.model.transformer_decoder,
            name="video", hidden_dim=HID, num_queries=Q,
            nheads=NHEADS, dim_feedforward=128, dec_layers=DEC_LAYERS,
            mask_dim=HID,
        ),
    )
    return dataclasses.replace(cfg, model=m)


def _sine_embed_np(pos, nfeat):
    dim_t = 10000.0 ** (2 * (np.arange(nfeat) // 2) / nfeat)
    p = pos[..., None] / dim_t
    return np.stack(
        [np.sin(p[..., 0::2]), np.cos(p[..., 1::2])], -1
    ).reshape(*pos.shape, nfeat)


def _pe3d(t, h, w, hidden):
    """Reference 3D sine PE (position_encoding.py:118-164): spatial
    concat(pos_y, pos_x) of hidden//2 each, temporal pos_z (hidden) ADDED."""
    f = hidden // 2
    scale = 2 * np.pi
    z = (np.arange(t) + 1.0) / (t + 1e-6) * scale
    y = (np.arange(h) + 1.0) / (h + 1e-6) * scale
    x = (np.arange(w) + 1.0) / (w + 1e-6) * scale
    pe_z = _sine_embed_np(z, hidden)                      # (t, hidden)
    pe_y = np.broadcast_to(_sine_embed_np(y, f)[None, :, None, :], (t, h, w, f))
    pe_x = np.broadcast_to(_sine_embed_np(x, f)[None, None, :, :], (t, h, w, f))
    pe = np.concatenate([pe_y, pe_x], -1) + pe_z[:, None, None, :]
    return torch.from_numpy(pe.astype(np.float32))


def _video_attn_bias(masks, size):
    """sigmoid<0.5 + all-masked fix-up over T*hw tokens
    (video_mask2former_transformer_decoder.py:419,468)."""
    b, q, t, h, w = masks.shape
    r = F.interpolate(masks.reshape(b, q * t, h, w), size=size,
                      mode="bilinear", align_corners=False)
    flat = r.reshape(b, q, t * size[0] * size[1])
    dis = flat < 0.0
    allm = dis.all(-1, keepdim=True)
    dis = dis & ~allm
    return torch.where(dis, -1e9, 0.0)[:, None]           # (B, 1, Q, T*hw)


def test_video_maskformer_forward_matches_torch_retyping():
    cfg = _cfg()
    model = VideoMaskFormerModel(cfg.model)
    rng = np.random.RandomState(0)
    frames = rng.randn(B * T, H, W, 3).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(frames), T)
    params = jax.tree_util.tree_map_with_path(
        lambda p, v: jnp.asarray(
            rng.randn(*v.shape).astype(np.float32) * 0.1 + 1.0
        ) if "norm" in "/".join(
            str(getattr(k, "key", k)) for k in p
        ).lower() else v,
        variables["params"],
    )
    out = model.apply({"params": params}, jnp.asarray(frames), T)

    seg = params["segmenter"]
    pp = seg["predictor"]
    with torch.no_grad():
        feats = _resnet50(seg["backbone"], frames)
        mask_features, ms = _pixel_decoder(seg["pixel_decoder"], feats)
        # video mask features: (B, T, H, W, C)
        mf = mask_features.permute(0, 2, 3, 1).view(
            B, T, *mask_features.shape[-2:], HID
        )

        level_embed = torch.from_numpy(np.asarray(pp["level_embed"]))
        query_feat = torch.from_numpy(np.asarray(pp["query_feat"]))
        query_embed = torch.from_numpy(np.asarray(pp["query_embed"]))
        srcs, poses, sizes = [], [], []
        for i, f in enumerate(ms):
            n, c, hh, ww = f.shape
            sizes.append((hh, ww))
            pe = _pe3d(T, hh, ww, HID).reshape(1, T * hh * ww, HID)
            src = f.flatten(2).transpose(1, 2).reshape(B, T * hh * ww, HID)
            srcs.append(src + level_embed[i])
            poses.append(pe)
        output = query_feat[None].expand(B, -1, -1)
        qpos = query_embed[None].expand(B, -1, -1)

        def heads(output):
            xh = _ln(output, pp["heads"]["decoder_norm"])
            logits = _lin(xh, pp["heads"]["class_embed"])
            mask_embed = _mlp(xh, pp["heads"]["mask_embed"], 3)
            masks = torch.einsum("bqc,bthwc->bqthw", mask_embed, mf)
            return logits, masks

        all_logits, all_masks = [], []
        logits, masks = heads(output)
        all_logits.append(logits)
        all_masks.append(masks)
        bias = _video_attn_bias(masks, sizes[0])
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
            bias = _video_attn_bias(masks, sizes[(i + 1) % 3])

    l1 = DEC_LAYERS + 1
    ref_logits = torch.stack(all_logits).numpy()          # (L+1, B, Q, K+1)
    ref_masks = torch.stack(all_masks).numpy()            # (L+1, B, Q, T, H, W)
    np.testing.assert_allclose(
        np.asarray(out["pred_logits_all"]), ref_logits, rtol=2e-3, atol=2e-3,
        err_msg="pred_logits_all",
    )
    np.testing.assert_allclose(
        np.asarray(out["pred_masks_all"]), ref_masks, rtol=2e-3, atol=2e-3,
        err_msg="pred_masks_all",
    )
