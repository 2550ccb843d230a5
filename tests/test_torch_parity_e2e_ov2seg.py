"""Composed end-to-end golden trace #5: OV2Seg forward vs a torch
re-typing of the REFERENCE pipeline.

Pins the wiring of ``/root/reference/openvis/ov2seg.py:489-713``: the
frame decoder with the TWO-headed prediction (zero-shot classifier MLP
hidden -> D/2 -> D plus a 2-way objectness head), the zero-background-row
text classifier ``50 * normalize(e) @ [text; 0].T`` (``:489-529``), and
the packed-logits split in the meta-arch.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from openvis_tpu.config import Config  # noqa: E402
from openvis_tpu.models.meta.ov2seg import OV2SegModel  # noqa: E402

from test_torch_parity_e2e import (  # noqa: E402
    _attn_bias,
    _lin,
    _ln,
    _mha,
    _mlp,
    _pe2d,
    _pixel_decoder,
    _resnet50,
)

K, D = 5, 32
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
        meta_architecture="OV2Seg",
        pixel_decoder=dataclasses.replace(
            cfg.model.pixel_decoder,
            conv_dim=HID, mask_dim=HID, transformer_enc_layers=ENC_LAYERS,
            dim_feedforward=128, num_heads=NHEADS,
        ),
        transformer_decoder=dataclasses.replace(
            cfg.model.transformer_decoder,
            name="ov2seg_frame", hidden_dim=HID, num_queries=Q,
            nheads=NHEADS, dim_feedforward=128, dec_layers=DEC_LAYERS,
            mask_dim=HID, clip_embed_dim=D,
        ),
    )
    return dataclasses.replace(cfg, model=m)


def test_ov2seg_forward_matches_torch_retyping():
    cfg = _cfg()
    model = OV2SegModel(cfg.model)
    rng = np.random.RandomState(0)
    frames = rng.randn(B * T, H, W, 3).astype(np.float32)
    text = rng.randn(K, D).astype(np.float32)
    text /= np.linalg.norm(text, axis=-1, keepdims=True)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(frames), T, jnp.asarray(text)
    )
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
    pp = seg["predictor"]
    with torch.no_grad():
        feats = _resnet50(seg["backbone"], frames)
        mask_features, ms = _pixel_decoder(seg["pixel_decoder"], feats)

        level_embed = torch.from_numpy(np.asarray(pp["level_embed"]))
        query_feat = torch.from_numpy(np.asarray(pp["query_feat"]))
        query_embed = torch.from_numpy(np.asarray(pp["query_embed"]))
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
            # zero-shot classifier MLP D/2 -> D + 2-way objectness
            e = _lin(F.relu(_lin(xh, pp["heads"]["zs_fc1"])),
                     pp["heads"]["zs_fc2"])
            obj = _lin(xh, pp["heads"]["object_embed"])
            mask_embed = _mlp(xh, pp["heads"]["mask_embed"], 3)
            masks = torch.einsum("bqc,bhwc->bqhw", mask_embed, mf)
            return e, obj, masks

        all_e, all_obj, all_masks = [], [], []
        e, obj, masks = heads(output)
        all_e.append(e)
        all_obj.append(obj)
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
            e, obj, masks = heads(output)
            all_e.append(e)
            all_obj.append(obj)
            all_masks.append(masks)
            bias = _attn_bias(masks, sizes[(i + 1) % 3])

        # zero-bg-row classifier, temperature 50 (ov2seg.py:489-529)
        text_bg = torch.cat(
            [torch.from_numpy(text), torch.zeros(1, D)], dim=0
        )
        cls_layers = []
        for e in all_e:
            en = e / (e.norm(dim=-1, keepdim=True) + 1e-6)
            cls_layers.append(50.0 * en @ text_bg.T)

    l1 = DEC_LAYERS + 1
    ref_cls = torch.stack(cls_layers).view(l1, B, T, Q, K + 1).numpy()
    ref_obj = torch.stack(all_obj).view(l1, B, T, Q, 2).numpy()
    ref_masks = torch.stack(all_masks).view(
        l1, B, T, Q, *all_masks[0].shape[-2:]
    ).permute(0, 1, 3, 2, 4, 5).numpy()
    np.testing.assert_allclose(
        np.asarray(out["pred_logits_all"]), ref_cls, rtol=2e-3, atol=2e-3,
        err_msg="pred_logits_all",
    )
    np.testing.assert_allclose(
        np.asarray(out["pred_object_logits_all"]), ref_obj,
        rtol=2e-3, atol=2e-3, err_msg="pred_object_logits_all",
    )
    np.testing.assert_allclose(
        np.asarray(out["pred_masks_all"]), ref_masks, rtol=2e-3, atol=2e-3,
        err_msg="pred_masks_all",
    )
