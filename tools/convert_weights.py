"""Convert pretrained PyTorch checkpoints into openvis-tpu param pytrees.

Two sources (SURVEY §5 checkpoint/resume; reference ``README.md:5``):
  * Detectron2 Mask2Former COCO-instance R50 ``model_final_3c8ec9.pkl``
    (d2 pickle: {"model": {name: ndarray}}) — backbone + pixel decoder +
    transformer decoder init;
  * OpenAI CLIP checkpoints (torch state dict / jit archive) — the frozen
    text + vision towers.

Conventions converted:
  * torch Linear (out, in) -> flax kernel (in, out) [transpose];
  * torch Conv2d (out, in, kh, kw) -> flax (kh, kw, in, out);
  * torch MultiheadAttention packed in_proj (3C, C) -> split q/k/v;
  * FrozenBatchNorm (weight, bias, running_mean, running_var) folded into
    the backbone's FrozenAffine (scale, bias) with eps=1e-5;
  * d2 GroupNorm / LayerNorm weight/bias -> scale/bias.

Usage:
  python tools/convert_weights.py m2f  model_final_3c8ec9.pkl out_m2f.msgpack
  python tools/convert_weights.py clip ViT-B-16.pt out_clip.msgpack
"""

from __future__ import annotations

import pickle
import sys
from typing import Dict

import numpy as np

BN_EPS = 1e-5


def _lin(d, name):
    return {
        "kernel": np.ascontiguousarray(d[f"{name}.weight"].T),
        "bias": d[f"{name}.bias"],
    }


def _conv(d, name, bias=True):
    out = {"kernel": np.ascontiguousarray(d[f"{name}.weight"].transpose(2, 3, 1, 0))}
    if bias and f"{name}.bias" in d:
        out["bias"] = d[f"{name}.bias"]
    return out


def _frozen_bn(d, name):
    w, b = d[f"{name}.weight"], d[f"{name}.bias"]
    mean, var = d[f"{name}.running_mean"], d[f"{name}.running_var"]
    scale = w / np.sqrt(var + BN_EPS)
    return {"scale": scale, "bias": b - mean * scale}


def _norm(d, name):  # GroupNorm / LayerNorm
    return {"scale": d[f"{name}.weight"], "bias": d[f"{name}.bias"]}


def _ln_f32(d, name):
    return {"ln": _norm(d, name)}


def _mha(d, name):
    """torch nn.MultiheadAttention -> q/k/v/out projections."""
    w = d[f"{name}.in_proj_weight"]
    b = d[f"{name}.in_proj_bias"]
    c = w.shape[1]
    qw, kw, vw = w[:c], w[c : 2 * c], w[2 * c :]
    qb, kb, vb = b[:c], b[c : 2 * c], b[2 * c :]
    return {
        "q_proj": {"kernel": np.ascontiguousarray(qw.T), "bias": qb},
        "k_proj": {"kernel": np.ascontiguousarray(kw.T), "bias": kb},
        "v_proj": {"kernel": np.ascontiguousarray(vw.T), "bias": vb},
        "out_proj": _lin(d, f"{name}.out_proj"),
    }


def _mlp(d, name, n_layers):
    return {
        f"layer{i}": _lin(d, f"{name}.layers.{i}") for i in range(n_layers)
    }


# ---------------------------------------------------------------------------
# Mask2Former (d2) — backbone + sem_seg_head
# ---------------------------------------------------------------------------

def convert_resnet(d: Dict[str, np.ndarray], depth: int = 50) -> Dict:
    blocks = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}[depth]
    out = {
        "stem_conv1": _conv(d, "backbone.stem.conv1", bias=False),
        "stem_norm1": _frozen_bn(d, "backbone.stem.conv1.norm"),
    }
    for si, nb in enumerate(blocks):
        stage = f"res{si + 2}"
        for bi in range(nb):
            pre = f"backbone.{stage}.{bi}"
            blk = {}
            for ci in (1, 2, 3):
                blk[f"conv{ci}"] = _conv(d, f"{pre}.conv{ci}", bias=False)
                blk[f"norm{ci}"] = _frozen_bn(d, f"{pre}.conv{ci}.norm")
            if f"{pre}.shortcut.weight" in d:
                blk["shortcut_conv"] = _conv(d, f"{pre}.shortcut", bias=False)
                blk["shortcut_norm"] = _frozen_bn(d, f"{pre}.shortcut.norm")
            out[f"{stage}_block{bi}"] = blk
    return out


def convert_swin(d: Dict[str, np.ndarray], size: str = "base") -> Dict:
    """d2 Mask2Former Swin checkpoint -> ``models/backbone/swin.py`` tree.

    Key layout per the reference's vendored Swin
    (``openvis/modeling/backbone/swin.py:551-614``): ``backbone.patch_embed.
    {proj,norm}``, ``backbone.layers.{i}.blocks.{j}.{norm1,attn,norm2,mlp}``,
    ``backbone.layers.{i}.downsample.{reduction,norm}``, and per-output-stage
    ``backbone.norm{i}``.  The relative_position_bias_table copies verbatim
    (same ((2ws-1)^2, nH) layout); ``relative_position_index`` is a constant
    buffer we rebuild from numpy at trace time and is skipped."""
    from openvis_tpu.models.backbone.swin import SWIN_SHAPES

    depths = SWIN_SHAPES[size]["depths"]
    out = {
        "patch_embed": _conv(d, "backbone.patch_embed.proj"),
        "patch_norm": _norm(d, "backbone.patch_embed.norm"),
    }
    if "backbone.absolute_pos_embed" in d:  # APE checkpoints (swin.py:557)
        out["absolute_pos_embed"] = np.ascontiguousarray(
            d["backbone.absolute_pos_embed"].transpose(0, 2, 3, 1)
        )
    for si, nb in enumerate(depths):
        for bi in range(nb):
            pre = f"backbone.layers.{si}.blocks.{bi}"
            out[f"stage{si}_block{bi}"] = {
                "norm1": _norm(d, f"{pre}.norm1"),
                "attn": {
                    "qkv": _lin(d, f"{pre}.attn.qkv"),
                    "proj": _lin(d, f"{pre}.attn.proj"),
                    "relative_position_bias_table": d[
                        f"{pre}.attn.relative_position_bias_table"
                    ],
                },
                "norm2": _norm(d, f"{pre}.norm2"),
                "mlp_fc1": _lin(d, f"{pre}.mlp.fc1"),
                "mlp_fc2": _lin(d, f"{pre}.mlp.fc2"),
            }
        if si < len(depths) - 1:
            out[f"downsample{si}"] = {
                "norm": _norm(d, f"backbone.layers.{si}.downsample.norm"),
                "reduction": {
                    "kernel": np.ascontiguousarray(
                        d[f"backbone.layers.{si}.downsample.reduction.weight"].T
                    ),
                },
            }
        out[f"out_norm{si}"] = _norm(d, f"backbone.norm{si}")
    return out


def convert_timm_resnet(d: Dict[str, np.ndarray], depth: int = 50) -> Dict:
    """timm ResNet-50 (the IN21k weights OV2Seg's ``CustomResNet`` loads,
    ``ov2seg.py:45-134``) -> the same backbone tree as :func:`convert_resnet`,
    by remapping timm naming (``conv1/bn1`` stem, ``layer{1..4}.{i}.conv/bn``
    blocks, ``downsample.0/1`` shortcuts) onto d2 naming.  timm resnet50's
    torchvision-style stride placement matches ``stride_in_1x1=False``."""
    bn_parts = ("weight", "bias", "running_mean", "running_var")
    remap: Dict[str, np.ndarray] = {}
    remap["backbone.stem.conv1.weight"] = d["conv1.weight"]
    for s in bn_parts:
        remap[f"backbone.stem.conv1.norm.{s}"] = d[f"bn1.{s}"]
    blocks = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}[depth]
    for si, nb in enumerate(blocks):
        for bi in range(nb):
            src = f"layer{si + 1}.{bi}"
            dst = f"backbone.res{si + 2}.{bi}"
            for ci in (1, 2, 3):
                remap[f"{dst}.conv{ci}.weight"] = d[f"{src}.conv{ci}.weight"]
                for s in bn_parts:
                    remap[f"{dst}.conv{ci}.norm.{s}"] = d[f"{src}.bn{ci}.{s}"]
            if f"{src}.downsample.0.weight" in d:
                remap[f"{dst}.shortcut.weight"] = d[f"{src}.downsample.0.weight"]
                for s in bn_parts:
                    remap[f"{dst}.shortcut.norm.{s}"] = d[
                        f"{src}.downsample.1.{s}"
                    ]
    return convert_resnet(remap, depth)


def convert_pixel_decoder(d: Dict[str, np.ndarray], enc_layers: int = 6) -> Dict:
    p = "sem_seg_head.pixel_decoder"
    out = {"level_embed": d[f"{p}.level_embed"]}
    for i in range(3):
        out[f"input_proj{i}_conv"] = _conv(d, f"{p}.input_proj.{i}.0")
        out[f"input_proj{i}_norm"] = _norm(d, f"{p}.input_proj.{i}.1")
    enc = {}
    for i in range(enc_layers):
        lp = f"{p}.transformer.encoder.layers.{i}"
        enc[f"layer{i}"] = {
            "self_attn": {
                "sampling_offsets": _lin(d, f"{lp}.self_attn.sampling_offsets"),
                "attention_weights": _lin(d, f"{lp}.self_attn.attention_weights"),
                "value_proj": _lin(d, f"{lp}.self_attn.value_proj"),
                "output_proj": _lin(d, f"{lp}.self_attn.output_proj"),
            },
            "norm1": _norm(d, f"{lp}.norm1"),
            "linear1": _lin(d, f"{lp}.linear1"),
            "linear2": _lin(d, f"{lp}.linear2"),
            "norm2": _norm(d, f"{lp}.norm2"),
        }
    out["encoder"] = enc
    # FPN tail: d2 names adapter_1/layer_1 operate on res2 (we call it idx 0)
    out["adapter0_conv"] = _conv(d, f"{p}.adapter_1", bias=False)
    out["adapter0_norm"] = _norm(d, f"{p}.adapter_1.norm")
    out["layer0_conv"] = _conv(d, f"{p}.layer_1", bias=False)
    out["layer0_norm"] = _norm(d, f"{p}.layer_1.norm")
    out["mask_features"] = _conv(d, f"{p}.mask_features")
    return out


def convert_predictor(
    d: Dict[str, np.ndarray], dec_layers: int = 9, head: str = "class"
) -> Dict:
    p = "sem_seg_head.predictor"
    out = {
        "query_feat": d[f"{p}.query_feat.weight"],
        "query_embed": d[f"{p}.query_embed.weight"],
        "level_embed": d[f"{p}.level_embed.weight"],
    }
    heads = {
        "decoder_norm": {"scale": d[f"{p}.decoder_norm.weight"],
                         "bias": d[f"{p}.decoder_norm.bias"]},
        "mask_embed": _mlp(d, f"{p}.mask_embed", 3),
    }
    if head == "class" and f"{p}.class_embed.weight" in d:
        heads["class_embed"] = _lin(d, f"{p}.class_embed")
    if head == "embedding" and f"{p}.class_embed.layers.0.weight" in d:
        heads["class_embed"] = _mlp(d, f"{p}.class_embed", 2)
    if head == "side_adapter" and f"{p}.attn_embed.layers.0.weight" in d:
        heads["attn_embed"] = _mlp(d, f"{p}.attn_embed", 3)
    out["heads"] = heads
    if head == "side_adapter" and f"{p}.attn_mlp.layers.0.weight" in d:
        for i in range(3):
            out[f"attn_mlp{i}"] = {
                "kernel": np.ascontiguousarray(
                    d[f"{p}.attn_mlp.layers.{i}.weight"].transpose(2, 3, 1, 0)
                ),
                "bias": d[f"{p}.attn_mlp.layers.{i}.bias"],
            }
    for i in range(dec_layers):
        out[f"cross_attn{i}"] = {
            "multihead_attn": _mha(
                d, f"{p}.transformer_cross_attention_layers.{i}.multihead_attn"
            ),
            "norm": _norm(d, f"{p}.transformer_cross_attention_layers.{i}.norm"),
        }
        out[f"self_attn{i}"] = {
            "self_attn": _mha(
                d, f"{p}.transformer_self_attention_layers.{i}.self_attn"
            ),
            "norm": _norm(d, f"{p}.transformer_self_attention_layers.{i}.norm"),
        }
        out[f"ffn{i}"] = {
            "linear1": _lin(d, f"{p}.transformer_ffn_layers.{i}.linear1"),
            "linear2": _lin(d, f"{p}.transformer_ffn_layers.{i}.linear2"),
            "norm": _norm(d, f"{p}.transformer_ffn_layers.{i}.norm"),
        }
    return out


def migrate_legacy_keys(state: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """d2 v<2 checkpoint key migration, matching the reference's
    ``_load_from_state_dict`` shims: bare ``sem_seg_head.*`` keys gain the
    ``pixel_decoder.`` prefix (``mask_former_head.py:23-45``) and
    ``static_query`` renames to ``query_feat``
    (``video_mask2former_transformer_decoder.py:224-245``)."""
    out = {}
    for k, v in state.items():
        nk = k
        if "static_query" in nk:
            nk = nk.replace("static_query", "query_feat")
        if "sem_seg_head." in nk and ".predictor." not in nk and (
            ".pixel_decoder." not in nk
        ):
            nk = nk.replace("sem_seg_head.", "sem_seg_head.pixel_decoder.")
        out[nk] = v
    return out


def convert_mask2former(
    state: Dict[str, np.ndarray],
    depth: int = 50,
    enc_layers: int = 6,
    dec_layers: int = 9,
    head: str = "class",
    backbone: str = "resnet",
    swin_size: str = "base",
) -> Dict:
    """Full segmenter tree: {backbone, pixel_decoder, predictor}.

    ``backbone='swin'`` converts the Swin checkpoints the reference's swin
    recipes start from (``configs/openvoc_ytvis_coco/swin/*.yaml:17``:
    Mask2Former SwinB/L COCO-instance)."""
    state = migrate_legacy_keys(state)
    bb = (
        convert_swin(state, swin_size)
        if backbone == "swin"
        else convert_resnet(state, depth)
    )
    return {
        "backbone": bb,
        "pixel_decoder": convert_pixel_decoder(state, enc_layers),
        "predictor": convert_predictor(state, dec_layers, head),
    }


# ---------------------------------------------------------------------------
# OpenAI CLIP
# ---------------------------------------------------------------------------

def _clip_block(d, pre):
    w = d[f"{pre}.attn.in_proj_weight"]
    b = d[f"{pre}.attn.in_proj_bias"]
    c = w.shape[1]
    return {
        "ln_1": _ln_f32(d, f"{pre}.ln_1"),
        "ln_2": _ln_f32(d, f"{pre}.ln_2"),
        "attn": {
            "q_proj": {"kernel": np.ascontiguousarray(w[:c].T), "bias": b[:c]},
            "k_proj": {"kernel": np.ascontiguousarray(w[c:2*c].T), "bias": b[c:2*c]},
            "v_proj": {"kernel": np.ascontiguousarray(w[2*c:].T), "bias": b[2*c:]},
            "out_proj": _lin(d, f"{pre}.attn.out_proj"),
        },
        "mlp_c_fc": _lin(d, f"{pre}.mlp.c_fc"),
        "mlp_c_proj": _lin(d, f"{pre}.mlp.c_proj"),
    }


def _convert_clip_rn_visual(d: Dict[str, np.ndarray]) -> Dict:
    """OpenAI/mask-adapted RN visual tower (``ModifiedResNet``,
    ``third_parties/mask_adapted_clip/mask_adapted_clip/model.py:151-221``)
    -> ``MaskAdaptedModifiedResNet`` tree.  Eval-mode BNs fold into affines
    (the tower is frozen, so folding running stats is exact)."""
    visual = {}
    for i in (1, 2, 3):
        visual[f"stem_conv{i}"] = _conv(d, f"visual.conv{i}", bias=False)
        visual[f"stem_bn{i}"] = _frozen_bn(d, f"visual.bn{i}")
    for si in range(1, 5):
        b = 0
        while f"visual.layer{si}.{b}.conv1.weight" in d:
            pre = f"visual.layer{si}.{b}"
            blk = {}
            for ci in (1, 2, 3):
                blk[f"conv{ci}"] = _conv(d, f"{pre}.conv{ci}", bias=False)
                blk[f"bn{ci}"] = _frozen_bn(d, f"{pre}.bn{ci}")
            if f"{pre}.downsample.0.weight" in d:
                blk["downsample_conv"] = _conv(d, f"{pre}.downsample.0",
                                               bias=False)
                blk["downsample_bn"] = _frozen_bn(d, f"{pre}.downsample.1")
            visual[f"layer{si}_block{b}"] = blk
            b += 1
    visual["positional_embedding"] = d["visual.attnpool.positional_embedding"]
    for p in ("q_proj", "k_proj", "v_proj", "c_proj"):
        visual[p] = _lin(d, f"visual.attnpool.{p}")
    return visual


def convert_clip(state: Dict[str, np.ndarray]) -> Dict:
    """OpenAI CLIP state dict -> {visual: ..., text: ..., logit_scale}.
    Dispatches between the ViT and ModifiedResNet (RN50/RN101) visual
    towers by key shape."""
    d = state
    if "visual.layer1.0.conv1.weight" in d:
        visual = _convert_clip_rn_visual(d)
        n_txt = len({k.split(".")[2] for k in d
                     if k.startswith("transformer.resblocks.")})
        text = {
            "token_embedding": {"embedding": d["token_embedding.weight"]},
            "positional_embedding": d["positional_embedding"],
            "ln_final": _ln_f32(d, "ln_final"),
            "text_projection": d["text_projection"],
        }
        for i in range(n_txt):
            text[f"resblock{i}"] = _clip_block(d, f"transformer.resblocks.{i}")
        return {"visual": visual, "text": text,
                "logit_scale": d["logit_scale"].reshape(())}
    n_vis = len({k.split(".")[3] for k in d if k.startswith("visual.transformer.resblocks.")})
    n_txt = len({k.split(".")[2] for k in d if k.startswith("transformer.resblocks.")})
    visual = {
        "conv1": {"kernel": np.ascontiguousarray(
            d["visual.conv1.weight"].transpose(2, 3, 1, 0))},
        "class_embedding": d["visual.class_embedding"],
        "positional_embedding": d["visual.positional_embedding"],
        "ln_pre": _ln_f32(d, "visual.ln_pre"),
        "ln_post": _ln_f32(d, "visual.ln_post"),
        "proj": d["visual.proj"],
    }
    # mask-adapted CLIP checkpoints (ov-seg finetunes the reference vendors
    # under third_parties/mask_adapted_clip, model.py:325) carry a learned
    # per-depth mask prompt table; plain OpenAI dicts lack it and the
    # adapted tower zero-inits (the reference's torch.zeros init)
    if "visual.mask_embedding" in d:
        visual["mask_embedding"] = d["visual.mask_embedding"]
    for i in range(n_vis):
        visual[f"resblock{i}"] = _clip_block(d, f"visual.transformer.resblocks.{i}")
    text = {
        "token_embedding": {"embedding": d["token_embedding.weight"]},
        "positional_embedding": d["positional_embedding"],
        "ln_final": _ln_f32(d, "ln_final"),
        "text_projection": d["text_projection"],
    }
    for i in range(n_txt):
        text[f"resblock{i}"] = _clip_block(d, f"transformer.resblocks.{i}")
    return {"visual": visual, "text": text,
            "logit_scale": d["logit_scale"].reshape(())}


# ---------------------------------------------------------------------------
# IO
# ---------------------------------------------------------------------------

def load_torch_state(path: str) -> Dict[str, np.ndarray]:
    if path.endswith(".pkl"):
        with open(path, "rb") as f:
            data = pickle.load(f, encoding="latin1")
        model = data.get("model", data)
        return {k: np.asarray(v) for k, v in model.items()}
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(obj, "state_dict"):  # jit archive
        obj = obj.state_dict()
    if "state_dict" in obj:
        obj = obj["state_dict"]
    return {k: v.float().numpy() for k, v in obj.items()}


def save_msgpack(tree: Dict, path: str):
    from flax import serialization

    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(tree))


def load_msgpack(path: str) -> Dict:
    from flax import serialization

    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def main():
    kind, src, dst = sys.argv[1:4]
    state = load_torch_state(src)
    if kind == "m2f":
        tree = convert_mask2former(state)
    elif kind.startswith("m2f_swin"):
        # m2f_swin_base / m2f_swin_large (reference swin recipes)
        size = kind.rsplit("_", 1)[-1]
        tree = convert_mask2former(state, backbone="swin", swin_size=size)
    elif kind == "clip":
        tree = convert_clip(state)
    elif kind == "timm_resnet":
        # wrap as a segmenter subtree so merge_pretrained grafts it in place
        tree = {"backbone": convert_timm_resnet(state)}
    else:
        raise SystemExit(f"unknown kind {kind}")
    save_msgpack(tree, dst)
    n = sum(x.size for x in __import__("jax").tree.leaves(tree))
    print(f"wrote {dst}: {n/1e6:.1f}M params")


if __name__ == "__main__":
    main()
