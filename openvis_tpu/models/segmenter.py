"""Segmenter: backbone -> pixel decoder -> masked transformer decoder.

Equivalent of the reference's backbone + ``MaskFormerHead`` pairing
(``openvis/modeling/mask_former_head.py:19-135``): the head wires the
``MSDeformAttnPixelDecoder``'s (mask_features, multi_scale_features) into the
registered transformer decoder.  Registry dispatch becomes a typed config
switch; the SAN path's ``extra_feats`` hook (CLIP taps added onto the
projected pixel-decoder inputs, ``msdeformattn.py:338-344``) is a plain
argument.

Input is the flattened frame batch (B*T, H, W, 3) NHWC; ``num_frames`` is a
static int so frame/video reshapes trace with fixed shapes.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax
from flax import linen as nn

from openvis_tpu.config import ModelConfig
from openvis_tpu.models.backbone.resnet import ResNet
from openvis_tpu.models.pixel_decoder import (
    BasePixelDecoder,
    MSDeformAttnPixelDecoder,
)
from openvis_tpu.models.transformer_decoder import MaskedTransformerDecoder


def build_backbone(cfg: ModelConfig) -> nn.Module:
    b = cfg.backbone
    if b.name in ("resnet", "timm_resnet"):
        # "timm_resnet" is OV2Seg's IN21k trunk (``ov2seg.py:25-134``
        # CustomResNet via timm): architecturally the same torchvision-style
        # bottleneck ResNet with every BN frozen (the TIMM wrapper converts
        # to FrozenBN, ``ov2seg.py:110-112``) — only the checkpoint naming
        # differs (``tools/convert_weights.convert_timm_resnet`` remaps).
        return ResNet(
            depth=b.depth,
            stem_out_channels=b.stem_out_channels,
            stride_in_1x1=False if b.name == "timm_resnet" else b.stride_in_1x1,
            out_features=tuple(b.out_features),
            name="backbone",
        )
    if b.name == "swin":
        from openvis_tpu.models.backbone.swin import SwinTransformer

        return SwinTransformer(
            embed_dim=b.swin_embed_dim,
            depths=tuple(b.swin_depths),
            num_heads=tuple(b.swin_num_heads),
            window_size=b.swin_window_size,
            mlp_ratio=b.swin_mlp_ratio,
            patch_size=b.swin_patch_size,
            qkv_bias=b.swin_qkv_bias,
            drop_path_rate=b.swin_drop_path_rate,
            patch_norm=b.swin_patch_norm,
            ape=b.swin_ape,
            pretrain_img_size=b.swin_pretrain_img_size,
            out_features=tuple(b.out_features),
            name="backbone",
        )
    raise ValueError(f"unknown backbone {b.name!r}")


# decoder-name -> (mode, head) dispatch, mirroring TRANSFORMER_DECODER_REGISTRY
_DECODER_KINDS = {
    "video": ("video", "class"),
    "frame": ("frame", "class"),
    "video_embedding": ("video", "embedding"),
    "frame_embedding": ("frame", "embedding"),
    "video_proposal": ("video", "proposal"),
    "frame_proposal": ("frame", "proposal"),
    "side_adapter_frame": ("frame", "side_adapter"),
    "side_adapter_video": ("video", "side_adapter"),
    "ov2seg_frame": ("frame", "ov2seg"),
    # ZeroShot decoder (zero_shot_mask2former_transformer_decoder.py:16):
    # registered in the reference but never selected by a shipped config
    "frame_zero_shot": ("frame", "zero_shot"),
    "video_zero_shot": ("video", "zero_shot"),
}


class Segmenter(nn.Module):
    """Backbone + pixel decoder + transformer decoder, returning the decoder
    output dict plus pixel-decoder features."""

    cfg: ModelConfig

    @nn.compact
    def __call__(
        self,
        frames: jax.Array,  # (B*T, H, W, 3) normalized NHWC
        num_frames: int,
        extra_features: Optional[List[jax.Array]] = None,
    ) -> Dict[str, Any]:
        cfg = self.cfg
        feats = build_backbone(cfg)(frames)

        pd = cfg.pixel_decoder
        if pd.name in ("fpn", "transformer_enc"):
            mask_features, _, ms_features = BasePixelDecoder(
                conv_dim=pd.conv_dim, mask_dim=pd.mask_dim,
                transformer_enc_layers=(
                    pd.transformer_enc_layers if pd.name == "transformer_enc"
                    else 0
                ),
                nheads=pd.num_heads, dim_feedforward=pd.dim_feedforward,
                name="pixel_decoder",
            )(feats, extra_features)
        else:
            mask_features, _, ms_features = MSDeformAttnPixelDecoder(
                conv_dim=pd.conv_dim,
                mask_dim=pd.mask_dim,
                transformer_in_features=tuple(pd.transformer_in_features),
                enc_layers=pd.transformer_enc_layers,
                n_heads=pd.num_heads,
                n_points=pd.num_points,
                d_ffn=pd.dim_feedforward,
                common_stride=pd.common_stride,
                name="pixel_decoder",
            )(feats, extra_features)

        td = cfg.transformer_decoder
        mode, head = _DECODER_KINDS[td.name]
        if mode == "video":
            bt = mask_features.shape[0]
            b = bt // num_frames
            mask_features_in = mask_features.reshape(
                b, num_frames, *mask_features.shape[1:]
            )
        else:
            mask_features_in = mask_features

        out = MaskedTransformerDecoder(
            mode=mode,
            head=head,
            hidden_dim=td.hidden_dim,
            num_queries=td.num_queries,
            nheads=td.nheads,
            dim_feedforward=td.dim_feedforward,
            dec_layers=td.dec_layers,
            pre_norm=td.pre_norm,
            mask_dim=td.mask_dim,
            num_classes=self.cfg.num_classes,
            clip_dim=td.clip_embed_dim,
            clip_heads=cfg.clip_adapter.clip_num_heads,
            in_channels=pd.conv_dim,
            name="predictor",
        )(ms_features, mask_features_in, num_frames)
        out["backbone_feats"] = feats
        return out
