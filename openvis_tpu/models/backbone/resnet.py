"""ResNet backbone (TPU-native, NHWC, frozen-BN semantics).

Functional equivalent of the Detectron2 ``build_resnet_backbone`` the
reference configures (``configs/openvoc_ytvis_coco/Base.yaml:2-16``):
basic stem, bottleneck blocks [3,4,6,3] for R50, ``STRIDE_IN_1X1: False``
(stride lives on the 3x3 conv), frozen BatchNorm folded at inference into an
affine scale/bias.  Emits a dict of pyramid features ``res2..res5`` at
strides 4/8/16/32.

FrozenBN is represented as explicit (scale, bias) affine params derived from
(weight, bias, running_mean, running_var) at weight-conversion time; they are
excluded from weight decay and gradient updates by the trainer's param-label
rules (see ``openvis_tpu/parallel/train_step.py``), matching d2's
``FrozenBatchNorm2d``.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn


class FrozenAffine(nn.Module):
    """Per-channel affine y = x * scale + bias (a folded, frozen BatchNorm)."""

    features: int

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        # fp32 affine arithmetic, result back in x.dtype: under AMP the
        # scale/bias stay f32 masters (autocast norm policy) — without the
        # cast-back they'd promote every downstream conv to f32 (see
        # models/amp.py)
        y = x.astype(jnp.float32) * scale.astype(jnp.float32) + bias.astype(
            jnp.float32
        )
        return y.astype(x.dtype)


class Bottleneck(nn.Module):
    out_channels: int
    bottleneck_channels: int
    stride: int = 1
    dilation: int = 1
    stride_in_1x1: bool = False
    has_shortcut: bool = False

    @nn.compact
    def __call__(self, x):
        s1, s3 = (self.stride, 1) if self.stride_in_1x1 else (1, self.stride)
        shortcut = x
        if self.has_shortcut:
            shortcut = nn.Conv(self.out_channels, (1, 1), strides=(self.stride,) * 2,
                               use_bias=False, name="shortcut_conv")(x)
            shortcut = FrozenAffine(self.out_channels, name="shortcut_norm")(shortcut)
        y = nn.Conv(self.bottleneck_channels, (1, 1), strides=(s1, s1),
                    use_bias=False, name="conv1")(x)
        y = nn.relu(FrozenAffine(self.bottleneck_channels, name="norm1")(y))
        y = nn.Conv(self.bottleneck_channels, (3, 3), strides=(s3, s3),
                    padding=[(self.dilation,) * 2] * 2,
                    kernel_dilation=(self.dilation,) * 2,
                    use_bias=False, name="conv2")(y)
        y = nn.relu(FrozenAffine(self.bottleneck_channels, name="norm2")(y))
        y = nn.Conv(self.out_channels, (1, 1), use_bias=False, name="conv3")(y)
        y = FrozenAffine(self.out_channels, name="norm3")(y)
        return nn.relu(y + shortcut)


_STAGE_BLOCKS = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3), 152: (3, 8, 36, 3)}


class ResNet(nn.Module):
    """ResNet-{50,101,152} trunk returning {res2..res5} NHWC features."""

    depth: int = 50
    stem_out_channels: int = 64
    stride_in_1x1: bool = False
    out_features: Sequence[str] = ("res2", "res3", "res4", "res5")

    @nn.compact
    def __call__(self, x) -> Dict[str, jnp.ndarray]:
        blocks = _STAGE_BLOCKS[self.depth]
        y = nn.Conv(self.stem_out_channels, (7, 7), strides=(2, 2),
                    padding=[(3, 3), (3, 3)], use_bias=False, name="stem_conv1")(x)
        y = nn.relu(FrozenAffine(self.stem_out_channels, name="stem_norm1")(y))
        # 3x3/2 max pool, pad 1
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        outs = {}
        in_mult = 4  # bottleneck expansion
        for stage_idx, n_blocks in enumerate(blocks):
            name = f"res{stage_idx + 2}"
            width = self.stem_out_channels * (2 ** stage_idx)
            out_ch = width * in_mult
            for b in range(n_blocks):
                stride = 2 if (b == 0 and stage_idx > 0) else 1
                y = Bottleneck(
                    out_channels=out_ch,
                    bottleneck_channels=width,
                    stride=stride,
                    stride_in_1x1=self.stride_in_1x1,
                    has_shortcut=(b == 0),
                    name=f"{name}_block{b}",
                )(y)
            if name in self.out_features:
                outs[name] = y
        return outs


FEATURE_STRIDES = {"res2": 4, "res3": 8, "res4": 16, "res5": 32}


def feature_channels(depth: int, stem: int = 64) -> Dict[str, int]:
    return {f"res{i+2}": stem * (2 ** i) * 4 for i in range(4)}
