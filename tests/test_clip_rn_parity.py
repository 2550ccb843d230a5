"""Torch-golden parity for the mask-adapted CLIP ModifiedResNet tower.

The reference behavior re-typed in fresh functional torch code (as in the
other parity suites):
``third_parties/mask_adapted_clip/mask_adapted_clip/model.py:14-221`` —
anti-aliased bottlenecks (stride via avg-pool after conv2, avg-pool +
1x1-conv shortcut), 3-conv stem + avg-pool, and the maskable
``AttentionPool2d`` (mean-token query; the downsampled mask enters as the
key-padding vector with a True appended — the fork's exact, quirky
alignment).  The converted random state dict must reproduce the torch
output through ``MaskAdaptedModifiedResNet`` bit-tightly.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, "/root/repo")
from openvis_tpu.models.clip_mask_adapted import (  # noqa: E402
    MaskAdaptedModifiedResNet,
)
from tools.convert_weights import _convert_clip_rn_visual  # noqa: E402

W = 8                    # tiny width: stem w/2=4, final dim w*32=256
LAYERS = (1, 1, 1, 1)
HEADS = 4
EMBED = 32
S = 64                   # input resolution -> final grid 2x2


def _t(x):
    return torch.from_numpy(np.asarray(x, np.float32))


def _bn(x, p, pre):
    w, b = _t(p[f"{pre}.weight"]), _t(p[f"{pre}.bias"])
    m, v = _t(p[f"{pre}.running_mean"]), _t(p[f"{pre}.running_var"])
    shape = (1, -1, 1, 1)
    return (x - m.view(shape)) / torch.sqrt(v.view(shape) + 1e-5) * w.view(
        shape
    ) + b.view(shape)


def _bottleneck(x, p, pre, stride):
    y = F.relu(_bn(F.conv2d(x, _t(p[f"{pre}.conv1.weight"])), p, f"{pre}.bn1"))
    y = F.relu(_bn(F.conv2d(y, _t(p[f"{pre}.conv2.weight"]), padding=1),
                   p, f"{pre}.bn2"))
    if stride > 1:
        y = F.avg_pool2d(y, stride)
    y = _bn(F.conv2d(y, _t(p[f"{pre}.conv3.weight"])), p, f"{pre}.bn3")
    if f"{pre}.downsample.0.weight" in p:
        idn = F.avg_pool2d(x, stride) if stride > 1 else x
        idn = _bn(F.conv2d(idn, _t(p[f"{pre}.downsample.0.weight"])),
                  p, f"{pre}.downsample.1")
    else:
        idn = x
    return F.relu(y + idn)


def _torch_forward(p, imgs, masks=None):
    """imgs: (N, 3, S, S); masks: (N, S, S) soft or None -> (N, EMBED)."""
    x = imgs
    for i in (1, 2, 3):
        stride = 2 if i == 1 else 1
        x = F.relu(_bn(
            F.conv2d(x, _t(p[f"visual.conv{i}.weight"]), stride=stride,
                     padding=1),
            p, f"visual.bn{i}",
        ))
    x = F.avg_pool2d(x, 2)
    for si, nb in enumerate(LAYERS):
        for b in range(nb):
            stride = 2 if (b == 0 and si > 0) else 1
            x = _bottleneck(x, p, f"visual.layer{si + 1}.{b}", stride)

    n, c, gh, gw = x.shape
    kp = None
    if masks is not None:
        m = F.interpolate(masks[:, None], size=(gh, gw)).squeeze(1)
        m = (m > 0.5).reshape(n, -1)
        kp = torch.cat([m, m.new_ones(n, 1)], dim=1)
    toks = x.reshape(n, c, gh * gw).permute(2, 0, 1)      # (L, N, C)
    toks = torch.cat([toks.mean(dim=0, keepdim=True), toks], dim=0)
    toks = toks + _t(p["visual.attnpool.positional_embedding"])[:, None, :]
    out, _ = F.multi_head_attention_forward(
        query=toks, key=toks, value=toks,
        embed_dim_to_check=c, num_heads=HEADS,
        q_proj_weight=_t(p["visual.attnpool.q_proj.weight"]),
        k_proj_weight=_t(p["visual.attnpool.k_proj.weight"]),
        v_proj_weight=_t(p["visual.attnpool.v_proj.weight"]),
        in_proj_weight=None,
        in_proj_bias=torch.cat([
            _t(p["visual.attnpool.q_proj.bias"]),
            _t(p["visual.attnpool.k_proj.bias"]),
            _t(p["visual.attnpool.v_proj.bias"]),
        ]),
        bias_k=None, bias_v=None, add_zero_attn=False, dropout_p=0.0,
        out_proj_weight=_t(p["visual.attnpool.c_proj.weight"]),
        out_proj_bias=_t(p["visual.attnpool.c_proj.bias"]),
        use_separate_proj_weight=True, training=False, need_weights=False,
        key_padding_mask=kp,
    )
    return out[0]


def _rand_state(rng):
    p = {}

    def conv(name, ci, co, k):
        p[f"{name}.weight"] = rng.randn(co, ci, k, k).astype(np.float32) * 0.2

    def bn(name, ch):
        p[f"{name}.weight"] = rng.rand(ch).astype(np.float32) + 0.5
        p[f"{name}.bias"] = rng.randn(ch).astype(np.float32) * 0.1
        p[f"{name}.running_mean"] = rng.randn(ch).astype(np.float32) * 0.1
        p[f"{name}.running_var"] = rng.rand(ch).astype(np.float32) + 0.5

    conv("visual.conv1", 3, W // 2, 3)
    bn("visual.bn1", W // 2)
    conv("visual.conv2", W // 2, W // 2, 3)
    bn("visual.bn2", W // 2)
    conv("visual.conv3", W // 2, W, 3)
    bn("visual.bn3", W)
    inpl = W
    for si, nb in enumerate(LAYERS):
        planes = W * (2 ** si)
        for b in range(nb):
            pre = f"visual.layer{si + 1}.{b}"
            conv(f"{pre}.conv1", inpl, planes, 1)
            bn(f"{pre}.bn1", planes)
            conv(f"{pre}.conv2", planes, planes, 3)
            bn(f"{pre}.bn2", planes)
            conv(f"{pre}.conv3", planes, planes * 4, 1)
            bn(f"{pre}.bn3", planes * 4)
            stride = 2 if (b == 0 and si > 0) else 1
            if b == 0 and (stride > 1 or inpl != planes * 4):
                conv(f"{pre}.downsample.0", inpl, planes * 4, 1)
                bn(f"{pre}.downsample.1", planes * 4)
            inpl = planes * 4
    c = W * 32
    grid = S // 32
    p["visual.attnpool.positional_embedding"] = (
        rng.randn(grid * grid + 1, c).astype(np.float32) * c ** -0.5
    )
    for proj, co in (("q_proj", c), ("k_proj", c), ("v_proj", c),
                     ("c_proj", EMBED)):
        p[f"visual.attnpool.{proj}.weight"] = (
            rng.randn(co, c).astype(np.float32) * c ** -0.5
        )
        p[f"visual.attnpool.{proj}.bias"] = (
            rng.randn(co).astype(np.float32) * 0.02
        )
    return p


@pytest.fixture(scope="module")
def setup():
    rng = np.random.RandomState(0)
    p = _rand_state(rng)
    vtree = _convert_clip_rn_visual(p)
    model = MaskAdaptedModifiedResNet(
        layers=LAYERS, width=W, embed_dim=EMBED, heads=HEADS, image_size=S
    )
    imgs = rng.randn(3, S, S, 3).astype(np.float32)
    return p, vtree, model, imgs


def test_rn_tower_matches_torch_unmasked(setup):
    p, vtree, model, imgs = setup
    ref = _torch_forward(p, _t(imgs.transpose(0, 3, 1, 2))).numpy()
    ours = np.asarray(model.apply({"params": vtree}, jnp.asarray(imgs)))
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


def test_rn_tower_matches_torch_masked(setup):
    p, vtree, model, imgs = setup
    # left half fg, right half bg: after nearest pooling to the 2x2 grid
    # the padding vector is a deterministic mix (never all-masked -> no
    # torch softmax NaN)
    masks = np.zeros((3, S, S), np.float32)
    masks[:, :, : S // 2] = 0.9
    ref = _torch_forward(
        p, _t(imgs.transpose(0, 3, 1, 2)), _t(masks)
    ).numpy()
    ours = np.asarray(model.apply(
        {"params": vtree}, jnp.asarray(imgs), jnp.asarray(masks)
    ))
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)
    # the mask must actually change the pooled features
    unmasked = np.asarray(model.apply({"params": vtree}, jnp.asarray(imgs)))
    assert np.abs(ours - unmasked).max() > 1e-4
