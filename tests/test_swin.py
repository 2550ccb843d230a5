"""Swin backbone: shapes, shifted-window parity vs torch reference impl."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openvis_tpu.models.backbone.swin import (
    SwinTransformer,
    _relative_position_index,
    _shift_attn_mask,
    window_partition,
    window_reverse,
)


def test_window_partition_roundtrip():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 14, 28, 8).astype(np.float32))
    wins = window_partition(x, 7)
    assert wins.shape == (2 * 2 * 4, 49, 8)
    back = window_reverse(wins, 7, 14, 28)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_relative_position_index_matches_torch_formula():
    torch = pytest.importorskip("torch")
    ws = 7
    coords = torch.stack(
        torch.meshgrid(torch.arange(ws), torch.arange(ws), indexing="ij")
    )
    flat = torch.flatten(coords, 1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.permute(1, 2, 0).contiguous()
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    ref = rel.sum(-1).numpy()
    np.testing.assert_array_equal(_relative_position_index(ws), ref)


def test_shift_mask_blocks_cross_region():
    m = _shift_attn_mask(14, 14, 7, 3)
    assert m.shape == (4, 49, 49)
    assert (m == 0).any() and (m == -100).any()
    # window 0 (top-left, unshifted region) is fully connected
    np.testing.assert_array_equal(m[0], np.zeros((49, 49)))


def test_swin_tiny_features():
    model = SwinTransformer(
        embed_dim=32, depths=(2, 2, 2, 2), num_heads=(2, 4, 8, 16),
        window_size=7,
    )
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 96, 128, 3).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    outs = model.apply({"params": params}, x)
    assert outs["res2"].shape == (1, 24, 32, 32)
    assert outs["res3"].shape == (1, 12, 16, 64)
    assert outs["res4"].shape == (1, 6, 8, 128)
    assert outs["res5"].shape == (1, 3, 4, 256)
    for v in outs.values():
        assert np.isfinite(np.asarray(v)).all()


def test_swin_segmenter_integration():
    import dataclasses

    from openvis_tpu.config import Config
    from openvis_tpu.models.segmenter import Segmenter

    cfg = Config()
    m = dataclasses.replace(
        cfg.model,
        num_classes=3,
        backbone=dataclasses.replace(
            cfg.model.backbone, name="swin", swin_embed_dim=32,
            swin_depths=(1, 1, 1, 1), swin_num_heads=(2, 4, 8, 16),
        ),
        pixel_decoder=dataclasses.replace(
            cfg.model.pixel_decoder, conv_dim=64, mask_dim=64,
            transformer_enc_layers=1, dim_feedforward=128, num_heads=4,
        ),
        transformer_decoder=dataclasses.replace(
            cfg.model.transformer_decoder, name="frame", hidden_dim=64,
            num_queries=8, nheads=4, dim_feedforward=128, dec_layers=2,
            mask_dim=64,
        ),
    )
    seg = Segmenter(m)
    rng = np.random.RandomState(0)
    frames = jnp.asarray(rng.randn(2, 64, 96, 3).astype(np.float32))
    params = seg.init(jax.random.PRNGKey(0), frames, 2)["params"]
    out = seg.apply({"params": params}, frames, 2)
    assert out["pred_masks"].shape == (1, 8, 2, 16, 24)
