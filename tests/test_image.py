"""resize_bicubic_torch must reproduce torch F.interpolate bicubic exactly
(the reference's CLIP preprocessing op, side_adapter.py:150 /
masqclip_adapter.py:229)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from openvis_tpu.utils.image import resize_bicubic_torch  # noqa: E402


@pytest.mark.parametrize("shape", [
    (48, 80, 32, 32),    # downscale (no antialias — the torch semantics)
    (17, 23, 40, 40),    # upscale, odd sizes
    (16, 16, 33, 31),    # non-square target
])
def test_matches_torch_bicubic(shape):
    h, w, th, tw = shape
    rng = np.random.RandomState(0)
    x = rng.randn(2, h, w, 3).astype(np.float32)
    ours = np.asarray(resize_bicubic_torch(jnp.asarray(x), (th, tw)))
    ref = F.interpolate(
        torch.from_numpy(x).permute(0, 3, 1, 2), (th, tw), mode="bicubic"
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_identity_when_same_size():
    x = jnp.asarray(np.random.RandomState(1).randn(1, 8, 9, 2).astype(np.float32))
    assert resize_bicubic_torch(x, (8, 9)) is x


@pytest.mark.parametrize("shape", [
    (16, 24, 2, 3),      # deep downscale — the attn-bias path (signs matter)
    (16, 16, 4, 4),
    (8, 12, 32, 48),     # upscale
    (17, 5, 8, 8),
])
def test_bilinear_matches_torch(shape):
    from openvis_tpu.utils.image import (
        resize_bilinear_torch,
        resize_bilinear_torch_hw,
    )

    h, w, th, tw = shape
    rng = np.random.RandomState(2)
    x = rng.randn(2, h, w, 3).astype(np.float32)
    ref = F.interpolate(
        torch.from_numpy(x).permute(0, 3, 1, 2), (th, tw), mode="bilinear",
        align_corners=False,
    ).permute(0, 2, 3, 1).numpy()
    ours = np.asarray(resize_bilinear_torch(jnp.asarray(x), (th, tw)))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)
    ours_hw = np.asarray(resize_bilinear_torch_hw(
        jnp.asarray(x.transpose(0, 3, 1, 2)), (th, tw)
    ))
    np.testing.assert_allclose(
        ours_hw, ref.transpose(0, 3, 1, 2), rtol=1e-5, atol=1e-6
    )


@pytest.mark.parametrize("shape", [
    (48, 64, 30, 40),    # DOWNSCALE — PIL would antialias here; torch doesn't
    (12, 16, 48, 64),    # upscale (the evaluator's padded->orig direction)
    (17, 23, 17, 23),    # identity
])
def test_bilinear_np_matches_torch_and_flips_signs(shape):
    """The evaluator's final logit resize (before `> 0` thresholding) must be
    torch-exact: reference F.interpolate in video_maskformer.py:263-298."""
    from openvis_tpu.utils.image import resize_bilinear_torch_np

    h, w, th, tw = shape
    rng = np.random.RandomState(3)
    x = rng.randn(4, h, w).astype(np.float32)  # logits straddle zero
    ref = F.interpolate(
        torch.from_numpy(x)[None], (th, tw), mode="bilinear",
        align_corners=False,
    )[0].numpy()
    ours = resize_bilinear_torch_np(x, (th, tw))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)
    # the correctness contract is the SIGN field, not a tolerance
    np.testing.assert_array_equal(ours > 0, ref > 0)
