"""Mask-crop adapter geometry + mask-adapted CLIP prompt path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openvis_tpu.models.clip_adapter import (
    clip_crop_classify,
    frame_average_scores,
    mask_square_boxes,
    roi_crop,
)
from openvis_tpu.models.clip_mask_adapted import (
    MaskAdaptedVisual,
    adapted_clip_crop_classify,
)


def test_mask_square_boxes():
    m = np.zeros((2, 32, 48), np.float32)
    m[0, 4:12, 10:30] = 1.0  # h=8, w=20 -> square side 20 from (10, 4)
    boxes, valid = mask_square_boxes(jnp.asarray(m))
    assert bool(valid[0]) and not bool(valid[1])
    np.testing.assert_allclose(np.asarray(boxes[0]), [10, 4, 30, 24])


def test_roi_crop_constant_preserved():
    # aligned=False roi_align is not an exact identity on the full box (it
    # samples at half-integer coordinates), but it must preserve constants
    img = np.full((1, 16, 16, 3), 3.5, np.float32)
    boxes = jnp.asarray([[0.0, 0.0, 16.0, 16.0]])
    out = roi_crop(jnp.asarray(img), boxes, 16)
    np.testing.assert_allclose(np.asarray(out), img, rtol=1e-6)


def test_roi_crop_matches_torch_roi_align():
    torch = pytest.importorskip("torch")
    torchvision = pytest.importorskip("torchvision")
    from torchvision.ops import roi_align

    rng = np.random.RandomState(1)
    img = rng.randn(1, 24, 36, 3).astype(np.float32)
    box = [4.0, 2.0, 28.0, 20.0]
    ours = np.asarray(roi_crop(jnp.asarray(img), jnp.asarray([box]), 8))
    t_img = torch.from_numpy(img.transpose(0, 3, 1, 2))
    t_box = torch.tensor([[0.0] + box])
    ref = roi_align(t_img, t_box, output_size=(8, 8), sampling_ratio=1)
    ref = ref.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def _np_roi_align(img, box, out, sampling_ratio=1):
    """Pure-numpy torchvision roi_align(aligned=False) oracle —
    transcribed from the documented CUDA bilinear_interpolate semantics so
    the parity check runs even without torchvision (which is absent in this
    container; the torch test above importorskips).  ``sampling_ratio``
    sub-samples per bin axis, averaged over the full sr*sr count (zeros
    included for out-of-bounds samples)."""
    h, w, c = img.shape
    sr = sampling_ratio
    x0, y0, x1, y1 = box
    bh = (y1 - y0) / out
    bw = (x1 - x0) / out
    res = np.zeros((out, out, c), np.float32)
    for i in range(out):
        for j in range(out):
            acc = np.zeros((c,), np.float64)
            for ki in range(sr):
                for kj in range(sr):
                    y = y0 + (i + (ki + 0.5) / sr) * bh
                    x = x0 + (j + (kj + 0.5) / sr) * bw
                    if y < -1.0 or y > h or x < -1.0 or x > w:
                        continue
                    y = min(max(y, 0.0), h - 1)
                    x = min(max(x, 0.0), w - 1)
                    yl, xl = int(y), int(x)
                    yh = min(yl + 1, h - 1)
                    xh = min(xl + 1, w - 1)
                    ly, lx = y - yl, x - xl
                    acc += (
                        (1 - ly) * (1 - lx) * img[yl, xl]
                        + (1 - ly) * lx * img[yl, xh]
                        + ly * (1 - lx) * img[yh, xl]
                        + ly * lx * img[yh, xh]
                    )
            res[i, j] = acc / (sr * sr)
    return res


@pytest.mark.parametrize("sr", [1, 2])
def test_roi_crop_matches_numpy_oracle(sr):
    rng = np.random.RandomState(1)
    img = rng.randn(1, 24, 36, 3).astype(np.float32)
    for box in ([4.0, 2.0, 28.0, 20.0],      # partially out of bounds (x)
                [0.0, 0.0, 36.0, 24.0],      # full image
                [10.5, 3.25, 19.5, 12.25],   # fractional interior
                [-6.0, -4.0, 10.0, 12.0],    # out of bounds (negative)
                [-5.0, -8.0, 31.0, 28.0],    # max-side box (side == max(h,w)
                                             # — the separable tap-window
                                             # contract's worst case)
                [3.0, 20.0, 39.0, 56.0]):    # max-side, far out at bottom
        ours = np.asarray(roi_crop(
            jnp.asarray(img), jnp.asarray([box]), 8, sampling_ratio=sr
        ))
        ref = _np_roi_align(img[0], box, 8, sampling_ratio=sr)
        np.testing.assert_allclose(ours[0], ref, rtol=1e-4, atol=1e-5)


def test_roi_crop_sampling_ratio_2_changes_large_crops():
    """Quantify the sr=1 vs sr=2 delta on a large crop (the documented
    roi_align sampling-density deviation, VERDICT r3 weak #6): sub-bin
    averaging must actually move values when the roi is much larger than
    the output grid."""
    rng = np.random.RandomState(2)
    img = rng.randn(1, 64, 64, 3).astype(np.float32)
    box = jnp.asarray([[0.0, 0.0, 64.0, 64.0]])  # 8x downscale per bin
    s1 = np.asarray(roi_crop(jnp.asarray(img), box, 8, sampling_ratio=1))
    s2 = np.asarray(roi_crop(jnp.asarray(img), box, 8, sampling_ratio=2))
    delta = np.abs(s1 - s2).mean()
    assert delta > 0.05, f"sr=2 indistinguishable from sr=1 (mean |d|={delta})"


def test_clip_crop_classify_shapes_and_validity():
    T, Q, H, W, D, K = 2, 3, 64, 96, 16, 4
    rng = np.random.RandomState(0)
    frames = jnp.asarray(rng.rand(T, H, W, 3).astype(np.float32) * 255)
    masks = np.zeros((T, Q, H, W), np.float32)
    masks[:, 0, 10:30, 20:50] = 0.9  # only query 0 valid
    text = rng.randn(K, D).astype(np.float32)
    text /= np.linalg.norm(text, axis=-1, keepdims=True)

    def fake_visual(imgs):  # (R, S, S, 3) -> (R, D)
        return imgs.mean(axis=(1, 2)) @ jnp.ones((3, D))

    logits, valid = clip_crop_classify(
        fake_visual, frames, jnp.asarray(masks), jnp.asarray(text),
        input_resolution=32,
    )
    assert logits.shape == (T, Q, K) and valid.shape == (T, Q)
    assert bool(valid[0, 0]) and not bool(valid[0, 1])

    scores, qv = frame_average_scores(logits, valid, "logits_then_softmax")
    assert scores.shape == (Q, K)
    np.testing.assert_allclose(np.asarray(scores.sum(-1)), 1.0, rtol=1e-5)


def test_mask_adapted_visual_prompt_changes_output():
    vis = MaskAdaptedVisual(
        patch_size=8, width=32, layers=3, heads=4, embed_dim=16,
        image_size=32, mask_prompt_depth=2,
    )
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(2, 32, 32, 3).astype(np.float32))
    mask = np.zeros((2, 32, 32), np.float32)
    mask[:, 8:24, 8:24] = 1.0
    params = vis.init(jax.random.PRNGKey(0), img, jnp.asarray(mask))["params"]
    assert params["mask_embedding"].shape == (2, 16, 32)
    with_mask = vis.apply({"params": params}, img, jnp.asarray(mask))
    without = vis.apply({"params": params}, img, None)
    assert with_mask.shape == (2, 16)
    # zero-init mask embedding still changes background tokens (x*m + 0*(1-m))
    assert np.abs(np.asarray(with_mask) - np.asarray(without)).max() > 1e-5


def test_adapted_crop_classify():
    T, Q, H, W, D, K = 1, 2, 64, 64, 16, 3
    rng = np.random.RandomState(0)
    frames = jnp.asarray(rng.rand(T, H, W, 3).astype(np.float32) * 255)
    masks = np.zeros((T, Q, H, W), np.float32)
    masks[:, 0, 8:40, 8:40] = 0.9
    text = rng.randn(K, D).astype(np.float32)
    text /= np.linalg.norm(text, axis=-1, keepdims=True)

    def fake_visual(imgs, m):
        base = imgs.mean(axis=(1, 2)) @ jnp.ones((3, D))
        if m is not None:
            base = base + m.mean(axis=(1, 2))[:, None]
        return base

    logits, valid = adapted_clip_crop_classify(
        fake_visual, frames, jnp.asarray(masks), jnp.asarray(text),
        input_resolution=32,
    )
    assert logits.shape == (T, Q, K)
    assert bool(valid[0, 0]) and not bool(valid[0, 1])

    # the reference blends the crop with the soft mask UNCONDITIONALLY
    # (mask_adapted_adapter.py:117-121) and only the prompt forwarding is
    # gated by mask_prompt_fwd (:68-71): with a visual that ignores the
    # prompt, both modes must see the SAME blended pixels
    # the classify body now runs under lax.map (per-frame region chunking),
    # so pixels are recorded through a debug callback (tracers cannot be
    # materialized at trace time) and the prompt flag at trace time
    pixels, prompted = [], []

    def recording_visual(imgs, m):
        jax.debug.callback(lambda a: pixels.append(np.asarray(a)), imgs)
        prompted.append(m is not None)
        return imgs.mean(axis=(1, 2)) @ jnp.ones((3, D))

    jax.block_until_ready(adapted_clip_crop_classify(
        recording_visual, frames, jnp.asarray(masks), jnp.asarray(text),
        input_resolution=32, mask_prompt_fwd=True,
    ))
    jax.block_until_ready(adapted_clip_crop_classify(
        recording_visual, frames, jnp.asarray(masks), jnp.asarray(text),
        input_resolution=32, mask_prompt_fwd=False,
    ))
    np.testing.assert_allclose(pixels[0], pixels[1])
    assert prompted == [True, False]
