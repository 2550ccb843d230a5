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
