"""HOTA/TrackMAP sanity: perfect tracks -> 1.0; identity swaps hurt AssA."""

import numpy as np

from openvis_tpu.data import rle
from openvis_tpu.evals.burst_eval import BURSTEvaluator, hota_for_class


def _track(boxes, t=6, h=32, w=40):
    segs = []
    for f in range(t):
        m = np.zeros((h, w), np.uint8)
        y0, x0, y1, x1 = boxes if isinstance(boxes, tuple) else boxes[f]
        m[y0:y1, x0:x1] = 1
        segs.append(rle.encode(m))
    return {"segmentations": segs}


def test_hota_perfect():
    a = _track((2, 2, 12, 12))
    b = _track((18, 20, 30, 36))
    res = hota_for_class({1: [a, b]}, {1: [dict(a), dict(b)]})
    assert abs(res["HOTA"] - 1.0) < 1e-9, res
    assert abs(res["DetA"] - 1.0) < 1e-9
    assert abs(res["AssA"] - 1.0) < 1e-9


def test_hota_identity_swap_hurts_assa():
    # two GT tracks; prediction swaps identities halfway
    boxes_a = (2, 2, 12, 12)
    boxes_b = (18, 20, 30, 36)
    gt = {1: [_track(boxes_a), _track(boxes_b)]}
    swap_a = [boxes_a] * 3 + [boxes_b] * 3
    swap_b = [boxes_b] * 3 + [boxes_a] * 3
    dt = {1: [_track(swap_a), _track(swap_b)]}
    res = hota_for_class(gt, dt)
    assert abs(res["DetA"] - 1.0) < 1e-9  # every frame still detected
    assert res["AssA"] < 0.75             # association broken
    assert res["HOTA"] < 0.9


def test_hota_missed_frames():
    gt = {1: [_track((2, 2, 12, 12), t=6)]}
    half = _track((2, 2, 12, 12), t=6)
    for f in range(3, 6):
        half["segmentations"][f] = None
    dt = {1: [half]}
    res = hota_for_class(gt, dt)
    assert res["DetA"] < 0.6  # 3 TP, 3 FN


def test_burst_evaluator_end_to_end():
    ev = BURSTEvaluator()
    gts = []
    for vid in (1, 2):
        g = _track((2, 2, 12, 12))
        g.update({"video_id": vid, "category_id": 5})
        gts.append(g)
        d = _track((2, 2, 12, 12))
        d.update({"video_id": vid, "category_id": 5, "score": 0.9})
        ev.process(d)
    res = ev.evaluate(gts, [5, 6])
    assert abs(res["HOTA"] - 1.0) < 1e-9
    assert abs(res["mAP"] - 1.0) < 1e-6
