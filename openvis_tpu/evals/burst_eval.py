"""BURST evaluation: HOTA + TrackMAP over class splits.

Rebuild of the reference's BURST chain (``openvis/data/evals/burst_eval.py:
24-177`` -> TrackEval wrapper ``bursteval.py:8-60`` + vendored
``BURSTSingle`` dataset): predictions are per-video tracks of per-frame
masks; metrics are

  * **HOTA** (TrackEval's hota.py algorithm): per class, per alpha in
    {0.05..0.95}, frame-level Hungarian matching on
    ``global_alignment_score * 1000 + iou`` with matches kept when
    ``iou >= alpha``; DetA = TP/(TP+FN+FP), AssA = mean over TPs of
    TPA/(TPA+FNA+FPA), HOTA = mean_alpha sqrt(DetA * AssA);
  * **TrackMAP**: track-level AP with spatio-temporal IoU — shared with the
    YTVIS evaluator's COCO-protocol machinery.

Class splits (all/common/uncommon) follow the reference's category tables;
the vendored tables ship the common/uncommon lists empty
(``burst.py:510-517``), so those splits mirror "all" unless populated.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Optional, Sequence

import numpy as np
from scipy.optimize import linear_sum_assignment

from openvis_tpu.data import rle as rle_util
from openvis_tpu.evals.ytvis_eval import YTVOSEval

ALPHAS = np.arange(0.05, 0.99, 0.05)


def _frame_iou(d, g) -> float:
    if d is None and g is None:
        return 0.0
    if d is None or g is None:
        return 0.0
    i, u = rle_util.rle_intersection_union(d, g)
    return i / u if u else 0.0


def hota_for_class(
    gt_tracks: Dict[int, List[Dict]],
    dt_tracks: Dict[int, List[Dict]],
) -> Dict[str, float]:
    """gt_tracks/dt_tracks: video_id -> list of {segmentations: [rle|None]}.
    Returns HOTA / DetA / AssA for one class."""
    n_a = len(ALPHAS)
    tp = np.zeros(n_a)
    fn = np.zeros(n_a)
    fp = np.zeros(n_a)
    # per-alpha accumulators for association: match counts per (gt, dt) pair
    ass_num = [defaultdict(float) for _ in range(n_a)]  # matches per pair
    gt_counts = defaultdict(int)   # (vid, gidx) -> #frames present
    dt_counts = defaultdict(int)

    per_video = {}
    vids = sorted(set(gt_tracks) | set(dt_tracks))
    for vid in vids:
        gts = gt_tracks.get(vid, [])
        dts = dt_tracks.get(vid, [])
        t = 0
        for tr in gts + dts:
            t = max(t, len(tr["segmentations"]))
        sims = []  # per frame (n_gt, n_dt) iou
        for f in range(t):
            s = np.zeros((len(gts), len(dts)))
            for gi, g in enumerate(gts):
                gs = g["segmentations"][f] if f < len(g["segmentations"]) else None
                if gs is not None:
                    gt_counts[(vid, gi)] += 1
                for di, d in enumerate(dts):
                    ds = d["segmentations"][f] if f < len(d["segmentations"]) else None
                    if gi == 0 and ds is not None:
                        dt_counts[(vid, di)] += 1
                    if gs is not None and ds is not None:
                        s[gi, di] = _frame_iou(ds, gs)
            # count dt presence even when there are no gts
            if not gts:
                for di, d in enumerate(dts):
                    if f < len(d["segmentations"]) and d["segmentations"][f] is not None:
                        dt_counts[(vid, di)] += 1
            sims.append(s)
        per_video[vid] = sims

    # global alignment score: potential matches accumulated over frames
    glob = {}
    for vid, sims in per_video.items():
        n_g = sims[0].shape[0] if sims else 0
        n_d = sims[0].shape[1] if sims else 0
        pot = np.zeros((n_g, n_d))
        for s in sims:
            pot += (s > 0).astype(float) * s
        denom = np.zeros((n_g, n_d))
        for gi in range(n_g):
            for di in range(n_d):
                denom[gi, di] = (
                    gt_counts[(vid, gi)] + dt_counts[(vid, di)] - pot[gi, di]
                )
        glob[vid] = np.divide(
            pot, np.maximum(denom, 1e-9), out=np.zeros_like(pot),
            where=denom > 0,
        )

    for ai, alpha in enumerate(ALPHAS):
        for vid, sims in per_video.items():
            g_sc = glob[vid]
            for f, s in enumerate(sims):
                n_g, n_d = s.shape
                gt_here = [gi for gi in range(n_g) if _present(gt_tracks[vid][gi], f)]
                dt_here = [di for di in range(n_d) if _present(dt_tracks[vid][di], f)]
                if gt_here and dt_here:
                    score = (
                        g_sc[np.ix_(gt_here, dt_here)] * 1000.0
                        + s[np.ix_(gt_here, dt_here)]
                    )
                    ri, ci = linear_sum_assignment(-score)
                    matched_g = set()
                    matched_d = set()
                    for r, c in zip(ri, ci):
                        gi, di = gt_here[r], dt_here[c]
                        if s[gi, di] >= alpha - 1e-9 and s[gi, di] > 0:
                            tp[ai] += 1
                            ass_num[ai][(vid, gi, di)] += 1
                            matched_g.add(gi)
                            matched_d.add(di)
                    fn[ai] += len(gt_here) - len(matched_g)
                    fp[ai] += len(dt_here) - len(matched_d)
                else:
                    fn[ai] += len(gt_here)
                    fp[ai] += len(dt_here)

    det_a = np.zeros(n_a)
    ass_a = np.zeros(n_a)
    hota = np.zeros(n_a)
    for ai in range(n_a):
        denom = tp[ai] + fn[ai] + fp[ai]
        det_a[ai] = tp[ai] / denom if denom else 0.0
        if tp[ai]:
            acc = 0.0
            for (vid, gi, di), tpa in ass_num[ai].items():
                fna = gt_counts[(vid, gi)] - tpa
                fpa = dt_counts[(vid, di)] - tpa
                acc += tpa * (tpa / (tpa + fna + fpa))
            ass_a[ai] = acc / tp[ai]
        hota[ai] = np.sqrt(det_a[ai] * ass_a[ai])
    return {
        "HOTA": float(hota.mean()),
        "DetA": float(det_a.mean()),
        "AssA": float(ass_a.mean()),
    }


def _present(track, f):
    segs = track["segmentations"]
    return f < len(segs) and segs[f] is not None


class BURSTEvaluator:
    """Accumulates track predictions; computes HOTA + TrackMAP per split."""

    def __init__(
        self,
        class_splits: Optional[Dict[str, Sequence[int]]] = None,
        dataset_info=None,
        min_area: int = 20,
    ):
        self.predictions: List[Dict] = []
        self.class_splits = class_splits or {}
        self.min_area = min_area
        self._contig_to_dataset_id = (
            {v: k for k, v in dataset_info.id_map.items()}
            if dataset_info is not None else None
        )

    def process(self, prediction: Dict):
        """prediction: {video_id, category_id, score, segmentations}."""
        self.predictions.append(prediction)

    def process_video(self, video_id, topk_out, image_size, orig_size):
        """Model top-k output -> track predictions.  Frames where a track's
        mask covers < ``min_area`` pixels are marked absent (None), the
        reference's ``m.sum() > 20`` validity rule
        (``data/evals/burst_eval.py:203-218``); contiguous labels unmap to
        LVIS ids (``:146-160``)."""
        from openvis_tpu.evals.ytvis_eval import masks_to_video_rles

        assert self._contig_to_dataset_id is not None
        scores = np.asarray(topk_out["scores"])
        labels = np.asarray(topk_out["labels"])
        masks = np.asarray(topk_out["mask_logits"])
        for i in range(len(scores)):
            segs = masks_to_video_rles(masks[i], image_size, orig_size)
            segs = [
                s if s is not None and rle_util.area(s) > self.min_area
                else None
                for s in segs
            ]
            if all(s is None for s in segs):
                continue
            self.predictions.append({
                "video_id": int(video_id),
                "category_id": self._contig_to_dataset_id[int(labels[i])],
                "score": float(scores[i]),
                "segmentations": segs,
            })

    def evaluate(self, gts: List[Dict], cat_ids: Sequence[int]) -> Dict[str, float]:
        results: Dict[str, float] = {}

        # --- HOTA: averaged over classes with GT ---
        hotas = []
        for cat in cat_ids:
            gt_c = defaultdict(list)
            dt_c = defaultdict(list)
            for g in gts:
                if g["category_id"] == cat:
                    gt_c[g["video_id"]].append(g)
            for d in self.predictions:
                if d["category_id"] == cat:
                    dt_c[d["video_id"]].append(d)
            if not gt_c:
                continue
            hotas.append(hota_for_class(gt_c, dt_c))
        if hotas:
            for k in ("HOTA", "DetA", "AssA"):
                results[k] = float(np.mean([h[k] for h in hotas]))

        # --- TrackMAP (COCO-protocol, spatio-temporal IoU) ---
        splits = {"all": list(cat_ids), **{
            k: list(v) for k, v in self.class_splits.items() if v
        }}
        for split, cats in splits.items():
            ev = YTVOSEval(
                [g for g in gts if g["category_id"] in cats],
                [d for d in self.predictions if d["category_id"] in cats],
                cats,
            )
            ev.accumulate()
            s = ev.summarize()
            suffix = "" if split == "all" else f"_{split}"
            results[f"mAP{suffix}"] = s["AP"]
        return results
