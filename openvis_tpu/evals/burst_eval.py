"""BURST evaluation: HOTA + TrackMAP over class splits.

Rebuild of the reference's BURST chain (``openvis/data/evals/burst_eval.py:
24-177`` -> TrackEval wrapper ``bursteval.py:8-60`` + vendored
``BURSTSingle`` dataset): predictions are per-video tracks of per-frame
masks; metrics are

  * **HOTA** (TrackEval ``hota.py`` EXACT semantics): per class, each video
    is a sequence — per frame, ONE Hungarian matching on
    ``global_alignment_score * similarity``, then per alpha in {0.05..0.95}
    matches are kept when ``similarity >= alpha - eps``.  The global
    alignment score is the Jaccard of per-frame Jaccard-normalized
    similarities: ``pot += s / (s.sum(0) + s.sum(1) - s)``, ``glob =
    pot / (gt_count + dt_count - pot)``.  DetA = TP/(TP+FN+FP), AssA =
    sum over matched pairs of ``m * m/(gtc+dtc-m)`` / TP (sequences combine
    by summing counters — TrackEval ``combine_sequences`` weighted-average
    form), HOTA = mean_alpha sqrt(DetA * AssA);
  * **TrackMAP**: track-level AP with spatio-temporal IoU — shared with the
    YTVIS evaluator's COCO-protocol machinery.

Per-frame mask IoU matrices run through the native C kernel
(``native/rle_ops.c:rle_iou_matrix``, one call per (video, frame)) with a
pure-Python fallback; one ``linear_sum_assignment`` per (video, frame) —
NOT per alpha — so real-scale BURST (hundreds of videos x hundreds of
frames x 19 alphas) stays minutes of host time.

Class splits (all/common/uncommon) follow the reference's category tables
(``burst.py:510-517``); this repo's catalogs populate common=64 /
uncommon=418 LVIS ids (the reference ships the lists empty, in which case
those splits would mirror "all").
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Optional, Sequence

import numpy as np
from scipy.optimize import linear_sum_assignment

from openvis_tpu.data import rle as rle_util
from openvis_tpu.evals.ytvis_eval import YTVOSEval
from openvis_tpu.native import native_iou_matrix

ALPHAS = np.arange(0.05, 0.99, 0.05)
_EPS = float(np.finfo("float").eps)


def _decode_flat(counts: np.ndarray) -> np.ndarray:
    """RLE counts -> flat bool mask (runs alternate 0/1 starting with 0)."""
    vals = np.zeros(len(counts), bool)
    vals[1::2] = True
    return np.repeat(vals, counts)


def _iou_matrix(counts_a: List[np.ndarray], counts_b: List[np.ndarray]) -> np.ndarray:
    """(na, nb) pairwise RLE IoU — native C kernel, numpy decode fallback."""
    out = native_iou_matrix(counts_a, counts_b)
    if out is not None:
        return out
    flat_a = [_decode_flat(c) for c in counts_a]
    flat_b = [_decode_flat(c) for c in counts_b]
    out = np.zeros((len(counts_a), len(counts_b)))
    for i, ma in enumerate(flat_a):
        for j, mb in enumerate(flat_b):
            inter = np.logical_and(ma, mb).sum()
            uni = np.logical_or(ma, mb).sum()
            out[i, j] = inter / uni if uni else 0.0
    return out


def _track_counts(tracks: List[Dict], t: int):
    """-> (present (N, T) bool, counts[n][f] int64 RLE-count arrays)."""
    n = len(tracks)
    present = np.zeros((n, t), bool)
    counts = [[None] * t for _ in range(n)]
    for i, tr in enumerate(tracks):
        segs = tr["segmentations"]
        for f in range(min(t, len(segs))):
            if segs[f] is not None:
                present[i, f] = True
                counts[i][f] = np.asarray(
                    rle_util._counts_list(segs[f]), np.int64
                )
    return present, counts


def hota_for_class(
    gt_tracks: Dict[int, List[Dict]],
    dt_tracks: Dict[int, List[Dict]],
) -> Dict[str, float]:
    """gt_tracks/dt_tracks: video_id -> list of {segmentations: [rle|None]}.
    Returns HOTA / DetA / AssA for one class (TrackEval hota.py semantics;
    videos are sequences, combined by summing TP/FN/FP and the
    TP-weighted AssA numerator)."""
    n_a = len(ALPHAS)
    tp = np.zeros(n_a)
    fn = np.zeros(n_a)
    fp = np.zeros(n_a)
    ass_sum = np.zeros(n_a)  # sum over pairs of m * m/(gtc+dtc-m)

    for vid in sorted(set(gt_tracks) | set(dt_tracks)):
        gts = gt_tracks.get(vid, [])
        dts = dt_tracks.get(vid, [])
        t = max((len(tr["segmentations"]) for tr in gts + dts), default=0)
        present_g, counts_g = _track_counts(gts, t)
        present_d, counts_d = _track_counts(dts, t)
        n_g, n_d = len(gts), len(dts)

        # pass 1: per-frame similarity + Jaccard-normalized potential
        # (TrackEval hota.py:40-58)
        sims = {}
        pot = np.zeros((n_g, n_d))
        for f in range(t):
            gi = np.flatnonzero(present_g[:, f])
            di = np.flatnonzero(present_d[:, f])
            if len(gi) and len(di):
                s = _iou_matrix([counts_g[i][f] for i in gi],
                                [counts_d[j][f] for j in di])
                sims[f] = (gi, di, s)
                denom = s.sum(0)[None, :] + s.sum(1)[:, None] - s
                sim_iou = np.zeros_like(s)
                m = denom > _EPS
                sim_iou[m] = s[m] / denom[m]
                pot[np.ix_(gi, di)] += sim_iou
        gt_cnt = present_g.sum(1).astype(float)
        dt_cnt = present_d.sum(1).astype(float)
        pair_cnt = gt_cnt[:, None] + dt_cnt[None, :]
        glob = pot / np.maximum(pair_cnt - pot, _EPS)

        # pass 2: ONE matching per frame on glob * sim, per-alpha keep by
        # similarity threshold (TrackEval hota.py:60-92)
        matches = np.zeros((n_a, n_g, n_d))
        for f in range(t):
            gi = np.flatnonzero(present_g[:, f])
            di = np.flatnonzero(present_d[:, f])
            if len(gi) == 0:
                fp += len(di)
                continue
            if len(di) == 0:
                fn += len(gi)
                continue
            gi, di, s = sims[f]
            score = glob[np.ix_(gi, di)] * s
            r, c = linear_sum_assignment(-score)
            msim = s[r, c]
            keep = msim[None, :] >= ALPHAS[:, None] - _EPS  # (n_a, n_match)
            nm = keep.sum(1)
            tp += nm
            fn += len(gi) - nm
            fp += len(di) - nm
            for ai in np.flatnonzero(nm):
                sel = keep[ai]
                matches[ai, gi[r[sel]], di[c[sel]]] += 1.0

        # association numerator for this sequence (hota.py:95-101)
        den = np.maximum(pair_cnt[None] - matches, _EPS)
        ass_sum += (matches * (matches / den)).sum(axis=(1, 2))

    det_a = tp / np.maximum(1.0, tp + fn + fp)
    ass_a = ass_sum / np.maximum(1.0, tp)
    hota = np.sqrt(det_a * ass_a)
    return {
        "HOTA": float(hota.mean()),
        "DetA": float(det_a.mean()),
        "AssA": float(ass_a.mean()),
    }


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
