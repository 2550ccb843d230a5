"""Render GT / prediction mask overlays for visual inspection.

Rebuilds the reference's manual dataset-visualization scripts — the
``__main__`` blocks of ``/root/reference/openvis/data/datasets/ytvis.py:351-390``
and ``burst.py`` (Detectron2 ``Visualizer.draw_dataset_dict`` over every
frame) — as a standalone PIL-only tool (no detectron2/cv2 in this image),
and extends them to prediction dumps: the ``results_{dataset}.json`` files
written by ``engine.evaluate_dataset`` share the YTVIS result schema
(video_id / category_id / score / per-frame RLE), so the same renderer
inspects model output.

Usage:
  # GT overlays for a registered dataset
  python tools/visualize.py --dataset ytvis_2019_val --root datasets \
      --out vis/ [--max-videos 5] [--max-frames 20]

  # prediction overlays from an eval dump
  python tools/visualize.py --dataset ytvis_2019_val --root datasets \
      --results output/results_ytvis_2019_val.json --score-threshold 0.3 \
      --out vis_pred/
"""

from __future__ import annotations

import argparse
import colorsys
import os
import sys
from typing import Dict, List, Optional, Sequence

import numpy as np
from PIL import Image, ImageDraw

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from openvis_tpu.data import catalog, rle
from openvis_tpu.data.mapper import load_burst_records, load_ytvis_records


def instance_color(idx: int) -> tuple:
    """Deterministic per-track color: golden-ratio hue walk at full
    saturation (stable across frames so a track keeps its color)."""
    h = (idx * 0.61803398875) % 1.0
    r, g, b = colorsys.hsv_to_rgb(h, 0.85, 1.0)
    return int(r * 255), int(g * 255), int(b * 255)


def _mask_boundary(mask: np.ndarray) -> np.ndarray:
    """1-pixel inner boundary via 4-neighbour shifts (no cv2)."""
    m = mask.astype(bool)
    interior = m.copy()
    interior[1:, :] &= m[:-1, :]
    interior[:-1, :] &= m[1:, :]
    interior[:, 1:] &= m[:, :-1]
    interior[:, :-1] &= m[:, 1:]
    return m & ~interior


def overlay_instances(
    img: np.ndarray,
    masks: Sequence[np.ndarray],
    labels: Sequence[str],
    colors: Optional[Sequence[tuple]] = None,
    alpha: float = 0.45,
) -> Image.Image:
    """Alpha-blend instance masks onto an (H, W, 3) uint8 frame, draw the
    mask boundary opaque, and tag each instance with its label at the mask
    top-left (Visualizer.draw_dataset_dict equivalent, PIL-only)."""
    out = img.astype(np.float32).copy()
    colors = colors or [instance_color(i) for i in range(len(masks))]
    anchors = []
    for mask, color in zip(masks, colors):
        m = np.asarray(mask, bool)
        if not m.any():
            anchors.append(None)
            continue
        c = np.asarray(color, np.float32)
        out[m] = (1 - alpha) * out[m] + alpha * c
        out[_mask_boundary(m)] = c
        ys, xs = np.nonzero(m)
        anchors.append((int(xs.min()), int(ys.min())))
    pil = Image.fromarray(out.clip(0, 255).astype(np.uint8))
    draw = ImageDraw.Draw(pil)
    for anchor, label, color in zip(anchors, labels, colors):
        if anchor is None or not label:
            continue
        x, y = anchor
        tw = draw.textlength(label)
        draw.rectangle([x, max(0, y - 11), x + tw + 2, max(11, y)],
                       fill=tuple(color))
        draw.text((x + 1, max(0, y - 11)), label, fill=(0, 0, 0))
    return pil


def _gt_tracks(record: Dict, thing_classes: Sequence[str],
               id_map: Dict[int, int]) -> List[Dict]:
    h, w = record["height"], record["width"]
    tracks = []
    for ann in record["annotations"]:
        name = thing_classes[id_map[ann["category_id"]]] \
            if ann["category_id"] in id_map else str(ann["category_id"])
        tracks.append({
            "label": name,
            "masks": [
                rle.segm_to_mask(s, h, w) if s else None
                for s in ann["segmentations"][:record["length"]]
            ],
        })
    return tracks


def _pred_tracks(preds: List[Dict], video_id: int, h: int, w: int, t: int,
                 thing_classes: Sequence[str], id_map: Dict[int, int],
                 score_threshold: float) -> List[Dict]:
    tracks = []
    for p in preds:
        if p["video_id"] != video_id or p.get("score", 1.0) < score_threshold:
            continue
        cid = p["category_id"]
        name = thing_classes[id_map[cid]] if cid in id_map else str(cid)
        tracks.append({
            "label": f"{name} {p.get('score', 1.0):.2f}",
            "masks": [
                rle.segm_to_mask(s, h, w) if s else None
                for s in p["segmentations"][:t]
            ],
        })
    return tracks


def render_video(record: Dict, tracks: List[Dict], out_dir: str,
                 max_frames: Optional[int] = None) -> List[str]:
    """Write one overlay jpg per frame; returns the written paths."""
    os.makedirs(out_dir, exist_ok=True)
    written = []
    fns = record["file_names"][: max_frames or len(record["file_names"])]
    for fi, fn in enumerate(fns):
        img = np.asarray(Image.open(fn).convert("RGB"))
        masks, labels, colors = [], [], []
        for ti, tr in enumerate(tracks):
            m = tr["masks"][fi] if fi < len(tr["masks"]) else None
            if m is None:
                continue
            masks.append(m)
            labels.append(tr["label"])
            colors.append(instance_color(ti))
        pil = overlay_instances(img, masks, labels, colors)
        path = os.path.join(out_dir, os.path.basename(fn))
        pil.save(path)
        written.append(path)
    return written


def main(argv: Optional[List[str]] = None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset", required=True, help="registered dataset name")
    p.add_argument("--root", required=True, help="datasets root dir")
    p.add_argument("--out", required=True, help="output dir")
    p.add_argument("--results", default="",
                   help="results_{ds}.json prediction dump; GT if omitted")
    p.add_argument("--score-threshold", type=float, default=0.3)
    p.add_argument("--max-videos", type=int, default=None)
    p.add_argument("--max-frames", type=int, default=None)
    args = p.parse_args(argv)

    info = catalog.get(args.dataset)
    load = load_burst_records if info.kind == "burst" else load_ytvis_records
    records = (load(info, args.root) if info.kind == "burst"
               else load(info, args.root, is_train=False))
    records = records[: args.max_videos or len(records)]

    preds = None
    if args.results:
        import json
        with open(args.results) as f:
            preds = json.load(f)

    for rec in records:
        h, w, t = rec["height"], rec["width"], rec["length"]
        if preds is None:
            tracks = _gt_tracks(rec, info.thing_classes, info.id_map)
        else:
            tracks = _pred_tracks(preds, rec["video_id"], h, w, t,
                                  info.thing_classes, info.id_map,
                                  args.score_threshold)
        vid_dir = os.path.join(args.out, str(rec["video_id"]))
        paths = render_video(rec, tracks, vid_dir, args.max_frames)
        print(f"video {rec['video_id']}: {len(tracks)} tracks, "
              f"{len(paths)} frames -> {vid_dir}")


if __name__ == "__main__":
    main()
