"""tools/visualize.py: GT + prediction overlay rendering (the reference's
manual dataset-visualization scripts, ytvis.py:351-390)."""

import json
import os

import numpy as np
from PIL import Image

from openvis_tpu.data import catalog, rle


def _make_dataset(tmp_path, name):
    h, w, t = 40, 56, 3
    img_dir = tmp_path / "vids" / "JPEGImages" / "v1"
    img_dir.mkdir(parents=True)
    fns = []
    for f in range(t):
        Image.fromarray(np.full((h, w, 3), 80, np.uint8)).save(
            img_dir / f"{f:05d}.jpg")
        fns.append(f"v1/{f:05d}.jpg")
    m = np.zeros((h, w), np.uint8)
    m[5:20, 10:30] = 1
    js = {
        "videos": [{"id": 7, "height": h, "width": w, "length": t,
                    "file_names": fns}],
        "annotations": [{"id": 1, "video_id": 7, "category_id": 2,
                         "segmentations": [rle.encode(m)] * t,
                         "bboxes": [[10, 5, 20, 15]] * t, "iscrowd": 0}],
        "categories": [{"id": 1, "name": "c1"}, {"id": 2, "name": "c2"}],
    }
    with open(tmp_path / "gt.json", "w") as f:
        json.dump(js, f)
    catalog.register(catalog.DatasetInfo(
        name=name, image_root="vids/JPEGImages", json_file="gt.json",
        thing_classes=("c1", "c2"), id_map={1: 0, 2: 1},
    ))
    return h, w, t, m


def test_overlay_instances_blends_and_labels():
    from tools.visualize import overlay_instances

    img = np.full((32, 32, 3), 100, np.uint8)
    mask = np.zeros((32, 32), bool)
    mask[8:20, 8:20] = True
    out = np.asarray(overlay_instances(img, [mask], ["cat 0.90"]))
    assert out.shape == (32, 32, 3)
    # masked interior recolored, far corner untouched
    assert not np.array_equal(out[14, 14], [100, 100, 100])
    assert np.array_equal(out[31, 31], [100, 100, 100])


def test_visualize_gt_and_predictions(tmp_path):
    from tools import visualize

    h, w, t, m = _make_dataset(tmp_path, "synth_vis")

    gt_out = tmp_path / "vis_gt"
    visualize.main([
        "--dataset", "synth_vis", "--root", str(tmp_path),
        "--out", str(gt_out), "--max-frames", "2",
    ])
    frames = sorted((gt_out / "7").iterdir())
    assert len(frames) == 2
    px = np.asarray(Image.open(frames[0])).astype(int)
    # jpeg re-encode shifts flat areas by ~1-3; overlays shift by >>20
    assert np.abs(px[10, 15] - 80).max() > 20   # inside GT mask
    assert np.abs(px[35, 50] - 80).max() <= 4   # background

    # prediction dump in the engine's results_{ds}.json schema
    m2 = np.zeros((h, w), np.uint8)
    m2[25:35, 30:50] = 1
    preds = [
        {"video_id": 7, "category_id": 1, "score": 0.9,
         "segmentations": [rle.encode(m2)] * t},
        {"video_id": 7, "category_id": 2, "score": 0.05,  # below threshold
         "segmentations": [rle.encode(m)] * t},
    ]
    with open(tmp_path / "results.json", "w") as f:
        json.dump(preds, f)
    pred_out = tmp_path / "vis_pred"
    visualize.main([
        "--dataset", "synth_vis", "--root", str(tmp_path),
        "--results", str(tmp_path / "results.json"),
        "--score-threshold", "0.3", "--out", str(pred_out),
    ])
    frames = sorted((pred_out / "7").iterdir())
    assert len(frames) == t
    px = np.asarray(Image.open(frames[0])).astype(int)
    assert np.abs(px[30, 40] - 80).max() > 20   # inside pred mask
    assert np.abs(px[10, 15] - 80).max() <= 4   # thresholded-out pred
