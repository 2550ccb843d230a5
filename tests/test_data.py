"""Data layer: RLE roundtrip, catalogs, mapper + loader on a synthetic
YTVIS-format dataset."""

import dataclasses
import json
import os

import numpy as np
import pytest
from PIL import Image

from openvis_tpu.config import Config
from openvis_tpu.data import catalog, rle
from openvis_tpu.data.mapper import (
    YTVISClipMapper,
    load_ytvis_records,
    select_frames,
)


def test_rle_roundtrip():
    rng = np.random.RandomState(0)
    for _ in range(5):
        m = (rng.rand(37, 53) > 0.7).astype(np.uint8)
        enc = rle.encode(m)
        assert isinstance(enc["counts"], str)
        np.testing.assert_array_equal(rle.decode(enc), m)
        assert rle.area(enc) == int(m.sum())


def test_rle_leb128_negative_deltas():
    # runs that shrink produce negative deltas — exercise sign extension
    m = np.zeros((10, 10), np.uint8)
    m[0:9, 0] = 1
    m[0:2, 2] = 1
    enc = rle.encode(m)
    np.testing.assert_array_equal(rle.decode(enc), m)


def test_polygon_rasterization():
    poly = [[2.0, 2.0, 8.0, 2.0, 8.0, 8.0, 2.0, 8.0]]
    m = rle.polygons_to_mask(poly, 12, 12)
    assert m[5, 5] == 1 and m[0, 0] == 0
    assert 36 <= m.sum() <= 64  # boundary handling tolerance


def test_catalog_counts():
    assert len(catalog.get("ytvis_2019_train").thing_classes) == 40
    assert len(catalog.get("ovis_train").thing_classes) == 25
    assert len(catalog.get("lvvis_val").thing_classes) == 1196
    assert len(catalog.get("ytvis_2019_train2coco").thing_classes) == 101
    assert len(catalog.get("burst_val").thing_classes) == 482


def test_select_frames_properties():
    rng = np.random.RandomState(0)
    for _ in range(20):
        idxs = select_frames(rng, 30, 2, 5)
        assert len(idxs) == 2
        assert 0 <= min(idxs) and max(idxs) < 30
        assert abs(idxs[1] - idxs[0]) <= 10
        assert idxs == sorted(idxs)


def test_select_frames_ratio_subsampling():
    """sampling_frame_ratio < 1 (ytvis_dataset_mapper.py:219-228): single
    frame drawn from round(len*ratio) evenly spaced candidates."""
    rng = np.random.RandomState(0)
    allowed = set(np.linspace(0, 30, num=15, endpoint=False).astype(int))
    seen = set()
    for _ in range(50):
        idxs = select_frames(rng, 30, 1, 5, ratio=0.5)
        assert len(idxs) == 1 and idxs[0] in allowed
        seen.add(idxs[0])
    assert len(seen) > 3  # actually samples across the grid
    # degenerate: one surviving frame -> middle
    assert select_frames(rng, 9, 1, 5, ratio=0.05) == [4]


def test_select_frames_contiguous_window():
    """frame_range*2+1 == num -> contiguous window sampling
    (ytvis_dataset_mapper.py:231-246)."""
    rng = np.random.RandomState(0)
    for _ in range(20):
        idxs = select_frames(rng, 30, 5, 2)
        assert idxs == list(range(idxs[0], idxs[0] + 5))
    # short video: indices resampled with replacement, all in range
    idxs = select_frames(rng, 3, 5, 2)
    assert len(idxs) == 5 and all(0 <= i < 3 for i in idxs)


@pytest.fixture()
def synthetic_ytvis(tmp_path):
    """Two 4-frame videos with 2 instances in YTVIS json format."""
    root = tmp_path
    img_dir = root / "vids" / "JPEGImages"
    h, w, t = 48, 64, 4
    videos, annotations = [], []
    rng = np.random.RandomState(0)
    for vid in (1, 2):
        vdir = img_dir / f"v{vid}"
        vdir.mkdir(parents=True)
        file_names = []
        for f in range(t):
            arr = rng.randint(0, 255, (h, w, 3), np.uint8)
            Image.fromarray(arr).save(vdir / f"{f:05d}.jpg")
            file_names.append(f"v{vid}/{f:05d}.jpg")
        videos.append({
            "id": vid, "height": h, "width": w, "length": t,
            "file_names": file_names,
        })
        for inst in range(2):
            segs = []
            for f in range(t):
                m = np.zeros((h, w), np.uint8)
                m[10 + inst * 5 : 25 + inst * 5, 10 + f : 30 + f] = 1
                segs.append(rle.encode(m))
            annotations.append({
                "id": vid * 10 + inst, "video_id": vid,
                "category_id": 1 + inst,
                "segmentations": segs,
                "bboxes": [[10, 10, 20, 15]] * t,
                "iscrowd": 0,
            })
    js = {
        "videos": videos,
        "annotations": annotations,
        "categories": [{"id": i, "name": f"c{i}"} for i in (1, 2)],
    }
    (root / "vids").mkdir(exist_ok=True)
    with open(root / "train.json", "w") as f:
        json.dump(js, f)
    info = catalog.DatasetInfo(
        name="synth", image_root="vids/JPEGImages", json_file="train.json",
        thing_classes=("c1", "c2"), id_map={1: 0, 2: 1},
    )
    return str(root), info


def test_ytvis_mapper(synthetic_ytvis):
    root, info = synthetic_ytvis
    cfg = Config()
    inp = dataclasses.replace(
        cfg.input, min_size_train=(48,), max_size_train=96,
        pad_size=(64, 96), max_instances=6,
    )
    records = load_ytvis_records(info, root, is_train=True)
    assert len(records) == 2 and records[0]["length"] == 4
    mapper = YTVISClipMapper(
        info, inp, cfg.model.pixel_mean, cfg.model.pixel_std, is_train=True
    )
    rng = np.random.RandomState(1)
    s = mapper(rng, records[0])
    t = inp.sampling_frame_num
    assert s["pixels"].shape[0] == t
    assert s["pixels"].shape[1] % 32 == 0 and s["pixels"].shape[2] % 32 == 0
    assert s["masks"].shape[:2] == (6, t)
    assert s["valid"][:2].all() and not s["valid"][2:].any()
    assert s["labels"][:2].tolist() == [0, 1]
    assert s["masks"][0].sum() > 0
    # mask lives inside the valid image region
    hh, ww = s["image_size"]
    assert s["masks"][0][:, hh:, :].sum() == 0
    assert s["masks"][0][:, :, ww:].sum() == 0


def test_eval_mapper_all_frames(synthetic_ytvis):
    root, info = synthetic_ytvis
    cfg = Config()
    inp = dataclasses.replace(
        cfg.input, min_size_test=48, max_size_test=96, pad_size=(64, 96),
        max_instances=6,
    )
    records = load_ytvis_records(info, root, is_train=False)
    mapper = YTVISClipMapper(
        info, inp, cfg.model.pixel_mean, cfg.model.pixel_std, is_train=False
    )
    s = mapper(np.random.RandomState(0), records[0])
    assert s["pixels"].shape[0] == 4  # all frames at eval


def test_crop_augmentation():
    """Reference composition (augmentation.py:326-333): RandomApply(prob) of
    [pre-resize + crop] BEFORE the main resize; frames and masks transform
    identically."""
    from openvis_tpu.data.transforms import ClipAugmenter

    rng = np.random.RandomState(2)
    frames = [rng.randint(0, 255, (60, 90, 3), np.uint8) for _ in range(2)]
    masks = [[np.ones((60, 90), np.uint8)] for _ in range(2)]
    aug = ClipAugmenter(
        (48,), 96, flip=False, is_train=True,
        crop=True, crop_type="absolute_range", crop_size=(24, 40),
        crop_prob=1.0, crop_pre_sizes=(50,),
    )
    out_f, out_m, size = aug(rng, frames, masks)
    # pre-resize short side 50 -> crop H,W in [24,40] -> main resize to 48
    assert min(size) == 48 or max(size) == 96
    assert out_f[0].shape[:2] == tuple(size)
    assert out_m[0][0].shape == tuple(size)
    assert out_f[0].shape == out_f[1].shape  # clip-consistent

    # prob 0.0 -> no crop: plain shortest-edge resize of the full image
    aug_nc = ClipAugmenter(
        (48,), 96, flip=False, is_train=True,
        crop=True, crop_type="absolute_range", crop_size=(24, 40),
        crop_prob=0.0,
    )
    _, _, size_nc = aug_nc(np.random.RandomState(2), frames, masks)
    assert size_nc == (48, 72)


def test_resize_scale_clip_and_fixed_size_crop():
    """ResizeScaleClip + FixedSizeCropClip (augmentation.py:127-182,
    :258-313): one clip-level draw; resize fits inside the scaled target
    box; crop when larger, pad bottom/right when smaller."""
    from openvis_tpu.data.transforms import (
        fixed_size_crop_clip,
        resize_scale_clip_size,
    )

    # deterministic scale: min == max
    rng = np.random.RandomState(0)
    nh, nw = resize_scale_clip_size(rng, 60, 90, 1.0, 1.0, 30, 30)
    # output_scale = min(30/60, 30/90) = 1/3 -> (20, 30)
    assert (nh, nw) == (20, 30)
    nh2, nw2 = resize_scale_clip_size(rng, 60, 90, 2.0, 2.0, 30, 30)
    assert (nh2, nw2) == (40, 60)

    # crop: input larger than target -> all frames share ONE offset
    rng = np.random.RandomState(1)
    frames = [np.arange(40 * 50 * 3, dtype=np.uint8).reshape(40, 50, 3)
              for _ in range(3)]
    masks = [[np.ones((40, 50), np.uint8)] for _ in range(3)]
    of, om = fixed_size_crop_clip(rng, frames, masks, (24, 24))
    assert all(f.shape == (24, 24, 3) for f in of)
    assert om[0][0].shape == (24, 24)
    np.testing.assert_array_equal(of[0], of[1])  # clip-consistent offset

    # pad: input smaller -> bottom/right pad with 128 (frames) / 0 (masks)
    small = [np.full((10, 12, 3), 7, np.uint8)]
    smask = [[np.ones((10, 12), np.uint8)]]
    pf, pm = fixed_size_crop_clip(np.random.RandomState(0), small, smask,
                                  (16, 16))
    assert pf[0].shape == (16, 16, 3)
    assert (pf[0][:10, :12] == 7).all() and (pf[0][10:, :] == 128).all()
    assert (pm[0][0][10:, :] == 0).all() and (pm[0][0][:10, :12] == 1).all()


def test_color_jitter_semantics():
    """d2 BlendTransform semantics: brightness scales, contrast blends with
    the mean, saturation blends with ITU-R grayscale (no-op on gray)."""
    from openvis_tpu.data.transforms import color_jitter

    rng = np.random.RandomState(0)
    img = rng.randint(0, 200, (8, 10, 3), np.uint8)

    class FixedRng:
        def uniform(self, lo, hi):
            return 1.1

    out = color_jitter(FixedRng(), img, ("brightness",))
    np.testing.assert_allclose(
        out, np.clip(img.astype(np.float32) * 1.1, 0, 255).astype(np.uint8)
    )
    out = color_jitter(FixedRng(), img, ("contrast",))
    m = img.astype(np.float32).mean()
    np.testing.assert_allclose(
        out,
        np.clip(m * -0.1 + img.astype(np.float32) * 1.1, 0, 255).astype(np.uint8),
        atol=1,
    )
    gray = np.full((8, 10, 3), 77, np.uint8)
    out = color_jitter(FixedRng(), gray, ("saturation",))
    np.testing.assert_allclose(out, gray, atol=1)


def test_clip_augmenter_color_consistent_shapes(synthetic_ytvis):
    import dataclasses

    root, info = synthetic_ytvis
    cfg = Config()
    inp = dataclasses.replace(
        cfg.input, min_size_train=(48,), max_size_train=96,
        pad_size=(64, 96), max_instances=6,
        augmentations=("brightness", "contrast", "saturation"),
    )
    records = load_ytvis_records(info, root, is_train=True)
    mapper = YTVISClipMapper(
        info, inp, cfg.model.pixel_mean, cfg.model.pixel_std, is_train=True
    )
    s = mapper(np.random.RandomState(2), records[0])
    assert s["pixels"].shape[1] % 32 == 0
    assert np.isfinite(s["pixels"]).all()


def test_burst_loader(tmp_path):
    from openvis_tpu.data.mapper import load_burst_records

    h, w = 32, 40
    m = np.zeros((h, w), np.uint8)
    m[5:15, 5:20] = 1
    r = rle.encode(m)
    js = {
        "sequences": [{
            "id": 7, "dataset": "YFCC100M", "seq_name": "v1",
            "height": h, "width": w,
            "annotated_image_paths": ["a.jpg", "b.jpg"],
            "track_category_ids": {"1": 5},
            "segmentations": [{"1": {"rle": r["counts"]}}, {}],
        }],
    }
    with open(tmp_path / "burst.json", "w") as f:
        json.dump(js, f)
    info = catalog.DatasetInfo(
        name="synth_burst", image_root="frames", json_file="burst.json",
        thing_classes=("x",) * 5, id_map={5: 4}, kind="burst",
    )
    recs = load_burst_records(info, str(tmp_path))
    assert len(recs) == 1
    rec = recs[0]
    assert rec["length"] == 2 and rec["video_id"] == 7
    assert len(rec["annotations"]) == 1
    segs = rec["annotations"][0]["segmentations"]
    assert segs[1] is None
    np.testing.assert_array_equal(rle.decode(segs[0]), m)
    assert rec["annotations"][0]["category_id"] == 5
