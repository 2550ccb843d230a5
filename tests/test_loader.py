"""Train loader: no-discard bucket assembly + worker-pool throughput."""

import dataclasses
import json
import time

import numpy as np
import pytest
from PIL import Image

from openvis_tpu.config import Config
from openvis_tpu.data import catalog, rle
from openvis_tpu.data.loader import TrainLoader, bucket_batches


def _fake_sample(shape, tag):
    t, h, w = shape
    return {
        "pixels": np.zeros((t, h, w, 3), np.float32) + tag,
        "image_size": np.asarray([h, w]),
        "orig_size": np.asarray([h, w]),
        "labels": np.zeros((2,), np.int32),
        "masks": np.zeros((2, t, h, w), np.float32),
        "valid": np.ones((2,), bool),
        "frame_valid": np.ones((2, t), bool),
    }


def test_bucket_batches_no_discard():
    """Every sample lands in exactly one emitted batch; batches are
    shape-homogeneous (round-1 loader dropped orientation mismatches)."""
    land = (2, 8, 12)
    port = (2, 12, 8)
    # interleave so no 2 consecutive samples share a shape
    stream = [
        _fake_sample(land if i % 2 == 0 else port, i) for i in range(8)
    ]
    batches = list(bucket_batches(iter(stream), batch_size=2))
    assert len(batches) == 4
    seen = []
    for b in batches:
        px = np.asarray(b["pixels"])
        assert px.shape[0] == 2
        seen.extend(int(px[i].flat[0]) for i in range(2))
    assert sorted(seen) == list(range(8))
    # first two emitted batches must be one landscape + one portrait
    shapes = {tuple(np.asarray(b["pixels"]).shape[2:4]) for b in batches[:2]}
    assert shapes == {(8, 12), (12, 8)}


@pytest.fixture()
def tiny_ytvis_root(tmp_path):
    h, w, t = 48, 64, 4
    img_dir = tmp_path / "vids" / "JPEGImages" / "v1"
    img_dir.mkdir(parents=True)
    rng = np.random.RandomState(0)
    fns = []
    for f in range(t):
        Image.fromarray(rng.randint(0, 255, (h, w, 3), np.uint8)).save(
            img_dir / f"{f:05d}.jpg"
        )
        fns.append(f"v1/{f:05d}.jpg")
    m = np.zeros((h, w), np.uint8)
    m[10:30, 10:40] = 1
    js = {
        "videos": [{"id": 1, "height": h, "width": w, "length": t,
                    "file_names": fns}],
        "annotations": [{"id": 1, "video_id": 1, "category_id": 1,
                         "segmentations": [rle.encode(m)] * t,
                         "bboxes": [[10, 10, 30, 20]] * t, "iscrowd": 0}],
        "categories": [{"id": 1, "name": "c1"}],
    }
    with open(tmp_path / "train.json", "w") as f:
        json.dump(js, f)
    catalog.register(catalog.DatasetInfo(
        name="synth_loader_train", image_root="vids/JPEGImages",
        json_file="train.json", thing_classes=("c1",), id_map={1: 0},
    ))
    return str(tmp_path)


def test_loader_ratio_mismatch_fails_fast(tiny_ytvis_root):
    """1 train dataset + 2 ratio entries must raise at construction — in
    round 2 this silently killed every worker thread and train_net hung
    forever on the first batch."""
    cfg = Config()
    cfg = dataclasses.replace(
        cfg,
        datasets=dataclasses.replace(
            cfg.datasets, root=tiny_ytvis_root,
            train=("synth_loader_train",), dataset_ratio=(1.0, 0.75),
        ),
    )
    with pytest.raises(ValueError, match="dataset_ratio"):
        TrainLoader(cfg, seed=0, num_workers=1, prefetch=1)


def test_loader_worker_error_propagates(tiny_ytvis_root, monkeypatch):
    """An exception inside a decode worker must surface in __next__ instead
    of hanging the training loop."""
    cfg = Config()
    cfg = dataclasses.replace(
        cfg,
        input=dataclasses.replace(
            cfg.input, min_size_train=(48,), max_size_train=96,
            pad_size=(64, 96), max_instances=4, sampling_frame_num=2,
        ),
        datasets=dataclasses.replace(
            cfg.datasets, root=tiny_ytvis_root,
            train=("synth_loader_train",), dataset_ratio=(1.0,),
        ),
        solver=dataclasses.replace(cfg.solver, ims_per_batch=2),
    )
    def boom(self, rng):
        raise RuntimeError("decode exploded")

    monkeypatch.setattr(TrainLoader, "_sample", boom)
    loader = TrainLoader(cfg, seed=0, num_workers=1, prefetch=1)
    with pytest.raises(RuntimeError, match="worker failed"):
        next(loader)


def test_train_loader_worker_pool(tiny_ytvis_root):
    cfg = Config()
    cfg = dataclasses.replace(
        cfg,
        input=dataclasses.replace(
            cfg.input, min_size_train=(48,), max_size_train=96,
            pad_size=(64, 96), max_instances=4, sampling_frame_num=2,
        ),
        datasets=dataclasses.replace(
            cfg.datasets, root=tiny_ytvis_root,
            train=("synth_loader_train",), dataset_ratio=(1.0,),
        ),
        solver=dataclasses.replace(cfg.solver, ims_per_batch=2),
    )
    loader = TrainLoader(cfg, seed=0, num_workers=2, prefetch=2)
    t0 = time.time()
    for _ in range(3):
        batch = next(loader)
        px = np.asarray(batch["pixels"])
        assert px.shape[0] == 2 and px.shape[1] == 2
        assert np.asarray(batch["targets"].valid).any()
    assert time.time() - t0 < 60
