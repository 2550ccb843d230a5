"""Train/test loaders: ratio-mixed sampling + fixed-shape batching.

Rebuild of ``build_detection_train_loader`` / ``build_combined_loader`` /
``build_detection_test_loader`` (``openvis/data/build.py:143,207,288``): the
combined loader samples source datasets with configured ratios
(``DATASET_RATIO``, e.g. YTVIS:COCO = 1.0:0.75, ``build.py:257-290``); here
that's a categorical draw per sample.  Batches group samples of identical
padded shape (orientation buckets) so every device step sees one static
shape; a background thread prefetches.
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, List, Optional

import jax.numpy as jnp
import numpy as np

from openvis_tpu.config import Config
from openvis_tpu.data import catalog
from openvis_tpu.data.mapper import (
    CocoClipMapper,
    YTVISClipMapper,
    load_burst_records,
    load_coco_records,
    load_ytvis_records,
)
from openvis_tpu.structures import ClipTargets, ImageBatch


def bucket_batches(samples, batch_size: int):
    """Group a sample stream into same-shape batches without discarding:
    each sample joins the bucket of its padded-canvas shape and a batch is
    emitted the moment any bucket holds ``batch_size`` samples."""
    buckets: Dict[tuple, List[Dict]] = {}
    for s in samples:
        key = tuple(s["pixels"].shape)
        bucket = buckets.setdefault(key, [])
        bucket.append(s)
        if len(bucket) == batch_size:
            yield collate(bucket)
            buckets[key] = []


def collate(samples: List[Dict]) -> Dict:
    """Stack same-shape samples into (ImageBatch, ClipTargets) arrays."""
    pixels = np.stack([s["pixels"] for s in samples])  # (B, T, H, W, 3)
    batch = {
        "pixels": jnp.asarray(pixels),
        "image_sizes": jnp.asarray(np.stack([s["image_size"] for s in samples])),
        "orig_sizes": jnp.asarray(np.stack([s["orig_size"] for s in samples])),
        "targets": ClipTargets(
            labels=jnp.asarray(np.stack([s["labels"] for s in samples])),
            masks=jnp.asarray(np.stack([s["masks"] for s in samples])),
            valid=jnp.asarray(np.stack([s["valid"] for s in samples])),
            frame_valid=jnp.asarray(np.stack([s["frame_valid"] for s in samples])),
        ),
    }
    return batch


class TrainLoader:
    """Infinite iterator of fixed-shape batches.

    Host pipeline (the reference's per-rank DataLoader workers,
    ``build.py:143`` + ``DATALOADER.NUM_WORKERS``, ``Base.yaml:62``):
    ``num_workers`` threads decode JPEGs + augment into a shared sample
    queue; an assembler thread groups samples into per-shape buckets
    (orientation / canvas size) and emits a batch whenever a bucket fills.
    No decoded sample is ever discarded — a draw whose shape mismatches the
    current majority simply waits in its own bucket for peers (the round-1
    single-thread loader dropped mismatching samples after full decode:
    wasted work plus a sampling bias toward the majority orientation).
    """

    def __init__(
        self,
        cfg: Config,
        seed: int = 0,
        prefetch: Optional[int] = None,
        num_workers: Optional[int] = None,
    ):
        self.cfg = cfg
        root = cfg.datasets.root
        inp = cfg.input
        mean, std = cfg.model.pixel_mean, cfg.model.pixel_std

        self.sources = []
        for name in cfg.datasets.train:
            info = catalog.get(name)
            if info.kind == "coco_clip":
                records = load_coco_records(info, root)
                mapper = CocoClipMapper(info, inp, mean, std)
            elif info.kind == "burst":
                records = load_burst_records(info, root)
                mapper = YTVISClipMapper(info, inp, mean, std, is_train=True)
            else:
                records = load_ytvis_records(info, root, is_train=True)
                mapper = YTVISClipMapper(info, inp, mean, std, is_train=True)
            records = [r for r in records if r.get("annotations")]
            self.sources.append((records, mapper))

        ratios = np.asarray(cfg.datasets.dataset_ratio, np.float64)
        if len(ratios) != len(self.sources):
            # fail fast HERE: a mismatch inside a worker thread would kill
            # the workers silently and leave __next__ blocked forever
            raise ValueError(
                f"datasets.dataset_ratio has {len(ratios)} entries for "
                f"{len(self.sources)} train datasets {cfg.datasets.train}"
            )
        self.probs = ratios / ratios.sum()
        self.batch_size = cfg.solver.ims_per_batch
        self._error: Optional[BaseException] = None
        if num_workers is None:
            num_workers = cfg.dataloader.num_workers
        if prefetch is None:
            prefetch = cfg.dataloader.prefetch
        self.num_workers = max(1, num_workers)
        # bounded sample queue gives back-pressure to the decode threads
        self._samples: "queue.Queue" = queue.Queue(
            maxsize=max(2 * self.batch_size, 8)
        )
        self._queue: "queue.Queue" = queue.Queue(maxsize=prefetch)
        self._threads = []
        for i in range(self.num_workers):
            th = threading.Thread(
                target=self._produce,
                args=(np.random.RandomState(seed * 1000 + i),),
                daemon=True,
            )
            th.start()
            self._threads.append(th)
        asm = threading.Thread(target=self._assemble, daemon=True)
        asm.start()
        self._threads.append(asm)

    def _sample(self, rng: np.random.RandomState) -> Dict:
        while True:
            si = rng.choice(len(self.sources), p=self.probs)
            records, mapper = self.sources[si]
            rec = records[rng.randint(len(records))]
            try:
                s = mapper(rng, rec)
            except FileNotFoundError:
                continue
            if s["valid"].any():
                return s

    def _produce(self, rng: np.random.RandomState):
        try:
            while True:
                self._samples.put(self._sample(rng))
        except BaseException as e:  # noqa: BLE001 — propagate to __next__
            self._error = e

    def _assemble(self):
        def stream():
            while True:
                yield self._samples.get()

        try:
            for batch in bucket_batches(stream(), self.batch_size):
                self._queue.put(batch)
        except BaseException as e:  # noqa: BLE001
            self._error = e

    def __iter__(self) -> Iterator[Dict]:
        return self

    def __next__(self) -> Dict:
        # poll so a dead worker surfaces as an exception instead of a hang;
        # already-assembled batches drain first (error checked only on an
        # empty poll), so a late worker failure doesn't discard good batches
        while True:
            try:
                return self._queue.get(timeout=5.0)
            except queue.Empty:
                if self._error is not None:
                    raise RuntimeError(
                        "data loader worker failed"
                    ) from self._error


def test_videos(cfg: Config, dataset_name: str):
    """Yields (record, mapper-processed full-video sample) pairs for eval.
    Test batch size is 1 video (build.py:207-241)."""
    info = catalog.get(dataset_name)
    root = cfg.datasets.root
    if info.kind == "burst":
        records = load_burst_records(info, root)
    else:
        records = load_ytvis_records(info, root, is_train=False)
    mapper = YTVISClipMapper(
        info, cfg.input, cfg.model.pixel_mean, cfg.model.pixel_std,
        is_train=False, size_divisibility=cfg.model.size_divisibility,
    )
    rng = np.random.RandomState(0)
    for rec in records:
        yield rec, mapper(rng, rec)
