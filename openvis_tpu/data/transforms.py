"""Host-side clip-consistent image transforms (numpy + PIL).

Rebuild of the reference's clip-consistent augmentations
(``openvis/data/augmentation.py``): ``ResizeShortestEdge`` (choice-by-clip),
``RandomFlip`` (flip-by-clip), ``RandomRotationClip`` (clip-level base angle
with per-frame jitter, used for COCO pseudo-clips).  The reference replays a
cached random draw for ``clip_frame_cnt`` consecutive single-frame calls
(``augmentation.py:42-50``); here every transform takes the whole clip at
once, so clip consistency is structural instead of stateful.

All functions transform frames (uint8 HWC RGB) and per-instance masks
(uint8 HW) identically.
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image


def resize_shortest_edge_size(
    h: int, w: int, short: int, max_size: int
) -> Tuple[int, int]:
    """d2 ResizeShortestEdge sizing: scale so min side == short, cap max
    side at max_size."""
    scale = short / min(h, w)
    if max(h, w) * scale > max_size:
        scale = max_size / max(h, w)
    nh, nw = int(h * scale + 0.5), int(w * scale + 0.5)
    return nh, nw


def resize_frame(frame: np.ndarray, size_hw: Tuple[int, int]) -> np.ndarray:
    img = Image.fromarray(frame)
    return np.asarray(img.resize((size_hw[1], size_hw[0]), Image.BILINEAR))


def resize_mask(mask: np.ndarray, size_hw: Tuple[int, int]) -> np.ndarray:
    img = Image.fromarray(mask)
    return np.asarray(img.resize((size_hw[1], size_hw[0]), Image.NEAREST))


def hflip_frame(frame: np.ndarray) -> np.ndarray:
    return frame[:, ::-1]


def rotate_frame(
    frame: np.ndarray, angle_deg: float, center_rel: Tuple[float, float],
    resample=Image.BILINEAR,
) -> np.ndarray:
    """Rotate around a relative center without expanding (d2
    RandomRotation(expand=False) semantics)."""
    h, w = frame.shape[:2]
    img = Image.fromarray(frame)
    out = img.rotate(
        angle_deg,
        resample=resample,
        center=(center_rel[0] * w, center_rel[1] * h),
        expand=False,
        fillcolor=0,
    )
    return np.asarray(out)


class ClipAugmenter:
    """Samples one set of random draws per clip and applies them to every
    frame (+ masks).  ``pseudo=True`` adds the per-frame rotation jitter the
    COCO pseudo-video mapper uses (``augmentation.py:95-116``)."""

    def __init__(
        self,
        min_sizes: Sequence[int],
        max_size: int,
        flip: bool = True,
        rotation: bool = False,
        rotation_range: Tuple[float, float] = (-15.0, 15.0),
        is_train: bool = True,
        crop: bool = False,
        crop_type: str = "absolute_range",
        crop_size: Tuple[int, int] = (600, 720),
    ):
        self.min_sizes = list(min_sizes)
        self.max_size = max_size
        self.flip = flip
        self.rotation = rotation
        self.rotation_range = rotation_range
        self.is_train = is_train
        self.crop = crop
        self.crop_type = crop_type
        self.crop_size = tuple(crop_size)

    def _crop_box(self, rng, h: int, w: int) -> Tuple[int, int, int, int]:
        """Clip-consistent crop box (RandomCropClip, augmentation.py:214-227;
        d2 absolute_range semantics: crop H in [size0, size1] capped at h)."""
        c0, c1 = self.crop_size
        if self.crop_type == "absolute_range":
            ch = min(h, rng.randint(min(c0, h), min(c1, h) + 1))
            cw = min(w, rng.randint(min(c0, w), min(c1, w) + 1))
        elif self.crop_type == "absolute":
            ch, cw = min(c0, h), min(c1, w)
        else:  # relative / relative_range
            ch = int(h * (c0 + (1 - c0) * rng.rand())) if self.crop_type == "relative_range" else int(h * c0)
            cw = int(w * (c1 + (1 - c1) * rng.rand())) if self.crop_type == "relative_range" else int(w * c1)
        y0 = rng.randint(0, h - ch + 1)
        x0 = rng.randint(0, w - cw + 1)
        return y0, x0, ch, cw

    def __call__(
        self,
        rng: np.random.RandomState,
        frames: List[np.ndarray],
        masks_per_frame: Optional[List[List[np.ndarray]]] = None,
        per_frame_rotation: bool = False,
    ):
        h, w = frames[0].shape[:2]
        if self.is_train:
            short = self.min_sizes[rng.randint(len(self.min_sizes))]
        else:
            short = self.min_sizes[0]
        size = resize_shortest_edge_size(h, w, short, self.max_size)
        do_flip = self.is_train and self.flip and rng.rand() < 0.5
        if self.rotation and self.is_train:
            base_angle = rng.uniform(*self.rotation_range)
            cx = rng.uniform(0.4, 0.6)
            cy = rng.uniform(0.4, 0.6)
        else:
            base_angle = 0.0
            cx = cy = 0.5

        # clip-consistent crop, sampled once in RESIZED coordinates
        rsize = size
        crop_box = None
        if self.crop and self.is_train:
            crop_box = self._crop_box(rng, rsize[0], rsize[1])
            size = (crop_box[2], crop_box[3])

        out_frames, out_masks = [], []
        for fi, frame in enumerate(frames):
            angle = base_angle
            if per_frame_rotation and self.rotation and self.is_train:
                angle = base_angle + rng.uniform(-2.0, 2.0)
            f = frame
            if angle != 0.0:
                f = rotate_frame(f, angle, (cx, cy))
            f = resize_frame(f, rsize)
            if crop_box is not None:
                y0, x0, ch, cw = crop_box
                f = f[y0 : y0 + ch, x0 : x0 + cw]
            if do_flip:
                f = hflip_frame(f)
            out_frames.append(f)
            if masks_per_frame is not None:
                ms = []
                for m in masks_per_frame[fi]:
                    mm = m
                    if angle != 0.0:
                        mm = rotate_frame(mm, angle, (cx, cy), Image.NEAREST)
                    mm = resize_mask(mm, rsize)
                    if crop_box is not None:
                        y0, x0, ch, cw = crop_box
                        mm = mm[y0 : y0 + ch, x0 : x0 + cw]
                    if do_flip:
                        mm = mm[:, ::-1]
                    ms.append(mm)
                out_masks.append(ms)
        return out_frames, (out_masks if masks_per_frame is not None else None), size
