"""Core fixed-shape data structures.

TPU-native replacements for the reference's Detectron2 ``ImageList`` /
``Instances`` (used throughout e.g. ``openvis/simplebsl.py:60``,
``openvis/data/ytvis_dataset_mapper.py:285-346``).  Everything is a
registered pytree of statically-shaped arrays with explicit validity masks —
no data-dependent shapes, no ``nonzero`` filtering — so all model code jits
with a fixed trace per (T, H, W, N) bucket.

Layout convention: images are **NHWC** (TPU-preferred); video clips are
``(B, T, H, W, C)``; per-clip instance targets are padded to ``N`` slots.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class ImageBatch:
    """A padded batch of video clips.

    Attributes:
      pixels:      (B, T, H, W, 3) float — normalized pixels, zero-padded.
      image_sizes: (B, 2) int32 — valid (h, w) per clip before padding
                   (augmentations are clip-consistent, so one size per clip).
      orig_sizes:  (B, 2) int32 — original (h, w) before resize, for
                   postprocessing back to native resolution.
      frame_valid: (B, T) bool — False for frames beyond the clip length
                   (videos shorter than the padded T bucket).
    """

    pixels: jax.Array
    image_sizes: jax.Array
    orig_sizes: jax.Array
    frame_valid: jax.Array

    @property
    def batch(self) -> int:
        return self.pixels.shape[0]

    @property
    def num_frames(self) -> int:
        return self.pixels.shape[1]

    @property
    def padded_hw(self) -> Tuple[int, int]:
        return self.pixels.shape[2], self.pixels.shape[3]

    def flat_frames(self) -> jax.Array:
        """(B*T, H, W, 3) view for per-frame backbones."""
        b, t, h, w, c = self.pixels.shape
        return self.pixels.reshape(b * t, h, w, c)


@struct.dataclass
class ClipTargets:
    """Padded ground-truth for one batch of clips.

    The reference builds per-frame ``Instances`` lists with stable ``gt_ids``
    across frames (``ytvis_dataset_mapper.py:285-346``) and later stacks them
    in ``prepare_targets`` (``video_maskformer.py:232-261``).  Here targets
    arrive already stacked and padded.

    Attributes:
      labels: (B, N) int32 — class index per instance slot; arbitrary where
              invalid.
      masks:  (B, N, T, H, W) bool — per-frame GT masks at input resolution.
      valid:  (B, N) bool — slot occupancy (instance exists in the clip).
      frame_valid: (B, N, T) bool — instance visible in frame t (an instance
              may be absent in some frames; its mask there is empty).
    """

    labels: jax.Array
    masks: jax.Array
    valid: jax.Array
    frame_valid: jax.Array

    @property
    def num_instances(self) -> int:
        return self.labels.shape[1]


def pad_to_divisible(h: int, w: int, div: int) -> Tuple[int, int]:
    return (-(-h // div)) * div, (-(-w // div)) * div


def make_image_batch(
    frames: np.ndarray,
    image_size: Tuple[int, int],
    orig_size: Tuple[int, int],
    pad_hw: Tuple[int, int],
    num_frames: int,
    pixel_mean,
    pixel_std,
) -> ImageBatch:
    """Host-side helper: normalize + pad one clip into an ImageBatch of B=1.

    ``frames``: (t, h, w, 3) uint8/float RGB.
    """
    t, h, w, _ = frames.shape
    ph, pw = pad_hw
    mean = np.asarray(pixel_mean, dtype=np.float32)
    std = np.asarray(pixel_std, dtype=np.float32)
    out = np.zeros((1, num_frames, ph, pw, 3), dtype=np.float32)
    out[0, :t, :h, :w] = (frames.astype(np.float32) - mean) / std
    fv = np.zeros((1, num_frames), dtype=bool)
    fv[0, :t] = True
    return ImageBatch(
        pixels=jnp.asarray(out),
        image_sizes=jnp.asarray([[h, w]], dtype=jnp.int32),
        orig_sizes=jnp.asarray([list(orig_size)], dtype=jnp.int32),
        frame_valid=jnp.asarray(fv),
    )


def batch_clips(batches) -> ImageBatch:
    """Concatenate B=1 ImageBatches (same padded shape) along batch."""
    return jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *batches)
