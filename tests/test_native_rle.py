"""Native RLE kernels vs the numpy reference implementation."""

import numpy as np
import pytest

from openvis_tpu.data import rle
from openvis_tpu.native import (
    get_lib,
    native_decode,
    native_encode,
    native_intersection_union,
)

pytestmark = pytest.mark.skipif(
    get_lib() is None, reason="no C toolchain available"
)


def test_native_encode_decode_roundtrip():
    rng = np.random.RandomState(0)
    for _ in range(5):
        m = (rng.rand(37, 53) > 0.6).astype(np.uint8)
        counts = native_encode(m)
        # parity with the numpy encoder
        ref = rle.encode_counts(m)
        assert counts.tolist() == list(ref)
        back = native_decode(counts, 37, 53)
        np.testing.assert_array_equal(back, m)


def test_native_iou_matches_decode_path():
    rng = np.random.RandomState(1)
    for _ in range(10):
        a = (rng.rand(40, 60) > 0.5).astype(np.uint8)
        b = (rng.rand(40, 60) > 0.5).astype(np.uint8)
        ea, eb = rle.encode(a), rle.encode(b)
        inter, uni = native_intersection_union(
            np.asarray(rle.string_to_counts(ea["counts"]), np.int64),
            np.asarray(rle.string_to_counts(eb["counts"]), np.int64),
        )
        ref_i = int(np.logical_and(a, b).sum())
        ref_u = int(np.logical_or(a, b).sum())
        assert (inter, uni) == (ref_i, ref_u)


def test_empty_and_full_masks():
    z = np.zeros((8, 8), np.uint8)
    f = np.ones((8, 8), np.uint8)
    ez, ef = rle.encode(z), rle.encode(f)
    inter, uni = native_intersection_union(
        np.asarray(rle.string_to_counts(ez["counts"]), np.int64),
        np.asarray(rle.string_to_counts(ef["counts"]), np.int64),
    )
    assert (inter, uni) == (0, 64)
    inter, uni = native_intersection_union(
        np.asarray(rle.string_to_counts(ef["counts"]), np.int64),
        np.asarray(rle.string_to_counts(ef["counts"]), np.int64),
    )
    assert (inter, uni) == (64, 64)
