"""ctypes loader for the native RLE kernels (compiled on first use)."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(__file__)
_SRC = os.path.join(_DIR, "rle_ops.c")
_SO = os.path.join(_DIR, "librle_ops.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_failed = False


def _build() -> bool:
    try:
        subprocess.run(
            ["cc", "-O3", "-shared", "-fPIC", "-o", _SO, _SRC],
            check=True, capture_output=True,
        )
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Compiled kernels, or None if no toolchain (callers fall back)."""
    global _lib, _failed
    if _lib is not None or _failed:
        return _lib
    with _lock:
        if _lib is not None or _failed:
            return _lib
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            if not _build():
                _failed = True
                return None
        lib = ctypes.CDLL(_SO)
        lp = ctypes.POINTER(ctypes.c_long)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        dp = ctypes.POINTER(ctypes.c_double)
        lib.rle_encode.restype = ctypes.c_long
        lib.rle_encode.argtypes = [u8p, ctypes.c_long, lp, ctypes.c_long]
        lib.rle_decode.restype = ctypes.c_long
        lib.rle_decode.argtypes = [lp, ctypes.c_long, u8p, ctypes.c_long]
        lib.rle_area.restype = ctypes.c_long
        lib.rle_area.argtypes = [lp, ctypes.c_long]
        lib.rle_intersection_union.restype = None
        lib.rle_intersection_union.argtypes = [lp, ctypes.c_long, lp,
                                               ctypes.c_long, lp, lp]
        lib.rle_iou_matrix.restype = None
        lib.rle_iou_matrix.argtypes = [lp, lp, ctypes.c_long, lp, lp,
                                       ctypes.c_long, u8p, dp]
        _lib = lib
        return _lib


def _as_long(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_long))


def native_intersection_union(
    counts_a: np.ndarray, counts_b: np.ndarray
) -> Optional[Tuple[int, int]]:
    lib = get_lib()
    if lib is None:
        return None
    ca = np.ascontiguousarray(counts_a, dtype=np.int64)
    cb = np.ascontiguousarray(counts_b, dtype=np.int64)
    inter = ctypes.c_long()
    uni = ctypes.c_long()
    lib.rle_intersection_union(
        _as_long(ca), len(ca), _as_long(cb), len(cb),
        ctypes.byref(inter), ctypes.byref(uni),
    )
    return int(inter.value), int(uni.value)


def native_iou_matrix(
    counts_a: "list[np.ndarray]", counts_b: "list[np.ndarray]",
    iscrowd_b: Optional[np.ndarray] = None,
) -> Optional[np.ndarray]:
    """Pairwise IoU between two lists of RLE count arrays -> (na, nb) f64.
    ``iscrowd_b``: optional bool per b-entry (crowd: union = area(a))."""
    lib = get_lib()
    if lib is None:
        return None
    na, nb = len(counts_a), len(counts_b)
    out = np.zeros((na, nb), np.float64)
    if na == 0 or nb == 0:
        return out
    off_a = np.zeros(na + 1, np.int64)
    off_b = np.zeros(nb + 1, np.int64)
    off_a[1:] = np.cumsum([len(c) for c in counts_a])
    off_b[1:] = np.cumsum([len(c) for c in counts_b])
    flat_a = np.ascontiguousarray(
        np.concatenate([np.asarray(c, np.int64) for c in counts_a])
        if off_a[-1] else np.zeros(0, np.int64))
    flat_b = np.ascontiguousarray(
        np.concatenate([np.asarray(c, np.int64) for c in counts_b])
        if off_b[-1] else np.zeros(0, np.int64))
    crowd = (
        np.ascontiguousarray(iscrowd_b, np.uint8)
        if iscrowd_b is not None
        else np.zeros(nb, np.uint8)
    )
    lib.rle_iou_matrix(
        _as_long(flat_a), _as_long(off_a), na,
        _as_long(flat_b), _as_long(off_b), nb,
        crowd.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    return out


def native_encode(mask: np.ndarray) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    flat = np.asfortranarray(mask).reshape(-1, order="F").astype(np.uint8)
    flat = np.ascontiguousarray(flat)
    out = np.empty(flat.size + 2, dtype=np.int64)
    k = lib.rle_encode(
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), flat.size,
        _as_long(out), out.size,
    )
    if k < 0:
        return None
    return out[:k]


def native_decode(counts: np.ndarray, h: int, w: int) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    ca = np.ascontiguousarray(counts, dtype=np.int64)
    flat = np.empty(h * w, dtype=np.uint8)
    rc = lib.rle_decode(
        _as_long(ca), len(ca),
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), flat.size,
    )
    if rc != 0:
        return None
    return flat.reshape((h, w), order="F")
