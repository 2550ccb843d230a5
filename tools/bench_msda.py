"""Micro-benchmark the Pallas MSDA level kernel on encoder shapes.

Times `_sample_level_pallas` per level of the bench config (10 frames @
384x640 -> levels (48,80)/(24,40)/(12,20), 8 heads, ch=32, Lq=5040) across
(bq, rr) tilings and dtypes.  Run on the real TPU:

    python tools/bench_msda.py [--full]   # --full sweeps more tilings
"""

from __future__ import annotations

import itertools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from openvis_tpu.ops.msda_pallas import (
    _sample_level_pallas,
    _sample_level_pallas_v2,
)


LEVELS = [(48, 80), (24, 40), (12, 20)]
BN, CH, P = 80, 32, 4  # 10 frames x 8 heads
LQ = sum(h * w for h, w in LEVELS)


def _raster_refs():
    """Normalized (x, y) per query token, raster order over the concatenated
    levels — mirrors ``pixel_decoder.encoder_reference_points`` so row-block
    gating sees the real locality structure."""
    pts = []
    for (h, w) in LEVELS:
        ys = (np.arange(h) + 0.5) / h
        xs = (np.arange(w) + 0.5) / w
        yy, xx = np.meshgrid(ys, xs, indexing="ij")
        pts.append(np.stack([xx.ravel(), yy.ravel()], -1))
    return np.concatenate(pts, 0)  # (LQ, 2)


_REFS = _raster_refs()


def bench_level(h, w, bq, rr, dtype, iters=10, impl=_sample_level_pallas,
                chain=4):
    """Marginal per-call ms via chained calls in one jit (the axon tunnel
    adds ~35ms per round trip, swamping single-call timings)."""
    rng = np.random.RandomState(0)
    v = jnp.asarray(rng.randn(BN, h * w, CH).astype(np.float32)).astype(dtype)
    # raster reference points scaled to this level + ring-init-scale offsets
    ref_y = np.broadcast_to(_REFS[None, :, 1:2] * h, (BN, LQ, 1))
    ref_x = np.broadcast_to(_REFS[None, :, 0:1] * w, (BN, LQ, 1))
    y = jnp.asarray((ref_y + rng.randn(BN, LQ, P) * 2).astype(np.float32))
    x = jnp.asarray((ref_x + rng.randn(BN, LQ, P) * 2).astype(np.float32))
    a = jnp.asarray(rng.rand(BN, LQ, P).astype(np.float32) / P)

    def make(n):
        @jax.jit
        def fn(yy):
            acc = jnp.zeros((), jnp.float32)
            cur = yy
            for _ in range(n):
                out = impl(v, cur, x, a, h, w, bq=bq, rr=rr)
                acc = acc + jnp.sum(out)
                cur = yy + 1e-6 * out[..., :P]
            return acc
        return fn

    def t(fn):
        np.asarray(fn(y))
        t0 = time.perf_counter()
        for _ in range(iters):
            np.asarray(fn(y))
        return (time.perf_counter() - t0) / iters * 1e3

    t1, tc = t(make(1)), t(make(1 + chain))
    return (tc - t1) / chain


def main(full=False):
    tilings = [(256, 4), (256, 2), (256, 8), (512, 4)]
    if full:
        tilings += [(128, 4), (128, 8), (512, 2), (1024, 4)]
    impls = {"v2": _sample_level_pallas_v2, "v1": _sample_level_pallas}
    for iname, impl in impls.items():
        for dtype in (jnp.bfloat16,):
            for bq, rr in tilings:
                total = 0.0
                per = {}
                try:
                    for (h, w) in LEVELS:
                        ms = bench_level(h, w, bq, rr, dtype, impl=impl)
                        per[f"{h}x{w}"] = round(ms, 2)
                        total += ms
                except Exception as e:  # noqa: BLE001
                    print(json.dumps({"impl": iname, "bq": bq, "rr": rr,
                                      "error": str(e)[:120]}), flush=True)
                    continue
                print(json.dumps({
                    "impl": iname, "bq": bq, "rr": rr,
                    "dtype": dtype.__name__,
                    "per_level_ms": per, "total_ms": round(total, 2),
                }), flush=True)


if __name__ == "__main__":
    main(full="--full" in sys.argv)
