"""TPU bench: row-packing on/off for the fused MSDA forward, and the full
custom-vjp fwd+bwd with the unpacked-dCoord backward, at train + eval
encoder shapes.  Chained calls amortize the ~35 ms axon tunnel RTT.

    python tools/bench_msda_pack.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from openvis_tpu.ops.msda_pallas import _msda_fused

CH = 3


def _raster_refs(levels):
    pts = []
    for (h, w) in levels:
        ys = (np.arange(h) + 0.5) / h
        xs = (np.arange(w) + 0.5) / w
        yy, xx = np.meshgrid(ys, xs, indexing="ij")
        pts.append(np.stack([xx.ravel(), yy.ravel()], -1))
    return np.concatenate(pts, 0)


def bench(tag, b, levels, dtype, iters=6):
    nh, ch, p = 8, 32, 4
    nl = len(levels)
    lq = sum(h * w for h, w in levels)
    rng = np.random.RandomState(0)
    value = jnp.asarray(
        rng.randn(b, lq, nh, ch).astype(np.float32)
    ).astype(dtype)
    refs = _raster_refs(levels)[None, :, None, None, None, :]
    sizes = np.array([(w, h) for h, w in levels], np.float32)
    offs = rng.randn(b, lq, nh, nl, p, 2).astype(np.float32) * 2.0
    loc = jnp.asarray(
        (refs + offs / sizes[None, None, None, :, None, :]).astype(np.float32)
    )
    attn = jax.nn.softmax(
        jnp.asarray(rng.randn(b, lq, nh, nl, p).astype(np.float32)), axis=-1
    ).reshape(b, lq, nh, nl, p)

    for name, pack in (("fwd_packed", True), ("fwd_unpacked", False)):
        def chain(v, l, a, pack=pack):
            s = jnp.zeros((), jnp.float32)
            for _ in range(CH):
                o = _msda_fused(v + s.astype(v.dtype) * 0, l, a, levels,
                                pack=pack)
                s = s + jnp.sum(o.astype(jnp.float32))
            return s
        fn = jax.jit(chain)
        np.asarray(fn(value, loc, attn))
        t0 = time.perf_counter()
        for _ in range(iters):
            np.asarray(fn(value, loc, attn))
        dt = (time.perf_counter() - t0) / iters * 1e3
        print(json.dumps({
            "case": f"{tag}_{name}",
            "ms_per_call": round((dt - 35.0) / CH, 2),
        }), flush=True)


def main():
    bench("train", 2, ((60, 108), (30, 54), (15, 27)), jnp.bfloat16)
    bench("eval", 10, ((48, 80), (24, 40), (12, 20)), jnp.bfloat16)


if __name__ == "__main__":
    main()
