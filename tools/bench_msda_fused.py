"""TPU bench: fused all-level MSDA kernel vs per-level v2, (bq, rr) sweep.

Chained-call slope timing (see profile_msda_chain.py for the tunnel
rationale).  Run on the real TPU:

    python tools/bench_msda_fused.py [bq,rr ...]   # default sweep
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from openvis_tpu.models.pixel_decoder import encoder_reference_points
from openvis_tpu.ops import msda_pallas as MP

LEVELS = ((48, 80), (24, 40), (12, 20))
B, NH, CH, P = 10, 8, 32, 4
D = NH * CH
LQ = sum(h * w for h, w in LEVELS)


def _time1(fn, *args, iters=5):
    r = fn(*args)
    np.asarray(jax.tree.leaves(r)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        np.asarray(jax.tree.leaves(fn(*args))[0])
    return (time.perf_counter() - t0) / iters * 1e3


def chain(n, impl):
    rng = np.random.RandomState(0)
    value = jnp.asarray(rng.randn(B, LQ, NH, CH).astype(np.float32)).astype(
        jnp.bfloat16
    )
    ref = np.asarray(encoder_reference_points(LEVELS))
    loc = np.broadcast_to(
        ref[None, :, None, :, None, :], (B, LQ, NH, 3, P, 2)
    ) + rng.randn(B, LQ, NH, 3, P, 2) * 0.01
    loc = jnp.asarray(loc.astype(np.float32)).astype(jnp.bfloat16)
    attn = jnp.asarray((rng.rand(B, LQ, NH, 3, P) / (3 * P)).astype(np.float32)
                       ).astype(jnp.bfloat16)

    @jax.jit
    def fn(v):
        out = jnp.zeros((B, LQ, D), jnp.float32)
        vv = v
        for _ in range(n):
            o = impl(vv, loc, attn)
            out = out + o.astype(jnp.float32)
            vv = v + 1e-6 * o.reshape(B, LQ, NH, CH).astype(v.dtype)
        return jnp.sum(out)

    return _time1(fn, value)


def main():
    combos = [(256, 4), (512, 4), (256, 2), (512, 2)]
    if len(sys.argv) > 1:
        combos = [tuple(int(v) for v in a.split(",")) for a in sys.argv[1:]]

    def v2(v, loc, attn):
        return MP.ms_deform_attn_pallas_fwd(
            v, LEVELS, loc, attn, level_impl=MP._sample_level_pallas_v2
        )

    t1 = chain(1, v2)
    t4 = chain(4, v2)
    print(json.dumps({"impl": "v2", "ms_marginal": round((t4 - t1) / 3, 2),
                      "ms_1": round(t1, 2)}), flush=True)

    for bq, rr in combos:
        for rl in (False, True):
            def fused(v, loc, attn, bq=bq, rr=rr, rl=rl):
                return MP._msda_fused(v, loc, attn, LEVELS, bq=bq, rr=rr,
                                      rr_lanes=rl)

            tag = f"fused_bq{bq}_rr{rr}" + ("_rrlanes" if rl else "")
            try:
                t1 = chain(1, fused)
                t4 = chain(4, fused)
            except Exception as e:  # noqa: BLE001
                print(json.dumps({"impl": tag, "error": str(e)[:200]}),
                      flush=True)
                continue
            print(json.dumps({"impl": tag,
                              "ms_marginal": round((t4 - t1) / 3, 2),
                              "ms_1": round(t1, 2)}), flush=True)


if __name__ == "__main__":
    main()
