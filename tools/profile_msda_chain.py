"""Resolve sub-tunnel-latency MSDA costs by chaining calls inside one jit.

The axon tunnel adds ~35 ms per jitted round trip, so single-call timings
can't separate the Pallas kernel from the surrounding projections/FFN.  Here
every measurement runs N chained applications inside ONE jit (with an eps
feedback so XLA can't CSE them); the (t_N - t_1)/(N-1) slope is the true
per-application device time.

    python tools/profile_msda_chain.py
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

from openvis_tpu.models.pixel_decoder import (
    MSDeformAttnEncoder,
    encoder_reference_points,
)
from openvis_tpu.ops.msda_pallas import ms_deform_attn_pallas

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


def chain_kernel(n, level_impl=None):
    """n chained full 3-level msda kernel applications."""
    from openvis_tpu.ops.msda_pallas import ms_deform_attn_pallas_fwd

    rng = np.random.RandomState(0)
    value = jnp.asarray(rng.randn(B, LQ, NH, CH).astype(np.float32)).astype(
        jnp.bfloat16
    )
    ref = np.asarray(encoder_reference_points(LEVELS))        # (LQ, nl, 2)
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
            o = ms_deform_attn_pallas_fwd(
                vv, LEVELS, loc, attn, level_impl=level_impl
            )
            out = out + o.astype(jnp.float32)
            vv = v + 1e-6 * o.reshape(B, LQ, NH, CH).astype(v.dtype)
        return jnp.sum(out)

    return _time1(fn, value)


def chain_encoder(nlayers):
    """Full deformable encoder with nlayers layers (kernel + projections +
    FFN + norms), bf16 params."""
    rng = np.random.RandomState(1)
    src = jnp.asarray(rng.randn(B, LQ, D).astype(np.float32)).astype(jnp.bfloat16)
    pos = jnp.asarray(rng.randn(1, LQ, D).astype(np.float32)).astype(jnp.bfloat16)
    enc = MSDeformAttnEncoder(nlayers, D, 1024, 3, NH, P)
    params = enc.init(jax.random.PRNGKey(0), src, pos, LEVELS)["params"]
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)

    @jax.jit
    def fn(p, s):
        return jnp.sum(enc.apply({"params": p}, s, pos, LEVELS))

    return _time1(fn, params, src)


def main():
    from openvis_tpu.ops.msda_pallas import (
        _sample_level_pallas,
        _sample_level_pallas_v2,
    )

    for name, impl in (("v1", _sample_level_pallas),
                       ("v2", _sample_level_pallas_v2)):
        try:
            t1 = chain_kernel(1, impl)
            t4 = chain_kernel(4, impl)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"stage": f"kernel_{name}",
                              "error": str(e)[:160]}), flush=True)
            continue
        print(json.dumps({"stage": f"kernel_{name}_1call_3lvl",
                          "ms": round(t1, 2)}), flush=True)
        print(json.dumps({"stage": f"kernel_{name}_marginal_3lvl",
                          "ms": round((t4 - t1) / 3, 2)}), flush=True)
    e1 = chain_encoder(1)
    e6 = chain_encoder(6)
    print(json.dumps({"stage": "encoder_1layer", "ms": round(e1, 2)}), flush=True)
    print(json.dumps({"stage": "encoder_marginal_layer",
                      "ms": round((e6 - e1) / 5, 2)}), flush=True)


if __name__ == "__main__":
    main()
