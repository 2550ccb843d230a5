"""Where does _loss_masks' ~32 ms/layer go? (point gathers vs top_k).

Chained timings at the train bench shapes: rows (40, 120, 216) per item x2
items, 37632 candidate points, top-9408 selection.

    python tools/profile_pointsample.py
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

from openvis_tpu.ops.point_sample import point_sample_shared

B, R, H, W = 2, 40, 120, 216
S, KTOP = 37632, 9408


def _t(fn, *args, iters=10):
    np.asarray(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        np.asarray(fn(*args))
    return (time.perf_counter() - t0) / iters * 1e3


def chain(f, n):
    @jax.jit
    def g(x, c):
        acc = jnp.zeros((), jnp.float32)
        cc = c
        for _ in range(n):
            o = f(x, cc)
            acc += jnp.sum(o)
            cc = c + 1e-7 * acc
        return acc
    return g


def main():
    rng = np.random.RandomState(0)
    maps = jnp.asarray(rng.randn(B, R, H, W).astype(np.float32))
    cand = jnp.asarray(rng.rand(B, S, 2).astype(np.float32))

    def sample(m, c):
        return jax.vmap(point_sample_shared)(m, c)

    t1 = _t(chain(sample, 1), maps, cand)
    t4 = _t(chain(sample, 4), maps, cand)
    print(json.dumps({"stage": "point_sample_shared_marginal",
                      "ms": round((t4 - t1) / 3, 2)}), flush=True)

    logits = sample(maps, cand)                           # (B, R, S)...

    def topk(lg, c):
        _, idx = jax.lax.top_k(-jnp.abs(lg + c[0, 0, 0]), KTOP)
        return idx

    lg = logits.reshape(B * R, S)
    t1 = _t(chain(lambda l, c: topk(l[None], c)[0], 1), lg, cand)
    t4 = _t(chain(lambda l, c: topk(l[None], c)[0], 4), lg, cand)
    print(json.dumps({"stage": "topk_marginal",
                      "ms": round((t4 - t1) / 3, 2)}), flush=True)

    # approx_max_k alternative
    def atopk(l, c):
        _, idx = jax.lax.approx_max_k(-jnp.abs(l + c[0, 0, 0]), KTOP)
        return idx

    t1 = _t(chain(atopk, 1), lg, cand)
    t4 = _t(chain(atopk, 4), lg, cand)
    print(json.dumps({"stage": "approx_topk_marginal",
                      "ms": round((t4 - t1) / 3, 2)}), flush=True)

    # sorted-y sampling: does presorting candidates speed the gather path?
    ys = np.sort(rng.rand(B, S).astype(np.float32), axis=1)
    cand_sorted = jnp.asarray(
        np.stack([rng.rand(B, S).astype(np.float32), ys], axis=-1)
    )
    t1 = _t(chain(sample, 1), maps, cand_sorted)
    t4 = _t(chain(sample, 4), maps, cand_sorted)
    print(json.dumps({"stage": "point_sample_sorted_y_marginal",
                      "ms": round((t4 - t1) / 3, 2)}), flush=True)

    # gather cost scaling: the take from (HW, R) with 4*S indices
    flat = jnp.asarray(rng.randn(B, H * W, R).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, H * W, (B, 4 * S)).astype(np.int32))

    def take(f, c):
        return jax.vmap(lambda ff, ii: jnp.take(ff, ii, axis=0))(
            f, (idx + c[0, 0, 0].astype(jnp.int32)) % (H * W)
        )

    t1 = _t(chain(take, 1), flat, cand)
    t4 = _t(chain(take, 4), flat, cand)
    print(json.dumps({"stage": "raw_row_gather_4S_marginal",
                      "ms": round((t4 - t1) / 3, 2)}), flush=True)


if __name__ == "__main__":
    main()
