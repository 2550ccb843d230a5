"""Microbench: Pallas tent-matmul point sampler vs the XLA gather/scatter
composition at criterion train shapes (fwd and fwd+bwd), on the current
backend.  Times by host materialization (axon tunnel: block_until_ready
does not fence)."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from openvis_tpu.ops.point_sample import (  # noqa: E402
    point_sample_shared,
    sort_points_by_y,
)
from openvis_tpu.ops.point_sample_pallas import (  # noqa: E402
    point_sample_nhwc_pallas,
)


def _t(fn, *args, reps=8):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    rng = np.random.RandomState(0)
    # criterion loss_masks candidate sampling at train scale:
    # rows (B, NT, h, w) stride-4 pred masks, 12544*3 candidate points
    for tag, (b, r, h, w, p) in [
        ("cand", (1, 80, 120, 216, 37632)),
        ("match", (1, 200, 120, 216, 12544)),
    ]:
        maps = jnp.asarray(rng.randn(b, r, h, w).astype(np.float32))
        coords = sort_points_by_y(
            jnp.asarray(rng.rand(b, p, 2).astype(np.float32))
        )
        g = jnp.asarray(rng.randn(b, r, p).astype(np.float32))
        value = jnp.transpose(maps, (0, 2, 3, 1))

        pal_f = jax.jit(lambda v, c: point_sample_nhwc_pallas(v, c))
        xla_f = jax.jit(lambda m, c: jax.vmap(point_sample_shared)(m, c))
        print(f"{tag} fwd pallas: {_t(pal_f, value, coords):.2f} ms", flush=True)
        print(f"{tag} fwd xla:    {_t(xla_f, maps, coords):.2f} ms", flush=True)

        pal_b = jax.jit(
            lambda v, c: jax.grad(
                lambda vv: jnp.vdot(point_sample_nhwc_pallas(vv, c), g)
            )(v)
        )
        xla_b = jax.jit(
            lambda m, c: jax.grad(
                lambda mm: jnp.vdot(jax.vmap(point_sample_shared)(mm, c), g)
            )(m)
        )
        print(f"{tag} bwd pallas: {_t(pal_b, value, coords):.2f} ms", flush=True)
        print(f"{tag} bwd xla:    {_t(xla_b, maps, coords):.2f} ms", flush=True)


if __name__ == "__main__":
    main()
