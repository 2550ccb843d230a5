"""Pallas TPU kernel for batched Hungarian assignment (exact JV/e-maxx).

The XLA composition in ``openvis_tpu.ops.hungarian`` is exact but its
scalar-sequential Dijkstra runs as an XLA while-loop whose per-iteration
overhead dominates; this kernel runs the ENTIRE solver inside one Pallas
program per batch element — cost matrix and all solver state live in VMEM
and the sequential loops compile to tight Mosaic control flow.

Mosaic restrictions shape the implementation: scalars cannot be
stored/loaded to/from VMEM directly, so every "array[j] = s" becomes a
masked full-row vector write against an iota, and every "s = array[j]"
becomes a masked reduction — all (1, 128..256)-lane VPU ops, effectively
free at these sizes.

Semantics identical to ``hungarian``: minimum-cost assignment of N rows to
distinct columns of an (N, M) matrix, N <= M, exact optimum (ties may
resolve differently; verified against scipy in tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INF = 1e15  # python float (jnp scalars would be captured consts)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _kernel(cost_ref, out_ref, u_ref, v_ref, p_ref, minv_ref, way_ref,
            used_ref, rowu_ref, n: int, m: int):
    mp = cost_ref.shape[1]
    np_ = u_ref.shape[1]
    col_idx = jax.lax.broadcasted_iota(jnp.int32, (1, mp), 1)
    row_idx = jax.lax.broadcasted_iota(jnp.int32, (1, np_), 1)

    def set_at(ref, idx_grid, j, val):
        ref[:] = jnp.where(idx_grid == j, val, ref[:])

    def get_f(ref, idx_grid, j):
        return jnp.sum(jnp.where(idx_grid == j, ref[:], 0.0))

    def get_i(ref, idx_grid, j):
        return jnp.sum(jnp.where(idx_grid == j, ref[:], 0))

    u_ref[:] = jnp.zeros_like(u_ref)
    v_ref[:] = jnp.zeros_like(v_ref)
    p_ref[:] = jnp.full_like(p_ref, -1)
    out_ref[:] = jnp.zeros_like(out_ref)

    def add_row(i, _):
        set_at(p_ref, col_idx, m, i)
        minv_ref[:] = jnp.full_like(minv_ref, _INF)
        way_ref[:] = jnp.zeros_like(way_ref)
        used_ref[:] = jnp.zeros_like(used_ref)
        rowu_ref[:] = jnp.zeros_like(rowu_ref)

        def dij_cond(state):
            _, pj0 = state
            return pj0 >= 0

        def dij_step(state):
            j0, i0 = state  # i0 == p[j0] >= 0: the row owning column j0
            set_at(used_ref, col_idx, j0, 1.0)
            set_at(rowu_ref, row_idx, i0, 1.0)
            u_i0 = get_f(u_ref, row_idx, i0)
            costrow = cost_ref[pl.ds(i0, 1), :][0]      # dynamic row (MP,)
            v_row = v_ref[0, :]
            used = used_ref[0, :]
            minv = minv_ref[0, :]
            cur = costrow - u_i0 - v_row
            better = jnp.logical_and(cur < minv, used < 0.5)
            minv = jnp.where(better, cur, minv)
            way_ref[0, :] = jnp.where(better, j0, way_ref[0, :])
            cand = jnp.where(used > 0.5, _INF, minv)
            delta = jnp.min(cand)
            j1 = jnp.argmin(cand).astype(jnp.int32)
            v_ref[0, :] = v_row - jnp.where(used > 0.5, delta, 0.0)
            u_ref[0, :] = u_ref[0, :] + rowu_ref[0, :] * delta
            minv_ref[0, :] = jnp.where(used > 0.5, minv, minv - delta)
            p_j1 = get_i(p_ref, col_idx, j1)
            return j1, p_j1

        j0, _ = jax.lax.while_loop(dij_cond, dij_step, (jnp.int32(m), i))

        def aug_cond(j):
            return j != m

        def aug_step(j):
            j1 = get_i(way_ref, col_idx, j)
            p_j1 = get_i(p_ref, col_idx, j1)
            set_at(p_ref, col_idx, j, p_j1)
            return j1

        jax.lax.while_loop(aug_cond, aug_step, j0)
        return 0

    jax.lax.fori_loop(0, n, add_row, 0)

    # invert p (col -> row) into col_of_row: out[p[j]] = j for assigned cols
    def invert(j, _):
        r = get_i(p_ref, col_idx, j)

        @pl.when(r >= 0)
        def _():
            set_at(out_ref, row_idx, r, j)

        return 0

    jax.lax.fori_loop(0, m, invert, 0)


def _entry(cost_ref, out_ref, *scratch, n, m):
    # blocks are (1, N, MP) / (1, 1, NP): drop the leading grid dim
    _kernel(cost_ref.at[0], out_ref.at[0], *scratch, n=n, m=m)


@functools.partial(jax.jit, static_argnames=("interpret",))
def batched_hungarian_pallas(cost: jax.Array, interpret: bool = False) -> jax.Array:
    """cost: (B, N, M) float -> (B, N) int32 column per row.  N <= M."""
    b, n, m = cost.shape
    assert n <= m
    mp = _round_up(m + 1, 128)
    np_ = _round_up(n, 128)
    padded = jnp.full((b, n, mp), _INF, jnp.float32)
    padded = padded.at[:, :, :m].set(cost.astype(jnp.float32))

    kern = functools.partial(_entry, n=n, m=m)
    out = pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n, mp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, np_), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 1, np_), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((1, np_), jnp.float32),   # u
            pltpu.VMEM((1, mp), jnp.float32),    # v
            pltpu.VMEM((1, mp), jnp.int32),      # p
            pltpu.VMEM((1, mp), jnp.float32),    # minv
            pltpu.VMEM((1, mp), jnp.int32),      # way
            pltpu.VMEM((1, mp), jnp.float32),    # used
            pltpu.VMEM((1, np_), jnp.float32),   # row_used
        ],
        interpret=interpret,
    )(padded)
    return out[:, 0, :n]
