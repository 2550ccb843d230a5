"""Order-statistic selection without sorting networks.

``kth_largest`` computes the exact k-th largest VALUE along the last axis —
the uncertainty-selection threshold of the point-sampled mask losses
(reference ``openvis/utils/point_features.py:79-92`` takes ``topk`` indices;
our criterion's dense formulation only needs the k-th value to threshold
against, see ``losses/criterion.py``).

``lax.top_k`` materializes and sorts k payload columns (measured 2.7 ms per
criterion layer at k=9408 of 40768 on v5e); this bit-descent finds the same
value in 32 compare+count passes that XLA fuses into cheap streaming
kernels, with no payload movement.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _f32_to_ordered_u32(x: jax.Array) -> jax.Array:
    """Monotonic bijection f32 -> uint32: x < y  <=>  map(x) < map(y).
    Standard sign-flip trick (negative floats reverse-ordered in raw bits)."""
    b = jax.lax.bitcast_convert_type(x, jnp.uint32)
    neg = (b >> 31) == 1
    return jnp.where(neg, ~b, b | jnp.uint32(0x80000000))


def _ordered_u32_to_f32(u: jax.Array) -> jax.Array:
    neg = (u >> 31) == 0
    b = jnp.where(neg, ~u, u & jnp.uint32(0x7FFFFFFF))
    return jax.lax.bitcast_convert_type(b, jnp.float32)


def kth_largest(x: jax.Array, k: int) -> jax.Array:
    """Exact k-th largest value of ``x`` along the last axis (k >= 1),
    shape ``x.shape[:-1]``.  Equals ``lax.top_k(x, k)[0][..., -1]`` bit-for-
    bit (ties are by value, so tie-breaking cannot differ).

    Binary-searches the answer's BITS: descending from the high bit, keep a
    candidate threshold ``t`` maximal such that ``count(x >= t) >= k``; the
    count predicate is monotone in ``t``, so the descent converges to the
    k-th value exactly.  Each of the 32 steps is one fused compare+count
    over the data — O(32 n) streaming work, no sort, no k-column payload.

    NaNs are not supported (they map above +inf); +/-inf are fine.
    """
    assert k >= 1
    u = _f32_to_ordered_u32(x.astype(jnp.float32))

    # radix-16 descent: 8 passes over the data instead of 32.  Each pass
    # fixes one hex digit by comparing against the 15 candidate thresholds
    # thr | (g << shift), g = 1..15, in ONE data read (the count predicate
    # is monotone in g, so the digit is the largest g whose count >= k).
    # The op is memory-bound at criterion shapes — 4x fewer passes measured
    # faster than the extra 15-way compare costs.
    gs = jnp.arange(1, 16, dtype=jnp.uint32)              # (15,)

    def step(i, thr):
        shift = jnp.uint32(28) - jnp.uint32(4) * jnp.uint32(i)
        cands = thr[..., None] | (gs << shift)            # (..., 15)
        cnt = jnp.sum(
            (u[..., None] >= cands[..., None, :]).astype(jnp.int32), axis=-2
        )                                                 # (..., 15)
        ok = cnt >= k
        digit = jnp.sum(ok.astype(jnp.uint32), axis=-1)   # largest ok g
        return thr | (digit << shift)

    thr0 = jnp.zeros(x.shape[:-1], jnp.uint32)
    thr = jax.lax.fori_loop(0, 8, step, thr0)
    return _ordered_u32_to_f32(thr)
