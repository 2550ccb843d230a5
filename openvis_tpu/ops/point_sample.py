"""Point sampling of mask logits (point_rend equivalents), TPU-native.

Rebuilds the detectron2 ``point_sample`` /
``get_uncertain_point_coords_with_randomness`` pair the reference leans on
(``openvis/modeling/criterion.py:12-15,156-181``;
``openvis/modeling/matcher.py:110-136``): bilinear sampling of (H, W) logit
maps at normalized [0,1]^2 coordinates with the torch
``grid_sample(align_corners=False)`` convention (pixel = p*size - 0.5, zero
padding), plus uncertainty-based importance sampling for the mask losses.

Implemented as vectorized 4-corner gathers so the backward pass is an XLA
scatter-add (no host code, no atomics).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp


def point_sample(maps: jax.Array, coords: jax.Array) -> jax.Array:
    """Bilinear-sample 2D maps at normalized points.

    maps:   (..., H, W)
    coords: (..., P, 2) in [0, 1], (x, y) order, batch dims broadcastable
            against maps' batch dims.
    -> (..., P)
    """
    h, w = maps.shape[-2], maps.shape[-1]
    x = coords[..., 0] * w - 0.5
    y = coords[..., 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    lx = (x - x0).astype(maps.dtype)
    ly = (y - y0).astype(maps.dtype)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    flat = maps.reshape(*maps.shape[:-2], h * w)

    def corner(dy, dx, wgt):
        yy = y0i + dy
        xx = x0i + dx
        inb = (yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)
        idx = jnp.clip(yy, 0, h - 1) * w + jnp.clip(xx, 0, w - 1)
        g = jnp.take_along_axis(flat, idx, axis=-1)
        return g * (wgt * inb.astype(maps.dtype))

    one = jnp.ones((), maps.dtype)
    return (
        corner(0, 0, (one - ly) * (one - lx))
        + corner(0, 1, (one - ly) * lx)
        + corner(1, 0, ly * (one - lx))
        + corner(1, 1, ly * lx)
    )


def point_sample_shared_t(
    flat_t: jax.Array, h: int, w: int, coords: jax.Array,
    f32_policy: bool = False,
) -> jax.Array:
    """``point_sample_shared`` on a PRE-TRANSPOSED (HW, R) matrix.

    Callers sampling the same maps repeatedly (the criterion samples target
    masks once per decoder layer at fresh points) hoist the (R, HW)->(HW, R)
    transpose — at full train resolution it is ~66 MB of traffic per call.

    ``f32_policy``: sample bf16-EXACT rows (binary targets) under the f32
    grid_sample policy without storing them f32 — the gather moves bf16
    bytes and the rows upcast AFTER the gather, bitwise equal to gathering
    an upcast-f32 matrix (half the matrix + gather traffic)."""
    cdt = jnp.float32 if f32_policy else flat_t.dtype
    x = coords[:, 0] * w - 0.5
    y = coords[:, 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    lx = (x - x0).astype(cdt)
    ly = (y - y0).astype(cdt)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def corner(dy, dx, wgt):
        yy = y0i + dy
        xx = x0i + dx
        inb = (yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)
        idx = jnp.clip(yy, 0, h - 1) * w + jnp.clip(xx, 0, w - 1)  # (P,)
        g = jnp.take(flat_t, idx, axis=0)               # (P, R) row gather
        return g.astype(cdt) * (wgt * inb.astype(cdt))[:, None]

    one = jnp.ones((), cdt)
    out = (
        corner(0, 0, (one - ly) * (one - lx))
        + corner(0, 1, (one - ly) * lx)
        + corner(1, 0, ly * (one - lx))
        + corner(1, 1, ly * lx)
    )
    return out.T                                        # (R, P)


def corner_pack_rows_t(flat_t: jax.Array, h: int, w: int) -> jax.Array:
    """(B, H*W, R) -> (B, H*W, 4R): the 4 bilinear corner values of each
    pixel packed into ONE row, segments ``[v(y,x) | v(y,x+1) | v(y+1,x) |
    v(y+1,x+1)]``, zero past the last row (columns that wrap a row end are
    weight-zeroed by the sampler's in-bounds test).

    TPU rationale: row gathers serialize on the scalar core per DESCRIPTOR,
    not per byte — the 4-corner composition issues 4 gathers per point while
    the packed table needs ONE gather of a 4x row at identical total bytes
    (measured: full-res criterion target sampling is descriptor-bound).
    Build cost is a one-off 4x copy of the table, hoisted out of the
    per-decoder-layer loop by the criterion."""
    b, hw, r = flat_t.shape
    z1 = jnp.zeros((b, 1, r), flat_t.dtype)
    zw1 = jnp.zeros((b, w + 1, r), flat_t.dtype)
    t01 = jnp.concatenate([flat_t[:, 1:], z1], axis=1)
    t10 = jnp.concatenate([flat_t[:, w:], zw1[:, 1:]], axis=1)
    t11 = jnp.concatenate([flat_t[:, w + 1 :], zw1], axis=1)
    return jnp.concatenate([flat_t, t01, t10, t11], axis=-1)


def point_sample_shared_t4(
    tbl: jax.Array, h: int, w: int, coords: jax.Array,
    f32_policy: bool = False,
) -> jax.Array:
    """``point_sample_shared_t`` against a ``corner_pack_rows_t`` table:
    ONE row gather per point (descriptor-bound regime), then the bilinear
    combine over the packed corner segments.  Exactly equal to the 4-gather
    composition: out-of-map corners are weight-zeroed, and corners whose
    floor coordinate is negative re-select the lower segment that the
    clipped base row already holds (v(y,0) / v(0,x) / v(0,0))."""
    r = tbl.shape[-1] // 4
    cdt = jnp.float32 if f32_policy else tbl.dtype
    x = coords[:, 0] * w - 0.5
    y = coords[:, 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    lx = (x - x0).astype(cdt)
    ly = (y - y0).astype(cdt)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    idx = jnp.clip(y0i, 0, h - 1) * w + jnp.clip(x0i, 0, w - 1)
    g = jnp.take(tbl, idx, axis=0).astype(cdt)          # (P, 4R)
    g00 = g[:, :r]
    g01r = g[:, r : 2 * r]
    g10r = g[:, 2 * r : 3 * r]
    g11r = g[:, 3 * r :]
    xneg = (x0i < 0)[:, None]
    yneg = (y0i < 0)[:, None]
    v01 = jnp.where(xneg, g00, g01r)   # v(y0, x0+1) with x0 clipped to 0
    v10 = jnp.where(yneg, g00, g10r)   # v(y0+1, x0) with y0 clipped to 0
    v11 = jnp.where(yneg, v01, jnp.where(xneg, g10r, g11r))

    def wgt(dy, dx, wv):
        yy = y0i + dy
        xx = x0i + dx
        inb = (yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)
        return (wv * inb.astype(cdt))[:, None]

    one = jnp.ones((), cdt)
    out = (
        g00 * wgt(0, 0, (one - ly) * (one - lx))
        + v01 * wgt(0, 1, (one - ly) * lx)
        + v10 * wgt(1, 0, ly * (one - lx))
        + v11 * wgt(1, 1, ly * lx)
    )
    return out.T                                        # (R, P)


def sample_maps_packed(
    tbl: jax.Array, h: int, w: int, coords: jax.Array,
    f32_policy: bool = False,
) -> jax.Array:
    """Batched ``point_sample_shared_t4``: tbl (B, H*W, 4R) corner-packed
    rows, coords (B, P, 2) -> (B, R, P)."""
    return jax.vmap(
        lambda t, c: point_sample_shared_t4(t, h, w, c, f32_policy)
    )(tbl, coords)


def _bit_words(r: int) -> int:
    """uint32 words per corner segment (rows padded to a word boundary)."""
    return -(-r // 32)


def bit_pack_rows_t(flat_t: jax.Array, h: int, w: int) -> jax.Array:
    """BINARY-mask variant of :func:`corner_pack_rows_t`: (B, H*W, R) 0/1
    rows -> (B, H*W, 4*ceil(R/32)) uint32, corner segment ``c`` in words
    ``[c*W32, (c+1)*W32)`` with row ``r`` at bit ``r % 32`` of word
    ``r // 32``.

    The criterion's target masks are exactly 0/1 (dataset RLE decodes; the
    corner-packed bf16 table already relies on this for bf16-exactness), so
    each row compresses 4R bf16 lanes -> 4*ceil(R/32) uint32 lanes — at
    R=80 that is 640 B -> 48 B per gathered row, one lane-tile fetch
    instead of three (the gather is tile-fetch-bound, BASELINE.md), and
    ~13x less table HBM residency.  Unpacking is a constant lane-index
    broadcast + shift + mask."""
    b, hw, r = flat_t.shape
    w32 = _bit_words(r)
    bits = (flat_t > 0.5).astype(jnp.uint32)
    pad = w32 * 32 - r
    if pad:
        bits = jnp.concatenate(
            [bits, jnp.zeros((b, hw, pad), jnp.uint32)], axis=-1
        )
    shifts = (jnp.arange(w32 * 32, dtype=jnp.uint32) % 32).reshape(1, 1, w32, 32)
    words = jnp.sum(
        bits.reshape(b, hw, w32, 32) << shifts, axis=-1, dtype=jnp.uint32
    )                                                       # (B, HW, W32)
    z1 = jnp.zeros((b, 1, w32), jnp.uint32)
    zw1 = jnp.zeros((b, w + 1, w32), jnp.uint32)
    t01 = jnp.concatenate([words[:, 1:], z1], axis=1)
    t10 = jnp.concatenate([words[:, w:], zw1[:, 1:]], axis=1)
    t11 = jnp.concatenate([words[:, w + 1 :], zw1], axis=1)
    return jnp.concatenate([words, t01, t10, t11], axis=-1)  # (B, HW, 4*W32)


def point_sample_shared_t4_bits(
    tbl: jax.Array, r: int, h: int, w: int, coords: jax.Array,
    f32_policy: bool = False,
) -> jax.Array:
    """``point_sample_shared_t4`` against a :func:`bit_pack_rows_t` table
    (binary targets): ONE 4*ceil(R/32)-word row gather per point, bit
    unpack, then the identical bilinear combine.  Exactly equal to the
    float corner-packed path — 0/1 values are exact in every dtype."""
    w32 = tbl.shape[-1] // 4
    cdt = jnp.float32 if f32_policy else jnp.bfloat16
    x = coords[:, 0] * w - 0.5
    y = coords[:, 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    lx = (x - x0).astype(cdt)
    ly = (y - y0).astype(cdt)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    idx = jnp.clip(y0i, 0, h - 1) * w + jnp.clip(x0i, 0, w - 1)
    g = jnp.take(tbl, idx, axis=0)                      # (P, 4*W32) uint32
    # unpack: constant per-output-lane word index + bit shift
    word_of = (jnp.arange(r) // 32).astype(jnp.int32)   # (R,)
    shift_of = (jnp.arange(r, dtype=jnp.uint32) % 32)

    def seg(c):
        words = jnp.take(g, word_of + c * w32, axis=1)  # (P, R) static perm
        return ((words >> shift_of[None, :]) & jnp.uint32(1)).astype(cdt)

    g00, g01r, g10r, g11r = seg(0), seg(1), seg(2), seg(3)
    xneg = (x0i < 0)[:, None]
    yneg = (y0i < 0)[:, None]
    v01 = jnp.where(xneg, g00, g01r)
    v10 = jnp.where(yneg, g00, g10r)
    v11 = jnp.where(yneg, v01, jnp.where(xneg, g10r, g11r))

    def wgt(dy, dx, wv):
        yy = y0i + dy
        xx = x0i + dx
        inb = (yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)
        return (wv * inb.astype(cdt))[:, None]

    one = jnp.ones((), cdt)
    out = (
        g00 * wgt(0, 0, (one - ly) * (one - lx))
        + v01 * wgt(0, 1, (one - ly) * lx)
        + v10 * wgt(1, 0, ly * (one - lx))
        + v11 * wgt(1, 1, ly * lx)
    )
    return out.T                                        # (R, P)


def sample_maps_packed_bits(
    tbl: jax.Array, r: int, h: int, w: int, coords: jax.Array,
    f32_policy: bool = False,
) -> jax.Array:
    """Batched ``point_sample_shared_t4_bits``: tbl (B, H*W, 4*ceil(R/32))
    uint32 bit-packed corner rows, coords (B, P, 2) -> (B, R, P)."""
    return jax.vmap(
        lambda t, c: point_sample_shared_t4_bits(t, r, h, w, c, f32_policy)
    )(tbl, coords)


def point_sample_shared(maps: jax.Array, coords: jax.Array) -> jax.Array:
    """Bilinear sampling when ALL rows share one point set.

    maps: (R, H, W); coords: (P, 2) in [0,1] (x, y).  -> (R, P).

    TPU note: with shared points the gather indices are row-independent, so
    sampling becomes 4 ROW-gathers from the transposed (HW, R) matrix —
    ~200x fewer gather descriptors than the per-row elementwise path (the
    reference's matcher already shares its points, matcher.py:110).
    """
    r, h, w = maps.shape
    flat_t = maps.reshape(r, h * w).T                   # (HW, R)
    return point_sample_shared_t(flat_t, h, w, coords)


def sorted_uniform_points(key: jax.Array, batch, p: int) -> jax.Array:
    """(*batch, P, 2) random points, (x, y), with y ASCENDING per batch
    item — jointly distributed EXACTLY as P iid U(0,1)^2 points sorted by
    y, but generated directly: the order statistics of P iid uniforms are
    the normalized partial sums of P+1 iid Exp(1) spacings
    (y_(i) = S_i / S_(P+1)), and x is iid uniform independent of y's order.

    TPU rationale: ``lax.sort`` over the criterion's 12k-40k point pools
    measured 5-6 ms per decoder layer (bitonic, hundreds of passes over a
    small array); the cumsum here is a log-depth associative scan.  Point-
    SET semantics are unchanged — every criterion reduction is order-
    independent, and pred/target samplers see the same sorted array."""
    kx, ky = jax.random.split(key)
    e = jax.random.exponential(ky, (*batch, p + 1), dtype=jnp.float32)
    s = jnp.cumsum(e, axis=-1)
    ys = s[..., :-1] / s[..., -1:]
    xs = jax.random.uniform(kx, (*batch, p), dtype=jnp.float32)
    return jnp.stack([xs, ys], axis=-1)


def sort_points_by_y(coords: jax.Array) -> jax.Array:
    """(..., P, 2) -> same coords with the point axis sorted ascending in
    NORMALIZED y.  Point-SET semantics: the criterion's reductions are
    order-independent, and pred/target samplers called with the same sorted
    coords stay pairwise aligned (the sort happens once, before pixel
    scaling, so different map resolutions cannot reorder fp ties).  Sorted
    points make each 256-point block touch a narrow band of feature rows —
    the precondition for the Pallas tent-matmul sampler."""
    ys, xs = jax.lax.sort_key_val(coords[..., 1], coords[..., 0],
                                  dimension=-1)
    return jnp.stack([xs, ys], axis=-1)


# Pallas tent-matmul sampler pays off only on LOW-RES maps: its window
# streams whole (rr, W_pad) row blocks per 256-point block, so at full
# train resolution (480x864) the refetch is ~3-4x the map itself and it
# LOSES to the gather composition (measured on v5e: criterion_all_layers
# 384 ms with pallas target sampling vs 300 with gathers).  Pred masks at
# stride 4 (~120x216) fit the window cheaply.  Route by map area.
_PALLAS_MAX_HW = 1 << 16


def sample_maps_shared(
    maps: jax.Array, coords: jax.Array, f32_policy: bool = False
) -> jax.Array:
    """Batched ``point_sample_shared``: maps (B, R, H, W), coords (B, P, 2)
    SORTED by y -> (B, R, P).  On TPU, low-res maps go through the
    sorted-window Pallas tent-matmul kernel (ops/point_sample_pallas.py —
    gathers serialize); full-res maps and other backends use the row-gather
    composition.

    ``f32_policy``: sample bf16-valued maps under the f32 grid_sample
    policy WITHOUT pre-upcasting — the Pallas path uses the bitwise-
    equivalent 2-pass split dot (bf16 values are exact in f32), the
    fallback upcasts.  No effect on f32 maps."""
    h, w = maps.shape[-2:]
    if jax.default_backend() == "tpu" and h * w <= _PALLAS_MAX_HW:
        from openvis_tpu.ops.point_sample_pallas import (
            point_sample_nhwc_pallas,
        )

        value = jnp.transpose(maps, (0, 2, 3, 1))         # (B, H, W, R)
        return point_sample_nhwc_pallas(value, coords, f32_tents=f32_policy)
    if f32_policy:
        maps = maps.astype(jnp.float32)
    return jax.vmap(point_sample_shared)(maps, coords)


def sample_maps_shared_t(
    flat_t: jax.Array, h: int, w: int, coords: jax.Array,
    f32_policy: bool = False,
) -> jax.Array:
    """Batched ``point_sample_shared_t``: flat_t (B, H*W, R) pre-transposed
    rows, coords (B, P, 2) SORTED by y -> (B, R, P).  The (H*W, R) layout
    IS channels-last (H, W, R) flattened, so the Pallas path (low-res maps
    only — see ``_PALLAS_MAX_HW``) needs no transpose at all.

    ``f32_policy``: f32 grid_sample policy over bf16-EXACT rows without an
    upfront upcast — split-dot on the Pallas path, upcast-after-gather on
    the fallback (both bitwise equal to sampling an f32 copy)."""
    if jax.default_backend() == "tpu" and h * w <= _PALLAS_MAX_HW:
        from openvis_tpu.ops.point_sample_pallas import (
            point_sample_nhwc_pallas,
        )

        b, hw, r = flat_t.shape
        return point_sample_nhwc_pallas(
            flat_t.reshape(b, h, w, r), coords, f32_tents=f32_policy
        )
    return jax.vmap(
        lambda ft, c: point_sample_shared_t(ft, h, w, c, f32_policy)
    )(flat_t, coords)


def uncertain_point_coords(
    rng: jax.Array,
    mask_logits: jax.Array,  # (R, H, W)
    num_points: int,
    oversample_ratio: float,
    importance_sample_ratio: float,
) -> jax.Array:
    """Importance sampling of point coordinates (d2 point_features.py logic):
    sample ``oversample*P`` random points, keep the ``importance*P`` most
    uncertain (uncertainty = -|logit|), add ``(1-importance)*P`` fresh random
    points.  Returns (R, P, 2) in [0,1]x[0,1] (x, y)."""
    r = mask_logits.shape[0]
    n_sampled = int(num_points * oversample_ratio)
    n_uncertain = int(importance_sample_ratio * num_points)
    n_random = num_points - n_uncertain

    k1, k2 = jax.random.split(rng)
    cand = jax.random.uniform(k1, (r, n_sampled, 2), dtype=jnp.float32)
    logits = point_sample(mask_logits, cand)          # (R, n_sampled)
    uncertainty = -jnp.abs(logits)
    _, idx = jax.lax.top_k(uncertainty, n_uncertain)  # (R, n_uncertain)
    picked = jnp.take_along_axis(cand, idx[..., None], axis=1)
    if n_random > 0:
        rand = jax.random.uniform(k2, (r, n_random, 2), dtype=jnp.float32)
        picked = jnp.concatenate([picked, rand], axis=1)
    return jax.lax.stop_gradient(picked)
