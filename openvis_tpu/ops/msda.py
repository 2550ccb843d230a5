"""Multi-scale deformable attention (MSDeformAttn) — TPU-native.

Rebuild of the reference's only native op (CUDA
``ms_deformable_im2col_cuda`` / ``col2im``, see
``openvis/modeling/pixel_decoder/ops/src/cuda/ms_deform_im2col_cuda.cuh`` and
the ``grid_sample`` oracle ``ops/functions/ms_deform_attn_func.py:52-72``).

Semantics: for each query, each head samples ``P`` bilinear points per
feature level (zero padding outside, ``align_corners=False`` convention:
pixel coordinate = loc * size - 0.5) and reduces them with softmaxed
attention weights.

TPU design: instead of the CUDA scatter/atomic ``col2im`` backward, the
forward is expressed as 4-corner vectorized gathers (`take_along_axis` rows
of the per-head channel dim) that XLA lowers to efficient dynamic-gathers;
the backward is autodiff'd (gather -> segment-sum scatter, no atomics).
Level spatial shapes are **static** Python tuples so each (H, W) bucket
traces once.

API mirrors the reference op but drops ``level_start_index``/``im2col_step``
(derived / unnecessary under XLA).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def ms_deform_attn(
    value: jax.Array,                # (B, Len_in, n_heads, ch)
    spatial_shapes: Sequence[Tuple[int, int]],  # static [(H_l, W_l)] per level
    sampling_locations: jax.Array,   # (B, Len_q, n_heads, n_levels, n_points, 2) in [0,1]
    attention_weights: jax.Array,    # (B, Len_q, n_heads, n_levels, n_points), softmaxed
) -> jax.Array:                      # (B, Len_q, n_heads * ch)
    """Multi-scale deformable attention.  On TPU the forward runs the
    Pallas implicit-matmul kernel (ops/msda_pallas.py — gathers serialize on
    TPU); elsewhere (and for the backward pass) the XLA composition below."""
    if jax.default_backend() == "tpu":
        from openvis_tpu.ops.msda_pallas import ms_deform_attn_pallas

        return ms_deform_attn_pallas(
            value, spatial_shapes, sampling_locations, attention_weights
        )
    return ms_deform_attn_xla(
        value, spatial_shapes, sampling_locations, attention_weights
    )


def ms_deform_attn_xla(
    value: jax.Array,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jax.Array,
    attention_weights: jax.Array,
) -> jax.Array:
    """XLA row-gather composition (reference oracle + backward path)."""
    b, len_in, n_heads, ch = value.shape
    n_levels = len(spatial_shapes)
    len_q = sampling_locations.shape[1]
    assert sum(h * w for h, w in spatial_shapes) == len_in, (
        f"value length {len_in} != sum of {spatial_shapes}"
    )

    # (B, n_heads, Len_in, ch): head-major so per-level slices gather rows.
    value_t = jnp.swapaxes(value, 1, 2)

    out = jnp.zeros((b, n_heads, len_q, ch), dtype=value.dtype)
    start = 0
    for lvl, (h, w) in enumerate(spatial_shapes):
        v = value_t[:, :, start : start + h * w, :]      # (B, nh, H*W, ch)
        start += h * w
        loc = sampling_locations[:, :, :, lvl]           # (B, Lq, nh, P, 2)
        attn = attention_weights[:, :, :, lvl]           # (B, Lq, nh, P)
        out = out + _sample_level(v, loc, attn, h, w)
    out = jnp.swapaxes(out, 1, 2)                        # (B, Lq, nh, ch)
    return out.reshape(b, len_q, n_heads * ch)


def _sample_level(v, loc, attn, h: int, w: int):
    """Bilinear-sample one level.

    v:    (B, nh, H*W, ch)
    loc:  (B, Lq, nh, P, 2) normalized [0,1], (x, y) order
    attn: (B, Lq, nh, P)
    -> (B, nh, Lq, ch)
    """
    b, len_q, n_heads, p, _ = loc.shape
    ch = v.shape[-1]
    compute_dtype = v.dtype

    # grid_sample(align_corners=False): input grid in [-1,1] maps pixel
    # centers to ((g+1)*size - 1)/2; with g = 2*loc - 1 this is loc*size - 0.5.
    x = loc[..., 0] * w - 0.5                            # (B, Lq, nh, P)
    y = loc[..., 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    lx = (x - x0).astype(compute_dtype)
    ly = (y - y0).astype(compute_dtype)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def corner_idx_w(dy: int, dx: int, wgt):
        yy = y0i + dy
        xx = x0i + dx
        inb = (yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)
        idx = jnp.clip(yy, 0, h - 1) * w + jnp.clip(xx, 0, w - 1)  # (B, Lq, nh, P)
        # weight includes attention and zero-padding mask; fold in BEFORE the
        # gather-sum so all 4 corners share one contraction pattern.
        cw = (wgt * attn * inb.astype(compute_dtype))               # (B, Lq, nh, P)
        return idx, cw

    one = jnp.ones((), compute_dtype)
    corners = [
        corner_idx_w(0, 0, (one - ly) * (one - lx)),
        corner_idx_w(0, 1, (one - ly) * lx),
        corner_idx_w(1, 0, ly * (one - lx)),
        corner_idx_w(1, 1, ly * lx),
    ]
    # ONE row-gather for all 4 corners: idx (B, nh, 4*Lq*P).  Row-structured
    # gathers (slice = the contiguous ch row) lower to efficient TPU gathers,
    # unlike take_along_axis whose broadcast emits elementwise gathers.
    idx_all = jnp.stack([c[0] for c in corners])                    # (4, B, Lq, nh, P)
    w_all = jnp.stack([c[1] for c in corners])
    idx_t = jnp.transpose(idx_all, (1, 3, 0, 2, 4)).reshape(
        b, n_heads, 4 * len_q * p
    )
    w_t = jnp.transpose(w_all, (1, 3, 0, 2, 4)).reshape(
        b, n_heads, 4, len_q, p
    )
    gather_rows = jax.vmap(jax.vmap(lambda vb, ib: jnp.take(vb, ib, axis=0)))
    g = gather_rows(v, idx_t).reshape(b, n_heads, 4, len_q, p, ch)
    return jnp.einsum("bhkqp,bhkqpc->bhqc", w_t, g)


def ms_deform_attn_oracle(value, spatial_shapes, sampling_locations, attention_weights):
    """Independent slow oracle via jax.scipy map_coordinates (order-1,
    zero-fill) for kernel tests — mirrors ``ops/test.py``'s CUDA-vs-PyTorch
    check pattern."""
    from jax.scipy.ndimage import map_coordinates

    b, len_in, n_heads, ch = value.shape
    len_q = sampling_locations.shape[1]
    out = jnp.zeros((b, len_q, n_heads, ch), dtype=jnp.float32)
    start = 0
    for lvl, (h, w) in enumerate(spatial_shapes):
        v = value[:, start : start + h * w].reshape(b, h, w, n_heads, ch)
        start += h * w
        for bi in range(b):
            for hd in range(n_heads):
                img = v[bi, :, :, hd, :].astype(jnp.float32)  # (H, W, ch)
                loc = sampling_locations[bi, :, hd, lvl]       # (Lq, P, 2)
                attn = attention_weights[bi, :, hd, lvl]       # (Lq, P)
                ys = loc[..., 1] * h - 0.5
                xs = loc[..., 0] * w - 0.5
                samples = jnp.stack(
                    [
                        map_coordinates(img[..., c], [ys, xs], order=1, mode="constant", cval=0.0)
                        for c in range(ch)
                    ],
                    axis=-1,
                )  # (Lq, P, ch)
                out = out.at[bi, :, hd].add(jnp.einsum("qp,qpc->qc", attn, samples))
    return out.reshape(b, len_q, n_heads * ch)
