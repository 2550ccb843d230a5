"""Pallas TPU point sampler: y-sorted windowed tent-matmul, zero gathers.

The criterion samples ~44k random points per decoder layer from the
prediction/target mask stacks (reference d2 ``point_sample`` over
``grid_sample``, ``openvis/modeling/criterion.py:156-181``).  As 4-corner
row gathers that is ~350k gather descriptors per layer — TPU gathers
serialize on the scalar core and dominated the criterion (~19 ms per
loss call measured; the same pathology as MSDA, ops/msda_pallas.py).

Reformulation: sort the points by y (a point SET — the criterion's
reductions are order-independent, and paired pred/target calls sort with
identical keys so correspondence is preserved), then each 256-point block
touches only a narrow, contiguous band of feature rows.  Per block the
sampler builds bilinear tent weights ``ty x tx`` on the VPU and contracts
them against the row band on the MXU — the implicit-matmul trick from the
MSDA kernel with one point per "query".

Windowing: each point block walks a STATIC number ``kb`` of row blocks
starting at its (scalar-prefetched, clamped) first active row.  ``kb`` is
sized at 4x the mean block span + slack: for uniform random points the
probability of any block exceeding it is e^{-O(block_size)} (~e^-400), and
whenever the window covers the whole (padded) map — all small/test shapes —
the result is EXACT.  Rows outside a point's tent contribute exact zeros
(zero-padded values), so no gating is needed inside the window.

Backward: only the prediction-mask samples need gradients (points and
targets are stop-gradient), and only w.r.t. the VALUES — dValue runs the
transposed contraction per row block over a windowed range of point blocks
(first touching point found by searchsorted on the sorted y).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PBQ = 256  # points per block


def _round_up(a: int, b: int) -> int:
    return -(-a // b) * b


def _split_hi_lo(a):
    """f32 -> (hi, lo) bf16 pair with a ~= hi + lo (residual ~2^-18 |a|)."""
    hi = a.astype(jnp.bfloat16)
    lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _dot_f32_3pass(lhs, rhs, dims=None):
    """f32 x f32 MXU dot as THREE native bf16 passes with f32 accumulation
    (the hi*hi + lo*hi + hi*lo decomposition; the dropped lo*lo term is
    ~2^-18 relative).  ``Precision.HIGHEST`` on f32 inside a Pallas kernel
    is a ~6-pass MXU emulation (see CLAUDE.md / ops/msda_pallas.py:85-88);
    this halves the MXU cost at grid_sample-indistinguishable accuracy
    (~1e-5 relative vs f32's ~6e-8 — far below the criterion's logit
    scale)."""
    lh, ll = _split_hi_lo(lhs)
    rh, rl = _split_hi_lo(rhs)

    def d(a, b):
        if dims is None:
            return jnp.dot(a, b, preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.DEFAULT)
        return jax.lax.dot_general(
            a, b, dims, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )

    return d(lh, rh) + d(ll, rh) + d(lh, rl)


def _fwd_kernel(sinfo_ref, y_ref, x_ref, v_ref, out_ref, tx_ref, acc_ref,
                *, w: int, rr: int, kb: int, ct, split2: bool):
    b = pl.program_id(0)
    q = pl.program_id(2)
    k = pl.program_id(3)

    @pl.when(k == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        xj = jax.lax.broadcasted_iota(
            jnp.int32, (PBQ, w), 1
        ).astype(jnp.float32)
        xq = x_ref[0]                                     # (PBQ, 1)
        tx_ref[:] = jnp.maximum(0.0, 1.0 - jnp.abs(xq - xj)).astype(
            jnp.float32 if split2 else ct
        )

    # exact per-block window gating: k-steps past the block's last tent-
    # active row contribute EXACT zeros (that is what made the static
    # window harmless) — skip their tents and dots outright
    @pl.when(k < sinfo_ref[b, q, 1])
    def _body():
        r0 = ((sinfo_ref[b, q, 0] + k) * rr).astype(jnp.float32)
        rows = []
        for ri in range(rr):
            ty = jnp.maximum(
                0.0, 1.0 - jnp.abs(y_ref[0] - (r0 + ri))
            )                                             # (PBQ, 1)
            if split2:
                rows.append(ty * tx_ref[:])
            else:
                rows.append(ty.astype(ct) * tx_ref[:])
        lhs = jnp.concatenate(rows, axis=1)               # (PBQ, rr*w)
        vblk = v_ref[0].reshape(rr * w, -1)
        if split2:
            # bf16-EXACT values (the AMP mask stack) x f32 tents: split the
            # TENTS hi/lo and run two native bf16 passes — bitwise equal to
            # the 3-pass f32 dot on the upcast values, whose third pass
            # (hi @ value_lo) is identically zero.  Keep the (d1 + d2)
            # grouping BEFORE adding acc (f32 + is non-associative; the
            # 3-pass path sums its passes first too).
            lh, ll = _split_hi_lo(lhs)
            acc_ref[:] = acc_ref[:] + (jnp.dot(
                lh, vblk, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            ) + jnp.dot(
                ll, vblk, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            ))
        elif ct == jnp.bfloat16:
            acc_ref[:] = acc_ref[:] + jnp.dot(
                lhs, vblk.astype(ct), preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            )
        else:
            acc_ref[:] = acc_ref[:] + _dot_f32_3pass(lhs, vblk.astype(ct))

    @pl.when(k == kb - 1)
    def _fin():
        out_ref[0] = acc_ref[:].astype(out_ref.dtype)


def _dvalue_kernel(pinfo_ref, y_ref, x_ref, g_ref, dv_ref, acc_ref,
                   *, w: int, rr: int, kpb: int):
    b = pl.program_id(0)
    r = pl.program_id(2)
    kp = pl.program_id(3)

    @pl.when(kp == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # exact window gating (see _fwd_kernel): point blocks wholly past the
    # row block's tent support contribute exact zeros — skip them
    @pl.when(kp < pinfo_ref[b, r, 1])
    def _body():
        xj = jax.lax.broadcasted_iota(
            jnp.int32, (PBQ, w), 1
        ).astype(jnp.float32)
        xq = x_ref[0]                                     # (PBQ, 1)
        tx = jnp.maximum(0.0, 1.0 - jnp.abs(xq - xj))
        r0 = (r * rr).astype(jnp.float32)
        rows = []
        for ri in range(rr):
            ty = jnp.maximum(
                0.0, 1.0 - jnp.abs(y_ref[0] - (r0 + ri))
            )                                             # (PBQ, 1)
            rows.append(ty * tx)
        lhs = jnp.concatenate(rows, axis=1)               # (PBQ, rr*w)
        g = g_ref[0].astype(jnp.float32)                  # (PBQ, cR)
        acc_ref[:] = acc_ref[:] + _dot_f32_3pass(
            lhs, g, (((0,), (0,)), ((), ()))
        )                                                 # (rr*w, cR)

    @pl.when(kp == kpb - 1)
    def _fin():
        dv_ref[0] = acc_ref[:].reshape(dv_ref.shape[1:]).astype(dv_ref.dtype)


def _window_blocks(mean_span_rows: float, rr: int, n_blocks: int) -> int:
    """Static window size: 4x the mean span + slack, in rr-row blocks,
    clamped to the whole map (=> exact for small maps)."""
    window_rows = 4.0 * mean_span_rows + 4.0
    return max(1, min(n_blocks, -(-int(window_rows + 1) // rr)))


@functools.partial(jax.jit, static_argnames=("rr", "interpret", "f32_tents"))
def _ps_fwd(value, ys, xs, rr: int = 2, interpret: bool = False,
            f32_tents: bool = False):
    """value (B, H, W, R) zero-padded maps; ys/xs (B, PP) pixel coords
    SORTED ascending in y per batch item (pads y=+1e9 at the end)
    -> (B, PP, R) f32 samples (grid_sample align_corners=False, zero pad).

    ``f32_tents`` (bf16 values only): keep tents f32 and run the 2-pass
    hi/lo-split dot — bitwise equal to upcasting the (bf16-exact) values to
    f32 and using the 3-pass dot, at 2/3 the MXU cost."""
    bsz, h, w, r = value.shape
    pp = ys.shape[1]
    assert pp % PBQ == 0
    npb = pp // PBQ
    split2 = bool(f32_tents) and value.dtype == jnp.bfloat16
    ct = jnp.bfloat16 if value.dtype == jnp.bfloat16 else jnp.float32
    rp = _round_up(r, 128)
    cr = rp // 128
    # lane-aligned width: zero-padded columns contribute exact zeros to the
    # dot, and aligned (PBQ, wp) pieces concatenate without lane relayouts
    wp = _round_up(w, 128)
    hp = _round_up(h, rr)
    kb = _window_blocks(h * PBQ / pp, rr, hp // rr)
    hp = max(hp, kb * rr)
    nrb = hp // rr

    v_pad = jnp.zeros((bsz, hp, wp, rp), value.dtype)
    v_pad = v_pad.at[:, :h, :w, :r].set(value)

    # first active row block per point block, clamped so start+kb stays
    # in range (the clamp only widens the window downward — harmless), and
    # the EXACT number of active k-steps: the last tent-active row is
    # floor(ymax)+1, anything past it contributes exact zeros and is gated
    # off in-kernel (pad points at y=1e9 clamp to the full window — at most
    # the one partial tail block)
    yblk = ys.reshape(bsz, npb, PBQ)
    ymin = yblk.min(axis=-1)
    ymax = yblk.max(axis=-1)
    starts = jnp.clip(
        (jnp.floor(ymin).astype(jnp.int32) - 1) // rr, 0, nrb - kb
    )
    rb_hi = jnp.clip(
        (jnp.floor(ymax).astype(jnp.int32) + 1) // rr, 0, nrb - 1
    )
    keff = jnp.clip(rb_hi - starts + 1, 1, kb)
    sinfo = jnp.stack([starts, keff], axis=-1)            # (B, npb, 2)

    # coords carried as (B, PP, 1): Mosaic requires the block's last two
    # dims be (8-, 128-divisible) or equal to the array dims — (PBQ, 1) is
    ys3 = ys[..., None]
    xs3 = xs[..., None]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bsz, cr, npb, kb),
        in_specs=[
            pl.BlockSpec((1, PBQ, 1), lambda b, c, q, k, s: (b, q, 0)),
            pl.BlockSpec((1, PBQ, 1), lambda b, c, q, k, s: (b, q, 0)),
            pl.BlockSpec((1, rr, wp, 128),
                         lambda b, c, q, k, s: (b, s[b, q, 0] + k, 0, c)),
        ],
        out_specs=pl.BlockSpec((1, PBQ, 128),
                               lambda b, c, q, k, s: (b, q, c)),
        scratch_shapes=[
            pltpu.VMEM((PBQ, wp), jnp.float32 if split2 else ct),
            pltpu.VMEM((PBQ, 128), jnp.float32),   # accumulator
        ],
    )
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, w=wp, rr=rr, kb=kb, ct=ct,
                          split2=split2),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bsz, pp, rp), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
        interpret=interpret,
    )(sinfo, ys3, xs3, v_pad)
    return out[:, :, :r]


def _ps_bwd(value_shape, value_dtype, ys, xs, g, rr: int = 2,
            interpret: bool = False):
    """dValue (B, H, W, R) given upstream g (B, PP, R) in the SAME sorted
    point order as the forward."""
    bsz, h, w, r = value_shape
    pp = ys.shape[1]
    npb = pp // PBQ
    rp = _round_up(r, 128)
    cr = rp // 128
    wp = _round_up(w, 128)
    hp = _round_up(h, rr)
    # expected point BLOCKS touching one rr-row block (+tent overhang),
    # 4x margin — exact whenever it covers all blocks (small shapes)
    mean_blocks = pp * (rr + 2) / max(h, 1) / PBQ
    kpb = max(1, min(npb, int(4.0 * mean_blocks + 2.0)))
    nrb = hp // rr

    g_pad = jnp.zeros((bsz, pp, rp), jnp.float32)
    g_pad = g_pad.at[:, :, :r].set(g.astype(jnp.float32))

    # first/last point blocks touching rows [r*rr, r*rr+rr): tent support
    # needs r*rr - 1 < y < r*rr + rr; sorted y -> two searchsorteds.  The
    # exact active k-count gates the static window in-kernel (see fwd)
    r0s = jnp.arange(nrb, dtype=jnp.float32) * rr - 1.0   # (nrb,)
    first_idx = jax.vmap(
        lambda yy: jnp.searchsorted(yy, r0s)
    )(ys).astype(jnp.int32)                               # (B, nrb)
    past_idx = jax.vmap(
        lambda yy: jnp.searchsorted(yy, r0s + float(rr) + 1.0)
    )(ys).astype(jnp.int32)                               # (B, nrb)
    pstarts = jnp.clip(first_idx // PBQ, 0, npb - kpb)
    kp_hi = jnp.clip(-(-past_idx // PBQ) - pstarts, 1, kpb)
    pinfo = jnp.stack([pstarts, kp_hi], axis=-1)          # (B, nrb, 2)

    ys3 = ys[..., None]
    xs3 = xs[..., None]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bsz, cr, nrb, kpb),
        in_specs=[
            pl.BlockSpec((1, PBQ, 1),
                         lambda b, c, rb, kp, s: (b, s[b, rb, 0] + kp, 0)),
            pl.BlockSpec((1, PBQ, 1),
                         lambda b, c, rb, kp, s: (b, s[b, rb, 0] + kp, 0)),
            pl.BlockSpec((1, PBQ, 128),
                         lambda b, c, rb, kp, s: (b, s[b, rb, 0] + kp, c)),
        ],
        out_specs=pl.BlockSpec((1, rr, wp, 128),
                               lambda b, c, rb, kp, s: (b, rb, 0, c)),
        scratch_shapes=[pltpu.VMEM((rr * wp, 128), jnp.float32)],
    )
    dv = pl.pallas_call(
        functools.partial(_dvalue_kernel, w=wp, rr=rr, kpb=kpb),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bsz, nrb * rr, wp, rp), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
        interpret=interpret,
    )(pinfo, ys3, xs3, g_pad)
    return dv[:, :h, :w, :r].astype(value_dtype)


def _ps_bwd_scatter(value_shape, value_dtype, ys, xs, g):
    """dValue via an XLA 4-corner scatter-add — the exact transpose of the
    gather composition in ``point_sample.point_sample_shared``.  A/B
    alternative to the Pallas dValue kernel (``_ps_bwd``): scatter-adds of
    (PP,) row indices into (HW, R) rows keep the row width on the lanes, so
    XLA's scatter path is competitive where per-element gathers were not."""
    bsz, h, w, r = value_shape
    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    lx = xs - x0
    ly = ys - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    gf = g.astype(jnp.float32)

    def one(y0b, x0b, lyb, lxb, gb):
        dflat = jnp.zeros((h * w, r), jnp.float32)
        for dy, dx, wgt in (
            (0, 0, (1.0 - lyb) * (1.0 - lxb)),
            (0, 1, (1.0 - lyb) * lxb),
            (1, 0, lyb * (1.0 - lxb)),
            (1, 1, lyb * lxb),
        ):
            yy = y0b + dy
            xx = x0b + dx
            inb = (yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)
            idx = jnp.clip(yy, 0, h - 1) * w + jnp.clip(xx, 0, w - 1)
            dflat = dflat.at[idx].add(gb * (wgt * inb)[:, None])
        return dflat

    dv = jax.vmap(one)(y0i, x0i, ly, lx, gf)
    return dv.reshape(bsz, h, w, r).astype(value_dtype)


# dValue implementation: "pallas" (windowed transposed tent-matmul) or
# "xla" (4-corner scatter-add).  Overridable via OVT_PS_BWD for A/B runs.
_BWD_IMPL = os.environ.get("OVT_PS_BWD", "pallas")


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _ps_op(value, ys, xs, interpret=False, f32_tents=False):
    return _ps_fwd(value, ys, xs, interpret=interpret, f32_tents=f32_tents)


def _ps_op_fwd(value, ys, xs, interpret, f32_tents):
    return (
        _ps_fwd(value, ys, xs, interpret=interpret, f32_tents=f32_tents),
        (value, ys, xs),
    )


def _ps_op_bwd(interpret, f32_tents, res, g):
    value, ys, xs = res
    if _BWD_IMPL == "xla":
        dv = _ps_bwd_scatter(value.shape, value.dtype, ys, xs, g)
    else:
        dv = _ps_bwd(value.shape, value.dtype, ys, xs, g,
                     interpret=interpret)
    return dv, jnp.zeros_like(ys), jnp.zeros_like(xs)


_ps_op.defvjp(_ps_op_fwd, _ps_op_bwd)


def point_sample_nhwc_pallas(value, coords, interpret: bool = False,
                             f32_tents: bool = False):
    """Batched shared-point sampling via the windowed tent-matmul kernel.

    value (B, H, W, R) channels-last maps; coords (B, P, 2) normalized
    [0,1] (x, y), SORTED ascending in y per batch item (use
    ``point_sample.sort_points_by_y`` — sorting must happen ONCE on the
    normalized coords so paired pred/target calls at different resolutions
    keep identical point order).  -> (B, R, P) f32.  Gradients flow to
    ``value`` only (points/targets are stop-gradient in the criterion).

    ``f32_tents``: for bf16 ``value`` whose entries are EXACT in bf16 (the
    AMP mask stack, binary targets), sample with f32 tents via the 2-pass
    split dot — bitwise equal to upcasting value to f32 first (see
    ``_ps_fwd``), at 2/3 the MXU cost and half the value HBM traffic."""
    bsz, h, w, r = value.shape
    p = coords.shape[1]

    ys = coords[..., 1].astype(jnp.float32) * h - 0.5
    xs = coords[..., 0].astype(jnp.float32) * w - 0.5
    pp = _round_up(p, PBQ)
    if pp != p:
        ys = jnp.concatenate(
            [ys, jnp.full((bsz, pp - p), 1e9, jnp.float32)], axis=1
        )
        xs = jnp.concatenate(
            [xs, jnp.full((bsz, pp - p), -10.0, jnp.float32)], axis=1
        )
    out = _ps_op(value, ys, xs, interpret, f32_tents)     # (B, PP, R)
    return jnp.swapaxes(out[:, :p], 1, 2)                 # (B, R, P)
