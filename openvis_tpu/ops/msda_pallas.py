"""Pallas TPU kernel for multi-scale deformable attention (forward).

The XLA composition (``openvis_tpu.ops.msda``) expresses each bilinear
sample as row gathers; TPU gathers of 64-byte rows serialize through the
scalar core and made the 6-layer deformable encoder ~97% of the whole
segmenter forward (profiled: 1.46s of 1.47s per 10-frame window).

This kernel reformulates sampling as an IMPLICIT sparse matmul that never
materializes indices or one-hots:

    out[q, c] = sum_j L[q, j] * V[j, c],
    L[q, j] = sum_p attn[q, p] * tent(y_qp - Y_j) * tent(x_qp - X_j)

with ``tent(d) = max(0, 1 - |d|)`` — exactly zero-padded
``grid_sample(align_corners=False)`` bilinear.  The grid walks feature-map
ROWS: per (batch*head, query-block, row) program the column tents
``tx[q, p, X]`` are computed once per query-block (hoisted into VMEM
scratch at row 0), the row tent is a per-(q, p) scalar, and the (BQ, Wp) x
(Wp, ch) product runs on the MXU with accumulation over rows.  All work is
dense VPU/MXU — zero gathers.

Backward runs the same implicit-matmul structure in two kernels: dValue as
L^T @ g accumulated over query blocks, and (dAttn, dLoc) via the per-block
score matrix S = g @ V^T with tent-derivative reductions — verified exact
against the XLA composition's autodiff.
"""

from __future__ import annotations

import functools
import os
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Backward-path y-stripe toggle (see ms_deform_attn_pallas_bwd).  In a
# STANDALONE bwd call the stripe's loc/attn/g permutation + dloc/dattn
# inverse (concat-of-45-slices x5 arrays) cost more than the hull savings
# (micro: unstriped both-parts 14.6 ms vs striped full bwd ~24), but in the
# COMPOSED train step those concats fuse into surrounding ops and striping
# still wins (A/B on bench.py train step: striped 239.9 vs unstriped 255.3
# ms/step — BASELINE.md round-5).  Env hatch: OPENVIS_MSDA_STRIPE=0.
_STRIPE_BWD = os.environ.get("OPENVIS_MSDA_STRIPE", "1") == "1"


def _round_up(a: int, b: int) -> int:
    return -(-a // b) * b


def _level_kernel(flags_ref, y_ref, x_ref, a_ref, v_ref, out_ref,
                  tx_ref, acc_ref,
                  *, h: int, w: int, p: int, bq: int, wp: int, rr: int,
                  ct):
    b = pl.program_id(0)
    qb = pl.program_id(1)
    rb = pl.program_id(2)
    nrb = pl.num_programs(2)

    @pl.when(rb == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        # hoist column tents: tx[q, p, X] = tent(x_qp - X), zero on padding.
        # Differences are computed in f32 (coords up to W would lose ~0.5px
        # in bf16); only the bounded [0,1] tent VALUES are stored as `ct`.
        xj = jax.lax.broadcasted_iota(jnp.int32, (bq, wp), 1).astype(jnp.float32)
        for pi in range(p):
            xq = x_ref[0, :, pi][:, None]                 # (BQ, 1)
            tx = jnp.maximum(0.0, 1.0 - jnp.abs(xq - xj))
            tx = jnp.where(xj < w, tx, 0.0)
            tx_ref[pi] = tx.astype(ct)

    # row-block gating: deformable attention is local, so most feature-row
    # blocks have zero tent mass for this query block (the CUDA reference
    # gets the same effect from gather locality, ms_deform_im2col_cuda.cuh)
    @pl.when(flags_ref[b, qb, rb] > 0)
    def _body():
        # RR feature rows per program: LHS (BQ, RR*WP) @ V (RR*WP, ch) — one
        # MXU dot; padded rows hold zero values so spill tents are harmless
        r0 = (rb * rr).astype(jnp.float32)
        lhs_rows = []
        for ri in range(rr):
            rf = r0 + ri
            lhs = jnp.zeros((bq, wp), ct)
            for pi in range(p):
                ty = jnp.maximum(0.0, 1.0 - jnp.abs(y_ref[0, :, pi] - rf))
                wgt = (a_ref[0, :, pi] * ty).astype(ct)[:, None]  # (BQ, 1)
                lhs = lhs + wgt * tx_ref[pi]
            lhs_rows.append(lhs)
        lhs_all = jnp.concatenate(lhs_rows, axis=1)       # (BQ, RR*WP)

        vblk = v_ref[0].astype(ct).reshape(rr * wp, -1)
        # bf16 path: native bf16 MXU with f32 accumulation (HIGHEST would
        # request a multi-pass f32 emulation Mosaic rejects for bf16 lhs)
        prec = (jax.lax.Precision.DEFAULT if ct == jnp.bfloat16
                else jax.lax.Precision.HIGHEST)
        acc_ref[:] = acc_ref[:] + jnp.dot(
            lhs_all, vblk, preferred_element_type=jnp.float32, precision=prec,
        )

    @pl.when(rb == nrb - 1)
    def _fin():
        out_ref[0] = acc_ref[:].astype(out_ref.dtype)


def _row_block_flags(y_p, lq_blocks: int, bq: int, rr: int, nrb: int,
                     transpose: bool = False):
    """(BN, nqb, nrb) int32: 1 iff any query in the block has tent mass on
    the row block (rows [r*rr, r*rr+rr), tent support (y-1, y+1))."""
    bn = y_p.shape[0]
    p = y_p.shape[-1]
    yb = y_p.reshape(bn, lq_blocks, bq * p)
    ymax = yb.max(axis=-1)                                  # (BN, nqb)
    ymin = jnp.where(yb > -9.0, yb, jnp.inf).min(axis=-1)   # ignore padding
    r0 = jnp.arange(nrb, dtype=jnp.float32) * rr            # (nrb,)
    active = jnp.logical_and(
        ymax[:, :, None] > r0[None, None, :] - 1.0,
        ymin[:, :, None] < r0[None, None, :] + rr,
    )
    flags = active.astype(jnp.int32)
    return jnp.swapaxes(flags, 1, 2) if transpose else flags


@functools.partial(jax.jit, static_argnames=("h", "w", "bq", "rr", "interpret"))
def _sample_level_pallas(value, y, x, attn, h: int, w: int, bq: int = 256,
                         rr: int = 4, interpret: bool = False):
    """value: (BN, H*W, ch); y/x: (BN, Lq, P) pixel coords; attn (BN, Lq, P)
    -> (BN, Lq, ch) float32 samples (attention-weighted, P-summed).

    bf16 values select the bf16 compute path (tent weights + MXU operands in
    bf16, f32 accumulation): ~2x VPU/MXU throughput at <0.5% weight error —
    the AMP inference path.  f32 values keep the exact path (tests/train)."""
    bn, hw, ch = value.shape
    lq, p = y.shape[1], y.shape[2]
    wp = _round_up(w, 128)
    lqp = _round_up(lq, bq)
    hp = _round_up(h, rr)
    ct = jnp.bfloat16 if value.dtype == jnp.bfloat16 else jnp.float32

    v_pad = jnp.zeros((bn, hp, wp, ch), value.dtype)
    v_pad = v_pad.at[:, :h, :w].set(value.reshape(bn, h, w, ch))

    def pad_q(a, fill):
        out = jnp.full((bn, lqp, p), fill, jnp.float32)
        return out.at[:, :lq].set(a.astype(jnp.float32))

    y_p = pad_q(y, -10.0)  # padding queries sample nothing (tent = 0)
    x_p = pad_q(x, -10.0)
    a_p = pad_q(attn, 0.0)
    nrb = hp // rr
    flags = _row_block_flags(y_p, lqp // bq, bq, rr, nrb)

    kern = functools.partial(
        _level_kernel, h=h, w=w, p=p, bq=bq, wp=wp, rr=rr, ct=ct
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bn, lqp // bq, nrb),
        in_specs=[
            pl.BlockSpec((1, bq, p), lambda b, q, r, f: (b, q, 0)),
            pl.BlockSpec((1, bq, p), lambda b, q, r, f: (b, q, 0)),
            pl.BlockSpec((1, bq, p), lambda b, q, r, f: (b, q, 0)),
            pl.BlockSpec((1, rr, wp, ch), lambda b, q, r, f: (b, r, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, ch), lambda b, q, r, f: (b, q, 0)),
        scratch_shapes=[
            pltpu.VMEM((p, bq, wp), ct),           # tx per point
            pltpu.VMEM((bq, ch), jnp.float32),     # row accumulator
        ],
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bn, lqp, ch), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(flags, y_p, x_p, a_p, v_pad)
    return out[:, :lq]


def _level_kernel_v2(bounds_ref, y_ref, x_ref, a_ref, v_ref, out_ref,
                     tx_ref, acc_ref,
                     *, h: int, w: int, p: int, bq: int, wp: int, rr: int,
                     ct):
    """Row-block loop INSIDE the kernel: grid is (bn, nqb) only.

    The v1 grid (bn, nqb, nrb) paid fixed per-program overhead for every
    row block — 33.6k programs per 3-level encoder call, and with gating
    most did no work.  Here the full (padded) level value lives in VMEM per
    program and a ``fori_loop`` walks ONLY the active row-block interval
    [lo, hi) (tent support in y is an interval, so the active set is
    contiguous), read from the scalar-prefetched ``bounds``."""
    b = pl.program_id(0)
    qb = pl.program_id(1)

    # hoist column tents once per (b, qb): tx[q, p, X] = tent(x_qp - X)
    xj = jax.lax.broadcasted_iota(jnp.int32, (bq, wp), 1).astype(jnp.float32)
    for pi in range(p):
        xq = x_ref[0, :, pi][:, None]                     # (BQ, 1)
        tx = jnp.maximum(0.0, 1.0 - jnp.abs(xq - xj))
        tx = jnp.where(xj < w, tx, 0.0)
        tx_ref[pi] = tx.astype(ct)

    acc_ref[:] = jnp.zeros_like(acc_ref)
    lo = bounds_ref[b, qb, 0]
    hi = bounds_ref[b, qb, 1]

    prec = (jax.lax.Precision.DEFAULT if ct == jnp.bfloat16
            else jax.lax.Precision.HIGHEST)

    def body(rb, carry):
        r0 = (rb * rr).astype(jnp.float32)
        lhs_rows = []
        for ri in range(rr):
            rf = r0 + ri
            lhs = jnp.zeros((bq, wp), ct)
            for pi in range(p):
                ty = jnp.maximum(0.0, 1.0 - jnp.abs(y_ref[0, :, pi] - rf))
                wgt = (a_ref[0, :, pi] * ty).astype(ct)[:, None]
                lhs = lhs + wgt * tx_ref[pi]
            lhs_rows.append(lhs)
        lhs_all = jnp.concatenate(lhs_rows, axis=1)       # (BQ, RR*WP)
        vblk = v_ref[0, pl.ds(rb * rr, rr)].astype(ct).reshape(rr * wp, -1)
        acc_ref[:] = acc_ref[:] + jnp.dot(
            lhs_all, vblk, preferred_element_type=jnp.float32, precision=prec,
        )
        return carry

    jax.lax.fori_loop(lo, hi, body, 0, unroll=False)
    out_ref[0] = acc_ref[:].astype(out_ref.dtype)


def _row_block_bounds(y_p, lq_blocks: int, bq: int, rr: int, nrb: int):
    """(BN, nqb, 2) int32 [lo, hi): the contiguous active row-block interval
    per query block — the interval hull of ``_row_block_flags``'s predicate
    (tent support in y is an interval, so the active set is contiguous)."""
    flags = _row_block_flags(y_p, lq_blocks, bq, rr, nrb)   # (BN, nqb, nrb)
    any_active = flags.max(axis=-1) > 0
    lo = jnp.argmax(flags, axis=-1).astype(jnp.int32)
    hi = (nrb - jnp.argmax(flags[..., ::-1], axis=-1)).astype(jnp.int32)
    lo = jnp.where(any_active, lo, 0)
    hi = jnp.where(any_active, hi, 0)
    return jnp.stack([lo, hi], axis=-1)


@functools.partial(jax.jit, static_argnames=("h", "w", "bq", "rr", "interpret",
                                             "pre_padded"))
def _sample_level_pallas_v2(value, y, x, attn, h: int, w: int, bq: int = 256,
                            rr: int = 4, interpret: bool = False,
                            pre_padded: bool = False):
    """v2 of ``_sample_level_pallas``: same contract, (bn, nqb) grid with the
    in-kernel row loop (see ``_level_kernel_v2``).

    ``pre_padded``: y/x/a already have the query axis padded to a multiple
    of ``bq`` with tent-dead fills (y/x <= -9 pixels, attn 0) — the 3-level
    caller pads the shared coordinate tensors once instead of per level."""
    bn, hw, ch = value.shape
    p = y.shape[2]
    wp = _round_up(w, 128)
    hp = _round_up(h, rr)
    ct = jnp.bfloat16 if value.dtype == jnp.bfloat16 else jnp.float32

    v_pad = jnp.zeros((bn, hp, wp, ch), value.dtype)
    v_pad = v_pad.at[:, :h, :w].set(value.reshape(bn, h, w, ch))

    if pre_padded:
        lq = lqp = y.shape[1]
        assert lqp % bq == 0
        y_p = y
        x_p = x
        a_p = attn
    else:
        lq = y.shape[1]
        lqp = _round_up(lq, bq)

        def pad_q(a, fill):
            out = jnp.full((bn, lqp, p), fill, jnp.float32)
            return out.at[:, :lq].set(a.astype(jnp.float32))

        y_p = pad_q(y, -10.0)
        x_p = pad_q(x, -10.0)
        a_p = pad_q(attn, 0.0)
    nrb = hp // rr
    nqb = lqp // bq
    bounds = _row_block_bounds(y_p, nqb, bq, rr, nrb)

    kern = functools.partial(
        _level_kernel_v2, h=h, w=w, p=p, bq=bq, wp=wp, rr=rr, ct=ct
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bn, nqb),
        in_specs=[
            pl.BlockSpec((1, bq, p), lambda b, q, s: (b, q, 0)),
            pl.BlockSpec((1, bq, p), lambda b, q, s: (b, q, 0)),
            pl.BlockSpec((1, bq, p), lambda b, q, s: (b, q, 0)),
            pl.BlockSpec((1, hp, wp, ch), lambda b, q, s: (b, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, ch), lambda b, q, s: (b, q, 0)),
        scratch_shapes=[
            pltpu.VMEM((p, bq, wp), ct),           # tx per point
            pltpu.VMEM((bq, ch), jnp.float32),     # accumulator
        ],
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bn, lqp, ch), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(bounds, y_p, x_p, a_p, v_pad)
    return out[:, :lq]


def _fused_levels_kernel(bounds_ref, y_ref, x_ref, a_ref, *refs,
                         levels, p: int, bq: int, rr: int, ct,
                         rr_lanes: bool = False):
    """ALL levels of one MSDA call in ONE kernel: grid (bn, nqb).

    v3 of the level kernels.  v2 launched one ``pallas_call`` per level, so
    per layer the 3 calls repeated the pallas setup, fetched the (padded)
    coordinate block 3x, produced 3 separate (BN, LQP, ch) f32 outputs, and
    left XLA to sum them (2 extra full read+write passes over the output).
    Here the static level loop runs INSIDE the kernel: one launch, one
    coordinate fetch, one accumulator, one output — matching the CUDA
    reference, whose single ``ms_deformable_im2col`` launch services all
    levels per block (ms_deform_im2col_cuda.cuh:243-330).

    ``levels`` is a static tuple of (h, w, wp, pk) per level; ``v_refs[l]``
    is that level's zero-padded (1, hp_l, wp_l, ch) value block.  Per level
    the column tents are hoisted into scratch and a ``fori_loop`` walks only
    the active row-block interval from ``bounds`` — same row gating as v2,
    shared across levels.  ``bounds`` arrives as a per-program (1, 1, nl, 2)
    SMEM BLOCK, not scalar-prefetched: the full (BN, nqb, nl, 2) array
    overflows SMEM at encoder scale (bn=80: 38 KB; Mosaic rejected the
    prefetch form there while v2's (BN, nqb, 2) still fit).

    ROW PACKING (``pk > 1``): a narrow level (W <= 64) is processed as the
    reshape (H/pk, pk*W) — the SAME row-major memory — so each 128-lane
    vector carries ``pk`` feature rows instead of one plus dead padding.
    Lane j then addresses (row_off=j//W, col=j%W): the column tents use
    ``col`` and the y-tents a per-lane ``row_off`` offset, which makes the
    y-tent a wide op instead of a per-query scalar — but each block visit
    covers pk x the rows, so block visits, MXU dots, and total instruction
    issue all shrink ~pk x for the narrow levels that otherwise drove ~2/3
    of the walk at <1/3 lane occupancy.

    X-FIRST FACTORIZATION (``pk == 1``): bilinear separates as
    ``S = sum_r ty_r (tx . V[r])``, so instead of building the full tent
    lhs per block (p*rr wide (BQ, WP) multiply-adds + concats — the
    measured instruction bottleneck), the kernel dots the HOISTED column
    tents of all p points at once, ``D_r = tx_all (P*BQ, WP) @ V[r]``, and
    applies the y-tents to the small (BQ, ch) dot results.  Per block the
    wide VPU work drops to a handful of (BQ, ch) ops; the MXU does rr dots
    whose lhs is loop-invariant scratch.  Packed levels keep the tent-lhs
    form — their y-tent varies per LANE (row_off), so x cannot factor."""
    nl = len(levels)
    v_refs = refs[:nl]
    out_ref = refs[nl]
    tx_refs = refs[nl + 1 : nl + 1 + nl]   # per-level (P*BQ, wp_l) scratch
    acc_ref = refs[nl + 1 + nl]

    acc_ref[:] = jnp.zeros_like(acc_ref)
    prec = (jax.lax.Precision.DEFAULT if ct == jnp.bfloat16
            else jax.lax.Precision.HIGHEST)

    if rr_lanes:
        # rr-on-lanes helpers (see _fused_dcoord_rr_kernel): the ri-of-lane
        # map and the DYL scratch (stacked y table, written per level via
        # sublane-offset blocks — Mosaic cannot concat lane-slices)
        dyl_ref = refs[nl + 2 + nl]
        ch_out = acc_ref.shape[-1]
        rrch = rr * ch_out
        lane_ri = (
            jax.lax.broadcasted_iota(jnp.int32, (bq, rrch), 1) // ch_out
        ).astype(jnp.float32)
    for lvl, (h, w, wp, pk) in enumerate(levels):
        # hoist column tents for this level: tx[q, p, X] = tent(x_qp - X).
        # Each level's tents live in their OWN exact-width (P*BQ, wp_l)
        # scratch — full-width writes/loads, no lane slicing (Mosaic-safe)
        # and no dead wp_max padding for narrow levels.
        # No `X < w` gating: padded columns hold ZERO values, so stray tent
        # mass there contributes exactly +0.0 to the dot — dropping the mask
        # saves 2 wide VPU ops per point per level at identical output.
        # The attention weight folds in here too (per-query rows), saving a
        # wide multiply per (row, point) in the block loop.
        tx_ref = tx_refs[lvl]
        jj = jax.lax.broadcasted_iota(
            jnp.int32, (bq, wp), 1
        ).astype(jnp.float32)
        if pk == 1:
            roff = None
            for pi in range(p):
                xq = x_ref[0, :, lvl * p + pi][:, None]   # (BQ, 1)
                aq = a_ref[0, :, lvl * p + pi][:, None]
                tx = jnp.maximum(0.0, 1.0 - jnp.abs(xq - jj)) * aq
                tx_ref[pi * bq : (pi + 1) * bq, :] = tx.astype(ct)
        else:
            roff = jnp.floor(jj * (1.0 / w))              # (BQ, WP) lane row
            col = jj - roff * w
            col = jnp.where(jj < pk * w, col, -1e4)       # dead lanes
            for pi in range(p):
                xq = x_ref[0, :, lvl * p + pi][:, None]
                aq = a_ref[0, :, lvl * p + pi][:, None]
                tx = jnp.maximum(0.0, 1.0 - jnp.abs(xq - col)) * aq
                tx_ref[pi * bq : (pi + 1) * bq, :] = tx.astype(ct)

        lo = bounds_ref[0, 0, lvl, 0]
        hi = bounds_ref[0, 0, lvl, 1]
        # loop-invariant dot lhs: all points' (a-folded) column tents
        txa = tx_ref[:] if pk == 1 else None

        if pk == 1 and rr_lanes:
            # rr-on-lanes: ONE dot per block emits all rr rows on full
            # lanes (value pre-laid-out (hp/rr, wp, rr*ch)); y-tents are a
            # single full-lane op against the hoisted DYL table, and the
            # (ri, pi) combines collapse to one FMA into a (P*BQ, rr*ch)
            # carry.  Finalize sums the ri lane-blocks and pi sublane
            # blocks once per level.
            for pi in range(p):
                dyl_ref[pi * bq : (pi + 1) * bq, :] = (
                    y_ref[0, :, lvl * p + pi][:, None] - lane_ri
                )
            dyl = dyl_ref[:]                              # (P*BQ, rr*ch)

            def body_rr(rb, acc4, lvl=lvl, dyl=dyl, txa=txa):
                vblk = v_refs[lvl][0, rb].astype(ct)      # (wp, rr*ch)
                d4 = jnp.dot(
                    txa, vblk, preferred_element_type=jnp.float32,
                    precision=prec,
                )                                         # (P*BQ, rr*ch)
                ty = jnp.maximum(
                    0.0, 1.0 - jnp.abs(dyl - (rb * rr).astype(jnp.float32))
                )
                return acc4 + ty * d4

            acc4 = jax.lax.fori_loop(
                lo, hi, body_rr,
                jnp.zeros((p * bq, rrch), jnp.float32), unroll=False,
            )
            contrib = jnp.zeros((bq, ch_out), jnp.float32)
            for pi in range(p):
                for ri in range(rr):
                    contrib = contrib + acc4[
                        pi * bq : (pi + 1) * bq,
                        ri * ch_out : (ri + 1) * ch_out,
                    ]
            acc_ref[:] = acc_ref[:] + contrib
            continue

        def block_body(rb, lvl=lvl, wp=wp, pk=pk, roff=roff, txa=txa,
                       tx_ref=tx_ref):
            r0 = (rb * rr).astype(jnp.float32)
            vblk = v_refs[lvl][0, pl.ds(rb * rr, rr)].astype(ct)
            if pk == 1:
                # x-first: one point-batched dot per row, y-tents applied
                # to the (BQ, ch) results (see kernel docstring)
                ch = vblk.shape[-1]
                contrib = jnp.zeros((bq, ch), jnp.float32)
                for ri in range(rr):
                    d = jnp.dot(
                        txa, vblk[ri], preferred_element_type=jnp.float32,
                        precision=prec,
                    )                                     # (P*BQ, ch)
                    rf = r0 + ri
                    for pi in range(p):
                        ty = jnp.maximum(
                            0.0,
                            1.0 - jnp.abs(y_ref[0, :, lvl * p + pi] - rf),
                        )
                        contrib = contrib + ty[:, None] * d[
                            pi * bq : (pi + 1) * bq
                        ]
                acc_ref[:] = acc_ref[:] + contrib
                return
            lhs_rows = []
            for ri in range(rr):
                rf = r0 + ri
                lhs = jnp.zeros((bq, wp), ct)
                for pi in range(p):
                    # packed row ri holds original rows rf*pk+roff(j)
                    dyy = (
                        y_ref[0, :, lvl * p + pi] - rf * pk
                    )[:, None] - roff
                    ty = jnp.maximum(0.0, 1.0 - jnp.abs(dyy))
                    lhs = lhs + ty.astype(ct) * tx_ref[
                        pi * bq : (pi + 1) * bq, :
                    ]
                lhs_rows.append(lhs)
            lhs_all = jnp.concatenate(lhs_rows, axis=1)   # (BQ, RR*WP)
            acc_ref[:] = acc_ref[:] + jnp.dot(
                lhs_all, vblk.reshape(rr * wp, -1),
                preferred_element_type=jnp.float32,
                precision=prec,
            )

        # fori over the dynamic interval beats a statically-unrolled
        # pl.when-gated block sweep (measured 15.5 vs 19.5 ms/call:
        # predicated-off blocks still cost instruction issue)
        def body(rb, carry):
            block_body(rb)
            return carry

        jax.lax.fori_loop(lo, hi, body, 0, unroll=False)

    out_ref[0] = acc_ref[:].astype(out_ref.dtype)


@functools.lru_cache(maxsize=None)
def _stripe_plan(spatial_shapes, n_stripes: int):
    """Static y-stripe interleaving of the concatenated token sequence.

    Raster-per-level query order gives coarse-level-origin query blocks
    whole-map row hulls at the fine levels (a 240-token stride-32 level IS
    the whole image), so those programs walk ~45 row blocks while
    fine-origin ones walk ~7.  Interleaving tokens into horizontal y-bands
    (stripe s = rows [s*h/S, (s+1)*h/S) of EVERY level, concatenated) makes
    every 256-query block y-local across levels, tightening the kernel's
    runtime row bounds.  Pure data layout: per-query math is unchanged, and
    both directions are concats of CONTIGUOUS static slices — no gathers.

    Returns (fwd_runs, inv_runs): (start, stop) ranges such that
    concat(x[a:b] for fwd_runs) stripes the sequence and concat over
    inv_runs of the striped sequence restores it; None if identity."""
    offs, off = [], 0
    for (h, w) in spatial_shapes:
        offs.append(off)
        off += h * w
    fwd_runs = []
    pos_of = {}
    pos = 0
    for s in range(n_stripes):
        for lvl, (h, w) in enumerate(spatial_shapes):
            r0 = (s * h) // n_stripes
            r1 = ((s + 1) * h) // n_stripes
            if r1 > r0:
                a, b = offs[lvl] + r0 * w, offs[lvl] + r1 * w
                fwd_runs.append((a, b))
                pos_of[(lvl, s)] = (pos, pos + (b - a))
                pos += b - a
    identity = fwd_runs[0][0] == 0 and all(
        fwd_runs[i][1] == fwd_runs[i + 1][0] for i in range(len(fwd_runs) - 1)
    )
    if identity:
        return None
    inv_runs = [
        pos_of[(lvl, s)]
        for lvl in range(len(spatial_shapes))
        for s in range(n_stripes)
        if (lvl, s) in pos_of
    ]
    return tuple(fwd_runs), tuple(inv_runs)


def _prep_levels(value_t, y_all, spatial_shapes, nqb, bq, rr, value_dtype,
                 pack: bool = True):
    """Shared level prep for the fused kernels: per-level zero-padded value
    blocks (optionally row-PACKED for narrow levels, see
    ``_fused_levels_kernel``), level meta (h, w, wp, pk), per-level row-block
    bounds in (packed) row units, and the packed-unit y coords."""
    bn = value_t.shape[0]
    ch = value_t.shape[-1]
    v_pads, level_meta, bounds, y_pkd = [], [], [], []
    start = 0
    for lvl, (h, w) in enumerate(spatial_shapes):
        pk = max(1, 128 // w) if (pack and w <= 64) else 1
        hpk = -(-h // pk)
        hp = _round_up(hpk, rr)
        wp = _round_up(pk * w, 128)
        v_lvl = value_t[:, start : start + h * w].reshape(bn, h, w, ch)
        start += h * w
        if pk > 1:
            v_row = jnp.zeros((bn, hpk * pk, w, ch), value_dtype)
            v_lvl = v_row.at[:, :h].set(v_lvl).reshape(bn, hpk, pk * w, ch)
        v_pad = jnp.zeros((bn, hp, wp, ch), value_dtype)
        v_pad = v_pad.at[:, : v_lvl.shape[1], : v_lvl.shape[2]].set(v_lvl)
        v_pads.append(v_pad)
        level_meta.append((h, w, wp, pk))
        # bounds in PACKED row units: y/pk is a conservative hull (tent
        # support (y-1, y+1) maps inside ((y-pk)/pk, (y+pk)/pk)); keep the
        # -10 pad fill UNscaled so the flags' pad test (y <= -9) still fires
        y_lvl = y_all[:, :, lvl]
        if pk > 1:
            y_lvl = jnp.where(y_lvl > -9.0, y_lvl * (1.0 / pk), y_lvl)
        y_pkd.append(y_lvl)
        bounds.append(_row_block_bounds(y_lvl, nqb, bq, rr, hp // rr))
    return v_pads, level_meta, jnp.stack(bounds, axis=2), y_pkd


@functools.partial(jax.jit, static_argnames=("spatial_shapes", "bq", "rr",
                                             "interpret", "pack", "rr_lanes"))
def _msda_fused(value, loc, attn, spatial_shapes, bq: int = 256, rr: int = 4,
                interpret: bool = False, pack: bool = True,
                rr_lanes: bool = False):
    """Fused all-level MSDA forward (see ``_fused_levels_kernel``).

    value: (B, Len_in, nh, ch); loc: (B, Lq, nh, nl, P, 2) in [0,1];
    attn: (B, Lq, nh, nl, P) -> (B, Lq, nh*ch) in value.dtype."""
    b, len_in, nh, ch = value.shape
    lq = loc.shape[1]
    nl = len(spatial_shapes)
    p = loc.shape[-2]
    bn = b * nh
    ct = jnp.bfloat16 if value.dtype == jnp.bfloat16 else jnp.float32
    lqp = _round_up(lq, bq)
    nqb = lqp // bq

    value_t = jnp.swapaxes(value, 1, 2).reshape(bn, len_in, ch)
    loc_t = jnp.swapaxes(loc, 1, 2).reshape(bn, lq, nl, p, 2)
    attn_t = jnp.swapaxes(attn, 1, 2).reshape(bn, lq, nl, p)

    # y-stripe the QUERY axis so every bq-block is y-local at all levels
    # (see _stripe_plan); values stay raster — only the query order moves
    stripes = None
    if lq == len_in:
        n_stripes = max(1, min(min(h for h, _ in spatial_shapes), 16))
        stripes = _stripe_plan(tuple(spatial_shapes), n_stripes)
    if stripes is not None:
        runs_f, _ = stripes
        loc_t = jnp.concatenate([loc_t[:, a:b] for a, b in runs_f], axis=1)
        attn_t = jnp.concatenate([attn_t[:, a:b] for a, b in runs_f], axis=1)

    # per-level pixel coords (grid_sample align_corners=False: loc*size-0.5),
    # query axis padded once for all levels; pads are tent-dead (-10 px)
    hs = jnp.asarray([h for h, _ in spatial_shapes], jnp.float32)
    ws = jnp.asarray([w for _, w in spatial_shapes], jnp.float32)
    y_all = jnp.full((bn, lqp, nl, p), -10.0, jnp.float32)
    x_all = jnp.full((bn, lqp, nl, p), -10.0, jnp.float32)
    a_all = jnp.zeros((bn, lqp, nl, p), jnp.float32)
    y_all = y_all.at[:, :lq].set(
        loc_t[..., 1].astype(jnp.float32) * hs[:, None] - 0.5
    )
    x_all = x_all.at[:, :lq].set(
        loc_t[..., 0].astype(jnp.float32) * ws[:, None] - 0.5
    )
    a_all = a_all.at[:, :lq].set(attn_t.astype(jnp.float32))

    v_pads, level_meta, bounds_all, _ = _prep_levels(
        value_t, y_all, spatial_shapes, nqb, bq, rr, value.dtype, pack=pack
    )
    if rr_lanes:
        # rr-on-lanes value layout for the x-first (pk == 1) levels (see
        # _fused_levels_kernel): (bn, hp/rr, wp, rr*ch)
        v_pads = [
            vp.reshape(bn, vp.shape[1] // rr, rr, vp.shape[2], ch)
            .transpose(0, 1, 3, 2, 4)
            .reshape(bn, vp.shape[1] // rr, vp.shape[2], rr * ch)
            if pk == 1 else vp
            for vp, (_, _, _, pk) in zip(v_pads, level_meta)
        ]

    y_flat = y_all.reshape(bn, lqp, nl * p)
    x_flat = x_all.reshape(bn, lqp, nl * p)
    a_flat = a_all.reshape(bn, lqp, nl * p)

    kern = functools.partial(
        _fused_levels_kernel, levels=tuple(level_meta), p=p, bq=bq, rr=rr,
        ct=ct, rr_lanes=rr_lanes,
    )
    coord_spec = pl.BlockSpec((1, bq, nl * p), lambda b, q: (b, q, 0))
    out = pl.pallas_call(
        kern,
        grid=(bn, nqb),
        in_specs=[
            pl.BlockSpec((1, 1, nl, 2), lambda b, q: (b, q, 0, 0),
                         memory_space=pltpu.SMEM),
            coord_spec, coord_spec, coord_spec,
        ] + [
            pl.BlockSpec((1, vp.shape[1], vp.shape[2], vp.shape[3]),
                         lambda b, q: (b, 0, 0, 0))
            for vp in v_pads
        ],
        out_specs=pl.BlockSpec((1, bq, ch), lambda b, q: (b, q, 0)),
        # emit in the value dtype directly (f32 accumulate in scratch): under
        # bf16 this halves the (BN, LQP, ch) output HBM write + re-read
        out_shape=jax.ShapeDtypeStruct((bn, lqp, ch), value.dtype),
        scratch_shapes=[
            # per-level exact-width column tents, all points stacked on the
            # sublane axis (the factorized path's dot lhs, loaded whole)
            pltpu.VMEM((p * bq, wp_l), ct)
            for _, _, wp_l, _ in level_meta
        ] + [
            pltpu.VMEM((bq, ch), jnp.float32),     # cross-level accumulator
        ] + (
            # rr-on-lanes: the hoisted (P*BQ, rr*ch) DYL table scratch
            [pltpu.VMEM((p * bq, rr * ch), jnp.float32)] if rr_lanes else []
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(bounds_all, y_flat, x_flat, a_flat, *v_pads)
    out = out[:, :lq]
    if stripes is not None:
        _, runs_i = stripes
        out = jnp.concatenate([out[:, a:b] for a, b in runs_i], axis=1)
    out = out.reshape(b, nh, lq, ch)
    return jnp.swapaxes(out, 1, 2).reshape(b, lq, nh * ch).astype(value.dtype)


def _dvalue_kernel(flags_ref, y_ref, x_ref, a_ref, g_ref, dv_ref, acc_ref,
                   *, h: int, w: int, p: int, bq: int, wp: int, rr: int):
    """dV[j, c] = sum_q L[q, j] g[q, c] — grid (bn, row-block, q-block),
    accumulation over q-blocks (innermost)."""
    b = pl.program_id(0)
    rb = pl.program_id(1)
    qb = pl.program_id(2)
    nqb = pl.num_programs(2)

    @pl.when(qb == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(flags_ref[b, rb, qb] > 0)
    def _body():
        xj = jax.lax.broadcasted_iota(jnp.int32, (bq, wp), 1).astype(jnp.float32)
        r0 = (rb * rr).astype(jnp.float32)
        lhs_rows = []
        for ri in range(rr):
            rf = r0 + ri
            lhs = jnp.zeros((bq, wp), jnp.float32)
            for pi in range(p):
                xq = x_ref[0, :, pi][:, None]
                tx = jnp.maximum(0.0, 1.0 - jnp.abs(xq - xj))
                tx = jnp.where(xj < w, tx, 0.0)
                ty = jnp.maximum(0.0, 1.0 - jnp.abs(y_ref[0, :, pi] - rf))
                lhs = lhs + (a_ref[0, :, pi] * ty)[:, None] * tx
            lhs_rows.append(lhs)
        lhs_all = jnp.concatenate(lhs_rows, axis=1)       # (BQ, RR*WP)

        g = g_ref[0].astype(jnp.float32)                  # (BQ, ch)
        acc_ref[:] = acc_ref[:] + jax.lax.dot_general(
            lhs_all, g, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )                                                 # (RR*WP, ch)

    @pl.when(qb == nqb - 1)
    def _fin():
        dv_ref[0] = acc_ref[:].reshape(dv_ref.shape[1:]).astype(dv_ref.dtype)


def _dcoord_kernel(flags_ref, y_ref, x_ref, a_ref, g_ref, v_ref,
                   da_ref, dy_ref, dx_ref, s_da, s_dy, s_dx,
                   *, h: int, w: int, p: int, bq: int, wp: int, rr: int):
    """da/dy/dx via S[q, j] = V[j]·g[q] — grid (bn, q-block, row-block)."""
    b = pl.program_id(0)
    qb = pl.program_id(1)
    rb = pl.program_id(2)
    nrb = pl.num_programs(2)

    @pl.when(rb == 0)
    def _init():
        s_da[:] = jnp.zeros_like(s_da)
        s_dy[:] = jnp.zeros_like(s_dy)
        s_dx[:] = jnp.zeros_like(s_dx)

    @pl.when(flags_ref[b, qb, rb] > 0)
    def _body():
        vblk = v_ref[0].astype(jnp.float32).reshape(rr * wp, -1)
        g = g_ref[0].astype(jnp.float32)                  # (BQ, ch)
        s = jax.lax.dot_general(
            g, vblk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ).reshape(bq, rr, wp)                             # (BQ, RR, WP)

        xj = jax.lax.broadcasted_iota(jnp.int32, (bq, wp), 1).astype(jnp.float32)
        r0 = (rb * rr).astype(jnp.float32)
        for pi in range(p):
            xq = x_ref[0, :, pi][:, None]
            dxx = xq - xj
            tx = jnp.maximum(0.0, 1.0 - jnp.abs(dxx))
            inx = jnp.logical_and(jnp.abs(dxx) < 1.0, xj < w)
            tx = jnp.where(xj < w, tx, 0.0)
            txp = jnp.where(inx, -jnp.sign(dxx), 0.0)     # d tent / d x
            aq = a_ref[0, :, pi]
            da_acc = jnp.zeros((bq,), jnp.float32)
            dy_acc = jnp.zeros((bq,), jnp.float32)
            dx_acc = jnp.zeros((bq,), jnp.float32)
            for ri in range(rr):
                rf = r0 + ri
                dyy = y_ref[0, :, pi] - rf
                ty = jnp.maximum(0.0, 1.0 - jnp.abs(dyy))
                typ = jnp.where(jnp.abs(dyy) < 1.0, -jnp.sign(dyy), 0.0)
                sr = s[:, ri]                             # (BQ, WP)
                u = jnp.sum(tx * sr, axis=1)              # (BQ,)
                v2 = jnp.sum(txp * sr, axis=1)
                da_acc = da_acc + ty * u
                dy_acc = dy_acc + typ * u
                dx_acc = dx_acc + ty * v2
            # scratch is (P, BQ): full-row updates (column writes are
            # awkward for Mosaic layouts)
            s_da[pi] = s_da[pi] + da_acc
            s_dy[pi] = s_dy[pi] + aq * dy_acc
            s_dx[pi] = s_dx[pi] + aq * dx_acc

    @pl.when(rb == nrb - 1)
    def _fin():
        da_ref[0] = s_da[:].astype(da_ref.dtype)
        dy_ref[0] = s_dy[:].astype(dy_ref.dtype)
        dx_ref[0] = s_dx[:].astype(dx_ref.dtype)


def _dvalue_kernel_v2(flags_ref, qb_ref, y_ref, x_ref, a_ref, g_ref, dv_ref,
                      acc_ref,
                      *, h: int, w: int, p: int, bq: int, wp: int, rr: int,
                      ct=jnp.float32, pk: int = 1):
    """dValue with the q-block loop INSIDE the kernel: grid (bn, nrb) only.
    Coordinate arrays arrive head-transposed (BN, P, LQP) so the query axis
    is the (128-aligned) lane dim; g arrives full (1, LQP, ch) in VMEM.

    The loop walks only the contiguous ACTIVE q-block interval per row
    block (per-program SMEM blocks ``qb_ref``; flags still gate holes):
    predicated-off fori iterations cost instruction issue (fwd measured
    19.5 -> 15.5 ms dropping a gated sweep), and with y-striped encoder
    queries the active interval is ~3-4 of ~34 blocks.

    ``ct`` mirrors the forward's compute-dtype policy (AMP): tent DIFFS stay
    f32, bounded tent VALUES and the MXU dot run in ct — f32 HIGHEST is a
    multi-pass MXU emulation that made the backward ~6x the forward.

    ``pk``: row packing for narrow levels (see ``_fused_levels_kernel``) —
    dv comes out in the packed (H/pk, pk*W) layout; the wrapper unpacks by
    reshape.  No column-validity mask in either layout: stray corner mass
    for x in (w-1, w) lands on a sliced-off padding lane (pk=1) or on a
    lane whose ``col`` makes the tent zero (pk>1), so out-of-map corners
    contribute nothing, matching grid_sample zero padding."""
    rb = pl.program_id(1)

    acc_ref[:] = jnp.zeros_like(acc_ref)
    jj = jax.lax.broadcasted_iota(jnp.int32, (bq, wp), 1).astype(jnp.float32)
    if pk == 1:
        col, roff = jj, None
    else:
        roff = jnp.floor(jj * (1.0 / w))
        col = jj - roff * w
        col = jnp.where(jj < pk * w, col, -1e4)           # dead lanes
    r0 = (rb * rr).astype(jnp.float32)
    prec = (jax.lax.Precision.DEFAULT if ct == jnp.bfloat16
            else jax.lax.Precision.HIGHEST)

    def body(qb, carry):
        @pl.when(flags_ref[0, rb, qb] > 0)
        def _():
            q0 = qb * bq
            # hoist the ri-independent terms: column tents (with attention
            # folded in) and the per-point y coords
            txs, yqs = [], []
            for pi in range(p):
                xq = x_ref[0, pi, pl.ds(q0, bq)][:, None]
                aq = a_ref[0, pi, pl.ds(q0, bq)][:, None]
                tx = jnp.maximum(0.0, 1.0 - jnp.abs(xq - col)) * aq
                txs.append(tx.astype(ct))
                yqs.append(y_ref[0, pi, pl.ds(q0, bq)])
            lhs_rows = []
            for ri in range(rr):
                rf = r0 + ri
                lhs = jnp.zeros((bq, wp), ct)
                for pi in range(p):
                    if pk == 1:
                        ty = jnp.maximum(0.0, 1.0 - jnp.abs(yqs[pi] - rf))
                        # [:, None] BEFORE the cast: Mosaic can't insert a
                        # minor dim on a bf16 lane-vector
                        lhs = lhs + ty[:, None].astype(ct) * txs[pi]
                    else:
                        dyy = (yqs[pi] - rf * pk)[:, None] - roff
                        ty = jnp.maximum(0.0, 1.0 - jnp.abs(dyy))
                        lhs = lhs + ty.astype(ct) * txs[pi]
                lhs_rows.append(lhs)
            lhs_all = jnp.concatenate(lhs_rows, axis=1)   # (BQ, RR*WP)
            gq = g_ref[0, pl.ds(q0, bq), :].astype(ct)
            acc_ref[:] = acc_ref[:] + jax.lax.dot_general(
                lhs_all, gq, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec,
            )
        return carry

    jax.lax.fori_loop(qb_ref[0, rb, 0], qb_ref[0, rb, 1], body, 0,
                      unroll=False)
    dv_ref[0] = acc_ref[:].reshape(dv_ref.shape[1:]).astype(dv_ref.dtype)


def _dcoord_kernel_v2(bounds_ref, y_ref, x_ref, a_ref, g_ref, v_ref,
                      da_ref, dy_ref, dx_ref, s_da, s_dy, s_dx,
                      *, h: int, w: int, p: int, bq: int, wp: int, rr: int,
                      ct=jnp.float32):
    """da/dy/dx with the row-block loop INSIDE the kernel: grid (bn, nqb),
    walking only the active [lo, hi) row-block interval (see fwd v2).
    ``ct`` selects the MXU dtype for the score matmul (see dValue)."""
    b = pl.program_id(0)
    qb = pl.program_id(1)

    s_da[:] = jnp.zeros_like(s_da)
    s_dy[:] = jnp.zeros_like(s_dy)
    s_dx[:] = jnp.zeros_like(s_dx)
    lo = bounds_ref[b, qb, 0]
    hi = bounds_ref[b, qb, 1]
    xj = jax.lax.broadcasted_iota(jnp.int32, (bq, wp), 1).astype(jnp.float32)
    g = g_ref[0].astype(ct)                               # (BQ, ch)
    prec = (jax.lax.Precision.DEFAULT if ct == jnp.bfloat16
            else jax.lax.Precision.HIGHEST)

    def body(rb, carry):
        vblk = v_ref[0, pl.ds(rb * rr, rr)].astype(ct).reshape(
            rr * wp, -1
        )
        s = jax.lax.dot_general(
            g, vblk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec,
        ).reshape(bq, rr, wp)
        r0 = (rb * rr).astype(jnp.float32)
        for pi in range(p):
            xq = x_ref[0, :, pi][:, None]
            dxx = xq - xj
            tx = jnp.maximum(0.0, 1.0 - jnp.abs(dxx))
            inx = jnp.logical_and(jnp.abs(dxx) < 1.0, xj < w)
            tx = jnp.where(xj < w, tx, 0.0)
            txp = jnp.where(inx, -jnp.sign(dxx), 0.0)
            aq = a_ref[0, :, pi]
            da_acc = jnp.zeros((bq,), jnp.float32)
            dy_acc = jnp.zeros((bq,), jnp.float32)
            dx_acc = jnp.zeros((bq,), jnp.float32)
            for ri in range(rr):
                rf = r0 + ri
                dyy = y_ref[0, :, pi] - rf
                ty = jnp.maximum(0.0, 1.0 - jnp.abs(dyy))
                typ = jnp.where(jnp.abs(dyy) < 1.0, -jnp.sign(dyy), 0.0)
                sr = s[:, ri]
                u = jnp.sum(tx * sr, axis=1)
                v2 = jnp.sum(txp * sr, axis=1)
                da_acc = da_acc + ty * u
                dy_acc = dy_acc + typ * u
                dx_acc = dx_acc + ty * v2
            s_da[pi] = s_da[pi] + da_acc
            s_dy[pi] = s_dy[pi] + aq * dy_acc
            s_dx[pi] = s_dx[pi] + aq * dx_acc
        return carry

    jax.lax.fori_loop(lo, hi, body, 0, unroll=False)
    da_ref[0] = s_da[:].astype(da_ref.dtype)
    dy_ref[0] = s_dy[:].astype(dy_ref.dtype)
    dx_ref[0] = s_dx[:].astype(dx_ref.dtype)


def _fused_dcoord_kernel(bounds_ref, y_ref, x_ref, a_ref, g_ref, *refs,
                         levels, p: int, bq: int, rr: int, ct):
    """ALL levels' (dAttn, dLoc) in ONE launch: grid (bn, nqb).

    Reformulated as THREE forward-structured sampling passes: with
    ``S[q,pi] = tent-sample(V)``, ``Sy = (dty)-sample``, ``Sx =
    (dtx)-sample``, the gradients are per-query contractions against g —
    ``da = <S, g>``, ``dy = a * <Sy, g>``, ``dx = a * <Sx, g>``.  The naive
    transpose (score matrix s = g V^T, then per-(point, row) tent
    reductions) paid ~32 cross-lane VPU reductions per row block and ran
    ~8x the forward per block; here every per-block contraction is an MXU
    dot like the forward, and the ch-axis reductions happen ONCE per level
    at finalize.  Column tents tx/txp are hoisted per level; the `xj < w`
    masks are dropped (padded value columns are zero, so tent mass there
    contributes exact +0.0 to every sample).

    Unpacked levels (pk == 1) use the X-FIRST FACTORIZATION (see
    ``_fused_levels_kernel``): per row, TWO point-batched dots against the
    loop-invariant hoisted tents — ``D = tx_all @ V[r]`` (serves S and Sy)
    and ``Dp = txp_all @ V[r]`` (serves Sx) — then y-tents combine the
    small (BQ, ch) results into the sval accumulators.  This removes the
    per-(pass, point) tent-lhs construction that dominated instruction
    issue and cuts the MXU work by a third (S and Sy share a dot)."""
    nl = len(levels)
    v_refs = refs[:nl]
    da_ref, dy_ref, dx_ref = refs[nl], refs[nl + 1], refs[nl + 2]
    # ONE (2*P*BQ, wp_l) scratch per level: tx stacked over txp, so the
    # x-first walk issues a SINGLE MXU dot per row serving both D and Dp
    # (halves dot issue vs separate tx/txp dots at identical FLOPs)
    txx_refs = refs[nl + 3 : nl + 3 + nl]
    rest = refs[nl + 3 + nl :]
    # sval only exists when a PACKED level is present (its tent-lhs path
    # accumulates there); unpacked x-first levels ride fori carries — the
    # kernel sits at the scoped-VMEM cliff at train encoder shapes, so a
    # dead (3P, BQ, ch) scratch (lane-padded, double-buffered) is ~3 MB
    has_packed = any(pk > 1 for _, _, _, pk in levels)
    if has_packed:
        sval_ref, s_da, s_dy, s_dx = rest
    else:
        sval_ref = None
        s_da, s_dy, s_dx = rest

    prec = (jax.lax.Precision.DEFAULT if ct == jnp.bfloat16
            else jax.lax.Precision.HIGHEST)
    g = g_ref[0].astype(jnp.float32)                      # (BQ, ch)

    ch = g.shape[-1]
    for lvl, (h, w, wp, pk) in enumerate(levels):
        # per-level exact-width (2*P*BQ, wp_l) tent scratch — tx in the
        # first P*BQ sublanes, txp in the rest: full-width writes/loads,
        # no lane slicing (see _fused_levels_kernel)
        txx_ref = txx_refs[lvl]
        jj = jax.lax.broadcasted_iota(
            jnp.int32, (bq, wp), 1
        ).astype(jnp.float32)
        if pk == 1:
            col, roff = jj, None
        else:  # row packing (see _fused_levels_kernel)
            roff = jnp.floor(jj * (1.0 / w))
            col = jj - roff * w
            col = jnp.where(jj < pk * w, col, -1e4)       # dead lanes
        for pi in range(p):
            xq = x_ref[0, :, lvl * p + pi][:, None]       # (BQ, 1)
            dxx = xq - col
            txx_ref[pi * bq : (pi + 1) * bq, :] = jnp.maximum(
                0.0, 1.0 - jnp.abs(dxx)
            ).astype(ct)
            txx_ref[(p + pi) * bq : (p + pi + 1) * bq, :] = jnp.where(
                jnp.abs(dxx) < 1.0, -jnp.sign(dxx), 0.0
            ).astype(ct)

        lo = bounds_ref[0, 0, lvl, 0]
        hi = bounds_ref[0, 0, lvl, 1]

        if pk == 1:
            # x-first walk (see docstring): per-point sample accumulators
            # ride the fori carry (registers / compiler-managed spill).
            # y lane-extracts hoisted out of the row loop (loop-invariant).
            txx = txx_ref[:]
            yqs = [y_ref[0, :, lvl * p + pi] for pi in range(p)]

            def body(rb, carry, lvl=lvl, txx=txx, yqs=yqs):
                cs, cy, cx = (list(c) for c in carry)
                vblk = v_refs[lvl][0, pl.ds(rb * rr, rr)].astype(ct)
                r0 = (rb * rr).astype(jnp.float32)
                for ri in range(rr):
                    # one dot serves D (rows :P*BQ) and Dp (rows P*BQ:)
                    ddp = jnp.dot(
                        txx, vblk[ri], preferred_element_type=jnp.float32,
                        precision=prec,
                    )                                     # (2*P*BQ, ch)
                    rf = r0 + ri
                    for pi in range(p):
                        dyy = yqs[pi] - rf
                        ty = jnp.maximum(0.0, 1.0 - jnp.abs(dyy))[:, None]
                        typ = jnp.where(
                            jnp.abs(dyy) < 1.0, -jnp.sign(dyy), 0.0
                        )[:, None]
                        ds = ddp[pi * bq : (pi + 1) * bq]
                        dps = ddp[(p + pi) * bq : (p + pi + 1) * bq]
                        cs[pi] = cs[pi] + ty * ds
                        cy[pi] = cy[pi] + typ * ds
                        cx[pi] = cx[pi] + ty * dps
                return tuple(cs), tuple(cy), tuple(cx)

            init = tuple(
                tuple(jnp.zeros((bq, ch), jnp.float32) for _ in range(p))
                for _ in range(3)
            )
            cs, cy, cx = jax.lax.fori_loop(lo, hi, body, init, unroll=False)
            for pi in range(p):
                aq = a_ref[0, :, lvl * p + pi]
                s_da[lvl * p + pi] = jnp.sum(cs[pi] * g, axis=1)
                s_dy[lvl * p + pi] = aq * jnp.sum(cy[pi] * g, axis=1)
                s_dx[lvl * p + pi] = aq * jnp.sum(cx[pi] * g, axis=1)
            continue

        sval_ref[:] = jnp.zeros_like(sval_ref)            # (3P, BQ, ch)

        def block_body(rb, lvl=lvl, wp=wp, pk=pk, roff=roff,
                       txx_ref=txx_ref):
            vblk = v_refs[lvl][0, pl.ds(rb * rr, rr)].astype(ct).reshape(
                rr * wp, -1
            )
            r0 = (rb * rr).astype(jnp.float32)
            for pi in range(p):
                yq = y_ref[0, :, lvl * p + pi]
                txi = txx_ref[pi * bq : (pi + 1) * bq, :]
                txpi = txx_ref[(p + pi) * bq : (p + pi + 1) * bq, :]
                rows_s, rows_y, rows_x = [], [], []
                for ri in range(rr):
                    dyy = (yq - (r0 + ri) * pk)[:, None] - roff
                    tyc = jnp.maximum(
                        0.0, 1.0 - jnp.abs(dyy)
                    ).astype(ct)
                    typc = jnp.where(
                        jnp.abs(dyy) < 1.0, -jnp.sign(dyy), 0.0
                    ).astype(ct)
                    rows_s.append(tyc * txi)
                    rows_y.append(typc * txi)
                    rows_x.append(tyc * txpi)
                for si, rows in ((0, rows_s), (1, rows_y), (2, rows_x)):
                    lhs = jnp.concatenate(rows, axis=1)   # (BQ, RR*WP)
                    sval_ref[si * p + pi] = sval_ref[si * p + pi] + jnp.dot(
                        lhs, vblk, preferred_element_type=jnp.float32,
                        precision=prec,
                    )

        def body(rb, carry):
            block_body(rb)
            return carry

        jax.lax.fori_loop(lo, hi, body, 0, unroll=False)

        # finalize this level: ch-axis contractions against g, once
        for pi in range(p):
            aq = a_ref[0, :, lvl * p + pi]
            s_da[lvl * p + pi] = jnp.sum(sval_ref[pi] * g, axis=1)
            s_dy[lvl * p + pi] = aq * jnp.sum(sval_ref[p + pi] * g, axis=1)
            s_dx[lvl * p + pi] = aq * jnp.sum(
                sval_ref[2 * p + pi] * g, axis=1
            )

    da_ref[0] = s_da[:].astype(da_ref.dtype)
    dy_ref[0] = s_dy[:].astype(dy_ref.dtype)
    dx_ref[0] = s_dx[:].astype(dx_ref.dtype)


def _fused_dcoord_rr_kernel(bounds_ref, y_ref, x_ref, a_ref, g_ref, *refs,
                            levels, p: int, bq: int, rr: int, ct):
    """RR-ON-LANES dCoord: all levels, grid (bn, nqb), UNPACKED levels only.

    The x-first kernel above issues ``rr`` dots per block, each emitting a
    (2P*BQ, ch=32) result — 32 of 128 output lanes — and then runs
    3*P*rr lane-padded (BQ, ch) tent combines per block.  Here the value is
    pre-laid-out per level as (hp/rr, wp, rr*ch): ONE dot per block emits
    all ``rr`` rows' D and Dp on FULL lanes, ``ddp = txx @ V4[rb]`` of
    shape (2P*BQ, rr*ch).  The y-tents become full-lane ops against a
    hoisted per-level table ``DYL[pi*BQ+q, ri*ch+c] = y_qpi - ri`` (per
    block just subtract the scalar r0), and the per-(ri, pi) combines
    collapse to THREE full-lane FMAs into (P*BQ, rr*ch) carries.  The
    ri-sum never happens inside the loop: finalize contracts each carry
    against ``G4 = [g g .. g]`` (g lane-tiled rr times), folding the
    lane-block reduction into the existing per-point g-contraction.

    Per block this is 8 MXU tile-issues instead of 32 and ~1/3 the VPU
    vreg-instructions of the x-first form (measured: see BASELINE.md)."""
    nl = len(levels)
    v_refs = refs[:nl]
    da_ref, dy_ref, dx_ref = refs[nl], refs[nl + 1], refs[nl + 2]
    txx_refs = refs[nl + 3 : nl + 3 + nl]
    dyl_ref = refs[nl + 3 + nl]
    s_da, s_dy, s_dx = refs[nl + 4 + nl :]

    prec = (jax.lax.Precision.DEFAULT if ct == jnp.bfloat16
            else jax.lax.Precision.HIGHEST)
    g = g_ref[0].astype(jnp.float32)                      # (BQ, ch)
    ch = g.shape[-1]
    rrch = rr * ch
    # hoisted across levels: g lane-tiled rr times, and the ri-of-lane map
    g4 = jnp.concatenate([g] * rr, axis=1)                # (BQ, rr*ch)
    lane_ri = (
        jax.lax.broadcasted_iota(jnp.int32, (bq, rrch), 1) // ch
    ).astype(jnp.float32)

    for lvl, (h, w, wp, pk) in enumerate(levels):
        # per-level (2*P*BQ, wp) x-tent scratch: tx rows then txp rows
        # (identical to the x-first kernel's)
        txx_ref = txx_refs[lvl]
        jj = jax.lax.broadcasted_iota(
            jnp.int32, (bq, wp), 1
        ).astype(jnp.float32)
        for pi in range(p):
            xq = x_ref[0, :, lvl * p + pi][:, None]       # (BQ, 1)
            dxx = xq - jj
            txx_ref[pi * bq : (pi + 1) * bq, :] = jnp.maximum(
                0.0, 1.0 - jnp.abs(dxx)
            ).astype(ct)
            txx_ref[(p + pi) * bq : (p + pi + 1) * bq, :] = jnp.where(
                jnp.abs(dxx) < 1.0, -jnp.sign(dxx), 0.0
            ).astype(ct)
        txx = txx_ref[:]

        # hoisted y table: DYL[pi*BQ+q, ri*ch+c] = y_qpi - ri.  Built via
        # sublane-offset scratch writes like txx — Mosaic cannot
        # concatenate (BQ, 1) lane-slices with mismatched offsets.
        for pi in range(p):
            dyl_ref[pi * bq : (pi + 1) * bq, :] = (
                y_ref[0, :, lvl * p + pi][:, None] - lane_ri
            )
        dyl = dyl_ref[:]                                  # (P*BQ, rr*ch)

        lo = bounds_ref[0, 0, lvl, 0]
        hi = bounds_ref[0, 0, lvl, 1]

        def body(rb, carry, dyl=dyl, txx=txx, lvl=lvl):
            acc_s, acc_y, acc_x = carry
            vblk = v_refs[lvl][0, rb].astype(ct)          # (wp, rr*ch)
            ddp = jnp.dot(
                txx, vblk, preferred_element_type=jnp.float32,
                precision=prec,
            )                                             # (2P*BQ, rr*ch)
            dy_t = dyl - (rb * rr).astype(jnp.float32)
            ady = jnp.abs(dy_t)
            ty = jnp.maximum(0.0, 1.0 - ady)
            typ = jnp.where(ady < 1.0, -jnp.sign(dy_t), 0.0)
            d, dp = ddp[: p * bq], ddp[p * bq :]
            return (acc_s + ty * d, acc_y + typ * d, acc_x + ty * dp)

        zero = jnp.zeros((p * bq, rrch), jnp.float32)
        acc_s, acc_y, acc_x = jax.lax.fori_loop(
            lo, hi, body, (zero, zero, zero), unroll=False
        )

        # finalize: the lane-tiled g4 contraction sums over BOTH ch and ri
        for pi in range(p):
            aq = a_ref[0, :, lvl * p + pi]
            blk = slice(pi * bq, (pi + 1) * bq)
            s_da[lvl * p + pi] = jnp.sum(acc_s[blk] * g4, axis=1)
            s_dy[lvl * p + pi] = aq * jnp.sum(acc_y[blk] * g4, axis=1)
            s_dx[lvl * p + pi] = aq * jnp.sum(acc_x[blk] * g4, axis=1)

    da_ref[0] = s_da[:].astype(da_ref.dtype)
    dy_ref[0] = s_dy[:].astype(dy_ref.dtype)
    dx_ref[0] = s_dx[:].astype(dx_ref.dtype)


def _fused_dcoord_rr_sub_kernel(bounds_ref, y_ref, x_ref, a_ref, g_ref, *refs,
                                levels, p: int, bq: int, rr: int, ct,
                                sub: int):
    """``_fused_dcoord_rr_kernel`` with ``sub`` QUERY SUB-BLOCKS per program.

    Motivation (BASELINE.md round-5): the walk cost scales ~ lq * hull(bq)
    — per-program row hulls widen superlinearly with the query block (bq
    128 -> 256 measured 10.34 -> 15.86 ms/call), but bq < 128 is blocked
    by the out-spec's 128-lane rule.  Here each bq=128 program processes
    ``sub`` independent bq/sub slices with their OWN walk bounds, so the
    hull tightens to hull(bq/sub) while the launch grid and output tiling
    stay at bq=128.  Per-(si, lvl) tents reuse one bqs-sized scratch; the
    finalize writes each slice's lanes of the (nl*p, bq) row scratches."""
    nl = len(levels)
    v_refs = refs[:nl]
    da_ref, dy_ref, dx_ref = refs[nl], refs[nl + 1], refs[nl + 2]
    txx_refs = refs[nl + 3 : nl + 3 + nl]
    dyl_ref = refs[nl + 3 + nl]
    s_da, s_dy, s_dx = refs[nl + 4 + nl :]

    prec = (jax.lax.Precision.DEFAULT if ct == jnp.bfloat16
            else jax.lax.Precision.HIGHEST)
    bqs = bq // sub
    ch = g_ref.shape[-1]
    rrch = rr * ch
    lane_ri = (
        jax.lax.broadcasted_iota(jnp.int32, (bqs, rrch), 1) // ch
    ).astype(jnp.float32)

    for si in range(sub):
        qs = slice(si * bqs, (si + 1) * bqs)
        g = g_ref[0, qs].astype(jnp.float32)              # (BQS, ch)
        g4 = jnp.concatenate([g] * rr, axis=1)            # (BQS, rr*ch)

        for lvl, (h, w, wp, pk) in enumerate(levels):
            txx_ref = txx_refs[lvl]
            jj = jax.lax.broadcasted_iota(
                jnp.int32, (bqs, wp), 1
            ).astype(jnp.float32)
            for pi in range(p):
                xq = x_ref[0, qs, lvl * p + pi][:, None]  # (BQS, 1)
                dxx = xq - jj
                txx_ref[pi * bqs : (pi + 1) * bqs, :] = jnp.maximum(
                    0.0, 1.0 - jnp.abs(dxx)
                ).astype(ct)
                txx_ref[(p + pi) * bqs : (p + pi + 1) * bqs, :] = jnp.where(
                    jnp.abs(dxx) < 1.0, -jnp.sign(dxx), 0.0
                ).astype(ct)
            txx = txx_ref[:]

            for pi in range(p):
                dyl_ref[pi * bqs : (pi + 1) * bqs, :] = (
                    y_ref[0, qs, lvl * p + pi][:, None] - lane_ri
                )
            dyl = dyl_ref[:]                              # (P*BQS, rr*ch)

            lo = bounds_ref[0, 0, si, lvl, 0]
            hi = bounds_ref[0, 0, si, lvl, 1]

            def body(rb, carry, dyl=dyl, txx=txx, lvl=lvl):
                acc_s, acc_y, acc_x = carry
                vblk = v_refs[lvl][0, rb].astype(ct)      # (wp, rr*ch)
                ddp = jnp.dot(
                    txx, vblk, preferred_element_type=jnp.float32,
                    precision=prec,
                )                                         # (2P*BQS, rr*ch)
                dy_t = dyl - (rb * rr).astype(jnp.float32)
                ady = jnp.abs(dy_t)
                ty = jnp.maximum(0.0, 1.0 - ady)
                typ = jnp.where(ady < 1.0, -jnp.sign(dy_t), 0.0)
                d, dp = ddp[: p * bqs], ddp[p * bqs :]
                return (acc_s + ty * d, acc_y + typ * d, acc_x + ty * dp)

            zero = jnp.zeros((p * bqs, rrch), jnp.float32)
            acc_s, acc_y, acc_x = jax.lax.fori_loop(
                lo, hi, body, (zero, zero, zero), unroll=False
            )

            for pi in range(p):
                aq = a_ref[0, qs, lvl * p + pi]
                blk = slice(pi * bqs, (pi + 1) * bqs)
                s_da[lvl * p + pi, qs] = jnp.sum(acc_s[blk] * g4, axis=1)
                s_dy[lvl * p + pi, qs] = aq * jnp.sum(acc_y[blk] * g4, axis=1)
                s_dx[lvl * p + pi, qs] = aq * jnp.sum(acc_x[blk] * g4, axis=1)

    da_ref[0] = s_da[:].astype(da_ref.dtype)
    dy_ref[0] = s_dy[:].astype(dy_ref.dtype)
    dx_ref[0] = s_dx[:].astype(dx_ref.dtype)


@functools.partial(jax.jit, static_argnames=("spatial_shapes", "bq", "rr",
                                             "interpret", "parts",
                                             "dcoord_pack", "dcoord_rr",
                                             "dcoord_sub"))
def _msda_bwd_fused(value, loc, attn, g, spatial_shapes, bq: int = 128,
                    rr: int = 4, interpret: bool = False,
                    parts=("dvalue", "dcoord"), dcoord_pack: bool = False,
                    dcoord_rr: bool = True, dcoord_sub: int = 1):
    # bq=128 (fwd uses 256): the x-first dCoord kernel's per-program live
    # set (stacked tent scratch, 3P fori-carried (BQ, ch) accumulators, the
    # merged (2P*BQ, ch) dot output — all lane-padded) scales with BQ and
    # sat at 18.2 MB of Mosaic stack vs the 16 MB scoped-VMEM limit at
    # train encoder shapes; halving BQ doubles the (parallel) grid instead.
    """Fused MSDA backward: shared cross-level coordinate prep (one
    transpose + one pad for all levels, like the fwd), ONE fused dCoord
    launch for all levels, and per-level dValue launches off the shared
    prep.  Inputs in the public layouts (value (B, Len, nh, ch), loc/attn
    (B, Lq, nh, nl, p[, 2]), g (B, Lq, nh*ch)); returns (dvalue, dloc,
    dattn) in the primal shapes.  Query striping happens in the caller."""
    b, len_in, nh, ch = value.shape
    lq = loc.shape[1]
    nl = len(spatial_shapes)
    p = loc.shape[-2]
    bn = b * nh
    lqp = _round_up(lq, bq)
    nqb = lqp // bq
    ct = jnp.bfloat16 if value.dtype == jnp.bfloat16 else jnp.float32

    value_t = jnp.swapaxes(value, 1, 2).reshape(bn, len_in, ch)
    loc_t = jnp.swapaxes(loc, 1, 2).reshape(bn, lq, nl, p, 2)
    attn_t = jnp.swapaxes(attn, 1, 2).reshape(bn, lq, nl, p)
    g_t = jnp.swapaxes(g.reshape(b, lq, nh, ch), 1, 2).reshape(bn, lq, ch)

    hs = jnp.asarray([h for h, _ in spatial_shapes], jnp.float32)
    ws = jnp.asarray([w for _, w in spatial_shapes], jnp.float32)
    y_all = jnp.full((bn, lqp, nl, p), -10.0, jnp.float32)
    x_all = jnp.full((bn, lqp, nl, p), -10.0, jnp.float32)
    a_all = jnp.zeros((bn, lqp, nl, p), jnp.float32)
    y_all = y_all.at[:, :lq].set(
        loc_t[..., 1].astype(jnp.float32) * hs[:, None] - 0.5
    )
    x_all = x_all.at[:, :lq].set(
        loc_t[..., 0].astype(jnp.float32) * ws[:, None] - 0.5
    )
    a_all = a_all.at[:, :lq].set(attn_t.astype(jnp.float32))
    g_p = jnp.zeros((bn, lqp, ch), ct)
    g_p = g_p.at[:, :lq].set(g_t.astype(ct))

    # dValue keeps row packing (its bottleneck is block visits); dCoord
    # defaults to UNPACKED levels — with the x-first factorization, an
    # unpacked narrow level costs a handful of (BQ, ch) VPU ops per block,
    # while the packed tent-lhs form pays 3 full-width (BQ, wp) products
    # per (point, row)
    v_pads, level_meta, bounds_all, y_pkd = _prep_levels(
        value_t, y_all, spatial_shapes, nqb, bq, rr, value.dtype, pack=True
    )
    if dcoord_pack:
        vc_pads, c_meta, c_bounds = v_pads, level_meta, bounds_all
    else:
        vc_pads, c_meta, c_bounds, _ = _prep_levels(
            value_t, y_all, spatial_shapes, nqb, bq, rr, value.dtype,
            pack=False,
        )
    if dcoord_rr and not dcoord_pack:
        # rr-on-lanes value layout (see _fused_dcoord_rr_kernel): per level
        # (bn, hp/rr, wp, rr*ch) with V4[rb, j, ri*ch + c] = V[rb*rr+ri, j, c]
        vc_pads = [
            vp.reshape(bn, vp.shape[1] // rr, rr, vp.shape[2], ch)
            .transpose(0, 1, 3, 2, 4)
            .reshape(bn, vp.shape[1] // rr, vp.shape[2], rr * ch)
            for vp in vc_pads
        ]

    y_flat = y_all.reshape(bn, lqp, nl * p)
    x_flat = x_all.reshape(bn, lqp, nl * p)
    a_flat = a_all.reshape(bn, lqp, nl * p)

    # --- fused dCoord: one launch, all levels ---
    coord_spec = pl.BlockSpec((1, bq, nl * p), lambda b_, q: (b_, q, 0))
    out_spec = pl.BlockSpec((1, nl * p, bq), lambda b_, q: (b_, 0, q))
    if "dcoord" not in parts:  # perf-decomposition escape hatch (bench only)
        z = jnp.zeros((bn, nl * p, lqp), jnp.float32)
        da, dy, dx = z, z, z
    else:
        rr_lanes = dcoord_rr and not dcoord_pack
        sub = dcoord_sub if rr_lanes else 1
        if sub > 1:
            # walk bounds at SUB-block granularity (see the sub kernel):
            # (bn, nqb, sub, nl, 2), hulls of bq/sub-query slices
            bqs = bq // sub
            subs = []
            for lvl, (h_l, w_l, _, pk_) in enumerate(c_meta):
                hp_l = _round_up(-(-h_l // pk_), rr)
                subs.append(_row_block_bounds(
                    y_all[:, :, lvl], nqb * sub, bqs, rr, hp_l // rr
                ))
            c_bounds = jnp.stack(subs, axis=2).reshape(
                bn, nqb, sub, nl, 2
            )
            kern = functools.partial(_fused_dcoord_rr_sub_kernel, sub=sub)
            bounds_spec = pl.BlockSpec(
                (1, 1, sub, nl, 2), lambda b_, q: (b_, q, 0, 0, 0),
                memory_space=pltpu.SMEM,
            )
        else:
            kern = _fused_dcoord_rr_kernel if rr_lanes else _fused_dcoord_kernel
            bounds_spec = pl.BlockSpec(
                (1, 1, nl, 2), lambda b_, q: (b_, q, 0, 0),
                memory_space=pltpu.SMEM,
            )
        da, dy, dx = pl.pallas_call(
            functools.partial(kern, levels=tuple(c_meta),
                              p=p, bq=bq, rr=rr, ct=ct),
            grid=(bn, nqb),
            in_specs=[
                bounds_spec,
                coord_spec, coord_spec, coord_spec,
                pl.BlockSpec((1, bq, ch), lambda b_, q: (b_, q, 0)),
            ] + [
                pl.BlockSpec((1, vp.shape[1], vp.shape[2], vp.shape[3]),
                             lambda b_, q: (b_, 0, 0, 0))
                for vp in vc_pads
            ],
            out_specs=[out_spec, out_spec, out_spec],
            out_shape=[
                jax.ShapeDtypeStruct((bn, nl * p, lqp), jnp.float32)
                for _ in range(3)
            ],
            scratch_shapes=[
                # per-level exact-width tents (tx stacked over txp — ONE
                # scratch so the x-first walk dots both in one MXU issue);
                # the sub kernel reuses a bq/sub-sized scratch per slice
                pltpu.VMEM((2 * p * (bq // sub), wp_l), ct)
                for _, _, wp_l, _ in c_meta
            ] + (
                # rr kernel: the hoisted (P*BQ, rr*ch) DYL table scratch.
                # x-first kernel: sval serves only PACKED levels (see
                # kernel) — omit it otherwise: the scoped-VMEM cliff.
                [pltpu.VMEM((p * (bq // sub), rr * ch), jnp.float32)]
                if rr_lanes
                else (
                    [pltpu.VMEM((3 * p, bq, ch), jnp.float32)]
                    if any(pk_ > 1 for _, _, _, pk_ in c_meta) else []
                )
            ) + [
                pltpu.VMEM((nl * p, bq), jnp.float32),
                pltpu.VMEM((nl * p, bq), jnp.float32),
                pltpu.VMEM((nl * p, bq), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
            ),
            interpret=interpret,
        )(c_bounds, y_flat, x_flat, a_flat, g_p, *vc_pads)

    # --- per-level dValue off the shared prep ---
    if "dvalue" not in parts:  # perf-decomposition escape hatch (bench only)
        dvalue = jnp.zeros_like(value)
        def unflat0(d):
            d = jnp.swapaxes(d, 1, 2)[:, :lq].reshape(bn, lq, nl, p)
            return jnp.swapaxes(d.reshape(b, nh, lq, nl, p), 1, 2)
        dloc = jnp.stack(
            [unflat0(dx) * ws[:, None], unflat0(dy) * hs[:, None]], axis=-1
        ).astype(loc.dtype)
        return dvalue, dloc, unflat0(da).astype(attn.dtype)
    dvalue_parts = []
    for lvl, (h, w, wp, pk) in enumerate(level_meta):
        hpk = -(-h // pk)
        hp = _round_up(hpk, rr)
        nrb = hp // rr
        # flags/q-bounds in PACKED row units (conservative hull, like the
        # fused dCoord's bounds)
        flags_t = jnp.swapaxes(
            _row_block_flags(y_pkd[lvl], nqb, bq, rr, nrb), 1, 2
        )
        any_q = flags_t.max(axis=-1) > 0
        qlo = jnp.argmax(flags_t, axis=-1).astype(jnp.int32)
        qhi = (nqb - jnp.argmax(flags_t[..., ::-1], axis=-1)).astype(
            jnp.int32
        )
        qbounds = jnp.stack(
            [jnp.where(any_q, qlo, 0), jnp.where(any_q, qhi, 0)], axis=-1
        )
        y_t = jnp.swapaxes(y_all[:, :, lvl], 1, 2)        # (BN, P, LQP)
        x_t = jnp.swapaxes(x_all[:, :, lvl], 1, 2)
        a_t = jnp.swapaxes(a_all[:, :, lvl], 1, 2)
        dv = pl.pallas_call(
            functools.partial(_dvalue_kernel_v2, h=h, w=w, p=p, bq=bq,
                              wp=wp, rr=rr, ct=ct, pk=pk),
            grid=(bn, nrb),
            in_specs=[
                pl.BlockSpec((1, nrb, nqb), lambda b_, r: (b_, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, nrb, 2), lambda b_, r: (b_, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, p, lqp), lambda b_, r: (b_, 0, 0)),
                pl.BlockSpec((1, p, lqp), lambda b_, r: (b_, 0, 0)),
                pl.BlockSpec((1, p, lqp), lambda b_, r: (b_, 0, 0)),
                pl.BlockSpec((1, lqp, ch), lambda b_, r: (b_, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, rr, wp, ch),
                                   lambda b_, r: (b_, r, 0, 0)),
            scratch_shapes=[pltpu.VMEM((rr * wp, ch), jnp.float32)],
            out_shape=jax.ShapeDtypeStruct((bn, hp, wp, ch), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
            ),
            interpret=interpret,
        )(flags_t, qbounds, y_t, x_t, a_t, g_p)
        if pk > 1:  # unpack (hpk, pk*w) rows back to (h, w)
            dv = dv[:, :hpk, : pk * w].reshape(bn, hpk * pk, w, ch)
        dvalue_parts.append(dv[:, :h, :w].reshape(bn, h * w, ch))
    dvalue_t = jnp.concatenate(dvalue_parts, axis=1)      # (BN, Len, ch)

    # --- assemble public shapes ---
    dvalue = jnp.swapaxes(
        dvalue_t.reshape(b, nh, len_in, ch), 1, 2
    ).astype(value.dtype)

    def unflat(d):  # (BN, nl*p, LQP) -> (B, Lq, nh, nl, p)
        d = jnp.swapaxes(d, 1, 2)[:, :lq].reshape(bn, lq, nl, p)
        return jnp.swapaxes(d.reshape(b, nh, lq, nl, p), 1, 2)

    dloc = jnp.stack(
        [unflat(dx) * ws[:, None], unflat(dy) * hs[:, None]], axis=-1
    ).astype(loc.dtype)
    dattn = unflat(da).astype(attn.dtype)
    return dvalue, dloc, dattn


@functools.partial(jax.jit, static_argnames=("h", "w", "bq", "rr", "interpret"))
def _sample_level_pallas_bwd_v2(value, y, x, attn, g, h: int, w: int,
                                bq: int = 256, rr: int = 4,
                                interpret: bool = False):
    """v2 backward: same contract as ``_sample_level_pallas_bwd`` with the
    reduction loops inside the kernels (program counts (bn, nrb) + (bn, nqb)
    instead of (bn, nrb, nqb) x2)."""
    bn, hw, ch = value.shape
    lq, p = y.shape[1], y.shape[2]
    wp = _round_up(w, 128)
    lqp = _round_up(lq, bq)
    hp = _round_up(h, rr)
    ct = jnp.bfloat16 if value.dtype == jnp.bfloat16 else jnp.float32

    v_pad = jnp.zeros((bn, hp, wp, ch), value.dtype)
    v_pad = v_pad.at[:, :h, :w].set(value.reshape(bn, h, w, ch))

    def pad_q(a, fill):
        out = jnp.full((bn, lqp, p), fill, jnp.float32)
        return out.at[:, :lq].set(a.astype(jnp.float32))

    y_p = pad_q(y, -10.0)
    x_p = pad_q(x, -10.0)
    a_p = pad_q(attn, 0.0)
    g_p = jnp.zeros((bn, lqp, ch), ct)
    g_p = g_p.at[:, :lq].set(g.astype(ct))
    nrb = hp // rr
    nqb = lqp // bq
    flags_t = jnp.swapaxes(
        _row_block_flags(y_p, nqb, bq, rr, nrb), 1, 2
    )                                                     # (BN, nrb, nqb)
    bounds = _row_block_bounds(y_p, nqb, bq, rr, nrb)
    # contiguous active q-block interval per row block (hull of flags_t)
    any_q = flags_t.max(axis=-1) > 0
    qlo = jnp.argmax(flags_t, axis=-1).astype(jnp.int32)
    qhi = (nqb - jnp.argmax(flags_t[..., ::-1], axis=-1)).astype(jnp.int32)
    qbounds = jnp.stack(
        [jnp.where(any_q, qlo, 0), jnp.where(any_q, qhi, 0)], axis=-1
    )                                                     # (BN, nrb, 2)

    # head-transposed coords: query axis on lanes (128-aligned)
    y_t = jnp.swapaxes(y_p, 1, 2)                         # (BN, P, LQP)
    x_t = jnp.swapaxes(x_p, 1, 2)
    a_t = jnp.swapaxes(a_p, 1, 2)

    # flags/qbounds ride per-program SMEM BLOCKS, not scalar prefetch: the
    # full (BN, nrb, nqb) int32 array overflows SMEM at encoder scale (the
    # opaque compile-500 failure mode; see CLAUDE.md), and neither feeds an
    # index_map — the per-bn (nrb, nqb)/(nrb, 2) slices are ~2 KB (SMEM
    # blocks must keep the trailing two dims equal to the array's)
    dv = pl.pallas_call(
        functools.partial(_dvalue_kernel_v2, h=h, w=w, p=p, bq=bq, wp=wp,
                          rr=rr, ct=ct),
        grid=(bn, nrb),
        in_specs=[
            pl.BlockSpec((1, nrb, nqb), lambda b, r: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, nrb, 2), lambda b, r: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, p, lqp), lambda b, r: (b, 0, 0)),
            pl.BlockSpec((1, p, lqp), lambda b, r: (b, 0, 0)),
            pl.BlockSpec((1, p, lqp), lambda b, r: (b, 0, 0)),
            pl.BlockSpec((1, lqp, ch), lambda b, r: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, rr, wp, ch), lambda b, r: (b, r, 0, 0)),
        scratch_shapes=[pltpu.VMEM((rr * wp, ch), jnp.float32)],
        out_shape=jax.ShapeDtypeStruct((bn, hp, wp, ch), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(flags_t, qbounds, y_t, x_t, a_t, g_p)
    dvalue = dv[:, :h, :w].reshape(bn, hw, ch)

    dc_grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bn, nqb),
        in_specs=[
            pl.BlockSpec((1, bq, p), lambda b, q, f: (b, q, 0)),
            pl.BlockSpec((1, bq, p), lambda b, q, f: (b, q, 0)),
            pl.BlockSpec((1, bq, p), lambda b, q, f: (b, q, 0)),
            pl.BlockSpec((1, bq, ch), lambda b, q, f: (b, q, 0)),
            pl.BlockSpec((1, hp, wp, ch), lambda b, q, f: (b, 0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, p, bq), lambda b, q, f: (b, 0, q))
            for _ in range(3)
        ],
        scratch_shapes=[pltpu.VMEM((p, bq), jnp.float32) for _ in range(3)],
    )
    da, dy, dx = pl.pallas_call(
        functools.partial(_dcoord_kernel_v2, h=h, w=w, p=p, bq=bq, wp=wp,
                          rr=rr, ct=ct),
        grid_spec=dc_grid,
        out_shape=[
            jax.ShapeDtypeStruct((bn, p, lqp), jnp.float32)
            for _ in range(3)
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(bounds, y_p, x_p, a_p, g_p, v_pad)
    da = jnp.swapaxes(da, 1, 2)[:, :lq]
    dy = jnp.swapaxes(dy, 1, 2)[:, :lq]
    dx = jnp.swapaxes(dx, 1, 2)[:, :lq]
    return dvalue, dy, dx, da


@functools.partial(jax.jit, static_argnames=("h", "w", "bq", "rr", "interpret"))
def _sample_level_pallas_bwd(value, y, x, attn, g, h: int, w: int,
                             bq: int = 256, rr: int = 4,
                             interpret: bool = False):
    """Backward of ``_sample_level_pallas``: returns (dvalue (BN, H*W, ch),
    dy, dx, dattn each (BN, Lq, P)) given g (BN, Lq, ch) float32."""
    bn, hw, ch = value.shape
    lq, p = y.shape[1], y.shape[2]
    wp = _round_up(w, 128)
    lqp = _round_up(lq, bq)
    hp = _round_up(h, rr)

    v_pad = jnp.zeros((bn, hp, wp, ch), value.dtype)
    v_pad = v_pad.at[:, :h, :w].set(value.reshape(bn, h, w, ch))

    def pad_q(a, fill):
        out = jnp.full((bn, lqp, p), fill, jnp.float32)
        return out.at[:, :lq].set(a.astype(jnp.float32))

    y_p = pad_q(y, -10.0)
    x_p = pad_q(x, -10.0)
    a_p = pad_q(attn, 0.0)
    g_p = jnp.zeros((bn, lqp, ch), jnp.float32)
    g_p = g_p.at[:, :lq].set(g.astype(jnp.float32))
    nrb = hp // rr
    nqb = lqp // bq
    flags = _row_block_flags(y_p, nqb, bq, rr, nrb)          # (BN, nqb, nrb)
    flags_t = jnp.swapaxes(flags, 1, 2)                      # (BN, nrb, nqb)

    coord_specs = [
        pl.BlockSpec((1, bq, p), lambda b, q, r, f: (b, q, 0))
        for _ in range(3)
    ]

    dv_grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bn, nrb, nqb),
        in_specs=[
            pl.BlockSpec((1, bq, p), lambda b, r, q, f: (b, q, 0)),
            pl.BlockSpec((1, bq, p), lambda b, r, q, f: (b, q, 0)),
            pl.BlockSpec((1, bq, p), lambda b, r, q, f: (b, q, 0)),
            pl.BlockSpec((1, bq, ch), lambda b, r, q, f: (b, q, 0)),
        ],
        out_specs=pl.BlockSpec((1, rr, wp, ch), lambda b, r, q, f: (b, r, 0, 0)),
        scratch_shapes=[pltpu.VMEM((rr * wp, ch), jnp.float32)],
    )
    dv = pl.pallas_call(
        functools.partial(_dvalue_kernel, h=h, w=w, p=p, bq=bq, wp=wp, rr=rr),
        grid_spec=dv_grid,
        out_shape=jax.ShapeDtypeStruct((bn, hp, wp, ch), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(flags_t, y_p, x_p, a_p, g_p)
    dvalue = dv[:, :h, :w].reshape(bn, hw, ch)

    dc_grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bn, nqb, nrb),
        in_specs=coord_specs + [
            pl.BlockSpec((1, bq, ch), lambda b, q, r, f: (b, q, 0)),
            pl.BlockSpec((1, rr, wp, ch), lambda b, q, r, f: (b, r, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, p, bq), lambda b, q, r, f: (b, 0, q))
            for _ in range(3)
        ],
        scratch_shapes=[pltpu.VMEM((p, bq), jnp.float32) for _ in range(3)],
    )
    da, dy, dx = pl.pallas_call(
        functools.partial(_dcoord_kernel, h=h, w=w, p=p, bq=bq, wp=wp, rr=rr),
        grid_spec=dc_grid,
        out_shape=[
            jax.ShapeDtypeStruct((bn, p, lqp), jnp.float32)
            for _ in range(3)
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(flags, y_p, x_p, a_p, g_p, v_pad)
    # outputs are (BN, P, LQP): transpose back
    da = jnp.swapaxes(da, 1, 2)[:, :lq]
    dy = jnp.swapaxes(dy, 1, 2)[:, :lq]
    dx = jnp.swapaxes(dx, 1, 2)[:, :lq]
    return dvalue, dy, dx, da


def ms_deform_attn_pallas_fwd(
    value: jax.Array,                # (B, Len_in, nh, ch)
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jax.Array,   # (B, Lq, nh, nl, P, 2) in [0,1]
    attention_weights: jax.Array,    # (B, Lq, nh, nl, P)
    level_impl=None,                 # _sample_level_pallas{,_v2}; default v2
) -> jax.Array:
    if level_impl is None:
        # default: the fused all-level kernel (one launch per MSDA call) —
        # unless the combined per-program VMEM residency of ALL level value
        # blocks (lanes padded to 128, x2 pipeline buffers) would crowd the
        # ~16 MB VMEM; then fall back to the per-level v2 kernels
        ch = value.shape[-1]
        esz = 2 if value.dtype == jnp.bfloat16 else 4
        vmem = sum(
            _round_up(h, 4) * _round_up(w, 128) * _round_up(ch, 128) * esz * 2
            for h, w in spatial_shapes
        )
        if vmem <= 12 * 1024 * 1024:
            return _msda_fused(value, sampling_locations, attention_weights,
                               tuple(tuple(s) for s in spatial_shapes),
                               rr_lanes=True)
        level_impl = _sample_level_pallas_v2

    b, len_in, nh, ch = value.shape
    lq = sampling_locations.shape[1]
    nl = len(spatial_shapes)
    p = sampling_locations.shape[-2]
    bn = b * nh
    impl = level_impl

    value_t = jnp.swapaxes(value, 1, 2).reshape(bn, len_in, ch)
    out = jnp.zeros((bn, lq, ch), jnp.float32)

    if impl is _sample_level_pallas_v2:
        # shared prep across levels: ONE head-major transpose + ONE query-
        # axis padding for the whole (nl, p) coordinate block, instead of
        # per-level transposes/pads (the per-call prep was a measurable
        # share of the 3-call cost; see BASELINE.md round-2 notes)
        bq = 256
        lqp = _round_up(lq, bq)
        loc_t = jnp.swapaxes(sampling_locations, 1, 2).reshape(
            bn, lq, nl, p, 2
        )
        attn_t = jnp.swapaxes(attention_weights, 1, 2).reshape(bn, lq, nl, p)
        locp = jnp.full((bn, lqp, nl, p, 2), -10.0, jnp.float32)
        locp = locp.at[:, :lq].set(loc_t.astype(jnp.float32))
        attnp = jnp.zeros((bn, lqp, nl, p), jnp.float32)
        attnp = attnp.at[:, :lq].set(attn_t.astype(jnp.float32))
        start = 0
        for lvl, (h, w) in enumerate(spatial_shapes):
            v = value_t[:, start : start + h * w]
            start += h * w
            # pixel coords (grid_sample align_corners=False); padded queries
            # land at -10*size - 0.5 (tent-dead, below the -9 bounds cutoff)
            y_p = locp[:, :, lvl, :, 1] * h - 0.5
            x_p = locp[:, :, lvl, :, 0] * w - 0.5
            out = out + impl(
                v, y_p, x_p, attnp[:, :, lvl], h, w, bq=bq, pre_padded=True
            )[:, :lq]
        out = out.reshape(b, nh, lq, ch)
        return jnp.swapaxes(out, 1, 2).reshape(b, lq, nh * ch).astype(
            value.dtype
        )

    start = 0
    for lvl, (h, w) in enumerate(spatial_shapes):
        v = value_t[:, start : start + h * w]
        start += h * w
        loc = sampling_locations[:, :, :, lvl]            # (B, Lq, nh, P, 2)
        attn = attention_weights[:, :, :, lvl]
        # pixel coords (grid_sample align_corners=False)
        xpix = loc[..., 0] * w - 0.5
        ypix = loc[..., 1] * h - 0.5

        def hm(a):  # (B, Lq, nh, P) -> (BN, Lq, P)
            return jnp.transpose(a, (0, 2, 1, 3)).reshape(bn, lq, p)

        out = out + impl(v, hm(ypix), hm(xpix), hm(attn), h, w)
    out = out.reshape(b, nh, lq, ch)
    return jnp.swapaxes(out, 1, 2).reshape(b, lq, nh * ch).astype(value.dtype)


def ms_deform_attn_pallas_bwd(value, spatial_shapes, loc, attn, g,
                              level_impl=None):
    """Pallas backward: returns (dvalue, dloc, dattn) in the primal shapes.
    ``level_impl`` selects ``_sample_level_pallas_bwd{,_v2}`` (default v2)."""
    b, len_in, nh, ch = value.shape
    lq = loc.shape[1]
    p = loc.shape[-2]
    bn = b * nh

    # encoder self-attention: y-stripe the query axis (see _stripe_plan) so
    # the dCoord row intervals and dValue q-block flags tighten like the
    # forward; dvalue indexes VALUE positions (raster) and needs no unpermute
    stripes = None
    if _STRIPE_BWD and lq == len_in:
        n_stripes = max(1, min(min(h for h, _ in spatial_shapes), 16))
        stripes = _stripe_plan(
            tuple(tuple(s) for s in spatial_shapes), n_stripes
        )
    if stripes is not None:
        runs_f, runs_i = stripes
        loc = jnp.concatenate([loc[:, a:e] for a, e in runs_f], axis=1)
        attn = jnp.concatenate([attn[:, a:e] for a, e in runs_f], axis=1)
        g = jnp.concatenate([g[:, a:e] for a, e in runs_f], axis=1)

    # fused path (one dCoord launch for all levels + shared prep), gated by
    # the same per-program VMEM residency bound as the fused forward
    if level_impl is None:
        esz = 2 if value.dtype == jnp.bfloat16 else 4
        vmem = sum(
            _round_up(h, 4) * _round_up(w, 128) * _round_up(ch, 128) * esz * 2
            for h, w in spatial_shapes
        )
        if vmem <= 12 * 1024 * 1024:
            dvalue, dloc, dattn = _msda_bwd_fused(
                value, loc, attn, g, tuple(tuple(s) for s in spatial_shapes)
            )
            if stripes is not None:
                runs_f, runs_i = stripes
                dloc = jnp.concatenate(
                    [dloc[:, a:e] for a, e in runs_i], axis=1
                )
                dattn = jnp.concatenate(
                    [dattn[:, a:e] for a, e in runs_i], axis=1
                )
            return dvalue, dloc, dattn

    value_t = jnp.swapaxes(value, 1, 2).reshape(bn, len_in, ch)
    # g: (B, Lq, nh*ch) -> (BN, Lq, ch)
    g_t = jnp.swapaxes(
        g.reshape(b, lq, nh, ch), 1, 2
    ).reshape(bn, lq, ch)

    def hm(a):
        return jnp.transpose(a, (0, 2, 1, 3)).reshape(bn, lq, p)

    def hm_inv(a):  # (BN, Lq, P) -> (B, Lq, nh, P)
        return jnp.transpose(a.reshape(b, nh, lq, p), (0, 2, 1, 3))

    impl = level_impl if level_impl is not None else _sample_level_pallas_bwd_v2
    dvalue_t = jnp.zeros_like(value_t, dtype=jnp.float32)
    dloc_parts = []
    dattn_parts = []
    start = 0
    for lvl, (h, w) in enumerate(spatial_shapes):
        v = value_t[:, start : start + h * w]
        l_lvl = loc[:, :, :, lvl]
        a_lvl = attn[:, :, :, lvl]
        xpix = l_lvl[..., 0] * w - 0.5
        ypix = l_lvl[..., 1] * h - 0.5
        dv, dy, dx, da = impl(
            v, hm(ypix), hm(xpix), hm(a_lvl), g_t, h, w
        )
        dvalue_t = dvalue_t.at[:, start : start + h * w].add(dv)
        # chain: pixel = loc * size - 0.5
        dloc_parts.append(jnp.stack(
            [hm_inv(dx) * w, hm_inv(dy) * h], axis=-1
        ))  # (B, Lq, nh, P, 2)
        dattn_parts.append(hm_inv(da))
        start += h * w

    dvalue = jnp.swapaxes(
        dvalue_t.reshape(b, nh, len_in, ch), 1, 2
    ).astype(value.dtype)
    dloc = jnp.stack(dloc_parts, axis=3).astype(loc.dtype)
    dattn = jnp.stack(dattn_parts, axis=3).astype(attn.dtype)
    if stripes is not None:
        dloc = jnp.concatenate([dloc[:, a:e] for a, e in runs_i], axis=1)
        dattn = jnp.concatenate([dattn[:, a:e] for a, e in runs_i], axis=1)
    return dvalue, dloc, dattn


@functools.lru_cache(maxsize=None)
def _make_msda(spatial_shapes: Tuple[Tuple[int, int], ...]):
    @jax.custom_vjp
    def f(value, loc, attn):
        return ms_deform_attn_pallas_fwd(value, spatial_shapes, loc, attn)

    def fwd(value, loc, attn):
        return f(value, loc, attn), (value, loc, attn)

    def bwd(res, g):
        value, loc, attn = res
        return ms_deform_attn_pallas_bwd(value, spatial_shapes, loc, attn, g)

    f.defvjp(fwd, bwd)
    return f


def ms_deform_attn_pallas(value, spatial_shapes, sampling_locations,
                          attention_weights):
    """Drop-in for ``msda.ms_deform_attn``: Pallas forward and Pallas
    backward (``ms_deform_attn_pallas_bwd``) via ``custom_vjp``."""
    f = _make_msda(tuple(tuple(s) for s in spatial_shapes))
    return f(value, sampling_locations, attention_weights)
