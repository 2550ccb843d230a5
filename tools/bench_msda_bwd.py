"""Micro-benchmark the full MSDA custom-vjp (fwd and fwd+bwd) at TRAIN
encoder shapes (B*T=2 @ 480x864 -> levels (60,108)/(30,54)/(15,27), 8 heads,
ch=32) and eval shapes.  Chains CH calls inside one jit so the ~35 ms axon
tunnel round-trip amortizes; fences on an in-graph scalar.

    python tools/bench_msda_bwd.py
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

from openvis_tpu.ops.msda_pallas import ms_deform_attn_pallas

CH = 3


def _raster_refs(levels):
    """Normalized (x, y) per token, raster order over concatenated levels —
    the encoder's reference points (pixel_decoder.encoder_reference_points),
    so the kernels' row gating sees the real locality structure."""
    pts = []
    for (h, w) in levels:
        ys = (np.arange(h) + 0.5) / h
        xs = (np.arange(w) + 0.5) / w
        yy, xx = np.meshgrid(ys, xs, indexing="ij")
        pts.append(np.stack([xx.ravel(), yy.ravel()], -1))
    return np.concatenate(pts, 0)  # (LQ, 2)


def bench(tag, b, levels, dtype, iters=6):
    nh, ch, p = 8, 32, 4
    nl = len(levels)
    lq = sum(h * w for h, w in levels)
    rng = np.random.RandomState(0)
    value = jnp.asarray(
        rng.randn(b, lq, nh, ch).astype(np.float32)
    ).astype(dtype)
    # reference-anchored sampling locations: ring-init-scale offsets of a
    # few pixels at each level (locality like the trained encoder)
    refs = _raster_refs(levels)[None, :, None, None, None, :]  # (1,LQ,1,1,1,2)
    sizes = np.array([(w, h) for h, w in levels], np.float32)  # (nl, 2)
    offs = rng.randn(b, lq, nh, nl, p, 2).astype(np.float32) * 2.0
    loc = jnp.asarray(
        (refs + offs / sizes[None, None, None, :, None, :]).astype(np.float32)
    )
    attn = jax.nn.softmax(
        jnp.asarray(rng.randn(b, lq, nh, nl, p).astype(np.float32)), axis=-1
    ).reshape(b, lq, nh, nl, p)

    def one(v, l, a):
        return ms_deform_attn_pallas(v, levels, l, a)

    def fwd_chain(v, l, a):
        s = jnp.zeros((), jnp.float32)
        for i in range(CH):
            s = s + jnp.sum(one(v + s.astype(v.dtype) * 0, l, a).astype(
                jnp.float32))
        return s

    def grad_chain(v, l, a):
        g = jax.grad(
            lambda vv, ll, aa: fwd_chain(vv, ll, aa), argnums=(0, 1, 2)
        )(v, l, a)
        return sum(jnp.sum(jnp.square(x.astype(jnp.float32))) for x in g)

    for name, fn in (("fwd", jax.jit(fwd_chain)), ("fwd+bwd", jax.jit(grad_chain))):
        r = fn(value, loc, attn)
        np.asarray(r)
        t0 = time.perf_counter()
        for _ in range(iters):
            np.asarray(fn(value, loc, attn))
        dt = (time.perf_counter() - t0) / iters * 1e3
        per = (dt - 35.0) / CH  # subtract one tunnel RTT, per chained call
        print(json.dumps({
            "case": f"{tag}_{name}", "ms_total": round(dt, 2),
            "ms_per_call": round(per, 2),
        }), flush=True)


def bench_parts(tag, b, levels, dtype, iters=6):
    """Decompose the fused backward: dValue-only vs dCoord-only."""
    from openvis_tpu.ops.msda_pallas import _msda_bwd_fused

    nh, ch, p = 8, 32, 4
    nl = len(levels)
    lq = sum(h * w for h, w in levels)
    rng = np.random.RandomState(0)
    value = jnp.asarray(
        rng.randn(b, lq, nh, ch).astype(np.float32)
    ).astype(dtype)
    refs = _raster_refs(levels)[None, :, None, None, None, :]
    sizes = np.array([(w, h) for h, w in levels], np.float32)
    offs = rng.randn(b, lq, nh, nl, p, 2).astype(np.float32) * 2.0
    loc = jnp.asarray(
        (refs + offs / sizes[None, None, None, :, None, :]).astype(np.float32)
    )
    attn = jax.nn.softmax(
        jnp.asarray(rng.randn(b, lq, nh, nl, p).astype(np.float32)), axis=-1
    ).reshape(b, lq, nh, nl, p)
    g = jnp.asarray(rng.randn(b, lq, nh * ch).astype(np.float32)).astype(dtype)

    for name, parts, dck, drr, bq, dsub in (
            ("dvalue", ("dvalue",), False, True, 128, 1),
            ("dcoord_rr", ("dcoord",), False, True, 128, 1),
            # sub-blocked walks: hull(bq/sub) per slice, launch grid kept
            ("dcoord_rr_sub2", ("dcoord",), False, True, 128, 2),
            ("dcoord_rr_sub4", ("dcoord",), False, True, 128, 4),
            # bq256 measured WORSE (15.86 vs 10.34 ms: query hulls widen);
            # bq64 is illegal (out_spec minor dim must be 128-divisible)
            ("dcoord_rr_bq256", ("dcoord",), False, True, 256, 1),
            ("dcoord_xfirst", ("dcoord",), False, False, 128, 1),
            ("dcoord_packed", ("dcoord",), True, False, 128, 1),
            ("both", ("dvalue", "dcoord"), False, True, 128, 1)):
        def chain(v, l, a, gg, parts=parts, dck=dck, drr=drr, bq=bq,
                  dsub=dsub):
            s = jnp.zeros((), jnp.float32)
            for _ in range(CH):
                outs = _msda_bwd_fused(
                    v + s.astype(v.dtype) * 0, l, a, gg, levels, parts=parts,
                    dcoord_pack=dck, dcoord_rr=drr, bq=bq, dcoord_sub=dsub,
                )
                s = s + sum(jnp.sum(o.astype(jnp.float32)) for o in outs)
            return s
        fn = jax.jit(chain)
        np.asarray(fn(value, loc, attn, g))
        t0 = time.perf_counter()
        for _ in range(iters):
            np.asarray(fn(value, loc, attn, g))
        dt = (time.perf_counter() - t0) / iters * 1e3
        print(json.dumps({
            "case": f"{tag}_bwdpart_{name}",
            "ms_per_call": round((dt - 35.0) / CH, 2),
        }), flush=True)


def main():
    if "--parts" in sys.argv:
        bench_parts("train", 2, ((60, 108), (30, 54), (15, 27)), jnp.bfloat16)
        bench_parts("eval", 10, ((48, 80), (24, 40), (12, 20)), jnp.bfloat16)
        return
    bench("train", 2, ((60, 108), (30, 54), (15, 27)), jnp.bfloat16)
    bench("eval", 10, ((48, 80), (24, 40), (12, 20)), jnp.bfloat16)


if __name__ == "__main__":
    main()
