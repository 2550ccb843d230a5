"""Criterion stage attribution at bench train shapes, chained timings.

Breaks one criterion layer (match + _loss_masks, reference
``openvis/modeling/criterion.py:156-219`` / ``matcher.py:100-140``) into
its primitive stages — low-res pred sampling (Pallas), full-res target
gathers, top-k threshold, Hungarian, dense losses — each timed as CH
chained calls inside ONE jit (fenced on an in-graph scalar) so the ~35 ms
axon tunnel dispatch amortizes and sub-35 ms stages resolve.

    python tools/profile_criterion.py
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

CH = 5


def _chain(fn):
    """CH dependent calls of fn(i, salt) inside one jit, summed to a scalar."""

    def run(*args):
        s = jnp.zeros((), jnp.float32)
        for i in range(CH):
            s = s + fn(s * 0 + 1.0, *args)
        return s

    return jax.jit(run)


def _t(fn, *args, iters=4):
    r = fn(*args)
    np.asarray(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        np.asarray(fn(*args))
    return (time.perf_counter() - t0) / iters * 1e3 / CH


def main():
    from openvis_tpu.losses.criterion import (
        CriterionSettings, _loss_masks, match, match_costs, target_rows_t,
    )
    from openvis_tpu.ops.hungarian import batched_hungarian
    from openvis_tpu.ops.point_sample import (
        point_sample_shared_t, sort_points_by_y,
    )
    from openvis_tpu.ops.point_sample_pallas import point_sample_nhwc_pallas
    from openvis_tpu.structures import ClipTargets

    # bench train shapes, online (frame-folded) criterion view:
    # B=2 frames, N=40 targets, Q=100 queries, masks 120x216, tgts 480x864
    B, N, Q, H, W, TH, TW = 2, 40, 100, 120, 216, 480, 864
    K = 40
    s = CriterionSettings(num_classes=K)
    ns = int(s.num_points * s.oversample_ratio)          # 37632
    nr = s.num_points - int(s.importance_sample_ratio * s.num_points)
    pp_loss = ns + nr                                    # 40768
    pp_match = s.num_points                              # 12544

    rng = np.random.RandomState(0)
    pred = jnp.asarray(rng.randn(B, Q, 1, H, W).astype(np.float32))
    logits = jnp.asarray(rng.randn(B, Q, K + 1).astype(np.float32))
    tmasks = jnp.asarray(
        (rng.rand(B, N, 1, TH, TW) > 0.9).astype(np.float32)
    )
    targets = ClipTargets(
        labels=jnp.asarray(rng.randint(0, K, (B, N)), jnp.int32),
        masks=tmasks,
        valid=jnp.ones((B, N), bool),
        frame_valid=jnp.ones((B, N, 1), bool),
    )
    tgt_t = target_rows_t(targets)                       # (B, TH*TW, N)
    key = jax.random.PRNGKey(0)
    pts_l = sort_points_by_y(
        jax.random.uniform(key, (B, pp_loss, 2), dtype=jnp.float32)
    )
    pts_m = sort_points_by_y(
        jax.random.uniform(key, (B, pp_match, 2), dtype=jnp.float32)
    )
    rows_loss = pred[:, :N].reshape(B, N, H, W)          # matched rows stand-in
    maps_loss = jnp.swapaxes(rows_loss.reshape(B, N, H, W), 1, 3)
    cost = jnp.asarray(rng.randn(B, N, Q).astype(np.float32))
    cl = jnp.asarray(rng.randn(B, N, pp_loss).astype(np.float32))

    out = {}

    def emit(name, v):
        out[name] = v
        print(json.dumps({"stage": name, "ms": round(float(v), 2)}),
              flush=True)

    # --- low-res pred sampling, loss points (Pallas windowed tent-matmul)
    nhwc_loss = jnp.transpose(rows_loss, (0, 2, 3, 1))   # (B, H, W, N)
    emit("sample_pred_loss40768", _t(_chain(
        lambda z, v, c: jnp.sum(point_sample_nhwc_pallas(v * z, c))
    ), nhwc_loss, pts_l))

    # --- low-res pred sampling, matcher points (Q rows)
    nhwc_match = jnp.transpose(
        pred.reshape(B, Q, H, W), (0, 2, 3, 1)
    )                                                    # (B, H, W, Q)
    emit("sample_pred_match12544_Qrows", _t(_chain(
        lambda z, v, c: jnp.sum(point_sample_nhwc_pallas(v * z, c))
    ), nhwc_match, pts_m))

    # --- full-res target gathers (row-gather composition)
    def tgt_sample(z, t, c):
        # z folds into the coords (x1.0, exact) — folding into the table
        # would re-materialize the full (B, TH*TW, N) array per chain link
        r = jax.vmap(lambda tt, cc: point_sample_shared_t(tt, TH, TW, cc))(
            t, c * z
        )
        return jnp.sum(r)

    emit("gather_tgt_loss40768", _t(_chain(tgt_sample), tgt_t, pts_l))
    emit("gather_tgt_match12544", _t(_chain(tgt_sample), tgt_t, pts_m))

    # --- corner-packed target gathers (ONE descriptor per point)
    from openvis_tpu.ops.point_sample import (
        corner_pack_rows_t, sample_maps_packed,
    )

    tgt_pk = corner_pack_rows_t(tgt_t, TH, TW)           # (B, TH*TW, 4N)
    # z folds into the COORDS here (not the 4x table) so the chained calls
    # re-gather without re-materializing a 0.5 GB table per link
    emit("gather_tgt_packed_loss40768", _t(_chain(
        lambda z, t, c: jnp.sum(sample_maps_packed(t, TH, TW, c * z))
    ), tgt_pk, pts_l))
    emit("gather_tgt_packed_match12544", _t(_chain(
        lambda z, t, c: jnp.sum(sample_maps_packed(t, TH, TW, c * z))
    ), tgt_pk, pts_m))

    # --- BIT-packed target gathers (one lane-tile row per point; binary
    # masks, r5) — the criterion's current default packed layout
    from openvis_tpu.ops.point_sample import (
        bit_pack_rows_t, sample_maps_packed_bits,
    )

    nrow = tgt_t.shape[-1]
    tgt_bits = bit_pack_rows_t(tgt_t, TH, TW)            # (B, TH*TW, 4*W32)
    emit("gather_tgt_bits_loss40768", _t(_chain(
        lambda z, t, c: jnp.sum(
            sample_maps_packed_bits(t, nrow, TH, TW, c * z)
        )
    ), tgt_bits, pts_l))
    emit("gather_tgt_bits_match12544", _t(_chain(
        lambda z, t, c: jnp.sum(
            sample_maps_packed_bits(t, nrow, TH, TW, c * z)
        )
    ), tgt_bits, pts_m))

    # --- the per-layer point-pool sorts (3-array union sort + matcher sort)
    raw = jax.random.uniform(key, (B, pp_loss, 2), dtype=jnp.float32)
    mk = jnp.ones((B, pp_loss), jnp.float32)
    emit("sort_union_40768x3", _t(_chain(
        lambda z, r, m: jnp.sum(jax.lax.sort(
            (r[..., 1] * z, r[..., 0], m), dimension=-1, num_keys=1)[0])
    ), raw, mk))
    emit("sort_match_12544x2", _t(_chain(
        lambda z, r: jnp.sum(sort_points_by_y(r * z))
    ), raw[:, :pp_match]))

    # --- top-k threshold over candidates
    emit("topk9408_of_37632", _t(_chain(
        lambda z, x: jnp.sum(
            jax.lax.top_k(x * z, int(s.importance_sample_ratio
                                     * s.num_points))[0][..., -1]
        )
    ), cl[:, :, :ns].reshape(B * N // 2, 2, ns).reshape(B, N, ns)))

    # --- the criterion's actual threshold op (32-pass bit descent)
    from openvis_tpu.ops.select import kth_largest

    emit("kth_largest9408_of_37632", _t(_chain(
        lambda z, x: jnp.sum(kth_largest(
            x * z, int(s.importance_sample_ratio * s.num_points)))
    ), cl[:, :, :ns].reshape(B, N, ns)))

    # --- Hungarian
    emit("hungarian_2x40x100", _t(_chain(
        lambda z, c: jnp.sum(batched_hungarian(c * z).astype(jnp.float32))
    ), cost))

    # --- dense losses over the candidate pool (elementwise + reductions)
    def dense(z, lg, lb):
        lg = lg * z
        ce = jax.nn.softplus(lg) - lg * lb
        sig = jax.nn.sigmoid(lg)
        return (ce.sum() + (sig * lb).sum() + sig.sum() + lb.sum())

    emit("dense_losses_2x40x40768", _t(_chain(dense), cl, cl))

    # --- composed: match_costs / match / _loss_masks fwd and fwd+bwd
    emit("match_costs", _t(_chain(
        lambda z, lg, pm, tt: jnp.sum(match_costs(
            key, lg * z, pm, targets, s, tt))
    ), logits, pred, tgt_t))
    a = jax.jit(lambda lg, pm, tt: match(key, lg, pm, targets, s, tt))(
        logits, pred, tgt_t
    )
    nm = jnp.asarray(float(N * B))
    emit("loss_masks_fwd", _t(_chain(
        lambda z, pm, aa, tt: jnp.sum(jnp.stack(_loss_masks(
            key, pm * z, aa, targets, nm, s, tt)))
    ), pred, a, tgt_t))
    emit("loss_masks_fwd_bwd", _t(_chain(
        lambda z, pm, aa, tt: jnp.sum(jax.grad(
            lambda m: jnp.sum(jnp.stack(_loss_masks(
                key, m, aa, targets, nm, s, tt)))
        )(pm * z))
    ), pred, a, tgt_t))


if __name__ == "__main__":
    main()
