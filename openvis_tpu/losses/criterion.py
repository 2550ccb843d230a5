"""Set-prediction matcher + criterion (DETR/Mask2Former style), TPU-native.

Rebuilds the reference's ``VideoHungarianMatcher``
(``openvis/modeling/matcher.py:61-171``) and ``VideoSetCriterion`` /
``VideoSetTrackingCriterion`` (``openvis/modeling/criterion.py:91-305``) as
one fused, fixed-shape loss:

  * matching cost = ``w_class * (-p[target])`` + ``w_mask * point
    sigmoid-CE`` + ``w_dice * point dice`` on ``num_points`` shared random
    points per batch item (``matcher.py:110-136``);
  * assignment solved **on device** (``openvis_tpu.ops.hungarian``) instead
    of the reference's per-item CPU scipy round-trip;
  * losses: weighted CE over classes with ``eos_coef`` empty weight
    (``criterion.py:123-137``) + point-sampled sigmoid-CE / dice mask losses
    with 3x oversampled, 0.75-importance uncertainty sampling
    (``criterion.py:156-181``);
  * ``num_masks`` is ``psum``-ed over the data mesh axis
    (``criterion.py:220-224``'s all_reduce);
  * aux layers: predictions arrive stacked on a leading layer axis and the
    whole (match + loss) is ``lax.map``-ped over it, re-matching per layer
    like ``criterion.py:231-237``.  The tracking variant matches once on
    ``matcher_outputs`` and reuses the indices (``criterion.py:258-305``).

Targets are the padded ``ClipTargets`` structure: invalid instance slots get
constant matcher-cost rows (which provably don't perturb the optimum of the
valid rows) and zero loss weight.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from openvis_tpu.ops.hungarian import batched_hungarian
from openvis_tpu.ops.select import kth_largest
from openvis_tpu.ops.point_sample import (
    _PALLAS_MAX_HW,
    bit_pack_rows_t,
    sample_maps_packed_bits,
    sample_maps_shared,
    sample_maps_shared_t,
    sorted_uniform_points,
)
from openvis_tpu.structures import ClipTargets


def target_rows_t(
    targets: ClipTargets, dtype=jnp.float32, pack: bool = False
) -> jax.Array:
    """(B, TH*TW, N*T) pre-transposed target-mask rows for repeated shared
    point sampling — the (N*T, TH*TW) -> transpose is ~66 MB of traffic at
    full train resolution and the criterion samples targets once per decoder
    layer, so it is hoisted out of the per-layer loop.

    ``dtype`` is bf16 regardless of the sampling policy: 0/1 targets are
    EXACT in bf16 and the samplers' f32_policy path upcasts after the
    gather (bitwise equal to f32 storage), so the transpose + per-layer
    gather traffic halves for free.

    ``pack`` is an EXPLICIT caller decision (no hidden backend probe — an
    implicit jax.default_backend() switch here once inverted the layouts
    profile_criterion compared): True BIT-packs the 0/1 rows into a
    (B, TH*TW, 4*ceil(R/32)) uint32 corner table so each sampled point on
    the full-res gather path costs ONE gather of a single lane-tile row
    (640 B of bf16 corners -> 48 B of bits at R=80; the gather is
    tile-fetch-bound) at ~1/13 the bf16 table's HBM residency.  Exact:
    target masks are 0/1 by construction (bit_pack_rows_t).  Callers
    inside the criterion derive it via :func:`_pack_targets`."""
    b, n, t = targets.masks.shape[:3]
    th, tw = targets.masks.shape[-2:]
    flat = targets.masks.astype(dtype).reshape(b, n * t, th * tw)
    rows = jnp.swapaxes(flat, 1, 2)
    if pack and th * tw > _PALLAS_MAX_HW:
        # only the row-GATHER path (full-res targets) benefits: low-res
        # targets route through the Pallas tent-matmul sampler, which
        # expects the plain layout.  _sample_targets dispatches on dtype.
        rows = bit_pack_rows_t(rows, th, tw)
    return rows


def _pack_targets(s: "CriterionSettings", th: int, tw: int) -> bool:
    """Packing policy for the criterion's own target tables: gated by the
    settings flag (the escape hatch to the 4-gather composition), and only
    worthwhile on the TPU gather path."""
    return (
        s.packed_targets
        and th * tw > _PALLAS_MAX_HW
        and jax.default_backend() == "tpu"
    )


def _sample_targets(tgt_t, n_rows: int, th: int, tw: int, coords, f32p: bool):
    """Sample target rows at shared points from EITHER target layout:
    plain (B, TH*TW, R) rows, or the bit-packed uint32 corner table
    ``target_rows_t`` builds for the full-res gather path."""
    if tgt_t.dtype == jnp.uint32:
        return sample_maps_packed_bits(
            tgt_t, n_rows, th, tw, coords, f32_policy=f32p
        )
    return sample_maps_shared_t(tgt_t, th, tw, coords, f32_policy=f32p)


@dataclass(frozen=True)
class CriterionSettings:
    num_classes: int
    class_weight: float = 2.0
    mask_weight: float = 5.0
    dice_weight: float = 5.0
    eos_coef: float = 0.1
    num_points: int = 12544
    oversample_ratio: float = 3.0
    importance_sample_ratio: float = 0.75
    deep_supervision: bool = True
    use_class_loss: bool = True
    # Opt-in (criterion.bf16_masks): run point SAMPLING in bf16 instead of
    # upcasting the per-layer mask slice to f32.  Off by default — torch
    # autocast pins grid_sample to fp32, so f32 sampling of bf16-valued
    # maps is the reference-parity AMP behavior (and exact: bf16->f32 is
    # lossless, so feeding set_criterion a bf16 stack changes nothing but
    # the HBM traffic of the layer scan).
    bf16_sampling: bool = False
    # Corner-pack full-res target tables on the TPU gather path (ONE row
    # gather per sampled point instead of four, ~21% on the gather stages)
    # at 4x the table's HBM residency.  Default on; memory-tight configs
    # can disable (criterion.packed_targets) to fall back to 4 gathers.
    packed_targets: bool = True


def _softplus(x):
    return jax.nn.softplus(x)


def match_costs(
    rng: jax.Array,
    pred_logits: Optional[jax.Array],  # (B, Q, C+1)
    pred_masks: jax.Array,             # (B, Q, T, H, W)
    targets: ClipTargets,
    s: CriterionSettings,
    tgt_t: Optional[jax.Array] = None,  # (B, TH*TW, N*T) from target_rows_t
) -> jax.Array:
    """(B, N, Q) cost matrix (rows = targets), constant rows for invalid."""
    b, q, t, h, w = pred_masks.shape
    n = targets.labels.shape[1]
    p = s.num_points
    th, tw = targets.masks.shape[-2:]

    # shared random points per batch item (matcher.py:110), y-SORTED so the
    # TPU tent-matmul sampler sees banded blocks (set semantics — every
    # reduction below is order-independent, and pred/target stay aligned
    # because both sample the SAME sorted array).  Generated directly in
    # sorted order (order statistics, no lax.sort — see
    # ops/point_sample.sorted_uniform_points).
    coords = sorted_uniform_points(rng, (b,), p)

    # sampling runs under the f32 grid_sample policy (torch autocast pins
    # grid_sample to fp32) unless criterion.bf16_masks opts into bf16
    # sampling.  A bf16 mask ARRAY is kept bf16 either way: its values are
    # f32-exact, so the Pallas sampler's 2-pass split dot (f32_policy)
    # returns bitwise the same samples as upcasting first, at 2/3 the MXU
    # cost and half the map traffic.
    f32p = not s.bf16_sampling
    if f32p and pred_masks.dtype != jnp.bfloat16:
        pred_masks = pred_masks.astype(jnp.float32)
    elif not f32p:
        pred_masks = pred_masks.astype(jnp.bfloat16)
    pm = pred_masks.reshape(b, q * t, h, w)
    out_pts = sample_maps_shared(pm, coords, f32_policy=f32p).astype(
        jnp.float32
    )
    if tgt_t is None:
        tgt_t = target_rows_t(targets, jnp.bfloat16, pack=_pack_targets(s, th, tw))
    tgt_pts = _sample_targets(
        tgt_t, n * t, th, tw, coords, f32p
    ).astype(jnp.float32)
    out_pts = out_pts.reshape(b, q, t * p)
    tgt_pts = tgt_pts.reshape(b, n, t * p)

    # batch sigmoid CE (matcher.py:37-58)
    pos = _softplus(-out_pts)   # BCE target=1
    neg = _softplus(out_pts)    # BCE target=0
    cost_mask = (
        jnp.einsum("bqp,bnp->bqn", pos, tgt_pts)
        + jnp.einsum("bqp,bnp->bqn", neg, 1.0 - tgt_pts)
    ) / (t * p)

    # batch dice (matcher.py:16-31)
    sig = jax.nn.sigmoid(out_pts)
    numer = 2.0 * jnp.einsum("bqp,bnp->bqn", sig, tgt_pts)
    denom = sig.sum(-1)[:, :, None] + tgt_pts.sum(-1)[:, None, :]
    cost_dice = 1.0 - (numer + 1.0) / (denom + 1.0)

    cost = s.mask_weight * cost_mask + s.dice_weight * cost_dice
    if pred_logits is not None and s.use_class_loss:
        prob = jax.nn.softmax(pred_logits.astype(jnp.float32), axis=-1)
        labels = jnp.clip(targets.labels, 0, prob.shape[-1] - 1)
        cost_class = -jnp.take_along_axis(
            prob, labels[:, None, :].repeat(q, axis=1), axis=-1
        )  # (B, Q, N)
        cost = cost + s.class_weight * cost_class

    cost = jnp.transpose(cost, (0, 2, 1))  # (B, N, Q)
    # constant rows for invalid targets: doesn't affect valid rows' optimum
    return jnp.where(targets.valid[:, :, None], cost, 0.0)


def match(
    rng: jax.Array,
    pred_logits: Optional[jax.Array],
    pred_masks: jax.Array,
    targets: ClipTargets,
    s: CriterionSettings,
    tgt_t: Optional[jax.Array] = None,
) -> jax.Array:
    """Returns assignment (B, N) int32: query index per target slot."""
    cost = match_costs(rng, pred_logits, pred_masks, targets, s, tgt_t)
    return jax.lax.stop_gradient(batched_hungarian(cost))


def tracking_match(
    rng: jax.Array,
    pred_logits: Optional[jax.Array],  # (B, T, Q, C+1) per-frame logits
    pred_masks: jax.Array,             # (B, Q, T, H, W)
    targets: ClipTargets,
    s: CriterionSettings,
) -> jax.Array:
    """``VideoHungarianTrackingMatcher`` (matcher.py:174-276): each target is
    matched by Hungarian assignment in its FIRST-appearance frame only, with
    queries already claimed by earlier frames excluded (cost 1e6); the
    assignment then locks across all frames.  Returns (B, N) query per slot.

    Fixed-shape formulation: per-frame costs are computed for every frame in
    one batched pass, then a ``lax.scan`` over T commits the rows whose
    first-appearance frame is the current one.
    """
    b, q, t, h, w = pred_masks.shape
    n = targets.labels.shape[1]

    # first appearance frame per slot (frame_valid (B, N, T))
    fv = targets.frame_valid
    first = jnp.argmax(fv, axis=-1).astype(jnp.int32)            # (B, N)

    # per-frame costs: fold T into batch and reuse the clip matcher on
    # single-frame masks/targets
    pm = jnp.swapaxes(pred_masks, 1, 2).reshape(b * t, q, 1, h, w)
    th, tw = targets.masks.shape[-2:]
    tm = jnp.swapaxes(targets.masks, 1, 2).reshape(b * t, n, 1, th, tw)
    tgt_bt = ClipTargets(
        labels=jnp.broadcast_to(targets.labels[:, None], (b, t, n)).reshape(b * t, n),
        masks=tm,
        valid=jnp.broadcast_to(targets.valid[:, None], (b, t, n)).reshape(b * t, n),
        frame_valid=jnp.ones((b * t, n, 1), bool),
    )
    logits_bt = (
        pred_logits.reshape(b * t, q, -1) if pred_logits is not None else None
    )
    cost_bt = match_costs(rng, logits_bt, pm, tgt_bt, s)          # (B*T, N, Q)
    cost_ft = cost_bt.reshape(b, t, n, q).transpose(1, 0, 2, 3)   # (T, B, N, Q)

    def step(carry, xs):
        assignment, used = carry              # (B, N) int32, (B, Q) f32
        f, cost_f = xs                        # scalar, (B, N, Q)
        commit = jnp.logical_and(targets.valid, first == f)       # (B, N)
        cost_f = cost_f + used[:, None, :] * 1e6
        # non-committing rows -> constant (don't perturb the optimum)
        cost_f = jnp.where(commit[:, :, None], cost_f, 0.0)
        cols = batched_hungarian(cost_f)                          # (B, N)
        assignment = jnp.where(commit, cols, assignment)
        hit = jax.nn.one_hot(
            jnp.where(commit, cols, q), q + 1, dtype=used.dtype
        )[..., :q].sum(axis=1)
        used = jnp.minimum(used + hit, 1.0)
        return (assignment, used), None

    init = (jnp.zeros((b, n), jnp.int32), jnp.zeros((b, q), jnp.float32))
    (assignment, _), _ = jax.lax.scan(
        step, init, (jnp.arange(t), cost_ft)
    )
    return jax.lax.stop_gradient(assignment)


def _loss_labels(
    pred_logits: jax.Array,    # (B, Q, C+1)
    assignment: jax.Array,     # (B, N)
    targets: ClipTargets,
    s: CriterionSettings,
) -> jax.Array:
    b, q, c1 = pred_logits.shape
    no_object = c1 - 1
    tc = jnp.full((b, q), no_object, jnp.int32)
    upd = jnp.where(targets.valid, assignment, q)  # OOB -> dropped
    tc = tc.at[jnp.arange(b)[:, None], upd].set(targets.labels, mode="drop")
    logp = jax.nn.log_softmax(pred_logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, tc[..., None], axis=-1)[..., 0]
    w = jnp.where(tc == no_object, s.eos_coef, 1.0)
    return (w * nll).sum() / w.sum()


def _loss_masks(
    rng: jax.Array,
    pred_masks: jax.Array,     # (B, Q, T, H, W)
    assignment: jax.Array,     # (B, N)
    targets: ClipTargets,
    num_masks: jax.Array,
    s: CriterionSettings,
    tgt_t: Optional[jax.Array] = None,  # (B, TH*TW, N*T) from target_rows_t
) -> Tuple[jax.Array, jax.Array]:
    """Point-sampled mask losses with uncertainty importance sampling
    (criterion.py:156-181).

    TPU delta: the 3x-oversampled candidate pool is SHARED across the rows
    of a batch item (the per-row top-k uncertainty selection stays per-row,
    and selected logits reuse the candidate values — point_sample at the
    same coordinates returns the same value).  Shared candidates make every
    gather row-structured; the reference draws per-row candidates, a
    statistically equivalent but ~10x slower access pattern on TPU.
    """
    b, q, t, h, w = pred_masks.shape
    n = targets.labels.shape[1]
    # f32 grid_sample policy via f32_policy (bf16 maps stay bf16 — the
    # sampler's split dot is bitwise equal to upcasting; see match_costs)
    f32p = not s.bf16_sampling
    if f32p and pred_masks.dtype != jnp.bfloat16:
        pred_masks = pred_masks.astype(jnp.float32)
    elif not f32p:
        pred_masks = pred_masks.astype(jnp.bfloat16)
    src = jnp.take_along_axis(
        pred_masks, assignment[:, :, None, None, None], axis=1
    )  # (B, N, T, H, W)
    rows = src.reshape(b, n * t, h, w)  # sampled in the masks' own dtype
    th, tw = targets.masks.shape[-2:]
    if tgt_t is None:
        tgt_t = target_rows_t(targets, jnp.bfloat16, pack=_pack_targets(s, th, tw))
    row_w = jnp.broadcast_to(targets.valid[:, :, None], (b, n, t)).reshape(-1)
    row_w = row_w.astype(jnp.float32)

    def sample_tgt(c):
        return jax.lax.stop_gradient(
            _sample_targets(tgt_t, n * t, th, tw, c, f32p)
        )

    n_sampled = int(s.num_points * s.oversample_ratio)
    n_uncertain = int(s.importance_sample_ratio * s.num_points)
    n_random = s.num_points - n_uncertain
    k1, k2 = jax.random.split(rng)
    # y-sorted point SETS (see match_costs), generated directly in sorted
    # order (order statistics — no lax.sort; the union sort of the previous
    # formulation measured ~5 ms/layer).  The candidate and random draws
    # stay two independent uniform pools (reference semantics,
    # criterion.py:156-181); each is sampled in its own sorted pass — the
    # random pool is small (num_points/4), so the second sampler call costs
    # far less than sorting the 40k-point union did.
    cand = sorted_uniform_points(k1, (b,), n_sampled)
    cand_logits = sample_maps_shared(rows, cand, f32_policy=f32p).astype(
        jnp.float32
    )                                                            # (B, NT, S)
    cand_labels = sample_tgt(cand).astype(jnp.float32)
    # per-row top-k most uncertain candidates (uncertainty = -|logit|),
    # selected WITHOUT reordering: top_k on the (stop-gradient) key alone
    # yields the k-th threshold, and the losses run densely over ALL
    # candidates weighted by the selection mask.  No payload sort, no
    # per-row point gathers forward, and — crucially — no serialized
    # scatter in the backward (both the gather and sort formulations paid
    # their cost again, transposed, in the VJP).  Identical point set as
    # top_k barring exact |logit| ties at the threshold: measure-zero for
    # f32 logits from random continuous points, but PLAUSIBLE when
    # pred_masks come from a bf16 forward (quantized values) — ties then
    # admit a few extra points beyond num_points; the mean divides by the
    # true selected count, so losses stay well-defined either way.
    key_unc = jax.lax.stop_gradient(-jnp.abs(cand_logits))       # (B, NT, S)
    if n_uncertain > 0:
        # exact k-th value via 32-pass bit descent (ops/select.py): same
        # threshold as lax.top_k's k-th output without sorting k payload
        # columns (top_k measured 2.7 ms/layer here)
        kth = kth_largest(key_unc, n_uncertain)[..., None]
        sel = (key_unc >= kth).astype(jnp.float32)
    else:
        sel = jnp.zeros_like(key_unc)
    n_sel = sel.sum(-1)                                          # (B, NT)

    def losses_over(logits, labels, weight):
        ce = _softplus(logits) - logits * labels
        sig = jax.nn.sigmoid(logits)
        return (
            (ce * weight).sum(-1),
            (sig * labels * weight).sum(-1),
            (sig * weight).sum(-1),
            (labels * weight).sum(-1),
        )

    ce_s, num_s, sig_s, lab_s = losses_over(cand_logits, cand_labels, sel)
    if n_random > 0:
        rnd = sorted_uniform_points(k2, (b,), n_random)
        rnd_logits = sample_maps_shared(rows, rnd, f32_policy=f32p).astype(
            jnp.float32
        )                                                        # (B, NT, R)
        rnd_labels = sample_tgt(rnd).astype(jnp.float32)
        one_w = jnp.ones((), jnp.float32)
        ce_r, num_r, sig_r, lab_r = losses_over(
            rnd_logits, rnd_labels, one_w
        )
        ce_s = ce_s + ce_r
        num_s = num_s + num_r
        sig_s = sig_s + sig_r
        lab_s = lab_s + lab_r
    total_pts = n_sel + n_random                                 # (B, NT)

    # sigmoid CE (criterion.py:51-69): mean over the selected point set
    loss_mask = ((ce_s / total_pts).reshape(-1) * row_w).sum() / num_masks

    # dice (criterion.py:26-45)
    dice = 1.0 - (2.0 * num_s + 1.0) / (sig_s + lab_s + 1.0)
    loss_dice = (dice.reshape(-1) * row_w).sum() / num_masks
    return loss_mask, loss_dice


def num_masks_normalizer(
    targets: ClipTargets, axis_name: Optional[str] = None
) -> jax.Array:
    """Average valid-instance count across the data mesh axis, clamped >= 1
    (criterion.py:220-224)."""
    nm = targets.valid.astype(jnp.float32).sum()
    if axis_name is not None:
        nm = jax.lax.pmean(nm, axis_name)
    return jnp.maximum(nm, 1.0)


def set_criterion(
    rng: jax.Array,
    pred_logits_all: Optional[jax.Array],  # (L, B, Q, C+1) or None
    pred_masks_all: jax.Array,             # (L, B, Q, T, H, W)
    targets: ClipTargets,
    s: CriterionSettings,
    axis_name: Optional[str] = None,
    fixed_assignment: Optional[jax.Array] = None,  # (B, N) reuse for all layers
) -> Tuple[Dict[str, jax.Array], jax.Array]:
    """Returns ``(losses, last_assignment)``.

    losses: {"loss_ce": (L,), "loss_mask": (L,), "loss_dice": (L,),
             "total": scalar} — layer L-1 is the final decoder output.
    """
    num_layers = pred_masks_all.shape[0]
    b, n = targets.labels.shape
    nm = num_masks_normalizer(targets, axis_name)
    rngs = jax.random.split(rng, num_layers * 2).reshape(num_layers, 2, -1)

    # Sampling dtype: f32 unless bf16 sampling is opted in.  A bf16 mask
    # STACK is still welcome — the scan slices it layer-by-layer (half the
    # carried HBM traffic) and the samplers apply the f32 policy to the
    # bf16 slice exactly (split-dot path; see match_costs).
    cdt = jnp.bfloat16 if s.bf16_sampling else jnp.float32

    # hoisted: one transpose for all layers, bf16 rows under either policy
    # (binary targets are bf16-exact; see target_rows_t)
    th, tw = targets.masks.shape[-2:]
    tgt_t = target_rows_t(targets, jnp.bfloat16, pack=_pack_targets(s, th, tw))

    # lax.scan over the layer axis: one traced (match + loss) instance
    # instead of L unrolled copies.  Round-3 scheduling experiments (v5e,
    # train shapes): full layer vmap 1224 ms/step (all layers' ~240 MB
    # sampling intermediates + VJP residuals resident at once), chunked
    # lax.map(batch_size=5) 813, per-layer scan 759 — the scan's layer-at-
    # a-time residency wins; the real per-layer cost is the point sampling
    # itself (see ops/point_sample_pallas.py).
    def layer_loss(args):
        logits, masks, keys = args
        if masks.dtype != jnp.bfloat16:
            # f32 stacks adopt the sampling dtype; bf16 AMP stacks stay
            # bf16 — match/_loss_masks apply the f32 grid_sample policy
            # through the sampler's exact split-dot path instead of an
            # upfront upcast (halves the per-layer slice traffic too)
            masks = masks.astype(cdt)
        if logits is not None:
            logits = logits.astype(jnp.float32)
        if fixed_assignment is None:
            a = match(keys[0], logits, masks, targets, s, tgt_t)
        else:
            a = fixed_assignment
        lm, ld = _loss_masks(keys[1], masks, a, targets, nm, s, tgt_t)
        if logits is not None and s.use_class_loss:
            lc = _loss_labels(logits, a, targets, s)
        else:
            lc = jnp.zeros(())
        return (lc, lm, ld), a

    def scan_body(_, xs):
        if pred_logits_all is None:
            masks, keys = xs
            (lc, lm, ld), a = layer_loss((None, masks, keys))
        else:
            logits, masks, keys = xs
            (lc, lm, ld), a = layer_loss((logits, masks, keys))
        return None, ((lc, lm, ld), a)

    xs = (
        (pred_masks_all, rngs)
        if pred_logits_all is None
        else (pred_logits_all, pred_masks_all, rngs)
    )
    _, ((lcs, lms, lds), assigns) = jax.lax.scan(scan_body, None, xs)
    last_a = assigns[-1]

    losses = {
        "loss_ce": lcs,
        "loss_mask": lms,
        "loss_dice": lds,
    }
    total = (
        s.class_weight * losses["loss_ce"].sum()
        + s.mask_weight * losses["loss_mask"].sum()
        + s.dice_weight * losses["loss_dice"].sum()
    )
    if not s.deep_supervision:
        total = (
            s.class_weight * losses["loss_ce"][-1]
            + s.mask_weight * losses["loss_mask"][-1]
            + s.dice_weight * losses["loss_dice"][-1]
        )
    losses["total"] = total
    return losses, last_a
