"""Matcher + criterion: point sampling parity vs torch grid_sample, loss
sanity (perfect predictions -> near-zero mask losses), padding invariance."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openvis_tpu.losses.criterion import (
    CriterionSettings,
    match,
    set_criterion,
)
from openvis_tpu.ops.point_sample import point_sample
from openvis_tpu.structures import ClipTargets


def _targets(b=2, n=5, t=2, h=64, w=96, n_valid=3, num_classes=7, seed=0):
    # draw a fixed 16-slot superset then slice, so different paddings n share
    # identical valid instances
    rng = np.random.RandomState(seed)
    labels = rng.randint(0, num_classes, (b, 16)).astype(np.int32)[:, :n]
    masks = np.zeros((b, n, t, h, w), np.float32)
    for bi in range(b):
        for ni in range(n_valid):
            y0, x0 = rng.randint(0, h - 16), rng.randint(0, w - 16)
            masks[bi, ni, :, y0 : y0 + 16, x0 : x0 + 16] = 1.0
    valid = np.zeros((b, n), bool)
    valid[:, :n_valid] = True
    return ClipTargets(
        labels=jnp.asarray(labels),
        masks=jnp.asarray(masks),
        valid=jnp.asarray(valid),
        frame_valid=jnp.asarray(np.ones((b, n, t), bool)),
    )


def test_point_sample_matches_torch_grid_sample():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.RandomState(0)
    maps = rng.randn(3, 17, 23).astype(np.float32)
    pts = rng.rand(3, 50, 2).astype(np.float32)

    ours = np.asarray(point_sample(jnp.asarray(maps), jnp.asarray(pts)))

    tm = torch.from_numpy(maps)[:, None]           # (3,1,H,W)
    grid = torch.from_numpy(pts)[:, None] * 2 - 1  # (3,1,50,2) in [-1,1]
    ref = F.grid_sample(tm, grid, align_corners=False, mode="bilinear")
    ref = ref[:, 0, 0].numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_perfect_prediction_low_loss():
    tg = _targets()
    b, n, t, h, w = tg.masks.shape
    q, c = 10, 7
    # predictions: queries 0..n-1 reproduce GT masks with logits +-10
    pred_masks = np.full((b, q, t, h, w), -10.0, np.float32)
    pred_masks[:, :n] = np.where(np.asarray(tg.masks) > 0.5, 10.0, -10.0)
    pred_logits = np.full((b, q, c + 1), 0.0, np.float32)
    n_valid = 3
    for bi in range(b):
        for ni in range(n_valid):
            pred_logits[bi, ni, np.asarray(tg.labels)[bi, ni]] = 8.0
        pred_logits[bi, n_valid:, c] = 8.0  # unmatched queries -> no-object

    # pure random sampling: with importance sampling the points concentrate
    # on mask boundaries, where even exact masks interpolate through logit 0.
    s = CriterionSettings(
        num_classes=c, num_points=512, importance_sample_ratio=0.0
    )
    losses, a = set_criterion(
        jax.random.PRNGKey(0),
        jnp.asarray(pred_logits)[None],
        jnp.asarray(pred_masks)[None],
        tg,
        s,
    )
    a = np.asarray(a)
    # matched queries must be the GT-reproducing ones for valid slots
    for bi in range(b):
        for ni in range(3):
            assert a[bi, ni] == ni, (bi, ni, a[bi])
    assert float(losses["loss_mask"][0]) < 0.05
    # dice over ~20 in-mask points per row is noisy even for exact masks
    assert float(losses["loss_dice"][0]) < 0.15
    assert float(losses["loss_ce"][0]) < 0.01


def test_invalid_slot_count_invariance():
    """Adding more padded (invalid) slots must not change the losses."""
    tg5 = _targets(n=5)
    tg9 = _targets(n=9)  # same 3 valid instances, more padding
    b, n, t, h, w = tg5.masks.shape
    q, c = 12, 7
    rng = np.random.RandomState(3)
    pred_masks = jnp.asarray(rng.randn(b, q, t, h, w).astype(np.float32))
    pred_logits = jnp.asarray(rng.randn(b, q, c + 1).astype(np.float32))
    s = CriterionSettings(num_classes=c, num_points=256)
    from scipy.optimize import linear_sum_assignment

    from openvis_tpu.losses.criterion import match, match_costs

    key = jax.random.PRNGKey(1)
    a5 = np.asarray(match(key, pred_logits, pred_masks, tg5, s))
    a9 = np.asarray(match(key, pred_logits, pred_masks, tg9, s))
    # constant padding rows must not perturb the *optimality* of the valid
    # rows' assignment (ties may resolve differently): check both paddings
    # achieve the scipy-optimal cost on the valid sub-matrix (same random
    # points for both since the point draw depends only on (key, B, P))
    cost = np.asarray(match_costs(key, pred_logits, pred_masks, tg5, s))
    for a in (a5, a9):
        for b in range(cost.shape[0]):
            sub = cost[b, :3]
            ri, ci = linear_sum_assignment(sub)
            ours = sub[np.arange(3), a[b, :3]].sum()
            assert len(set(a[b, :3].tolist())) == 3
            np.testing.assert_allclose(ours, sub[ri, ci].sum(), rtol=1e-4)


def test_grads_flow():
    tg = _targets()
    b, n, t, h, w = tg.masks.shape
    q, c = 10, 7
    rng = np.random.RandomState(4)
    pm = jnp.asarray(rng.randn(b, q, t, h, w).astype(np.float32))
    pl = jnp.asarray(rng.randn(b, q, c + 1).astype(np.float32))
    s = CriterionSettings(num_classes=c, num_points=128)

    def f(pm, pl):
        losses, _ = set_criterion(jax.random.PRNGKey(0), pl[None], pm[None], tg, s)
        return losses["total"]

    gm, gl = jax.grad(f, argnums=(0, 1))(pm, pl)
    assert np.isfinite(np.asarray(gm)).all()
    assert np.isfinite(np.asarray(gl)).all()
    assert float(jnp.abs(gm).sum()) > 0
    assert float(jnp.abs(gl).sum()) > 0


def test_tracking_match_first_appearance_lock():
    from openvis_tpu.losses.criterion import tracking_match

    b, n, t, h, w, q, c = 1, 4, 3, 32, 48, 6, 5
    rng = np.random.RandomState(0)
    masks = np.zeros((b, n, t, h, w), np.float32)
    # slot 0 appears frame 0 (box A); slot 1 appears frame 1 (box B)
    masks[0, 0, :, 2:12, 2:12] = 1.0
    masks[0, 1, 1:, 18:30, 20:40] = 1.0
    fv = np.zeros((b, n, t), bool)
    fv[0, 0, :] = True
    fv[0, 1, 1:] = True
    valid = np.zeros((b, n), bool)
    valid[0, :2] = True
    tg = ClipTargets(
        labels=jnp.asarray(rng.randint(0, c, (b, n)).astype(np.int32)),
        masks=jnp.asarray(masks), valid=jnp.asarray(valid),
        frame_valid=jnp.asarray(fv),
    )
    # query 3 reproduces slot 0; query 3 ALSO best for slot 1, query 5 second
    pm = np.full((b, q, t, h, w), -10.0, np.float32)
    pm[0, 3] = np.where(masks[0, 0] > 0.5, 10.0, -10.0)
    pm[0, 3, 1:, 18:30, 20:40] = 10.0  # query 3 also covers slot 1's box
    pm[0, 5] = np.where(masks[0, 1] > 0.5, 8.0, -8.0)
    pl = np.zeros((b, t, q, c + 1), np.float32)

    s = CriterionSettings(num_classes=c, num_points=512, class_weight=0.0)
    a = np.asarray(tracking_match(
        jax.random.PRNGKey(0), jnp.asarray(pl), jnp.asarray(pm), tg, s
    ))
    assert a[0, 0] == 3            # slot 0 claims query 3 in frame 0
    assert a[0, 1] == 5            # slot 1 must take query 5 (3 is used)


def test_bf16_stack_exactly_matches_f32_upcast():
    """Default policy: a bf16 mask STACK fed to set_criterion must produce
    BITWISE the same losses as pre-upcasting that stack to f32 — the scan
    keeps the stack bf16 in HBM but samples in f32 (the torch-autocast
    grid_sample policy), and bf16->f32 is lossless."""
    tg = _targets()
    b, n, t, h, w = tg.masks.shape
    q, c = 10, 7
    rng = np.random.RandomState(3)
    pred_masks = rng.randn(b, q, t, h, w).astype(np.float32) * 3.0
    pred_logits = rng.randn(b, q, c + 1).astype(np.float32)
    s = CriterionSettings(num_classes=c, num_points=512)
    stack16 = jnp.asarray(pred_masks)[None].astype(jnp.bfloat16)
    l32, _ = set_criterion(
        jax.random.PRNGKey(0), jnp.asarray(pred_logits)[None],
        stack16.astype(jnp.float32), targets=tg, s=s,
    )
    l16, _ = set_criterion(
        jax.random.PRNGKey(0), jnp.asarray(pred_logits)[None],
        stack16, targets=tg, s=s,
    )
    for k in ("loss_ce", "loss_mask", "loss_dice", "total"):
        np.testing.assert_array_equal(
            np.asarray(l16[k]), np.asarray(l32[k]), err_msg=k
        )


def test_bf16_sampling_optin_close_to_f32():
    """Opt-in bf16_sampling: bf16 point sampling must track the f32
    criterion within bf16 tolerance (values); assignment may differ only
    through near-tied costs, so compare losses, not indices."""
    tg = _targets()
    b, n, t, h, w = tg.masks.shape
    q, c = 10, 7
    rng = np.random.RandomState(3)
    pred_masks = rng.randn(b, q, t, h, w).astype(np.float32) * 3.0
    pred_logits = rng.randn(b, q, c + 1).astype(np.float32)
    l32, _ = set_criterion(
        jax.random.PRNGKey(0), jnp.asarray(pred_logits)[None],
        jnp.asarray(pred_masks)[None], targets=tg,
        s=CriterionSettings(num_classes=c, num_points=512),
    )
    l16, _ = set_criterion(
        jax.random.PRNGKey(0), jnp.asarray(pred_logits)[None],
        jnp.asarray(pred_masks)[None].astype(jnp.bfloat16), targets=tg,
        s=CriterionSettings(num_classes=c, num_points=512,
                            bf16_sampling=True),
    )
    for k in ("loss_ce", "loss_mask", "loss_dice"):
        np.testing.assert_allclose(
            np.asarray(l16[k]), np.asarray(l32[k]), rtol=0.05, atol=0.02,
            err_msg=k,
        )
    assert l16["total"].dtype == jnp.float32


def test_shared_t_f32_policy_bitwise_vs_f32_storage():
    """point_sample_shared_t(f32_policy=True) on bf16-EXACT rows must be
    BITWISE equal to gathering an upcast-f32 matrix: the gather moves bf16
    bytes, the upcast happens after (binary targets are bf16-exact)."""
    from openvis_tpu.ops.point_sample import point_sample_shared_t

    rng = np.random.RandomState(5)
    h, w, r, p = 37, 53, 9, 400
    rows = (rng.rand(h * w, r) > 0.5).astype(np.float32)
    coords = jnp.asarray((rng.rand(p, 2) * 1.2 - 0.1).astype(np.float32))
    ft16 = jnp.asarray(rows).astype(jnp.bfloat16)
    got = np.asarray(point_sample_shared_t(ft16, h, w, coords,
                                           f32_policy=True))
    ref = np.asarray(point_sample_shared_t(ft16.astype(jnp.float32), h, w,
                                           coords))
    np.testing.assert_array_equal(got, ref)


def test_corner_packed_sampling_bitwise_vs_gather_composition():
    """corner_pack_rows_t + point_sample_shared_t4 (the full-res TPU target
    path) must be BITWISE equal to the 4-gather composition, including every
    boundary regime (floor coords of -1, last row/column, exact corners)."""
    from openvis_tpu.ops.point_sample import (
        corner_pack_rows_t,
        point_sample_shared_t,
        point_sample_shared_t4,
    )

    rng = np.random.RandomState(0)
    b, h, w, r, p = 2, 19, 23, 6, 400
    flat_t = jnp.asarray(rng.randn(b, h * w, r).astype(np.float32))
    pts = rng.rand(b, p, 2).astype(np.float32)
    # force boundary coverage: exact 0/1 corners and near-edge strips
    pts[:, :4] = [[0.0, 0.0], [1.0, 1.0], [0.0, 1.0], [1.0, 0.0]]
    pts[:, 4:40, 0] *= 0.03            # x floor -1 band
    pts[:, 40:80, 1] *= 0.03           # y floor -1 band
    pts[:, 80:120, 0] = 1.0 - 0.03 * pts[:, 80:120, 0]   # last column
    pts[:, 120:160, 1] = 1.0 - 0.03 * pts[:, 120:160, 1]  # last row
    pts = jnp.asarray(pts)

    for f32p, dt in ((False, jnp.float32), (True, jnp.bfloat16)):
        tbl = corner_pack_rows_t(flat_t.astype(dt), h, w)
        got = jax.vmap(
            lambda t, c: point_sample_shared_t4(t, h, w, c, f32_policy=f32p)
        )(tbl, pts)
        want = jax.vmap(
            lambda t, c: point_sample_shared_t(t, h, w, c, f32_policy=f32p)
        )(flat_t.astype(dt), pts)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_bit_packed_sampling_bitwise_vs_gather_composition():
    """bit_pack_rows_t + sample_maps_packed_bits (the full-res BINARY
    target path) must be BITWISE equal to the plain-row sampler on 0/1
    masks, in both sampling policies, including boundary regimes, and for
    R both off and on a 32-bit word boundary."""
    from openvis_tpu.ops.point_sample import (
        bit_pack_rows_t,
        point_sample_shared_t,
        sample_maps_packed_bits,
    )

    rng = np.random.RandomState(1)
    b, h, w, p = 2, 19, 23, 400
    pts = rng.rand(b, p, 2).astype(np.float32)
    pts[:, :4] = [[0.0, 0.0], [1.0, 1.0], [0.0, 1.0], [1.0, 0.0]]
    pts[:, 4:40, 0] *= 0.03
    pts[:, 40:80, 1] *= 0.03
    pts[:, 80:120, 0] = 1.0 - 0.03 * pts[:, 80:120, 0]
    pts[:, 120:160, 1] = 1.0 - 0.03 * pts[:, 120:160, 1]
    pts = jnp.asarray(pts)

    for r in (6, 32, 37, 64):
        flat_t = jnp.asarray(
            (rng.rand(b, h * w, r) > 0.6).astype(np.float32)
        )
        tbl = bit_pack_rows_t(flat_t, h, w)
        assert tbl.dtype == jnp.uint32
        assert tbl.shape[-1] == 4 * ((r + 31) // 32)
        for f32p in (False, True):
            got = sample_maps_packed_bits(tbl, r, h, w, pts, f32_policy=f32p)
            want = jax.vmap(
                lambda t, c: point_sample_shared_t(
                    t, h, w, c, f32_policy=f32p
                )
            )(flat_t.astype(jnp.bfloat16), pts)
            np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_sorted_uniform_points_distribution():
    """sorted_uniform_points must emit y ASCENDING with the exact joint law
    of sorted iid uniforms: order-stat means E[y_(i)] = i/(P+1), uniform
    pooled marginals, iid uniform x."""
    from openvis_tpu.ops.point_sample import sorted_uniform_points

    pts = np.asarray(sorted_uniform_points(jax.random.PRNGKey(0), (64,), 257))
    xs, ys = pts[..., 0], pts[..., 1]
    assert np.all(np.diff(ys, axis=-1) >= 0)
    assert 0.0 < ys.min() and ys.max() < 1.0
    # order-stat means across the batch: i/(P+1) +- CLT noise
    want = np.arange(1, 258) / 258.0
    np.testing.assert_allclose(ys.mean(0), want, atol=5 * 0.5 / np.sqrt(64))
    # pooled marginals ~ U(0,1)
    for arr in (xs.ravel(), ys.ravel()):
        assert abs(arr.mean() - 0.5) < 0.01
        for qtile in (0.1, 0.3, 0.7, 0.9):
            assert abs((arr < qtile).mean() - qtile) < 0.015
