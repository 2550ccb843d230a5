"""Pallas MSDeformAttn kernel (interpret mode) vs the XLA composition."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import openvis_tpu.ops.msda_pallas as MP
from openvis_tpu.ops.msda import ms_deform_attn_xla


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(
        MP, "_sample_level_pallas",
        functools.partial(MP._sample_level_pallas.__wrapped__, interpret=True),
    )
    monkeypatch.setattr(
        MP, "_sample_level_pallas_v2",
        functools.partial(
            MP._sample_level_pallas_v2.__wrapped__, interpret=True
        ),
    )
    monkeypatch.setattr(
        MP, "_msda_fused",
        functools.partial(MP._msda_fused.__wrapped__, interpret=True),
    )
    monkeypatch.setattr(
        MP, "_msda_bwd_fused",
        functools.partial(MP._msda_bwd_fused.__wrapped__, interpret=True),
    )


@pytest.mark.parametrize("seed", [0, 1])
def test_matches_xla_composition(seed):
    rng = np.random.RandomState(seed)
    shapes = [(6, 9), (3, 5)]
    L = sum(h * w for h, w in shapes)
    B, NH, CH, P, LQ = 2, 4, 32, 4, 17
    value = jnp.asarray(rng.randn(B, L, NH, CH).astype(np.float32))
    # locations spill outside [0,1] to exercise zero padding
    loc = jnp.asarray((rng.rand(B, LQ, NH, 2, P, 2) * 1.4 - 0.2).astype(np.float32))
    attn = jnp.asarray(rng.rand(B, LQ, NH, 2, P).astype(np.float32))
    ref = np.asarray(ms_deform_attn_xla(value, shapes, loc, attn))
    out = np.asarray(MP.ms_deform_attn_pallas_fwd(value, shapes, loc, attn))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_bf16_path_close_to_f32_oracle():
    """bf16 values select the bf16 tent/MXU path (the AMP inference path);
    must stay within bf16 tolerance of the exact f32 oracle."""
    rng = np.random.RandomState(3)
    shapes = [(6, 9), (3, 5)]
    L = sum(h * w for h, w in shapes)
    B, NH, CH, P, LQ = 1, 2, 32, 4, 13
    value = rng.randn(B, L, NH, CH).astype(np.float32)
    loc = jnp.asarray(rng.rand(B, LQ, NH, 2, P, 2).astype(np.float32))
    attn = jnp.asarray(rng.rand(B, LQ, NH, 2, P).astype(np.float32))
    ref = np.asarray(ms_deform_attn_xla(jnp.asarray(value), shapes, loc, attn))
    out = np.asarray(MP.ms_deform_attn_pallas_fwd(
        jnp.asarray(value).astype(jnp.bfloat16), shapes, loc, attn
    )).astype(np.float32)
    np.testing.assert_allclose(out, ref, rtol=0.05, atol=0.05)


def test_single_level_odd_sizes():
    rng = np.random.RandomState(2)
    shapes = [(7, 13)]
    B, NH, CH, P, LQ = 1, 2, 32, 4, 9
    value = jnp.asarray(rng.randn(B, 7 * 13, NH, CH).astype(np.float32))
    loc = jnp.asarray(rng.rand(B, LQ, NH, 1, P, 2).astype(np.float32))
    attn = jnp.asarray(rng.rand(B, LQ, NH, 1, P).astype(np.float32))
    ref = np.asarray(ms_deform_attn_xla(value, shapes, loc, attn))
    out = np.asarray(MP.ms_deform_attn_pallas_fwd(value, shapes, loc, attn))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("seed", [0, 4])
def test_v1_v2_level_kernels_identical(seed):
    """The (bn, nqb)-grid in-kernel-row-loop v2 must match v1 exactly
    (same arithmetic, different scheduling)."""
    rng = np.random.RandomState(seed)
    h, w = 11, 19
    BN, CH, P, LQ = 3, 32, 4, 300  # LQ > bq exercises multiple q-blocks
    v = jnp.asarray(rng.randn(BN, h * w, CH).astype(np.float32))
    y = jnp.asarray((rng.rand(BN, LQ, P) * (h + 4) - 2).astype(np.float32))
    x = jnp.asarray((rng.rand(BN, LQ, P) * (w + 4) - 2).astype(np.float32))
    a = jnp.asarray(rng.rand(BN, LQ, P).astype(np.float32))
    o1 = np.asarray(MP._sample_level_pallas(v, y, x, a, h, w, bq=256))
    o2 = np.asarray(MP._sample_level_pallas_v2(v, y, x, a, h, w, bq=256))
    np.testing.assert_allclose(o2, o1, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("seed", [0, 7])
def test_fused_matches_per_level_v2(seed):
    """The fused all-level kernel (default path) must match the per-level v2
    composition exactly — same arithmetic, one launch."""
    rng = np.random.RandomState(seed)
    shapes = ((12, 20), (6, 10), (3, 5))
    L = sum(h * w for h, w in shapes)
    B, NH, CH, P, LQ = 2, 2, 32, 4, 300  # LQ > bq exercises multiple q-blocks
    value = jnp.asarray(rng.randn(B, L, NH, CH).astype(np.float32))
    loc = jnp.asarray((rng.rand(B, LQ, NH, 3, P, 2) * 1.3 - 0.15)
                      .astype(np.float32))
    attn = jnp.asarray(rng.rand(B, LQ, NH, 3, P).astype(np.float32))
    ref = np.asarray(MP.ms_deform_attn_pallas_fwd(
        value, shapes, loc, attn, level_impl=MP._sample_level_pallas_v2
    ))
    out = np.asarray(MP.ms_deform_attn_pallas_fwd(value, shapes, loc, attn))
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)
    xla = np.asarray(ms_deform_attn_xla(value, shapes, loc, attn))
    np.testing.assert_allclose(out, xla, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("pack", [True, False])
def test_fused_rr_lanes_matches_xla(pack):
    """rr-on-lanes forward (value pre-laid-out (hp/rr, wp, rr*ch), one dot
    per block on full lanes) must match XLA; with pack=True the packed
    narrow levels keep the x-first path (mixed kernel)."""
    rng = np.random.RandomState(23)
    shapes = ((9, 70), (6, 10), (3, 5))  # w=70 unpacked; two packed levels
    L = sum(h * w for h, w in shapes)
    B, NH, CH, P, LQ = 2, 2, 32, 4, 300
    value = jnp.asarray(rng.randn(B, L, NH, CH).astype(np.float32))
    loc = jnp.asarray((rng.rand(B, LQ, NH, 3, P, 2) * 1.3 - 0.15)
                      .astype(np.float32))
    attn = jnp.asarray(rng.rand(B, LQ, NH, 3, P).astype(np.float32))
    out = np.asarray(MP._msda_fused(
        value, loc, attn, shapes, pack=pack, rr_lanes=True
    ))
    xla = np.asarray(ms_deform_attn_xla(value, shapes, loc, attn))
    np.testing.assert_allclose(out, xla, rtol=1e-4, atol=1e-5)


def test_row_block_bounds_cover_flags():
    """[lo, hi) must contain every flagged row block (undershoot would drop
    tent mass; overshoot only wastes compute)."""
    rng = np.random.RandomState(5)
    bq, rr, nrb, p = 8, 4, 9, 4
    for _ in range(20):
        y = jnp.asarray(
            (rng.rand(2, 16, p) * (nrb * rr + 6) - 3).astype(np.float32)
        )
        flags = np.asarray(MP._row_block_flags(y, 2, bq, rr, nrb))
        bounds = np.asarray(MP._row_block_bounds(y, 2, bq, rr, nrb))
        for b in range(2):
            for qb in range(2):
                active = np.nonzero(flags[b, qb])[0]
                lo, hi = bounds[b, qb]
                if len(active):
                    assert lo <= active.min() and hi >= active.max() + 1
                assert 0 <= lo <= hi <= nrb


@pytest.mark.parametrize("shapes", [
    ((7, 64), (4, 65), (2, 3)),    # pk boundary: w=64 packs (pk=2), w=65 not
    ((1, 12), (5, 128), (3, 20)),  # h < pk level; exact-128 level
])
def test_fused_packing_boundary_shapes(shapes):
    """Row packing at its decision boundaries (w=64 packs pk=2, w=65 stays
    unpacked; h smaller than pk; w exactly 128) must still match XLA."""
    rng = np.random.RandomState(17)
    L = sum(h * w for h, w in shapes)
    B, NH, CH, P, LQ = 1, 2, 32, 4, 70
    value = jnp.asarray(rng.randn(B, L, NH, CH).astype(np.float32))
    loc = jnp.asarray((rng.rand(B, LQ, NH, 3, P, 2) * 1.3 - 0.15)
                      .astype(np.float32))
    attn = jnp.asarray(rng.rand(B, LQ, NH, 3, P).astype(np.float32))
    out = np.asarray(MP.ms_deform_attn_pallas_fwd(value, shapes, loc, attn))
    xla = np.asarray(ms_deform_attn_xla(value, shapes, loc, attn))
    np.testing.assert_allclose(out, xla, rtol=1e-4, atol=1e-5)

    g = jnp.asarray(rng.randn(B, LQ, NH * CH).astype(np.float32))
    _, vjp = jax.vjp(lambda v, l, a: ms_deform_attn_xla(v, shapes, l, a),
                     value, loc, attn)
    dv_ref, dl_ref, da_ref = vjp(g)
    dv, dl, da = MP.ms_deform_attn_pallas_bwd(value, shapes, loc, attn, g)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(dv_ref),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dl), np.asarray(dl_ref),
                               rtol=1e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(da), np.asarray(da_ref),
                               rtol=1e-4, atol=1e-5)
