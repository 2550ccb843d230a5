"""Pallas MSDeformAttn backward kernels vs the XLA composition's autodiff
(interpret mode)."""

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
        MP, "_sample_level_pallas_bwd",
        functools.partial(MP._sample_level_pallas_bwd.__wrapped__, interpret=True),
    )
    monkeypatch.setattr(
        MP, "_sample_level_pallas_bwd_v2",
        functools.partial(
            MP._sample_level_pallas_bwd_v2.__wrapped__, interpret=True
        ),
    )


@pytest.mark.parametrize("seed", [0, 3])
def test_backward_matches_xla_vjp(seed):
    rng = np.random.RandomState(seed)
    shapes = ((6, 9), (3, 5))
    L = sum(h * w for h, w in shapes)
    B, NH, CH, P, LQ = 2, 2, 32, 4, 13
    value = jnp.asarray(rng.randn(B, L, NH, CH).astype(np.float32))
    loc = jnp.asarray((rng.rand(B, LQ, NH, 2, P, 2) * 1.2 - 0.1).astype(np.float32))
    attn = jnp.asarray(rng.rand(B, LQ, NH, 2, P).astype(np.float32))
    g = jnp.asarray(rng.randn(B, LQ, NH * CH).astype(np.float32))

    _, vjp = jax.vjp(lambda v, l, a: ms_deform_attn_xla(v, shapes, l, a),
                     value, loc, attn)
    dv_ref, dl_ref, da_ref = vjp(g)
    for impl in (MP._sample_level_pallas_bwd, MP._sample_level_pallas_bwd_v2):
        dv, dl, da = MP.ms_deform_attn_pallas_bwd(
            value, shapes, loc, attn, g, level_impl=impl
        )
        np.testing.assert_allclose(np.asarray(dv), np.asarray(dv_ref), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(dl), np.asarray(dl_ref), rtol=1e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(da), np.asarray(da_ref), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("encoder_shaped,stripe", [
    (False, False), (True, False), (True, True),
])
def test_backward_fused_matches_xla_vjp(monkeypatch, encoder_shaped, stripe):
    """Default (level_impl=None) backward routes through the fused
    all-level dCoord + shared-prep dValue path; encoder-shaped inputs
    (lq == len_in) with ``stripe`` additionally exercise the y-stripe round
    trip (default off since round 5 — the OPENVIS_MSDA_STRIPE hatch)."""
    monkeypatch.setattr(
        MP, "_msda_bwd_fused",
        functools.partial(MP._msda_bwd_fused.__wrapped__, interpret=True),
    )
    monkeypatch.setattr(MP, "_STRIPE_BWD", stripe)
    rng = np.random.RandomState(11 if encoder_shaped else 7)
    shapes = ((8, 9), (4, 5), (2, 3))
    L = sum(h * w for h, w in shapes)
    B, NH, CH, P = 2, 2, 32, 4
    LQ = L if encoder_shaped else 13
    value = jnp.asarray(rng.randn(B, L, NH, CH).astype(np.float32))
    loc = jnp.asarray(
        (rng.rand(B, LQ, NH, 3, P, 2) * 1.2 - 0.1).astype(np.float32)
    )
    attn = jnp.asarray(rng.rand(B, LQ, NH, 3, P).astype(np.float32))
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


def test_dcoord_sub_blocked_bitwise():
    """The sub-blocked dCoord walk (dcoord_sub=2|4 — per-slice bounds inside
    each bq program; measured-worse-but-kept variant, BASELINE.md r5) must
    be BITWISE equal to the sub=1 rr kernel."""
    from openvis_tpu.ops.msda_pallas import _msda_bwd_fused

    rng = np.random.RandomState(3)
    levels = ((12, 20), (6, 10), (3, 5))
    b, nh, ch, p = 2, 2, 32, 4
    lq = sum(h * w for h, w in levels)
    value = jnp.asarray(
        rng.randn(b, lq, nh, ch).astype(np.float32)
    ).astype(jnp.bfloat16)
    loc = jnp.asarray(rng.rand(b, lq, nh, 3, p, 2).astype(np.float32))
    attn = jnp.asarray(rng.rand(b, lq, nh, 3, p).astype(np.float32))
    g = jnp.asarray(
        rng.randn(b, lq, nh * ch).astype(np.float32)
    ).astype(jnp.bfloat16)

    ref = _msda_bwd_fused(value, loc, attn, g, levels, interpret=True)
    for sub in (2, 4):
        got = _msda_bwd_fused(value, loc, attn, g, levels, interpret=True,
                              dcoord_sub=sub)
        for a, bref in zip(got, ref):
            np.testing.assert_array_equal(
                np.asarray(a, np.float32), np.asarray(bref, np.float32)
            )
