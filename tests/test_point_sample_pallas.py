"""Sorted-window Pallas point sampler vs the gather composition
(interpret mode; small shapes make the static windows cover the whole map,
so results are exact up to matmul reassociation and the 3-pass f32 dot
decomposition — ``_dot_f32_3pass`` drops the lo*lo term, bounding the
deviation at ~2^-17 of the summed tent mass, i.e. a few e-5 absolute for
N(0,1) values; tolerances below sit just above that bound)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import openvis_tpu.ops.point_sample_pallas as PSP
from openvis_tpu.ops.point_sample import point_sample_shared, sort_points_by_y




def _ref(maps, coords):
    return np.asarray(jax.vmap(point_sample_shared)(maps, coords))


@pytest.mark.parametrize("r,h,w,p", [(7, 9, 13, 100), (150, 6, 5, 300),
                                     (32, 16, 16, 513)])
def test_fwd_matches_gather_composition(r, h, w, p):
    rng = np.random.RandomState(r)
    maps = jnp.asarray(rng.randn(2, r, h, w).astype(np.float32))
    # spill outside [0,1] to exercise zero padding
    coords = sort_points_by_y(jnp.asarray(
        (rng.rand(2, p, 2) * 1.4 - 0.2).astype(np.float32)
    ))
    ref = _ref(maps, coords)
    value = jnp.transpose(maps, (0, 2, 3, 1))
    out = np.asarray(PSP.point_sample_nhwc_pallas(value, coords,
                                                  interpret=True))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_bwd_dvalue_matches_autodiff():
    rng = np.random.RandomState(0)
    r, h, w, p = 5, 8, 11, 260
    maps = jnp.asarray(rng.randn(1, r, h, w).astype(np.float32))
    coords = sort_points_by_y(jnp.asarray(
        rng.rand(1, p, 2).astype(np.float32)
    ))
    g = jnp.asarray(rng.randn(1, r, p).astype(np.float32))

    def f_ref(m):
        return jnp.sum(jax.vmap(point_sample_shared)(m, coords) * g)

    want = np.asarray(jax.grad(f_ref)(maps))

    def f_pal(m):
        value = jnp.transpose(m, (0, 2, 3, 1))
        return jnp.sum(
            PSP.point_sample_nhwc_pallas(value, coords, interpret=True) * g
        )

    # interpret mode for the bwd kernel too
    import openvis_tpu.ops.point_sample_pallas as M

    orig = M._ps_bwd

    def bwd_interp(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    M._ps_bwd = bwd_interp
    try:
        got = np.asarray(jax.grad(f_pal)(maps))
    finally:
        M._ps_bwd = orig
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_bwd_scatter_matches_autodiff():
    rng = np.random.RandomState(1)
    r, h, w, p = 5, 8, 11, 260
    maps = jnp.asarray(rng.randn(2, r, h, w).astype(np.float32))
    coords = sort_points_by_y(jnp.asarray(
        (rng.rand(2, p, 2) * 1.3 - 0.15).astype(np.float32)
    ))
    g = jnp.asarray(rng.randn(2, r, p).astype(np.float32))

    def f_ref(m):
        return jnp.sum(jax.vmap(point_sample_shared)(m, coords) * g)

    want = np.asarray(jax.grad(f_ref)(maps))

    def f_pal(m):
        value = jnp.transpose(m, (0, 2, 3, 1))
        return jnp.sum(
            PSP.point_sample_nhwc_pallas(value, coords, interpret=True) * g
        )

    import openvis_tpu.ops.point_sample_pallas as M

    orig = M._BWD_IMPL
    M._BWD_IMPL = "xla"
    try:
        got_nhwc = np.asarray(jax.grad(f_pal)(maps))
    finally:
        M._BWD_IMPL = orig
    np.testing.assert_allclose(got_nhwc, want, rtol=1e-4, atol=1e-4)


def test_bf16_path_close():
    rng = np.random.RandomState(3)
    r, h, w, p = 9, 10, 12, 256
    maps = rng.randn(1, r, h, w).astype(np.float32)
    coords = sort_points_by_y(jnp.asarray(
        rng.rand(1, p, 2).astype(np.float32)
    ))
    ref = _ref(jnp.asarray(maps), coords)
    value = jnp.transpose(jnp.asarray(maps), (0, 2, 3, 1)).astype(
        jnp.bfloat16
    )
    out = np.asarray(PSP.point_sample_nhwc_pallas(value, coords,
                                                  interpret=True))
    np.testing.assert_allclose(out, ref, rtol=0.05, atol=0.05)


def test_split2_bitwise_equals_upcast_3pass():
    """bf16 values + f32 tents (f32_tents=True) must be BITWISE equal to
    upcasting the values to f32 and using the 3-pass dot: the upcast
    values' lo-halves are identically zero, so the third pass vanishes."""
    rng = np.random.RandomState(3)
    r, h, w, p = 9, 10, 12, 300
    maps32 = jnp.asarray(rng.randn(2, r, h, w).astype(np.float32))
    maps16 = maps32.astype(jnp.bfloat16)
    coords = sort_points_by_y(jnp.asarray(
        (rng.rand(2, p, 2) * 1.3 - 0.15).astype(np.float32)
    ))
    v16 = jnp.transpose(maps16, (0, 2, 3, 1))
    v32 = jnp.transpose(maps16.astype(jnp.float32), (0, 2, 3, 1))
    got = np.asarray(PSP.point_sample_nhwc_pallas(
        v16, coords, interpret=True, f32_tents=True
    ))
    ref = np.asarray(PSP.point_sample_nhwc_pallas(
        v32, coords, interpret=True
    ))
    np.testing.assert_array_equal(got, ref)


def test_window_gating_tall_map():
    """Tall map at high point count: keff < kb for most blocks — the gated
    steps must not change results (they contribute exact zeros)."""
    rng = np.random.RandomState(4)
    r, h, w, p = 4, 120, 8, 4096
    maps = jnp.asarray(rng.randn(1, r, h, w).astype(np.float32))
    coords = sort_points_by_y(jnp.asarray(
        rng.rand(1, p, 2).astype(np.float32)
    ))
    ref = _ref(maps, coords)
    value = jnp.transpose(maps, (0, 2, 3, 1))
    out = np.asarray(PSP.point_sample_nhwc_pallas(value, coords,
                                                  interpret=True))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)
