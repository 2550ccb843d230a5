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
