"""MSDeformAttn kernel vs oracles.

Mirrors the reference's kernel test strategy (CUDA op vs a ``grid_sample``
composition, ``ops/test.py:35-89``): our XLA composition is checked against
(a) an independent torch ``F.grid_sample`` composition and (b) the
map_coordinates oracle, plus autodiff gradient checks.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from openvis_tpu.ops.msda import ms_deform_attn, ms_deform_attn_oracle

SHAPES = [(6, 4), (4, 3), (2, 2)]
B, NH, CH, LQ, P = 2, 4, 8, 7, 3


def _rand_inputs(seed=0, dtype=np.float32):
    rng = np.random.RandomState(seed)
    len_in = sum(h * w for h, w in SHAPES)
    value = rng.randn(B, len_in, NH, CH).astype(dtype)
    # locations mostly in [0,1] with some outside to exercise zero padding
    loc = rng.uniform(-0.2, 1.2, size=(B, LQ, NH, len(SHAPES), P, 2)).astype(dtype)
    w = rng.rand(B, LQ, NH, len(SHAPES), P).astype(dtype) + 1e-5
    w = w / w.sum(axis=(3, 4), keepdims=True)
    return value, loc, w


def torch_reference(value, loc, weights):
    """Independent torch oracle: per-level grid_sample(align_corners=False)."""
    import torch
    import torch.nn.functional as F

    value = torch.from_numpy(value)
    loc = torch.from_numpy(loc)
    weights = torch.from_numpy(weights)
    b, _, nh, ch = value.shape
    lq = loc.shape[1]
    splits = [h * w for h, w in SHAPES]
    vals = value.split(splits, dim=1)
    out = torch.zeros(b, nh, ch, lq)
    for lvl, (h, w) in enumerate(SHAPES):
        v = vals[lvl].view(b, h, w, nh, ch).permute(0, 3, 4, 1, 2).reshape(b * nh, ch, h, w)
        g = 2 * loc[:, :, :, lvl] - 1  # (b, lq, nh, P, 2)
        g = g.permute(0, 2, 1, 3, 4).reshape(b * nh, lq, P, 2)
        s = F.grid_sample(v, g, mode="bilinear", padding_mode="zeros", align_corners=False)
        s = s.view(b, nh, ch, lq, P)
        a = weights[:, :, :, lvl].permute(0, 2, 1, 3)  # (b, nh, lq, P)
        out += (s * a[:, :, None]).sum(-1)
    return out.permute(0, 3, 1, 2).reshape(b, lq, nh * ch).numpy()


def test_forward_matches_torch_grid_sample():
    value, loc, w = _rand_inputs()
    ours = np.asarray(ms_deform_attn(jnp.asarray(value), SHAPES, jnp.asarray(loc), jnp.asarray(w)))
    ref = torch_reference(value, loc, w)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_forward_matches_map_coordinates_oracle():
    value, loc, w = _rand_inputs(seed=1)
    ours = np.asarray(ms_deform_attn(jnp.asarray(value), SHAPES, jnp.asarray(loc), jnp.asarray(w)))
    ref = np.asarray(
        ms_deform_attn_oracle(jnp.asarray(value), SHAPES, jnp.asarray(loc), jnp.asarray(w))
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_gradients():
    value, loc, w = _rand_inputs(seed=2)
    with jax.enable_x64():
        args = [jnp.asarray(x, jnp.float64) for x in (value, loc, w)]
        def f(v, l, a):
            return ms_deform_attn(v, SHAPES, l, a).sum()

        grads = jax.grad(f, argnums=(0, 1, 2))(*args)
        # finite-difference spot checks against autodiff
        rng = np.random.RandomState(0)
        eps = 1e-6
        for argi in range(3):
            flat = np.asarray(args[argi]).ravel()
            for _ in range(5):
                i = rng.randint(flat.size)
                pert = list(args)
                fp = flat.copy(); fp[i] += eps
                pert[argi] = jnp.asarray(fp.reshape(args[argi].shape))
                up = float(f(*pert))
                fm = flat.copy(); fm[i] -= eps
                pert[argi] = jnp.asarray(fm.reshape(args[argi].shape))
                down = float(f(*pert))
                fd = (up - down) / (2 * eps)
                ad = float(np.asarray(grads[argi]).ravel()[i])
                np.testing.assert_allclose(ad, fd, rtol=1e-4, atol=1e-5)


def test_jit_compiles_fixed_shapes():
    value, loc, w = _rand_inputs(seed=3)
    f = jax.jit(lambda v, l, a: ms_deform_attn(v, SHAPES, l, a))
    out = f(jnp.asarray(value), jnp.asarray(loc), jnp.asarray(w))
    assert out.shape == (B, LQ, NH * CH)
