"""Pallas Hungarian kernel (interpret mode on CPU) vs scipy."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

from openvis_tpu.ops.hungarian_pallas import batched_hungarian_pallas


@pytest.mark.parametrize("b,n,m", [(2, 5, 10), (1, 40, 100), (2, 100, 100)])
def test_pallas_matches_scipy(b, n, m):
    rng = np.random.RandomState(0)
    cost = rng.randn(b, n, m).astype(np.float32) * 5
    col = np.asarray(batched_hungarian_pallas(jnp.asarray(cost), interpret=True))
    for bi in range(b):
        ri, ci = linear_sum_assignment(cost[bi])
        assert len(set(col[bi].tolist())) == n
        np.testing.assert_allclose(
            cost[bi][np.arange(n), col[bi]].sum(), cost[bi][ri, ci].sum(),
            rtol=1e-5, atol=1e-3,
        )


def test_pallas_constant_padding_rows():
    rng = np.random.RandomState(1)
    valid = rng.rand(6, 12).astype(np.float32)
    padded = np.concatenate([valid, np.zeros((3, 12), np.float32)])[None]
    col = np.asarray(batched_hungarian_pallas(jnp.asarray(padded), interpret=True))[0]
    ri, ci = linear_sum_assignment(valid)
    np.testing.assert_allclose(
        valid[np.arange(6), col[:6]].sum(), valid[ri, ci].sum(), rtol=1e-5
    )
