"""On-device Hungarian vs scipy oracle (total-cost optimality)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

from openvis_tpu.ops.hungarian import batched_hungarian, hungarian


@pytest.mark.parametrize("n,m", [(1, 1), (3, 5), (10, 10), (40, 100), (100, 100)])
def test_matches_scipy_total_cost(n, m):
    rng = np.random.RandomState(0)
    solve = jax.jit(batched_hungarian)  # batched form compiles ~50x faster
    for trial in range(3):
        cost = rng.randn(n, m).astype(np.float32) * 5.0
        col = np.asarray(solve(jnp.asarray(cost)[None])[0])
        assert len(set(col.tolist())) == n, "assignment must be injective"
        ri, ci = linear_sum_assignment(cost)
        ours = cost[np.arange(n), col].sum()
        ref = cost[ri, ci].sum()
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-4)


def test_batched():
    rng = np.random.RandomState(1)
    cost = rng.rand(4, 7, 20).astype(np.float32)
    cols = np.asarray(batched_hungarian(jnp.asarray(cost)))
    for b in range(4):
        ri, ci = linear_sum_assignment(cost[b])
        np.testing.assert_allclose(
            cost[b][np.arange(7), cols[b]].sum(), cost[b][ri, ci].sum(), rtol=1e-5
        )


def test_constant_rows_do_not_disturb_valid_rows():
    """Padding rows with a constant must leave valid-row assignment optimal."""
    rng = np.random.RandomState(2)
    cost_valid = rng.rand(5, 12).astype(np.float32)
    padded = np.concatenate([cost_valid, np.zeros((4, 12), np.float32)], axis=0)
    col = np.asarray(batched_hungarian(jnp.asarray(padded)[None])[0])
    ri, ci = linear_sum_assignment(cost_valid)
    np.testing.assert_allclose(
        cost_valid[np.arange(5), col[:5]].sum(),
        cost_valid[ri, ci].sum(),
        rtol=1e-5,
    )
