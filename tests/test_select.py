"""ops/select.kth_largest: exact equivalence with lax.top_k's k-th value."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openvis_tpu.ops.select import kth_largest


@pytest.mark.parametrize("k", [1, 7, 100, 1000])
def test_matches_topk_random(k):
    rng = np.random.RandomState(k)
    x = jnp.asarray(rng.randn(3, 5, 1000).astype(np.float32) * 10.0)
    ref = jax.lax.top_k(x, k)[0][..., -1]
    got = kth_largest(x, k)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_matches_topk_with_ties_and_negatives():
    # bf16-quantized values produce heavy ties — the criterion's AMP case
    rng = np.random.RandomState(0)
    x = rng.randn(4, 2048).astype(np.float32)
    x = np.array(jnp.asarray(x).astype(jnp.bfloat16).astype(jnp.float32))
    x[:, :100] = -np.abs(x[:, :100])  # dense negative cluster
    x = jnp.asarray(x)
    for k in (1, 50, 512, 2048):
        ref = jax.lax.top_k(x, k)[0][..., -1]
        got = kth_largest(x, k)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_neg_inf_padding_rows():
    # masked entries at -inf (the criterion masks random points out of the
    # candidate threshold); k-th may land on or above the -inf band
    x = jnp.concatenate(
        [jnp.arange(10, dtype=jnp.float32)[None, :],
         jnp.full((1, 10), -jnp.inf)], axis=0
    )
    got = kth_largest(x, 3)
    assert got[0] == 7.0
    assert np.isneginf(np.asarray(got)[1])


def test_grad_free_usage_under_jit():
    x = jnp.asarray(np.random.RandomState(1).randn(2, 64).astype(np.float32))
    got = jax.jit(lambda a: kth_largest(a, 5))(x)
    ref = jax.lax.top_k(x, 5)[0][..., -1]
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
