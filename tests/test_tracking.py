"""MinVIS embedding tracker (models/tracking.py).

The ema_alpha=1 fast path (one batched pairwise Hungarian + permutation
composition) must be exactly equivalent to the sequential carry-based solve
(minvis.py:44-72 semantics)."""

import jax
import jax.numpy as jnp
import numpy as np

from openvis_tpu.models.tracking import (
    align_outputs,
    apply_track_indices,
    track_by_embeds,
)
from openvis_tpu.ops.hungarian import batched_hungarian


def _normalize(x):
    return x / (np.linalg.norm(x, axis=-1, keepdims=True) + 1e-6)


def _sequential_reference(embeds: np.ndarray) -> np.ndarray:
    """Carry-based solve, the reference semantics (minvis.py:44-72)."""
    b, t, q, c = embeds.shape
    e = _normalize(embeds)
    out = np.zeros((b, t, q), np.int32)
    for bi in range(b):
        carry = e[bi, 0]
        for ti in range(t):
            cos = _normalize(carry) @ e[bi, ti].T
            idx = np.asarray(batched_hungarian(jnp.asarray(1.0 - cos)[None]))[0]
            out[bi, ti] = idx
            carry = e[bi, ti][idx]
    return out


def test_fast_path_matches_sequential():
    rng = np.random.RandomState(0)
    b, t, q, c = 2, 7, 12, 16
    embeds = rng.randn(b, t, q, c).astype(np.float32)
    fast = np.asarray(track_by_embeds(jnp.asarray(embeds)))
    seq = _sequential_reference(embeds)
    np.testing.assert_array_equal(fast, seq)


def test_recovers_known_permutation():
    """Frame t = frame 0's queries shuffled by a known permutation: the
    tracker must invert it so aligned embeds are constant over time."""
    rng = np.random.RandomState(1)
    q, c, t = 10, 8, 5
    base = rng.randn(q, c).astype(np.float32)
    perms = [rng.permutation(q) for _ in range(t)]
    perms[0] = np.arange(q)
    embeds = np.stack([base[np.argsort(p)] for p in perms])  # (T, Q, C)
    # frame t query j holds base[perm... ]: aligned[t, k] must equal base[k]
    idx = np.asarray(track_by_embeds(jnp.asarray(embeds)[None]))[0]
    aligned = np.stack([embeds[ti][idx[ti]] for ti in range(t)])
    for ti in range(t):
        np.testing.assert_allclose(aligned[ti], base, rtol=1e-5)


def test_single_frame_identity():
    rng = np.random.RandomState(2)
    embeds = rng.randn(3, 1, 6, 4).astype(np.float32)
    idx = np.asarray(track_by_embeds(jnp.asarray(embeds)))
    assert (idx == np.arange(6)).all()


def test_ema_path_still_runs():
    rng = np.random.RandomState(3)
    embeds = rng.randn(1, 4, 8, 16).astype(np.float32)
    idx = np.asarray(track_by_embeds(jnp.asarray(embeds), ema_alpha=0.7))
    assert idx.shape == (1, 4, 8)
    # every frame's indices are a permutation
    for ti in range(4):
        assert sorted(idx[0, ti].tolist()) == list(range(8))


def test_ema_path_matches_numpy_reference():
    """OV2Seg's EMA tracker (alpha=0.7 blend of the carried reference,
    ov2seg.py:926-934): exact equivalence to a numpy re-typing of the
    sequential carry solve."""
    rng = np.random.RandomState(6)
    b, t, q, c = 2, 5, 10, 12
    alpha = 0.7
    embeds = rng.randn(b, t, q, c).astype(np.float32)
    ours = np.asarray(track_by_embeds(jnp.asarray(embeds), ema_alpha=alpha))

    e = _normalize(embeds)
    want = np.zeros((b, t, q), np.int32)
    for bi in range(b):
        carry = e[bi, 0]
        for ti in range(t):
            cos = _normalize(carry) @ e[bi, ti].T
            idx = np.asarray(
                batched_hungarian(jnp.asarray(1.0 - cos)[None])
            )[0]
            want[bi, ti] = idx
            aligned = e[bi, ti][idx]
            carry = alpha * aligned + (1.0 - alpha) * carry
    np.testing.assert_array_equal(ours, want)


def test_align_outputs_shapes_and_consistency():
    rng = np.random.RandomState(4)
    b, t, q, c, h, w = 1, 3, 5, 8, 6, 6
    logits = rng.randn(b, t, q, c).astype(np.float32)
    masks = rng.randn(b, q, t, h, w).astype(np.float32)
    embeds = rng.randn(b, t, q, c).astype(np.float32)
    al, am, idx = align_outputs(
        jnp.asarray(logits), jnp.asarray(masks), jnp.asarray(embeds)
    )
    assert al.shape == logits.shape and am.shape == masks.shape
    al, am, idx = map(np.asarray, (al, am, idx))
    for ti in range(t):
        np.testing.assert_allclose(al[0, ti], logits[0, ti][idx[0, ti]])
        np.testing.assert_allclose(
            am[0, :, ti], masks[0, :, ti][idx[0, ti]]
        )
