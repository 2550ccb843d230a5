"""Sharded == single-device numerical parity for the train step.

The correctness contract that replaces DDP (reference
``openvis/utils/distributed.py:46-53``: gradient all-reduce makes every rank
step identically): a train step jitted over an 8-device ``data`` mesh on a
global batch must produce the same loss, gradients, and updated params as
the same step on ONE device with the same global batch.  Under jit-over-mesh
the program is global, so only a device-count-dependent semantic bug (e.g.
per-shard normalizers, shard-local negatives) can break this — exactly the
bugs this pins down.  BriVIS additionally pins the brownian GLOBAL negative
pool semantics (= the reference's ``concat_all_gather``,
``brownian_criterion.py:72-78``) and ``num_masks`` global averaging
(``criterion.py:220-224``).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from openvis_tpu.parallel.train_step import (
    TrainState,
    make_optimizer,
    make_train_step,
)
from openvis_tpu.structures import ClipTargets
from openvis_tpu.train import init_model, make_loss_fn

from test_brivis import brivis_tiny_config
from test_end_to_end import tiny_config

K, D = 5, 32
H, W, N = 64, 96, 4


def _global_batch(rng, b, t):
    labels = rng.randint(0, K, (b, N)).astype(np.int32)
    masks = np.zeros((b, N, t, H, W), np.float32)
    masks[:, :2, :, 10:30, 20:50] = 1.0
    valid = np.zeros((b, N), bool)
    valid[:, :2] = True
    text = rng.randn(K, D).astype(np.float32)
    text /= np.linalg.norm(text, axis=-1, keepdims=True)
    return {
        "pixels": jnp.asarray(rng.randn(b, t, H, W, 3).astype(np.float32)),
        "targets": ClipTargets(
            labels=jnp.asarray(labels),
            masks=jnp.asarray(masks),
            valid=jnp.asarray(valid),
            frame_valid=jnp.asarray(np.ones((b, N, t), bool)),
        ),
        "text_feats": jnp.asarray(text),
    }


def _shard(batch, state, mesh):
    data = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    sb = {
        "pixels": jax.device_put(batch["pixels"], data),
        "targets": jax.tree.map(
            lambda x: jax.device_put(x, data), batch["targets"]
        ),
        "text_feats": jax.device_put(batch["text_feats"], repl),
    }
    return sb, jax.device_put(state, repl)


def _run_parity(cfg, t, loss_kwargs=None):
    n_dev = len(jax.devices())
    assert n_dev == 8, "conftest forces an 8-device CPU mesh"
    rng = np.random.RandomState(0)
    batch = _global_batch(rng, n_dev, t)

    model, params = init_model(cfg, jax.random.PRNGKey(0), batch)
    loss_fn = make_loss_fn(cfg, model, K, **(loss_kwargs or {}))
    tx = make_optimizer(cfg, params)
    state = TrainState.create(params, tx)
    step = make_train_step(loss_fn, tx)

    # single-device run (everything on device 0)
    dev0 = jax.devices()[0]
    b1 = jax.device_put(batch, dev0)
    s1 = jax.device_put(state, dev0)
    new1, m1 = jax.jit(step)(s1, b1, jax.random.PRNGKey(1))

    # 8-device data-sharded run, SAME global batch
    mesh = Mesh(np.asarray(jax.devices()), ("data",))
    b8, s8 = _shard(batch, state, mesh)
    new8, m8 = jax.jit(step)(s8, b8, jax.random.PRNGKey(1))

    np.testing.assert_allclose(
        float(m8["total_loss"]), float(m1["total_loss"]), rtol=5e-4,
        err_msg="sharded loss != single-device loss",
    )
    np.testing.assert_allclose(
        float(m8["grad_norm"]), float(m1["grad_norm"]), rtol=5e-3,
        err_msg="sharded grad norm != single-device grad norm",
    )
    # updated params: compare every leaf (catches per-shard grad bugs the
    # scalar metrics could average away)
    flat1 = jax.tree_util.tree_leaves_with_path(new1.params)
    flat8 = dict(jax.tree_util.tree_leaves_with_path(new8.params))
    checked = 0
    for path, leaf1 in flat1:
        leaf8 = np.asarray(flat8[path])
        np.testing.assert_allclose(
            leaf8, np.asarray(leaf1), rtol=5e-3, atol=5e-5,
            err_msg=f"param mismatch at {jax.tree_util.keystr(path)}",
        )
        checked += 1
    assert checked > 50


def test_simplebsl_sharded_matches_single_device():
    _run_parity(tiny_config(), t=2)


def test_brivis_sharded_matches_single_device():
    """BriVIS: brownian negatives pool over the GLOBAL (sharded) batch axis
    and must match the single-device pool exactly."""
    cfg = brivis_tiny_config()
    cfg = dataclasses.replace(
        cfg, solver=dataclasses.replace(cfg.solver, amp=False)
    )
    _run_parity(cfg, t=3)
