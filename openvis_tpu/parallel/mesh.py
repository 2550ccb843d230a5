"""Device mesh + sharding helpers.

The reference is DDP-only (SURVEY §2.6: ``launch`` spawns 1 proc/GPU and
wraps in DDP).  Here parallelism is a ``jax.sharding.Mesh`` with a ``data``
axis: the global batch (and at inference the frame axis) is sharded over it,
parameters are replicated, and XLA inserts the gradient all-reduces that DDP
did by hand.  Everything runs in the single-controller jit model — losses
like the ``num_masks`` normalizer are computed on global arrays, so the
reference's explicit ``all_reduce(num_masks)`` (criterion.py:222-224) and
``concat_all_gather`` of contrastive negatives (brownian_criterion.py:72-78)
become plain global reductions/matmuls.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), ("data",))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over `data`."""
    return NamedSharding(mesh, P("data"))

def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Device_put a pytree of host arrays with the leading axis sharded."""
    s = data_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)
