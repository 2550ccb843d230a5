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


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host init (the reference's ``launch(num_machines, machine_rank,
    dist_url)`` rendezvous, train_net.py:303-313).  On TPU pods the runtime
    autodetects everything and the arguments may all be None; on other
    platforms pass the coordinator explicitly.  After this, ``jax.devices()``
    is global and :func:`make_mesh` lays the data axis across ICI within a
    slice and DCN across slices (XLA owns the transport — SURVEY §2.6)."""
    kwargs = {}
    if coordinator_address:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def make_mesh(n_devices: Optional[int] = None, time: int = 1) -> Mesh:
    """1-D ``("data",)`` mesh, or — when ``time > 1``
    (``ParallelConfig.time_axis``) — a 2-D ``("data", "time")`` mesh.  The
    leading batch axis shards over EVERY mesh axis (``batch_spec``): at
    train the time axis just folds into data-parallelism; at eval the
    window-group axis rides it, so consecutive windows of one video land on
    ICI-adjacent devices (sequence parallelism over the frame axis at
    window granularity)."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    if time <= 1:
        return Mesh(np.asarray(devices), ("data",))
    if len(devices) % time:
        raise ValueError(
            f"{len(devices)} devices do not divide by parallel.time_axis={time}"
        )
    return Mesh(
        np.asarray(devices).reshape(len(devices) // time, time),
        ("data", "time"),
    )


def batch_spec(mesh: Mesh) -> P:
    """PartitionSpec sharding the leading axis over all mesh axes."""
    return P(tuple(mesh.axis_names))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over every mesh axis."""
    return NamedSharding(mesh, batch_spec(mesh))

def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Device_put a pytree of host arrays with the leading axis sharded."""
    s = data_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


def put_global(x, sharding: NamedSharding):
    """Host array -> global sharded array.  Single-process: a plain
    device_put.  Multi-host: each process contributes its local slice of the
    global batch (``jax.make_array_from_process_local_data``) — the
    per-process loader produces ``ims_per_batch / process_count`` samples,
    mirroring the reference's per-rank DataLoader split (build.py:23-37)."""
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    return jax.make_array_from_process_local_data(sharding, np.asarray(x))
