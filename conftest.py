"""Root conftest: force the CPU platform with a virtual 8-device mesh.

The container's sitecustomize registers the remote `axon` TPU backend and
exports JAX_PLATFORMS=axon for every python process; tests must NOT use it
(remote compiles take minutes and serialize against the bench entrypoints),
so we override to CPU here — before any test module initializes a backend —
and force 8 virtual CPU devices to exercise the multi-chip sharding paths
(SURVEY.md §4d).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
