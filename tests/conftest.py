"""Tests run on a virtual 8-device CPU mesh (see root conftest.py, which
forces JAX_PLATFORMS=cpu before any backend initializes)."""

import jax

jax.config.update("jax_default_matmul_precision", "highest")
