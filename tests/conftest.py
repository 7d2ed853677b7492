"""Test configuration: force an 8-virtual-device CPU mesh.

Tests must run without TPU hardware; multi-chip sharding logic is
exercised on a virtual CPU mesh (SURVEY.md section 4d). Env vars must be
set before JAX initialises its backends, hence this happens at conftest
import time.
"""

import os

# Force CPU even when the ambient environment points JAX at a TPU backend
# (e.g. JAX_PLATFORMS=axon): tests must be hardware-independent.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
