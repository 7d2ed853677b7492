"""Test configuration: CPU-only JAX.

Tests must run without TPU hardware. Multi-device sharding tests run in a
subprocess with a cleaned environment (see test_sharding.py): this
container's axon ``sitecustomize`` snapshots XLA's process-global flags at
interpreter start, so virtual CPU device counts cannot be requested from
inside an already-started interpreter.
"""

import os

# Force CPU. The axon sitecustomize both imports jax and initialises its
# backends at interpreter start and *overrides* JAX_PLATFORMS, so the env
# var alone is ineffective — tear the backends down and re-select.
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402
from jax._src import xla_bridge  # noqa: E402

if jax.config.jax_platforms != "cpu" or os.environ.get("PALLAS_AXON_POOL_IPS"):
    xla_bridge._clear_backends()
    jax.config.update("jax_platforms", "cpu")

assert jax.default_backend() == "cpu", jax.default_backend()
jax.config.update("jax_enable_x64", False)
