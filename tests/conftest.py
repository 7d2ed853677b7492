"""Test configuration: CPU-only JAX.

Tests must run without TPU hardware. Multi-device sharding tests run in a
subprocess with a cleaned environment (see test_sharding.py): this
container's axon ``sitecustomize`` snapshots XLA's process-global flags at
interpreter start, so virtual CPU device counts cannot be requested from
inside an already-started interpreter.
"""

import os

# Force CPU even when the ambient environment points JAX at a TPU backend
# (JAX_PLATFORMS=axon). Backend *selection* is still changeable here
# (backends initialise lazily) — only device-count flags are locked.
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
