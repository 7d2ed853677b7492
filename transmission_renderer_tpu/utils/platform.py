"""Platform selection helpers.

This container's axon sitecustomize imports jax, initialises its backends
and force-selects the tunneled TPU at interpreter start — plain
``JAX_PLATFORMS=cpu`` is silently ignored. ``force_cpu()`` reliably
switches to the CPU backend (tear down + re-select), provided no arrays
have been created yet.
"""

from __future__ import annotations

import os


def force_cpu() -> None:
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    from jax._src import xla_bridge

    # NB: don't query jax.default_backend() before the switch — that would
    # itself initialise the axon backend state we're trying to replace.
    if jax.config.jax_platforms != "cpu" or os.environ.get("PALLAS_AXON_POOL_IPS"):
        xla_bridge._clear_backends()
        jax.config.update("jax_platforms", "cpu")
    assert jax.default_backend() == "cpu", jax.default_backend()
