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


def f32_matmuls(fn):
    """Run ``fn`` with full-f32 matmul precision.

    TPU matmuls default to bf16 inputs; the camera/clip transforms are in
    the RMSE-critical chain (SURVEY.md §7 hard part 6) and visibly shift
    geometry at default precision (measured RMSE 0.013 vs CPU at 128x72).
    The frame's matmuls are all tiny (Nx4 @ 4x4), so "highest" is free.
    """
    import functools

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        import jax

        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapper
