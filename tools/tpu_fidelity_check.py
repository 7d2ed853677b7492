"""Cross-backend fidelity check: render every golden scene on the
current (TPU) backend — both raster paths plus the AS-debug ray caster —
and compare against the CPU-rendered goldens in tests/goldens/. The RMSE
budget matches the golden tests' rationale: beyond 8-bit quantisation +
cross-backend f32 reassociation is a real divergence.

Run on hardware each round (docs/FIDELITY.md §4 cites the results).
"""

from __future__ import annotations

import dataclasses
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402
import jax  # noqa: E402


def main() -> int:
    # import after jax backend init so `--cpu`-style harnesses can front-run
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
    import golden_defs as G
    from transmission_renderer_tpu.utils import load_png

    print("backend:", jax.default_backend(), flush=True)
    budget = 4e-3
    failures = 0

    def check(label, got, name):
        nonlocal failures
        golden = load_png(
            os.path.join(G.GOLDEN_DIR, f"{name}.png")
        )[..., :3] / 255.0
        rmse = float(np.sqrt(np.mean((got - golden) ** 2)))
        ok = rmse < budget
        print(f"{label}/{name}: RMSE vs CPU golden = {rmse:.5f} -> "
              f"{'OK' if ok else 'FAIL'}", flush=True)
        failures += 0 if ok else 1

    for name in G.GOLDENS:
        check("jax-path", G.render_golden(name, pallas=False), name)
    # Pallas path: the REAL kernel on this backend (the CPU goldens used
    # interpret mode, which is defined to match the kernel bit-for-bit
    # modulo backend f32 reassociation)
    real_pal = dataclasses.replace(G.CFG_PAL, pallas_interpret=False)
    saved = G.CFG_PAL
    try:
        G.CFG_PAL = real_pal
        for name in G.PALLAS_GOLDENS:
            check("pallas-path", G.render_golden(name, pallas=True), name)
    finally:
        G.CFG_PAL = saved
    check("rt", G.render_as_debug_golden(), "as_debug")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
