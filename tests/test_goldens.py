"""Golden-frame regression tests (SURVEY.md §4c).

The reference has no automated goldens (its 'golden' is the readme
collage); these pin this framework against itself so refactors can't
silently shift the image. Goldens were rendered on CPU; the comparison
tolerance absorbs backend-to-backend f32 reassociation.

Coverage (VERDICT round 2 #8): every scene family perf surgery touches —
flagship dragon, helmet (dense material tap), stress (alpha-clip depth
peeling), the AS-debug caster — on the pure-JAX raster, plus a
Pallas-interpret render of a subset against the SAME goldens so both
backends stay pinned to one image.

Regenerate intentionally with: python tools/regen_goldens.py
"""

import os

import numpy as np
import pytest

from golden_defs import (
    GOLDEN_DIR,
    GOLDENS,
    PALLAS_GOLDENS,
    render_as_debug_golden,
    render_golden,
)
from transmission_renderer_tpu.utils import load_png


def _load(name):
    return load_png(os.path.join(GOLDEN_DIR, f"{name}.png"))[..., :3] / 255.0


def _check(name, got, tol=4e-3):
    golden = _load(name)
    rmse = float(np.sqrt(np.mean((got - golden) ** 2)))
    # 8-bit quantisation alone contributes ~0.001; anything beyond ~0.004
    # means the image actually changed.
    assert rmse < tol, f"{name}: RMSE {rmse} vs golden"


@pytest.mark.parametrize("name", sorted(GOLDENS))
def test_golden(name):
    _check(name, render_golden(name))


@pytest.mark.parametrize("name", sorted(PALLAS_GOLDENS))
def test_golden_pallas(name):
    # the Pallas-interpret kernel must reproduce the same image (the two
    # backends differ only by f32 reassociation + the depth-peel clip
    # resolve, both inside the tolerance)
    _check(name, render_golden(name, pallas=True))


def test_golden_as_debug():
    _check("as_debug", render_as_debug_golden())


@pytest.mark.parametrize("name,bound", [("dragon", 1e-2), ("helmet", 2e-3)])
def test_bf16_light_math_error_bound(name, bound):
    # RenderConfig.bf16_light_math spends RMSE for light-loop VPU
    # throughput. Measured spend: ~1.2e-3 frame-wide on the opaque helmet
    # and ~7e-3 on the transmission dragon (the BTDF's mirrored-halfway
    # GGX lobe hits bf16's noh resolution, ~2^-8 near 1) — both OVER the
    # 1e-3 ship budget (BASELINE.md), which is why the flag is opt-in and
    # not a bench default (docs/FIDELITY.md). This pins the measured
    # bounds so a regression that silently widens the error (e.g. a cast
    # leaking into the radiance/accumulation path) fails.
    import dataclasses as _dc

    from golden_defs import CFG, render_golden_cfg

    exact = render_golden_cfg(name, CFG)
    bf16 = render_golden_cfg(name, _dc.replace(CFG, bf16_light_math=True))
    rmse = float(np.sqrt(np.mean((bf16 - exact) ** 2)))
    assert rmse < bound, f"{name}: bf16 light math RMSE {rmse} over bound"
