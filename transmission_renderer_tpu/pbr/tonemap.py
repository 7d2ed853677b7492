"""Lottes tonemapper — JAX port of the reference's tonemap path.

The curve evaluation mirrors shader/src/tonemapping.rs:10-25 (itself lifted
from colstodian). The parameter *baking* reproduces the standard Lottes
"Advanced Techniques and Optimization of HDR Color Pipelines" fit that
colstodian implements: given (contrast a, shoulder d, max luminance, grey
point in/out), solve for b and c such that the curve maps grey_in ->
grey_out and max_luminance -> 1.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class LottesParams(NamedTuple):
    """Un-baked tonemapper parameters (colstodian's ``LottesTonemapperParams``).

    Defaults chosen to match colstodian's `Default` as used by the
    reference (src/main.rs:506-510). The curve-shape parameters (contrast /
    shoulder / grey points / max luminance) are pinned by the property
    tests in tests/test_tonemap.py; the colour-treatment trio
    (crosstalk/saturation/cross_saturation) only affects hue ratios.
    """

    contrast: float = 1.35
    shoulder: float = 0.99
    max_luminance: float = 25.0
    grey_point_in: float = 0.18
    grey_point_out: float = 0.18
    crosstalk: float = 10.0
    saturation: float = 1.0
    cross_saturation: float = 1.33


class BakedLottesParams(NamedTuple):
    """ABI-mirror of shader/src/tonemapping.rs:28-38."""

    a: jnp.ndarray
    b: jnp.ndarray
    c: jnp.ndarray
    d: jnp.ndarray
    crosstalk: jnp.ndarray
    saturation: jnp.ndarray
    cross_saturation: jnp.ndarray


def bake_lottes_params(params: LottesParams = LottesParams()) -> BakedLottesParams:
    """Solve the Lottes curve constants b, c from the artistic parameters.

    With z = x^a, curve(x) = z / (z^d * b + c), constrained so that
    curve(grey_in) = grey_out and curve(max_luminance) = 1.
    """
    a = params.contrast
    d = params.shoulder
    gi = params.grey_point_in
    go = params.grey_point_out
    lm = params.max_luminance

    gi_a = gi**a
    gi_ad = gi ** (a * d)
    lm_a = lm**a
    lm_ad = lm ** (a * d)

    denom = (lm_ad - gi_ad) * go
    b = (-gi_a + lm_a * go) / denom
    c = (lm_ad * gi_a - lm_a * gi_ad * go) / denom

    f32 = lambda v: jnp.float32(v)
    return BakedLottesParams(
        a=f32(a),
        b=f32(b),
        c=f32(c),
        d=f32(d),
        crosstalk=f32(params.crosstalk),
        saturation=f32(params.saturation),
        cross_saturation=f32(params.cross_saturation),
    )


def _tonemap_inner(x: jnp.ndarray, p: BakedLottesParams) -> jnp.ndarray:
    """z / (z^d * b + c) (shader/src/tonemapping.rs:10-13)."""
    z = x**p.a
    return z / (z**p.d * p.b + p.c)


def lottes_tonemap(colour: jnp.ndarray, p: BakedLottesParams) -> jnp.ndarray:
    """Max-channel ratio-preserving Lottes tonemap
    (shader/src/tonemapping.rs:15-25).

    ``colour`` is [..., 3] linear HDR; the result is [..., 3] in [0, 1].
    """
    # Shading noise can leave colours a hair below zero ((1-VoH)^5 with
    # VoH fractionally above 1); a negative base under a fractional power
    # is NaN. The reference's final `.min(ONE).max(ZERO)` uses Rust f32
    # max/min, which *discard* NaN operands (-> 0/black); we clamp the
    # input instead, which yields the same image without NaN round trips.
    colour = jnp.maximum(colour, 0.0)
    max_c = jnp.max(colour, axis=-1, keepdims=True)
    # Guard the 0/0 at pure black.
    safe_max = jnp.maximum(max_c, 1e-30)
    ratio = colour / safe_max
    tonemapped_max = _tonemap_inner(max_c[..., 0], p)[..., None]

    ratio = ratio ** (p.saturation / p.cross_saturation)
    crosstalk_t = tonemapped_max**p.crosstalk
    ratio = ratio + (1.0 - ratio) * crosstalk_t
    ratio = ratio**p.cross_saturation

    return jnp.clip(ratio * tonemapped_max, 0.0, 1.0)


def lottes_tonemap_planes(planes: tuple, p: BakedLottesParams) -> tuple:
    """``lottes_tonemap`` over (r, g, b) channel PLANES — the same ops in
    the same order per channel (max over 3 elements is rounding-free, so
    the nested maximum equals the axis reduce bit-for-bit); keeps the
    frame's planar back half free of [..., 3] interleaves."""
    r, g, b = (jnp.maximum(c, 0.0) for c in planes)
    max_c = jnp.maximum(jnp.maximum(r, g), b)
    safe_max = jnp.maximum(max_c, 1e-30)
    tonemapped_max = _tonemap_inner(max_c, p)
    crosstalk_t = tonemapped_max**p.crosstalk

    def chan(c):
        ratio = c / safe_max
        ratio = ratio ** (p.saturation / p.cross_saturation)
        ratio = ratio + (1.0 - ratio) * crosstalk_t
        ratio = ratio**p.cross_saturation
        return jnp.clip(ratio * tonemapped_max, 0.0, 1.0)

    return (chan(r), chan(g), chan(b))
