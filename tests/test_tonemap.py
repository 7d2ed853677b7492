"""Tonemapper tests: the baking formula is pinned by its defining
constraints (curve maps grey_in -> grey_out and max_luminance -> 1)."""

import numpy as np
import jax.numpy as jnp

from transmission_renderer_tpu.pbr import (
    BakedLottesParams,
    LottesParams,
    bake_lottes_params,
    lottes_tonemap,
)
from transmission_renderer_tpu.pbr.tonemap import _tonemap_inner


def test_bake_constraints():
    params = LottesParams()
    baked = bake_lottes_params(params)
    # curve(grey_in) == grey_out
    assert np.isclose(
        float(_tonemap_inner(jnp.float32(params.grey_point_in), baked)),
        params.grey_point_out,
        rtol=1e-4,
    )
    # curve(max_luminance) == 1
    assert np.isclose(
        float(_tonemap_inner(jnp.float32(params.max_luminance), baked)), 1.0, rtol=1e-4
    )


def test_curve_monotonic():
    baked = bake_lottes_params()
    xs = jnp.linspace(1e-4, 25.0, 512)
    ys = np.asarray(_tonemap_inner(xs, baked))
    assert np.all(np.diff(ys) > -1e-6)
    assert np.all(ys >= 0.0) and np.all(ys <= 1.0 + 1e-5)


def test_tonemap_output_range_and_grey_preservation():
    baked = bake_lottes_params()
    rng = np.random.default_rng(0)
    hdr = jnp.asarray(rng.uniform(0.0, 20.0, (64, 3)).astype(np.float32))
    out = np.asarray(lottes_tonemap(hdr, baked))
    assert out.shape == (64, 3)
    assert np.all(out >= 0.0) and np.all(out <= 1.0)
    # Greys stay grey: ratio treatment is identity when all channels equal
    grey = jnp.full((5, 3), 0.18, jnp.float32)
    out_grey = np.asarray(lottes_tonemap(grey, baked))
    assert np.allclose(out_grey[:, 0], out_grey[:, 1], atol=1e-6)
    assert np.allclose(out_grey[:, 1], out_grey[:, 2], atol=1e-6)
    assert np.allclose(out_grey[:, 0], 0.18, atol=1e-3)


def test_tonemap_black_is_black():
    baked = bake_lottes_params()
    out = np.asarray(lottes_tonemap(jnp.zeros((2, 3), jnp.float32), baked))
    assert np.all(np.isfinite(out))
    assert np.allclose(out, 0.0)


def test_shader_curve_shape_matches_reference_formula():
    """tonemap_inner must equal z/(z^d*b + c) with z=x^a
    (shader/src/tonemapping.rs:10-13)."""
    p = BakedLottesParams(
        a=jnp.float32(1.2),
        b=jnp.float32(0.6),
        c=jnp.float32(0.3),
        d=jnp.float32(0.9),
        crosstalk=jnp.float32(10.0),
        saturation=jnp.float32(1.0),
        cross_saturation=jnp.float32(1.33),
    )
    x = 0.7
    z = x**1.2
    expected = z / (z**0.9 * 0.6 + 0.3)
    assert np.isclose(float(_tonemap_inner(jnp.float32(x), p)), expected, rtol=1e-6)
