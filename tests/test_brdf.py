"""Unit tests for the glam-pbr port — closed-form and NumPy-oracle checks.

Oracle values are computed from the formulas in the reference
(glam-pbr/src/lib.rs), re-derived independently in NumPy here.
"""

import numpy as np
import jax.numpy as jnp

from transmission_renderer_tpu.pbr import (
    MaterialParams,
    apply_ior_to_roughness,
    apply_volume_attenuation,
    basic_brdf,
    combined_f0,
    combined_f90,
    d_ggx,
    fresnel_schlick,
    ior_to_dielectric_f0,
    light_direction_and_attenuation,
    perceptual_to_actual_roughness,
    refract,
    transmission_btdf,
    v_smith_ggx_correlated,
)


def mat(
    diffuse=(1.0, 1.0, 1.0),
    metallic=0.0,
    roughness=0.5,
    ior=1.5,
    spec_colour=(1.0, 1.0, 1.0),
    spec_factor=1.0,
):
    return MaterialParams(
        diffuse_colour=jnp.array(diffuse, jnp.float32),
        metallic=jnp.float32(metallic),
        perceptual_roughness=jnp.float32(roughness),
        index_of_refraction=jnp.float32(ior),
        specular_colour=jnp.array(spec_colour, jnp.float32),
        specular_factor=jnp.float32(spec_factor),
    )


def test_ior_to_dielectric_f0_default():
    # ior 1.5 -> 4% reflectance (glam-pbr/src/lib.rs:184)
    assert np.isclose(float(ior_to_dielectric_f0(jnp.float32(1.5))), 0.04)


def test_roughness_remaps():
    assert np.isclose(float(perceptual_to_actual_roughness(jnp.float32(0.5))), 0.25)
    # ior remap clamp: ior=1.5 -> factor 1; ior=1.0 -> factor 0; ior=1.25 -> 0.5
    assert np.isclose(float(apply_ior_to_roughness(jnp.float32(0.6), jnp.float32(1.5))), 0.6)
    assert np.isclose(float(apply_ior_to_roughness(jnp.float32(0.6), jnp.float32(1.0))), 0.0)
    assert np.isclose(
        float(apply_ior_to_roughness(jnp.float32(0.6), jnp.float32(1.25))), 0.3
    )


def test_d_ggx_closed_form():
    # At noh=1: D = 1/(pi * a^2) for alpha = a (f = a^2)
    a = 0.25
    expected = a * a / (np.pi * (a * a) ** 2)
    assert np.isclose(float(d_ggx(jnp.float32(1.0), jnp.float32(a))), expected, rtol=1e-6)
    # General point, NumPy oracle
    noh, alpha = 0.7, 0.3
    a2 = alpha * alpha
    f = noh * noh * (a2 - 1) + 1
    assert np.isclose(
        float(d_ggx(jnp.float32(noh), jnp.float32(alpha))), a2 / (np.pi * f * f), rtol=1e-6
    )


def test_v_smith_oracle():
    nov, nol, alpha = 0.8, 0.6, 0.4
    a2 = alpha * alpha
    ggx_v = nol * np.sqrt(nov * nov * (1 - a2) + a2)
    ggx_l = nov * np.sqrt(nol * nol * (1 - a2) + a2)
    expected = 0.5 / (ggx_v + ggx_l)
    got = float(v_smith_ggx_correlated(jnp.float32(nov), jnp.float32(nol), jnp.float32(alpha)))
    assert np.isclose(got, expected, rtol=1e-6)
    # Degenerate: zero visibility when both dots are 0
    assert float(v_smith_ggx_correlated(jnp.float32(0.0), jnp.float32(0.0), jnp.float32(0.4))) == 0.0


def test_fresnel_schlick_endpoints():
    f0 = jnp.array([0.04, 0.04, 0.04], jnp.float32)
    f90 = jnp.ones(3, jnp.float32)
    # Grazing: voh=0 -> f90
    np.testing.assert_allclose(fresnel_schlick(jnp.float32(0.0), f0, f90), f90, rtol=1e-6)
    # Normal incidence: voh=1 -> f0
    np.testing.assert_allclose(fresnel_schlick(jnp.float32(1.0), f0, f90), f0, rtol=1e-6)


def test_light_direction_and_attenuation():
    d, dist, att = light_direction_and_attenuation(
        jnp.zeros(3, jnp.float32), jnp.array([0.0, 2.0, 0.0], jnp.float32)
    )
    np.testing.assert_allclose(np.asarray(d), [0.0, 1.0, 0.0], atol=1e-7)
    assert np.isclose(float(dist), 2.0)
    assert np.isclose(float(att), 0.25)


def test_combined_f0_f90():
    # Dielectric, default specular: f0 = 0.04, f90 = 1
    m = mat()
    np.testing.assert_allclose(np.asarray(combined_f0(m)), [0.04] * 3, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(combined_f90(m)), [1.0] * 3, rtol=1e-6)
    # Pure metal: f0 = diffuse colour, f90 = 1
    m = mat(diffuse=(0.9, 0.6, 0.3), metallic=1.0)
    np.testing.assert_allclose(np.asarray(combined_f0(m)), [0.9, 0.6, 0.3], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(combined_f90(m)), [1.0] * 3, rtol=1e-6)
    # specular_factor scales dielectric f0 and f90 (KHR_materials_specular)
    m = mat(spec_factor=0.5)
    np.testing.assert_allclose(np.asarray(combined_f0(m)), [0.02] * 3, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(combined_f90(m)), [0.5] * 3, rtol=1e-6)


def test_basic_brdf_oracle():
    """Full basic_brdf against an independent NumPy evaluation."""
    n = np.array([0.0, 0.0, 1.0], np.float32)
    v = np.array([0.0, np.sin(0.3), np.cos(0.3)], np.float32)
    l = np.array([np.sin(0.5), 0.0, np.cos(0.5)], np.float32)
    intensity = np.array([2.0, 2.0, 2.0], np.float32)

    m = mat(diffuse=(0.8, 0.2, 0.1), metallic=0.3, roughness=0.4)
    res = basic_brdf(jnp.array(n), jnp.array(l), jnp.array(intensity), jnp.array(v), m)

    # NumPy oracle
    eps = 1.1920929e-07
    h = (v + l) / np.linalg.norm(v + l)
    noh = max(float(n @ h), eps)
    nov = max(float(n @ v), eps)
    nol = max(float(n @ l), eps)
    voh = max(float(v @ h), eps)
    diffuse_colour = np.array([0.8, 0.2, 0.1])
    metallic = 0.3
    alpha = 0.4**2
    c_diff = diffuse_colour * (1 - metallic)
    diel_f0 = 0.04 * np.ones(3)
    f0 = diel_f0 + (diffuse_colour - diel_f0) * metallic
    f90 = 1.0 + (1.0 - 1.0) * metallic
    fres = f0 + (f90 - f0) * (1 - voh) ** 5
    a2 = alpha * alpha
    d = a2 / (np.pi * (noh * noh * (a2 - 1) + 1) ** 2)
    ggx = nol * np.sqrt(nov * nov * (1 - a2) + a2) + nov * np.sqrt(
        nol * nol * (1 - a2) + a2
    )
    vis = 0.5 / ggx
    exp_diffuse = intensity * nol * (1 - fres.max()) / np.pi * c_diff
    exp_specular = intensity * nol * d * vis * fres

    np.testing.assert_allclose(np.asarray(res.diffuse), exp_diffuse, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(res.specular), exp_specular, rtol=1e-5)


def test_transmission_btdf_mirror_symmetry():
    """For view and light mirrored about the surface plane, the BTDF equals
    the specular D*V*(1-F) lobe of the mirrored light."""
    n = jnp.array([0.0, 0.0, 1.0], jnp.float32)
    v = jnp.array([0.0, 0.6, 0.8], jnp.float32)
    # Light behind the surface, exactly mirroring v through the plane
    l = jnp.array([0.0, 0.6, -0.8], jnp.float32)
    m = mat(roughness=0.5, ior=1.5)
    out = transmission_btdf(m, n, v, l)
    # The mirrored light == view direction, so halfway == view == mirrored
    # light and noh = nov = voh = cos(angle v-n)
    eps = 1.1920929e-07
    noh = max(0.8, eps)
    alpha = 0.25  # perceptual 0.5 -> actual 0.25; ior 1.5 -> factor 1
    a2 = alpha**2
    d = a2 / (np.pi * (noh * noh * (a2 - 1) + 1) ** 2)
    ggx = 2 * noh * np.sqrt(noh * noh * (1 - a2) + a2)
    vis = 0.5 / ggx
    f = 0.04 + 0.96 * (1 - 1.0) ** 5  # voh=1 -> f0
    expected = (1 - f) * d * vis * 1.0
    np.testing.assert_allclose(np.asarray(out), [expected] * 3, rtol=1e-4)


def test_refract_straight_through():
    # Incident along -n: refraction continues along -n regardless of ior
    n = jnp.array([0.0, 0.0, 1.0], jnp.float32)
    i = jnp.array([0.0, 0.0, -1.0], jnp.float32)
    out = refract(i, n, jnp.float32(1.5))
    np.testing.assert_allclose(np.asarray(out), [0.0, 0.0, -1.0], atol=1e-6)


def test_refract_snell():
    # Check Snell's law for an oblique ray
    ior = 1.5
    theta_i = 0.5
    n = np.array([0.0, 0.0, 1.0], np.float32)
    i = np.array([np.sin(theta_i), 0.0, -np.cos(theta_i)], np.float32)
    out = np.asarray(refract(jnp.array(i), jnp.array(n), jnp.float32(ior)))
    out = out / np.linalg.norm(out)
    sin_t = np.hypot(out[0], out[1])
    assert np.isclose(sin_t, np.sin(theta_i) / ior, atol=1e-6)


def test_volume_attenuation_beer():
    light = jnp.ones(3, jnp.float32)
    colour = jnp.array([0.5, 0.8, 1.0], jnp.float32)
    out = apply_volume_attenuation(
        light, jnp.float32(2.0), jnp.float32(4.0), colour
    )
    # transmittance = exp(ln(c)/d * t) = c^(t/d) = c^0.5
    np.testing.assert_allclose(np.asarray(out), np.array([0.5, 0.8, 1.0]) ** 0.5, rtol=1e-4)
    # infinite attenuation distance -> unchanged (the glTF default)
    out_inf = apply_volume_attenuation(
        light, jnp.float32(2.0), jnp.float32(np.inf), colour
    )
    np.testing.assert_allclose(np.asarray(out_inf), np.ones(3), rtol=1e-6)


def test_batched_shapes():
    """All functions broadcast over pixel batches."""
    B = (4, 7)
    n = jnp.tile(jnp.array([0.0, 0.0, 1.0], jnp.float32), B + (1,))
    v = jnp.tile(jnp.array([0.0, 0.6, 0.8], jnp.float32), B + (1,))
    l = jnp.tile(jnp.array([0.6, 0.0, 0.8], jnp.float32), B + (1,))
    m = MaterialParams(
        diffuse_colour=jnp.ones(B + (3,), jnp.float32),
        metallic=jnp.zeros(B, jnp.float32),
        perceptual_roughness=jnp.full(B, 0.5, jnp.float32),
        index_of_refraction=jnp.full(B, 1.5, jnp.float32),
        specular_colour=jnp.ones(B + (3,), jnp.float32),
        specular_factor=jnp.ones(B, jnp.float32),
    )
    res = basic_brdf(n, l, jnp.ones(B + (3,)), v, m)
    assert res.diffuse.shape == B + (3,)
    assert res.specular.shape == B + (3,)
    out = transmission_btdf(m, n, v, l)
    assert out.shape == B + (3,)
