"""BRDF / BTDF library — JAX port of the reference's ``glam-pbr`` crate.

Every function cites the behaviour it reproduces (reference
glam-pbr/src/lib.rs). All functions are elementwise over arbitrary leading
batch dimensions: vectors are ``[..., 3]`` float32 arrays, scalars are
``[...]`` arrays. Shading vectors must be normalised and point away from
the surface (glam-pbr/src/lib.rs:47).

Dot products are clamped to ``>= f32 machine epsilon`` exactly like the
reference's typed ``Dot<A, B>`` wrapper (glam-pbr/src/lib.rs:92-99) — note
this is a *lower* clamp only, there is no upper clamp at 1.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax.numpy as jnp

# f32::EPSILON — the reference clamps all shading dot products to this
# (glam-pbr/src/lib.rs:95).
F32_EPSILON = 1.1920929e-07

_PI = 3.14159265358979323846
_FRAC_1_PI = 1.0 / _PI


class MaterialParams(NamedTuple):
    """Per-shading-point material parameters.

    Mirror of glam-pbr/src/lib.rs:171-179 (``MaterialParams``). Each field
    is an array broadcastable against the others; colour fields end in a
    size-3 axis.
    """

    diffuse_colour: jnp.ndarray  # [..., 3]
    metallic: jnp.ndarray  # [...]
    perceptual_roughness: jnp.ndarray  # [...]
    index_of_refraction: jnp.ndarray  # [...]
    specular_colour: jnp.ndarray  # [..., 3]
    specular_factor: jnp.ndarray  # [...]


class BrdfResult(NamedTuple):
    """Split diffuse/specular result (glam-pbr/src/lib.rs:437-452)."""

    diffuse: jnp.ndarray  # [..., 3]
    specular: jnp.ndarray  # [..., 3]

    def __add__(self, other: "BrdfResult") -> "BrdfResult":
        return BrdfResult(self.diffuse + other.diffuse, self.specular + other.specular)


def _dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Clamped shading dot product (glam-pbr/src/lib.rs:92-99)."""
    return jnp.maximum(jnp.sum(a * b, axis=-1), F32_EPSILON)


def _normalize(v: jnp.ndarray) -> jnp.ndarray:
    return v / jnp.linalg.norm(v, axis=-1, keepdims=True)


def light_direction_and_attenuation(
    fragment_position: jnp.ndarray, light_position: jnp.ndarray
):
    """Inverse-square point-light falloff (glam-pbr/src/lib.rs:12-23).

    Returns (direction [...,3], distance [...], attenuation [...]).
    """
    vector = light_position - fragment_position
    distance_sq = jnp.sum(vector * vector, axis=-1)
    distance = jnp.sqrt(distance_sq)
    direction = vector / distance[..., None]
    attenuation = 1.0 / distance_sq
    return direction, distance, attenuation


def perceptual_to_actual_roughness(perceptual: jnp.ndarray) -> jnp.ndarray:
    """r_actual = r_perceptual^2 (glam-pbr/src/lib.rs:153-156)."""
    return perceptual * perceptual


def apply_ior_to_roughness(roughness: jnp.ndarray, ior: jnp.ndarray) -> jnp.ndarray:
    """roughness * clamp(2*ior - 2, 0, 1) (glam-pbr/src/lib.rs:144-161).

    Applies to either perceptual or actual roughness — the reference
    defines the same remap on both.
    """
    return roughness * jnp.clip(ior * 2.0 - 2.0, 0.0, 1.0)


def ior_to_dielectric_f0(ior: jnp.ndarray) -> jnp.ndarray:
    """((ior - 1) / (ior + 1))^2 (glam-pbr/src/lib.rs:192-196); 1.5 -> 4%."""
    root = (ior - 1.0) / (ior + 1.0)
    return root * root


def d_ggx(noh: jnp.ndarray, actual_roughness: jnp.ndarray) -> jnp.ndarray:
    """GGX normal distribution (glam-pbr/src/lib.rs:101-109).

    Guarded at the perfectly-smooth singularity: alpha = 0 with noh = 1
    makes the reference's expression 0/0 (NaN on GPU too); we return 0
    there (the zero-measure mirror direction of a delta lobe).
    """
    alpha_roughness_sq = actual_roughness * actual_roughness
    f = (noh * noh) * (alpha_roughness_sq - 1.0) + 1.0
    return jnp.where(
        f * f > 0.0, alpha_roughness_sq / (_PI * f * f), 0.0
    )


def v_smith_ggx_correlated(
    nov: jnp.ndarray, nol: jnp.ndarray, actual_roughness: jnp.ndarray
) -> jnp.ndarray:
    """Height-correlated Smith visibility (glam-pbr/src/lib.rs:114-133)."""
    a2 = actual_roughness * actual_roughness
    ggx_v = nol * jnp.sqrt(nov * nov * (1.0 - a2) + a2)
    ggx_l = nov * jnp.sqrt(nol * nol * (1.0 - a2) + a2)
    ggx = ggx_v + ggx_l
    return jnp.where(ggx > 0.0, 0.5 / ggx, 0.0)


def fresnel_schlick(
    voh: jnp.ndarray, f0: jnp.ndarray, f90: jnp.ndarray
) -> jnp.ndarray:
    """Schlick Fresnel with explicit f0/f90 (glam-pbr/src/lib.rs:137-139)."""
    return f0 + (f90 - f0) * (1.0 - voh[..., None]) ** 5.0


def combined_f0(material: MaterialParams) -> jnp.ndarray:
    """KHR_materials_specular combined F0 (glam-pbr/src/lib.rs:425-430)."""
    dielectric = (
        ior_to_dielectric_f0(material.index_of_refraction)[..., None]
        * material.specular_colour
        * material.specular_factor[..., None]
    )
    m = material.metallic[..., None]
    return dielectric + (material.diffuse_colour - dielectric) * m


def combined_f90(material: MaterialParams) -> jnp.ndarray:
    """Combined F90 (glam-pbr/src/lib.rs:432-435)."""
    dielectric = jnp.broadcast_to(
        material.specular_factor[..., None], material.diffuse_colour.shape
    )
    m = material.metallic[..., None]
    return dielectric + (1.0 - dielectric) * m


def _diffuse_brdf(base: jnp.ndarray, fresnel: jnp.ndarray) -> jnp.ndarray:
    """(1 - max_element(F)) * base / pi (glam-pbr/src/lib.rs:356-360)."""
    return (1.0 - jnp.max(fresnel, axis=-1, keepdims=True)) * _FRAC_1_PI * base


class MaterialInvariants(NamedTuple):
    """Light-independent per-pixel shading terms, hoisted out of the
    clustered light loop (each is the same expression the per-light path
    computes, evaluated once — results are bit-identical).
    """

    actual_roughness: jnp.ndarray  # [...]
    c_diff: jnp.ndarray  # [..., 3]
    f0: jnp.ndarray  # [..., 3]
    f90: jnp.ndarray  # [..., 3]


def material_invariants(material: MaterialParams) -> MaterialInvariants:
    """Precompute the light-independent terms of basic_brdf /
    transmission_btdf for reuse across a pixel's light slots."""
    return MaterialInvariants(
        actual_roughness=perceptual_to_actual_roughness(
            material.perceptual_roughness
        ),
        c_diff=material.diffuse_colour * (1.0 - material.metallic[..., None]),
        f0=combined_f0(material),
        f90=combined_f90(material),
    )


def basic_brdf(
    normal: jnp.ndarray,  # [..., 3]
    light: jnp.ndarray,  # [..., 3] (unit, surface -> light)
    light_intensity: jnp.ndarray,  # [..., 3]
    view: jnp.ndarray,  # [..., 3] (unit, surface -> eye)
    material: MaterialParams,
    inv: MaterialInvariants | None = None,
) -> BrdfResult:
    """Lambert-with-Fresnel diffuse + GGX specular (glam-pbr/src/lib.rs:377-423).

    Metallic workflow with KHR_materials_specular combined F0/F90.
    ``inv`` (optional) supplies the light-independent terms precomputed by
    :func:`material_invariants` so a light loop evaluates them once.
    """
    if inv is None:
        inv = material_invariants(material)
    actual_roughness = inv.actual_roughness

    halfway = _normalize(view + light)
    noh = _dot(normal, halfway)
    nov = _dot(normal, view)
    nol = _dot(normal, light)
    voh = _dot(view, halfway)

    c_diff = inv.c_diff
    fresnel = fresnel_schlick(voh, inv.f0, inv.f90)

    radiance = light_intensity * nol[..., None]
    diffuse = radiance * _diffuse_brdf(c_diff, fresnel)

    distribution = d_ggx(noh, actual_roughness)
    visibility = v_smith_ggx_correlated(nov, nol, actual_roughness)
    specular = radiance * (distribution * visibility)[..., None] * fresnel

    return BrdfResult(diffuse=diffuse, specular=specular)


def transmission_btdf(
    material: MaterialParams,
    normal: jnp.ndarray,  # [..., 3]
    view: jnp.ndarray,  # [..., 3]
    light: jnp.ndarray,  # [..., 3]
    inv: MaterialInvariants | None = None,
) -> jnp.ndarray:
    """Per-light rough transmission lobe (glam-pbr/src/lib.rs:200-233).

    Mirrors the light through the surface, evaluates GGX on the mirrored
    half-vector, and weights by (1 - F) * D * V * base_colour.
    """
    if inv is None:
        inv = material_invariants(material)
    transmission_roughness = apply_ior_to_roughness(
        inv.actual_roughness, material.index_of_refraction
    )

    l_dot_n = jnp.sum((-light) * normal, axis=-1, keepdims=True)
    light_mirrored = _normalize(light + 2.0 * normal * l_dot_n)

    halfway = _normalize(view + light_mirrored)
    noh = _dot(normal, halfway)
    voh = _dot(view, halfway)
    nov = _dot(normal, view)
    nol_mirrored = _dot(normal, light_mirrored)

    distribution = d_ggx(noh, transmission_roughness)
    visibility = v_smith_ggx_correlated(nov, nol_mirrored, transmission_roughness)

    fresnel = fresnel_schlick(voh, inv.f0, inv.f90)

    return (
        (1.0 - fresnel)
        * (distribution * visibility)[..., None]
        * material.diffuse_colour
    )


def refract(
    incident: jnp.ndarray, normal: jnp.ndarray, ior: jnp.ndarray
) -> jnp.ndarray:
    """GLSL-style refract with eta = 1/ior (glam-pbr/src/lib.rs:248-256).

    Note the reference takes sqrt(k) without a total-internal-reflection
    guard; we keep identical behaviour (NaN on TIR) because TIR cannot
    occur for the front-facing view rays this is called with.
    """
    eta = 1.0 / ior
    n_dot_i = jnp.sum(normal * incident, axis=-1)
    k = 1.0 - eta * eta * (1.0 - n_dot_i * n_dot_i)
    return (
        eta[..., None] * incident
        - (eta * n_dot_i + jnp.sqrt(k))[..., None] * normal
    )


def get_volume_transmission_ray(
    normal: jnp.ndarray,
    view: jnp.ndarray,
    thickness: jnp.ndarray,
    ior: jnp.ndarray,
    model_scale: jnp.ndarray,
):
    """Refracted exit ray scaled by thickness (glam-pbr/src/lib.rs:258-268)."""
    refraction = refract(-view, normal, ior)
    length = thickness * model_scale
    return _normalize(refraction) * length[..., None], length


def apply_volume_attenuation(
    transmitted_light: jnp.ndarray,  # [..., 3]
    transmission_distance: jnp.ndarray,  # [...]
    attenuation_distance: jnp.ndarray,  # [...]
    attenuation_colour: jnp.ndarray,  # [..., 3]
) -> jnp.ndarray:
    """Beer's-law attenuation (glam-pbr/src/lib.rs:275-290).

    ``attenuation_distance == inf`` means no attenuation (the glTF default).
    """
    # -ln(colour)/distance: colour=0 gives coefficient=inf, and
    # exp(-inf * d) = 0 is the correct Beer's-law limit for d > 0. At
    # d == 0 (zero-thickness path) inf * 0 = NaN — the SAME IEEE corner
    # the reference hits (glam-pbr/src/lib.rs:275-290 does the identical
    # arithmetic in Rust f32); preserved for parity, surfaced by
    # --check-nan.
    coefficient = -jnp.log(attenuation_colour) / attenuation_distance[..., None]
    transmittance = jnp.exp(-coefficient * transmission_distance[..., None])
    no_attenuation = jnp.isinf(attenuation_distance)[..., None]
    return jnp.where(no_attenuation, transmitted_light, transmittance * transmitted_light)


def ibl_volume_refraction(
    material: MaterialParams,
    framebuffer_size_x: jnp.ndarray,
    normal: jnp.ndarray,  # [..., 3]
    view: jnp.ndarray,  # [..., 3]
    proj_view_matrix: jnp.ndarray,  # [4, 4] row-vector convention: clip = M @ pos
    position: jnp.ndarray,  # [..., 3]
    thickness: jnp.ndarray,  # [...]
    model_scale: jnp.ndarray,  # [...]
    attenuation_distance: jnp.ndarray,  # [...]
    attenuation_colour: jnp.ndarray,  # [..., 3]
    framebuffer_sampler: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    ggx_lut_sampler: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
) -> jnp.ndarray:
    """Once-per-pixel volume refraction (glam-pbr/src/lib.rs:292-354).

    Walks the refracted view ray ``thickness * model_scale`` into the
    volume, projects the exit point into framebuffer UV space, fetches the
    transmitted light from the opaque-framebuffer mip chain at
    ``lod = log2(fb_width) * perceptual_roughness_after_ior``
    (glam-pbr/src/lib.rs:334-335), attenuates via Beer's law, then deweights
    by split-sum specular from the GGX LUT.

    ``framebuffer_sampler(uv [..., 2], lod [...]) -> [..., 3]`` and
    ``ggx_lut_sampler(nov [...], perceptual_roughness [...]) -> [..., 2]``
    mirror the shader's sampler closures (shader/src/lib.rs:126-138).
    """
    ray, ray_length = get_volume_transmission_ray(
        normal, view, thickness, material.index_of_refraction, model_scale
    )
    refracted_ray_exit = position + ray

    exit_h = jnp.concatenate(
        [refracted_ray_exit, jnp.ones_like(refracted_ray_exit[..., :1])], axis=-1
    )
    device_coords = exit_h @ proj_view_matrix.T
    screen_coords = device_coords[..., :2] / device_coords[..., 3:4]
    texture_coords = (screen_coords + 1.0) / 2.0

    framebuffer_lod = jnp.log2(framebuffer_size_x) * apply_ior_to_roughness(
        material.perceptual_roughness, material.index_of_refraction
    )

    transmitted_light = framebuffer_sampler(texture_coords, framebuffer_lod)
    attenuated_colour = apply_volume_attenuation(
        transmitted_light, ray_length, attenuation_distance, attenuation_colour
    )

    # NB: unclamped dot, exactly as the reference (glam-pbr/src/lib.rs:345).
    normal_dot_view = jnp.sum(normal * view, axis=-1)
    brdf = ggx_lut_sampler(normal_dot_view, material.perceptual_roughness)

    f0 = combined_f0(material)
    f90 = combined_f90(material)
    specular_colour = f0 * brdf[..., 0:1] + f90 * brdf[..., 1:2]

    return (1.0 - specular_colour) * attenuated_colour * material.diffuse_colour
