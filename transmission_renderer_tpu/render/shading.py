"""Deferred shading passes — the fragment-shader equivalents.

``shade_opaque`` reproduces ``fragment`` (shader/src/lib.rs:164-249);
``shade_transmission`` reproduces ``fragment_transmission``
(shader/src/lib.rs:37-162). Both run dense over the G-buffer; per-pixel
material/texture fetches are gathers into the material SoA / texel atlas.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from transmission_renderer_tpu.ops.mipchain import MipPyramid, sample_pyramid_lod
from transmission_renderer_tpu.ops.texture import (
    WRAP_REPEAT,
    sample_lut_2ch,
    sample_texture_rows,
)
from transmission_renderer_tpu.pbr import (
    ClusterCoefficients,
    MaterialParams,
    basic_brdf,
    get_depth_slice,
    ibl_volume_refraction,
    light_direction_and_attenuation,
    spotlight_factor,
    transmission_btdf,
)
from transmission_renderer_tpu.pbr.lights import Lights
from transmission_renderer_tpu.render.gbuffer import GBuffer
from transmission_renderer_tpu.scene.types import Scene


class ShadeContext(NamedTuple):
    """Per-frame shading uniforms (the reference's PushConstants + Uniforms,
    shared-structs/src/lib.rs:11-29)."""

    view_position: jnp.ndarray  # [3]
    proj_view: jnp.ndarray  # [4, 4]
    sun_dir: jnp.ndarray  # [3]
    sun_intensity: jnp.ndarray  # [3]
    framebuffer_size: tuple[int, int]  # static (W, H)
    cluster_size_in_pixels: tuple[float, float]
    num_clusters_xy: tuple[int, int]
    cluster_coeffs: ClusterCoefficients
    cluster_light_counts: jnp.ndarray  # [C] uint32
    cluster_light_indices: jnp.ndarray  # [C, K] uint32
    lights: Lights
    ggx_lut: jnp.ndarray  # [S, S, 2]
    debug_clusters: bool = False
    # static per-slot texture gating (see SceneFlags.tex_slots); order:
    # diffuse, metallic_roughness, normal_map, emissive, occlusion,
    # transmission, thickness, specular, specular_colour
    tex_slots: tuple = (True,) * 9
    # half-res framebuffer fetch in the transmission pass (see
    # RenderConfig.half_res_refraction)
    half_res_refraction: bool = False
    # shadow factors per pixel per light come from the ray-traced path
    # (None -> factor 1.0, the non-RayQuery variant)
    sun_shadow_factor: jnp.ndarray | None = None  # [H, W]
    light_shadow_factors: jnp.ndarray | None = None  # [H, W, L]


def _mip_lod(duv_dx, duv_dy, tex_w, tex_h):
    """Vulkan-style implicit LOD: log2 of the max screen-space texel
    footprint (the trilinear sampler behaviour the reference gets from
    hardware)."""
    size = jnp.stack([tex_w, tex_h], -1).astype(jnp.float32)
    fx = duv_dx * size
    fy = duv_dy * size
    rho = jnp.maximum(
        jnp.sum(fx * fx, axis=-1), jnp.sum(fy * fy, axis=-1)
    )
    return 0.5 * jnp.log2(jnp.maximum(rho, 1e-12))


def _sample_material_texture(
    scene: Scene, tex_id, uv, duv_dx, duv_dy
):
    """Implicit-LOD trilinear sample; callers mask tex_id == -1.

    One meta-row gather serves both the LOD computation (level-0 size)
    and the level lookups inside the sampler."""
    safe = jnp.maximum(tex_id, 0)
    rows = scene.atlas_meta[safe]  # [..., META_COLS]
    lod = _mip_lod(duv_dx, duv_dy, rows[..., 3], rows[..., 4])
    return sample_texture_rows(scene.atlas_texels, rows, uv, lod, WRAP_REPEAT)


class PixelMaterial(NamedTuple):
    params: MaterialParams
    diffuse_alpha: jnp.ndarray
    emission: jnp.ndarray
    transmission_factor: jnp.ndarray
    thickness: jnp.ndarray
    attenuation_distance: jnp.ndarray
    attenuation_colour: jnp.ndarray
    normal: jnp.ndarray  # shading normal after normal mapping


def evaluate_pixel_material(
    scene: Scene,
    g: GBuffer,
    view_vector: jnp.ndarray,
    tex_slots: tuple = (True,) * 9,
):
    """Per-pixel material evaluation: diffuse/emission/metallic-roughness/
    specular/transmission texture fetches + normal mapping
    (get_material_params shader/src/lighting.rs:261-301, get_emission
    :303-313, calculate_normal :222-259, plus the transmission/thickness
    fetches of fragment_transmission shader/src/lib.rs:37-162, 120-124).

    ``tex_slots`` statically gates each texture slot: slots no material in
    the scene uses skip their ~8 gathers/pixel entirely — the trace-time
    analogue of the shader's per-fragment ``!= -1`` branches."""
    m = scene.materials
    mid = g.material_id
    (
        use_diffuse, use_mr, use_normal, use_emissive, _use_occlusion,
        use_transmission, use_thickness, use_specular, use_specular_colour,
    ) = tex_slots

    # Pack all material columns into two matrices so the per-pixel fetch is
    # TWO row gathers instead of ~25 (TPU gathers cost by index count).
    f32col = lambda x: x[:, None].astype(jnp.float32)
    fmat = jnp.concatenate(
        [
            f32col(m.metallic_factor),          # 0
            f32col(m.roughness_factor),         # 1
            m.diffuse_factor,                   # 2:6
            m.emissive_factor,                  # 6:9
            f32col(m.index_of_refraction),      # 9
            f32col(m.transmission_factor),      # 10
            f32col(m.thickness_factor),         # 11
            f32col(m.attenuation_distance),     # 12
            m.attenuation_colour,               # 13:16
            f32col(m.specular_factor),          # 16
            m.specular_colour_factor,           # 17:20
        ],
        axis=1,
    )
    imat = jnp.stack(
        [
            m.tex_diffuse, m.tex_metallic_roughness, m.tex_normal_map,
            m.tex_emissive, m.tex_transmission, m.tex_thickness,
            m.tex_specular, m.tex_specular_colour,
        ],
        axis=1,
    )
    frow = fmat[mid]  # [H, W, 20]
    irow = imat[mid]  # [H, W, 8]

    def tex4(slot):
        tid = irow[..., slot]
        sample = _sample_material_texture(scene, tid, g.uv, g.duv_dx, g.duv_dy)
        return tid, sample

    # diffuse (sRGB)
    diffuse = frow[..., 2:6]
    if use_diffuse:
        tid, s = tex4(0)
        diffuse = jnp.where((tid >= 0)[..., None], diffuse * s, diffuse)

    # metallic/roughness — note the z/y (B/G) channel swap
    # (shader/src/lighting.rs:269-277)
    metallic = frow[..., 0]
    roughness = frow[..., 1]
    if use_mr:
        tid, s = tex4(1)
        metallic = jnp.where(tid >= 0, metallic * s[..., 2], metallic)
        roughness = jnp.where(tid >= 0, roughness * s[..., 1], roughness)

    # specular extension
    specular_colour = frow[..., 17:20]
    if use_specular_colour:
        tid, s = tex4(7)
        specular_colour = jnp.where(
            (tid >= 0)[..., None], specular_colour * s[..., :3], specular_colour
        )
    specular_factor = frow[..., 16]
    if use_specular:
        tid, s = tex4(6)
        specular_factor = jnp.where(
            tid >= 0, specular_factor * s[..., 3], specular_factor
        )

    # emission (sRGB)
    emission = frow[..., 6:9]
    if use_emissive:
        tid, s = tex4(3)
        emission = jnp.where((tid >= 0)[..., None], emission * s[..., :3], emission)

    # transmission & thickness
    transmission_factor = frow[..., 10]
    if use_transmission:
        tid, s = tex4(4)
        transmission_factor = jnp.where(
            tid >= 0, transmission_factor * s[..., 0], transmission_factor
        )
    thickness = frow[..., 11]
    if use_thickness:
        tid, s = tex4(5)
        thickness = jnp.where(tid >= 0, thickness * s[..., 1], thickness)

    # normal mapping via the screen-space cotangent frame
    # (shader/src/lighting.rs:243-259), using analytic derivatives
    normal = g.normal / jnp.maximum(
        jnp.linalg.norm(g.normal, axis=-1, keepdims=True), 1e-12
    )
    if use_normal:
        tid = irow[..., 2]
        map_sample = _sample_material_texture(scene, tid, g.uv, g.duv_dx, g.duv_dy)
        map_normal = map_sample[..., :3] * (255.0 / 127.0) - (128.0 / 127.0)
        # cotangent frame from dp/dx, dp/dy, duv/dx, duv/dy. The reference
        # uses -view_vector as 'position' for the derivatives; analytic
        # world-pos derivatives are equivalent up to the camera offset.
        dp1 = g.dpos_dx
        dp2 = g.dpos_dy
        duv1 = g.duv_dx
        duv2 = g.duv_dy
        dp2perp = jnp.cross(dp2, normal)
        dp1perp = jnp.cross(normal, dp1)
        t = dp2perp * duv1[..., 0:1] + dp1perp * duv2[..., 0:1]
        bt = dp2perp * duv1[..., 1:2] + dp1perp * duv2[..., 1:2]
        invmax = 1.0 / jnp.sqrt(
            jnp.maximum(
                jnp.maximum(jnp.sum(t * t, axis=-1), jnp.sum(bt * bt, axis=-1)),
                1e-20,
            )
        )
        mapped = (
            t * invmax[..., None] * map_normal[..., 0:1]
            + bt * invmax[..., None] * map_normal[..., 1:2]
            + normal * map_normal[..., 2:3]
        )
        mapped = mapped / jnp.maximum(
            jnp.linalg.norm(mapped, axis=-1, keepdims=True), 1e-12
        )
        normal = jnp.where((tid >= 0)[..., None], mapped, normal)

    params = MaterialParams(
        diffuse_colour=diffuse[..., :3],
        metallic=metallic,
        perceptual_roughness=roughness,
        index_of_refraction=frow[..., 9],
        specular_colour=specular_colour,
        specular_factor=specular_factor,
    )
    return PixelMaterial(
        params=params,
        diffuse_alpha=diffuse[..., 3],
        emission=emission,
        transmission_factor=transmission_factor,
        thickness=thickness,
        attenuation_distance=frow[..., 12],
        attenuation_colour=frow[..., 13:16],
        normal=normal,
    )


def _cluster_index(ctx: ShadeContext, depth: jnp.ndarray, shape):
    """Fragment -> cluster id (shader/src/lib.rs:205-215)."""
    h, w = shape
    cx, cy = ctx.num_clusters_xy
    px = jnp.arange(w, dtype=jnp.float32)[None, :] + 0.5
    py = jnp.arange(h, dtype=jnp.float32)[:, None] + 0.5
    cluster_x = jnp.minimum(
        (px / ctx.cluster_size_in_pixels[0]).astype(jnp.uint32), cx - 1
    )
    cluster_y = jnp.minimum(
        (py / ctx.cluster_size_in_pixels[1]).astype(jnp.uint32), cy - 1
    )
    cluster_z = get_depth_slice(ctx.cluster_coeffs, depth)
    cluster_z = jnp.minimum(cluster_z, ctx.cluster_coeffs.num_depth_slices - 1)
    return (
        cluster_z * (cx * cy)
        + jnp.broadcast_to(cluster_y, (h, w)) * cx
        + jnp.broadcast_to(cluster_x, (h, w))
    ).astype(jnp.int32)


def evaluate_lights_common(
    ctx: ShadeContext,
    material: MaterialParams,
    view: jnp.ndarray,
    position: jnp.ndarray,
    normal: jnp.ndarray,
    depth: jnp.ndarray,
    with_transmission: bool,
):
    """The clustered light loop shared by both fragment shaders
    (evaluate_lights / evaluate_lights_transmission,
    shader/src/lighting.rs:13-95, 145-220).

    Returns (BrdfResult sum, transmission accumulation [H, W, 3] or None).
    """
    h, w = depth.shape
    cluster = _cluster_index(ctx, depth, (h, w))
    num_lights = ctx.lights.num

    # Fused cluster fetch: [count, idx_0..idx_{S-1}] in ONE row gather
    # (TPU gathers cost by index count, not row width).
    max_slots = min(num_lights, ctx.cluster_light_indices.shape[1])
    cluster_table = jnp.concatenate(
        [
            ctx.cluster_light_counts[:, None].astype(jnp.int32),
            ctx.cluster_light_indices[:, :max_slots].astype(jnp.int32),
        ],
        axis=1,
    )
    cluster_rows = cluster_table[cluster]  # [H, W, 1 + S]
    counts = cluster_rows[..., 0]

    sun_factor = (
        ctx.sun_shadow_factor
        if ctx.sun_shadow_factor is not None
        else jnp.ones((h, w), jnp.float32)
    )
    if not with_transmission and ctx.sun_shadow_factor is not None:
        # ambient floor on ray-traced sun shadows (shader/src/lighting.rs:166)
        sun_factor = jnp.maximum(sun_factor, 0.1)

    sun_intensity = ctx.sun_intensity * sun_factor[..., None]
    result = basic_brdf(normal, ctx.sun_dir, sun_intensity, view, material)
    transmission = None
    if with_transmission:
        transmission = sun_intensity * transmission_btdf(
            material, normal, view, jnp.broadcast_to(ctx.sun_dir, position.shape)
        )

    # Clustered loop: slot i reads the cluster's i-th accepted light.
    # num_lights is tiny (<= a handful) so a Python loop unrolls cleanly.
    for slot in range(max_slots):
        light_idx = cluster_rows[..., 1 + slot]
        active = slot < counts

        l_pos = ctx.lights.position[light_idx]
        direction, distance, attenuation = light_direction_and_attenuation(
            position, l_pos
        )
        factor = jnp.where(active, 1.0, 0.0)
        if ctx.light_shadow_factors is not None:
            factor = factor * jnp.take_along_axis(
                ctx.light_shadow_factors, light_idx[..., None], axis=-1
            )[..., 0]
        # spotlight factor (guard epsilon=0 point lights)
        is_spot = ctx.lights.is_a_spotlight()[light_idx]
        eps = jnp.where(
            ctx.lights.spot_epsilon[light_idx] == 0.0,
            1.0,
            ctx.lights.spot_epsilon[light_idx],
        )
        spot = spotlight_factor(
            direction,
            ctx.lights.spot_direction[light_idx],
            ctx.lights.spot_outer_angle[light_idx],
            eps,
        )
        if not with_transmission:
            # only evaluate_lights applies the spot factor
            # (shader/src/lighting.rs:201-203)
            factor = factor * jnp.where(is_spot, spot, 1.0)

        light_emission = ctx.lights.colour_emission[light_idx] * factor[..., None]
        radiance = light_emission * attenuation[..., None]
        contrib = basic_brdf(normal, direction, radiance, view, material)
        result = result + contrib
        if with_transmission:
            transmission = transmission + radiance * transmission_btdf(
                material, normal, view, direction
            )

    return result, transmission, cluster, counts


_DEBUG_COLOURS = jnp.array(
    [  # shader/src/lib.rs:647-664
        [0.0, 0.0, 0.0],
        [0.0, 0.0, 0.1647],
        [0.0, 0.0, 0.3647],
        [0.0, 0.0, 0.6647],
        [0.0, 0.0, 0.9647],
        [0.0, 0.9255, 0.9255],
        [0.0, 0.5647, 0.0],
        [0.0, 0.7843, 0.0],
        [1.0, 1.0, 0.0],
        [0.90588, 0.75294, 0.0],
        [1.0, 0.5647, 0.0],
        [1.0, 0.0, 0.0],
        [0.8392, 0.0, 0.0],
        [1.0, 0.0, 1.0],
        [0.6, 0.3333, 0.7882],
    ],
    jnp.float32,
)


def shade_opaque(
    scene: Scene, g: GBuffer, ctx: ShadeContext
) -> jnp.ndarray:
    """The opaque PBR fragment shader (shader/src/lib.rs:164-249).
    Returns [H, W, 3] HDR; background pixels are black (the draw pass
    clears to zero)."""
    view_vector = ctx.view_position - g.position
    view = view_vector / jnp.maximum(
        jnp.linalg.norm(view_vector, axis=-1, keepdims=True), 1e-12
    )
    pm = evaluate_pixel_material(scene, g, view_vector, ctx.tex_slots)

    result, _, cluster, counts = evaluate_lights_common(
        ctx, pm.params, view, g.position, pm.normal, g.depth, with_transmission=False
    )
    out = result.diffuse + result.specular + pm.emission

    if ctx.debug_clusters:
        # cluster false-colouring oracle (shader/src/lib.rs:241-245)
        c1 = _DEBUG_COLOURS[counts.astype(jnp.int32) % 15]
        c2 = _DEBUG_COLOURS[cluster % 15]
        out = c1 + (c2 - 0.5) * 0.025

    return jnp.where(g.valid[..., None], out, 0.0)


def shade_transmission(
    scene: Scene,
    g: GBuffer,
    ctx: ShadeContext,
    opaque_pyramid: MipPyramid,
) -> jnp.ndarray:
    """The transmission fragment shader (shader/src/lib.rs:37-162).
    Returns [H, W, 3] HDR for transmissive-covered pixels (callers select
    by g.valid)."""
    view_vector = ctx.view_position - g.position
    view = view_vector / jnp.maximum(
        jnp.linalg.norm(view_vector, axis=-1, keepdims=True), 1e-12
    )
    pm = evaluate_pixel_material(scene, g, view_vector, ctx.tex_slots)

    result, transmission, _, _ = evaluate_lights_common(
        ctx, pm.params, view, g.position, pm.normal, g.depth, with_transmission=True
    )

    if ctx.half_res_refraction:
        import jax

        def fb_sampler(uv, lod):
            c = sample_pyramid_lod(
                opaque_pyramid, uv[::2, ::2], lod[::2, ::2]
            )
            return jax.image.resize(c, uv.shape[:2] + (3,), "linear")

    else:
        fb_sampler = lambda uv, lod: sample_pyramid_lod(opaque_pyramid, uv, lod)
    lut_sampler = lambda nov, rough: sample_lut_2ch(ctx.ggx_lut, nov, rough)

    transmission = transmission + ibl_volume_refraction(
        pm.params,
        jnp.float32(ctx.framebuffer_size[0]),
        pm.normal,
        view,
        ctx.proj_view,
        g.position,
        pm.thickness,
        g.model_scale,
        pm.attenuation_distance,
        pm.attenuation_colour,
        fb_sampler,
        lut_sampler,
    )

    real_transmission = pm.transmission_factor[..., None] * transmission
    diffuse = result.diffuse + (
        real_transmission - result.diffuse
    ) * pm.transmission_factor[..., None]
    out = diffuse + result.specular + pm.emission
    return jnp.where(g.valid[..., None], out, 0.0)
