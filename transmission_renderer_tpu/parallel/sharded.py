"""Row-band-sharded render_frame via shard_map.

Each device owns a contiguous band of tile rows:
  * scene + draw list are replicated (scenes are small vs framebuffers),
  * vertex transform / culling / binning are computed per device (cheap,
    avoids a gather), each device then slices its band's bins,
  * opaque raster + shade produce the device's HDR band,
  * one ``all_gather`` assembles the full opaque framebuffer so the
    transmission pass can mip-sample arbitrary UVs (the coarse-mip
    all-gather strategy of SURVEY.md §5.7 — level 0 included for exact
    low-LOD fetches; a ppermute halo path is the planned optimisation),
  * transmissive raster + shade + tonemap stay band-local.

The output is the full tonemapped frame, sharded over rows.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from transmission_renderer_tpu.config import (
    BUCKET_ALPHA_CLIP,
    BUCKET_OPAQUE,
    BUCKET_TRANSMISSION,
    BUCKET_TRANSMISSION_ALPHA_CLIP,
    RenderConfig,
)
from transmission_renderer_tpu.ops.cull import bucket_triangle_masks, cull_instances
from transmission_renderer_tpu.ops.mipchain import build_pyramid
from transmission_renderer_tpu.ops.raster import (
    VisibilityBuffer,
    bin_triangles,
    rasterize_tilelist,
    setup_triangles,
    tile_image,
    untile_image,
)
from transmission_renderer_tpu.pbr import (
    bake_lottes_params,
    cluster_coefficients,
    lottes_tonemap,
)
from transmission_renderer_tpu.pbr.clustering import (
    assign_lights_to_clusters,
    write_cluster_data,
)
from transmission_renderer_tpu.pbr.lights import Lights
from transmission_renderer_tpu.render.frame import (
    DrawList,
    FrameParams,
    SceneFlags,
    _make_alpha_fn,
)
from transmission_renderer_tpu.render.gbuffer import interpolate_gbuffer
from transmission_renderer_tpu.render.shading import (
    ShadeContext,
    shade_opaque,
    shade_transmission,
)
from transmission_renderer_tpu.scene.types import Scene, Similarity, quat_rotate, similarity_apply
from transmission_renderer_tpu.utils.ggx_lut import default_ggx_lut
from transmission_renderer_tpu.utils.platform import f32_matmuls


def make_band_mesh(n_devices: int | None = None) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), ("band",))


def _band_tile_rows(config: RenderConfig, n_bands: int) -> int:
    """Tile rows per band; tiles_y padded up to a multiple of n_bands
    (padded rows raster nothing visible and are cropped)."""
    return -(-config.tiles_y // n_bands)


@f32_matmuls
def render_frame_sharded(
    scene: Scene,
    dl: DrawList,
    params: FrameParams,
    lights: Lights,
    config: RenderConfig,
    mesh: Mesh,
    ggx_lut: jnp.ndarray | None = None,
    flags: SceneFlags | None = None,
):
    """Sharded equivalent of render_frame. Call under jit with the mesh's
    devices available; returns the tonemapped [H, W, 3] frame (row-sharded
    NamedSharding on the first axis)."""
    if flags is None:
        flags = SceneFlags(has_alpha_clip=True, has_transmission=True)
    if ggx_lut is None:
        ggx_lut = jnp.asarray(default_ggx_lut())

    n_bands = mesh.devices.size
    w, h = config.width, config.height
    tw, th = config.tile_w, config.tile_h
    tiles_x = config.tiles_x
    rows_per_band = _band_tile_rows(config, n_bands)
    band_h = rows_per_band * th

    coeffs = cluster_coefficients(config.z_near, config.z_far, config.num_depth_slices)

    def band_body(scene, dl, params, lights, ggx_lut):
        band = jax.lax.axis_index("band")

        # ---- replicated prefix: vertex transform + cull + clusters --------
        inst_t = Similarity(
            translation=scene.inst_transform.translation[dl.vtx_inst],
            scale=scene.inst_transform.scale[dl.vtx_inst],
            rotation=scene.inst_transform.rotation[dl.vtx_inst],
        )
        world_pos = similarity_apply(inst_t, scene.positions[dl.vtx_src])
        world_nrm = quat_rotate(inst_t.rotation, scene.normals[dl.vtx_src])
        uvs = scene.uvs[dl.vtx_src]
        pos_h = jnp.concatenate([world_pos, jnp.ones_like(world_pos[:, :1])], -1)
        clip = pos_h @ params.proj_view.T

        visible = cull_instances(
            scene, params.view, params.frustum_x_xz, params.frustum_y_yz,
            config.z_near,
        )
        tri_scale = scene.inst_transform.scale[dl.tri_inst]
        alpha_fn = _make_alpha_fn(scene, dl, uvs) if flags.has_alpha_clip else None

        aabb_min, aabb_max = write_cluster_data(
            params.inverse_perspective, (w, h),
            (config.num_clusters_x, config.num_clusters_y), coeffs,
        )
        lp_h = jnp.concatenate(
            [lights.position, jnp.ones_like(lights.position[:, :1])], -1
        )
        light_pos_view = (lp_h @ params.view.T)[:, :3]
        spot_dir_view = lights.spot_direction @ params.view[:3, :3].T
        counts, indices = assign_lights_to_clusters(
            aabb_min, aabb_max, light_pos_view, lights.falloff_distance_sq,
            lights.is_a_spotlight(), spot_dir_view, lights.spot_outer_angle,
            config.max_lights_per_cluster,
        )
        ctx = ShadeContext(
            view_position=params.view_position,
            proj_view=params.proj_view,
            sun_dir=params.sun_dir,
            sun_intensity=params.sun_intensity,
            framebuffer_size=(w, h),
            cluster_size_in_pixels=config.cluster_size_in_pixels,
            num_clusters_xy=(config.num_clusters_x, config.num_clusters_y),
            cluster_coeffs=coeffs,
            cluster_light_counts=counts,
            cluster_light_indices=indices,
            lights=lights,
            ggx_lut=ggx_lut,
            debug_clusters=config.debug_clusters,
            tex_slots=flags.tex_slots,
            half_res_refraction=config.half_res_refraction,
        )

        band_tiles = (
            band * rows_per_band * tiles_x
            + jnp.arange(rows_per_band * tiles_x, dtype=jnp.int32)
        )
        row0_px = band * band_h

        def raster_band(bucket_set, init_depth_tiles=None):
            mask = bucket_triangle_masks(dl.tri_inst, dl.tri_bucket, visible, bucket_set)
            setup = setup_triangles(clip, dl.tri_vtx, mask, w, h, tw, th)
            # bin over the padded global tile grid, slice this band's rows
            tiles_y_padded = rows_per_band * n_bands
            bins = bin_triangles(
                setup, tiles_x, tiles_y_padded, config.max_tiles_per_tri,
                config.max_tris_per_tile, config.max_big_tris,
            )
            lst = jax.lax.dynamic_slice_in_dim(
                bins.tile_tri_ids, band * rows_per_band * tiles_x,
                rows_per_band * tiles_x, 0,
            )
            cnt = jax.lax.dynamic_slice_in_dim(
                bins.tile_tri_count, band * rows_per_band * tiles_x,
                rows_per_band * tiles_x, 0,
            )
            tri_ids, depths, barys = rasterize_tilelist(
                setup, band_tiles, lst, cnt, bins.big_tri_ids, bins.big_tri_count,
                w, h, tw, th, alpha_coverage_fn=alpha_fn,
                init_depth_tiles=init_depth_tiles,
            )
            def ut(a):
                return untile_image(
                    a, tiles_x, rows_per_band, tw, th, tiles_x * tw, band_h
                )[:, :w]

            vis = VisibilityBuffer(
                tri_id=ut(tri_ids), depth=ut(depths), bary=ut(barys)
            )
            return setup, vis, tri_ids, depths

        # GBuffer interpolation needs absolute pixel coordinates; shift the
        # derivative/edge evaluation by rendering into a band-local frame
        # whose pixel rows are offset by row0_px. interpolate_gbuffer
        # re-evaluates edges from pixel indices, so pass a shifted view.
        def gbuffer_for(vis, setup):
            return interpolate_gbuffer(
                vis, setup, dl.tri_vtx, dl.tri_material, tri_scale,
                world_pos, world_nrm, uvs, w, h, row_offset=row0_px,
            )

        setup_o, vis_o, _, _ = raster_band((BUCKET_OPAQUE, BUCKET_ALPHA_CLIP))
        g_o = gbuffer_for(vis_o, setup_o)
        hdr_band = shade_opaque(scene, g_o, ctx)

        if flags.has_transmission:
            # Assemble the full opaque framebuffer for arbitrary-UV mip
            # fetches, then mip + transmission band-locally.
            hdr_full = jax.lax.all_gather(hdr_band, "band", axis=0, tiled=True)
            pyramid = build_pyramid(hdr_full[:h])

            init_tiles = tile_image(vis_o.depth, tw, th)
            setup_t, vis_t, _, _ = raster_band(
                (BUCKET_TRANSMISSION, BUCKET_TRANSMISSION_ALPHA_CLIP),
                init_depth_tiles=init_tiles,
            )
            g_t = gbuffer_for(vis_t, setup_t)
            hdr_t = shade_transmission(
                scene, g_t,
                ctx._replace(tex_slots=flags.tex_slots_transmission),
                pyramid,
            )
            hdr_band = jnp.where(g_t.valid[..., None], hdr_t, hdr_band)

        return lottes_tonemap(hdr_band, bake_lottes_params())

    shard = jax.shard_map(
        band_body,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P()),
        out_specs=P("band"),
        check_vma=False,
    )
    ldr_padded = shard(scene, dl, params, lights, ggx_lut)
    return ldr_padded[:h]
