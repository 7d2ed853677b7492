"""Per-pass timing breakdown of the flagship frame on the live backend.

The TPU analogue of the reference's per-pass GPU timestamp collection
(src/profiling.rs:88-131 + the zones wrapped around every pass in
record(), src/main.rs:1642-2260): each frame stage runs as its own jitted
function over device-materialised inputs, timed with a forced 4-byte
readback (on the tunneled axon TPU, block_until_ready returns at enqueue)
and the measured round-trip subtracted.

Usage:  python tools/stage_bench.py [--width W --height H] [--frames N]

Stage boundaries mirror render_frame (render/frame.py); if the frame
graph changes, update the stage list here. The full-frame row at the
bottom is the ground truth the stages should roughly sum to.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/trtpu_jit_cache")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def timeit(fn, *args, n=6, rt=0.0):
    """Time a stage with a 4-byte readback per iteration.

    The timing wrapper reduces the stage's outputs to one scalar INSIDE
    the jitted graph: fetching whole intermediates would ride the ~35 MB/s
    tunnel and swamp the measurement. The untimed first call materialises
    the real outputs for the next stage."""
    f = jax.jit(fn)
    out = f(*args)

    def checksum(*a):
        # full sums (not slices): a partial read would let XLA dead-code
        # -eliminate most of the stage being measured
        leaves = jax.tree_util.tree_leaves(fn(*a))
        acc = jnp.float32(0)
        for x in leaves:
            if hasattr(x, "dtype"):
                acc = acc + jnp.sum(x.astype(jnp.float32))
        return acc

    fc = jax.jit(checksum)
    float(fc(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        float(fc(*args))
    return (time.perf_counter() - t0) / n - rt, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--frames", type=int, default=6)
    ap.add_argument("--dense", action="store_true",
                    help="disable block-sparse shading caps")
    ap.add_argument("--shade-sub", action="store_true",
                    help="also time shade_opaque's material/lights halves")
    args = ap.parse_args()

    from transmission_renderer_tpu.config import (
        BUCKET_TRANSMISSION, BUCKET_TRANSMISSION_ALPHA_CLIP, RenderConfig,
    )
    from transmission_renderer_tpu.models import build_dragon_scene
    from transmission_renderer_tpu.ops.cull import bucket_triangle_masks, cull_instances
    from transmission_renderer_tpu.ops.mipchain import build_pyramid
    from transmission_renderer_tpu.ops.raster import bin_triangles, setup_triangles
    from transmission_renderer_tpu.ops.raster_pallas_gbuf import (
        gather_gbuf_payload, pack_gbuf_payload, rasterize_gbuffer_pallas,
    )
    from transmission_renderer_tpu.pbr import bake_lottes_params, lottes_tonemap
    from transmission_renderer_tpu.pbr.lights import pack_lights, point_light
    from transmission_renderer_tpu.render import make_frame_params, render_frame
    from transmission_renderer_tpu.scene.camera import CameraRig
    from transmission_renderer_tpu.scene.types import Similarity, quat_rotate, similarity_apply

    kw = {}
    if args.dense:
        kw = dict(opaque_block_cap_frac=None, transmission_block_cap_frac=None)
    config = RenderConfig(width=args.width, height=args.height, **kw)
    w, h = config.width, config.height
    scene, dl, flags = build_dragon_scene(roughness_override=0.25).finish_bundle()
    rig = CameraRig()
    rig.camera.position = np.array([0.0, 2.2, 1.5], np.float32)
    rig.camera.pitch = -0.25
    lights = pack_lights([
        point_light([0.0, 0.8, 0.0], [1.0, 0.0, 0.0], 5.0),
        point_light([8.0, 0.8, 0.0], [0.0, 1.0, 0.0], 10.0),
    ])
    params = make_frame_params(
        config, rig.camera.view_matrix(), rig.camera.position, rig.sun_dir()
    )
    print(f"backend={jax.default_backend()} device={jax.devices()[0].device_kind} "
          f"{w}x{h} sparse_caps=({config.opaque_block_cap_frac},"
          f"{config.transmission_block_cap_frac})", file=sys.stderr)

    # round-trip baseline
    trivial = jax.jit(lambda x: jnp.sum(x))
    small = jnp.ones((8,), jnp.float32)
    float(trivial(small))
    t0 = time.perf_counter()
    for _ in range(20):
        float(trivial(small))
    rt = (time.perf_counter() - t0) / 20
    print(f"{'round_trip':28s} {rt*1e3:9.2f} ms")

    n = args.frames
    rows = []

    def stage(name, fn, *sargs):
        dt, out = timeit(fn, *sargs, n=n, rt=rt)
        rows.append((name, dt * 1e3))
        print(f"{name:28s} {dt*1e3:9.2f} ms", flush=True)
        return out

    # ---- stages mirroring render_frame --------------------------------------
    def f_vertex(scene, dl, params):
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
        return world_pos, world_nrm, uvs, clip

    world_pos, world_nrm, uvs, clip = stage("vertex_transform", f_vertex, scene, dl, params)

    def f_setup(scene, dl, params, clip):
        visible = cull_instances(
            scene, params.view, params.frustum_x_xz, params.frustum_y_yz,
            config.z_near,
        )
        is_trans = (dl.tri_bucket == BUCKET_TRANSMISSION) | (
            dl.tri_bucket == BUCKET_TRANSMISSION_ALPHA_CLIP
        )
        mask = bucket_triangle_masks(
            dl.tri_inst, dl.tri_bucket, visible, (0, 1, 2, 3)
        )
        setup = setup_triangles(clip, dl.tri_vtx, mask, w, h,
                                config.tile_w, config.tile_h)
        return setup, is_trans

    setup_all, is_trans = stage("cull+setup", f_setup, scene, dl, params, clip)

    def f_bin(setup, is_trans):
        # class-split bins exactly as render_frame (frame.py): each pass
        # streams only its class's record runs
        return bin_triangles(
            setup, config.tiles_x, config.tiles_y,
            config.pallas_tiles_per_tri, config.max_tris_per_tile,
            config.pallas_max_big_tris, materialize=False,
            class_flags=is_trans.astype(jnp.int32), num_classes=2,
            mid_tile_cap=config.pallas_mid_tile_cap,
            max_mid_tris=config.pallas_max_mid_tris,
        )

    bins = stage("binning_sort", f_bin, setup_all, is_trans)

    def f_payload(setup, dl, world_pos, world_nrm, uvs, is_trans, bins):
        tri_scale = scene.inst_transform.scale[dl.tri_inst]
        records = pack_gbuf_payload(
            setup, dl.tri_vtx, dl.tri_material, tri_scale,
            world_pos, world_nrm, uvs, is_trans,
        )
        return records, gather_gbuf_payload(records, bins)

    records, gpayload = stage(
        "payload_pack+gather", f_payload, setup_all, dl, world_pos, world_nrm,
        uvs, is_trans, bins,
    )

    pos_derivs_o = flags.tex_slots[2]
    pos_derivs_t = flags.tex_slots_transmission[2]

    def f_raster_o(records, bins, gpayload):
        return rasterize_gbuffer_pallas(
            records, bins, w, h, pass_class=0, payload=gpayload,
            pos_derivs=pos_derivs_o,
        )

    g_o = stage("raster_gbuf_opaque", f_raster_o, records, bins, gpayload)

    # clustering + ctx (tiny, folded into shade stage closure)
    from transmission_renderer_tpu.pbr import cluster_coefficients
    from transmission_renderer_tpu.pbr.clustering import (
        assign_lights_to_clusters, write_cluster_data,
    )
    from transmission_renderer_tpu.render.shading import ShadeContext
    from transmission_renderer_tpu.utils.ggx_lut import default_ggx_lut

    coeffs = cluster_coefficients(config.z_near, config.z_far, config.num_depth_slices)

    def f_cluster(params, lights):
        aabb_min, aabb_max = write_cluster_data(
            params.inverse_perspective, (w, h),
            (config.num_clusters_x, config.num_clusters_y), coeffs,
        )
        lp_h = jnp.concatenate(
            [lights.position, jnp.ones_like(lights.position[:, :1])], -1
        )
        light_pos_view = (lp_h @ params.view.T)[:, :3]
        spot_dir_view = lights.spot_direction @ params.view[:3, :3].T
        return assign_lights_to_clusters(
            aabb_min, aabb_max, light_pos_view, lights.falloff_distance_sq,
            lights.is_a_spotlight(), spot_dir_view, lights.spot_outer_angle,
            config.max_lights_per_cluster,
        )

    counts, indices = stage("clustering", f_cluster, params, lights)
    ggx_lut = jnp.asarray(default_ggx_lut())

    def make_ctx(tex_slots):
        return ShadeContext(
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
            tex_slots=tex_slots,
        )

    from transmission_renderer_tpu.render.frame import _gather_gbuffer
    from transmission_renderer_tpu.render.shading import (
        shade_opaque, shade_opaque_flat, shade_transmission,
        shade_transmission_flat,
    )
    from transmission_renderer_tpu.render.sparse import (
        block_gather, block_scatter, compact_blocks, num_blocks, pixel_coords,
    )

    nb = num_blocks(h, w)

    def f_shade_o(g_o):
        ctx = make_ctx(flags.tex_slots)
        if config.opaque_block_cap_frac is not None:
            cap = min(int(np.ceil(nb * config.opaque_block_cap_frac)), nb)
            wk = compact_blocks(g_o.valid, cap)
            gf = _gather_gbuffer(wk, g_o)
            px, py = pixel_coords(wk)
            out = shade_opaque_flat(scene, gf, ctx, px, py)
            return block_scatter(wk, out, jnp.zeros((h, w, 3), jnp.float32))
        return shade_opaque(scene, g_o, ctx)

    hdr = stage("shade_opaque", f_shade_o, g_o)

    if args.shade_sub:
        from transmission_renderer_tpu.render.shading import (
            _dense_coords,
            evaluate_lights_common,
            evaluate_pixel_material,
            flatten_gbuffer,
        )

        gf = jax.jit(flatten_gbuffer)(g_o)
        pxd, pyd = _dense_coords(h, w)

        def f_mat(gf):
            ctx = make_ctx(flags.tex_slots)
            return evaluate_pixel_material(scene, gf, ctx.tex_slots)

        pm = stage("  shade_o/material", f_mat, gf)

        def f_lights(gf, pm):
            ctx = make_ctx(flags.tex_slots)
            view_vector = ctx.view_position - gf.position
            view = view_vector / jnp.maximum(
                jnp.linalg.norm(view_vector, axis=-1, keepdims=True), 1e-12
            )
            r, _, _, _ = evaluate_lights_common(
                ctx, pm.params, view, gf.position, pm.normal, gf.depth,
                pxd, pyd, with_transmission=False,
            )
            return r.diffuse + r.specular

        stage("  shade_o/lights", f_lights, gf, pm)
    pyramid = stage("mip_pyramid", build_pyramid, hdr)

    def f_raster_t_dense(records, bins, gpayload, g_o):
        return rasterize_gbuffer_pallas(
            records, bins, w, h, pass_class=1, payload=gpayload,
            init_depth=g_o.depth, pos_derivs=pos_derivs_t,
        )

    # sparse-tile variant (what render_frame actually runs; frame.py)
    from transmission_renderer_tpu.render.frame import (
        _rasterize_class_sparse, _tile_cap,
    )
    from transmission_renderer_tpu.ops.raster import tile_image, untile_image
    from transmission_renderer_tpu.ops.raster_pallas_gbuf import (
        TILE_H, TILE_W, gbuffer_from_channels,
    )

    n_tiles = config.tiles_x * config.tiles_y
    cap_rt = _tile_cap(config.transmission_tile_cap_frac, n_tiles,
                       config.sparse_raster_tile_floor)

    def f_raster_t(records, bins, gpayload, g_o):
        if not cap_rt:
            return f_raster_t_dense(records, bins, gpayload, g_o)
        init_tiles = tile_image(g_o.depth, TILE_W, TILE_H)
        ch_t, cnt, _ = _rasterize_class_sparse(
            gpayload, bins.tile_start, jnp.zeros((), jnp.int32), 1, cap_rt,
            init_tiles, config, w, h, pos_derivs=pos_derivs_t,
        )
        return gbuffer_from_channels({
            name: untile_image(a, config.tiles_x, config.tiles_y,
                               TILE_W, TILE_H, w, h)
            for name, a in ch_t.items()
        })

    stage("raster_gbuf_trans_dense", f_raster_t_dense, records, bins, gpayload, g_o)
    g_t = stage("raster_gbuf_transmission", f_raster_t, records, bins, gpayload, g_o)

    from transmission_renderer_tpu.render.frame import refraction_level_set

    level_set = refraction_level_set(flags, w, build_pyramid(
        jnp.zeros((h, w, 3), jnp.float32)).num_levels)

    # the pyramid's offsets/widths/heights are static Python ints inside
    # the frame jit; crossing the stage boundary as an argument would
    # trace them — re-attach the statics and pass only the level arrays
    pyr_static = build_pyramid(jnp.zeros((h, w, 3), jnp.float32))

    def f_shade_t_inner(g_t, hdr, level_quads):
        pyramid = pyr_static._replace(level_quads=level_quads)
        return f_shade_t(g_t, hdr, pyramid)

    def f_shade_t(g_t, hdr, pyramid):
        ctx = make_ctx(flags.tex_slots_transmission)
        if config.transmission_block_cap_frac is not None:
            cap = min(max(int(np.ceil(nb * config.transmission_block_cap_frac)),
                          256), nb)
            wk = compact_blocks(g_t.valid, cap)
            gf = _gather_gbuffer(wk, g_t)
            px, py = pixel_coords(wk)
            out = shade_transmission_flat(scene, gf, ctx, pyramid, px, py,
                                          pyramid_level_set=level_set)
            merged = jnp.where(gf.valid[..., None], out, block_gather(wk, hdr))
            return block_scatter(wk, merged, hdr)
        out = shade_transmission(scene, g_t, ctx, pyramid,
                                 pyramid_level_set=level_set)
        return jnp.where(g_t.valid[..., None], out, hdr)

    hdr2 = stage("shade_transmission", f_shade_t_inner, g_t, hdr,
                 pyramid.level_quads)

    stage("tonemap", lambda x: lottes_tonemap(x, bake_lottes_params()), hdr2)

    total = sum(ms for _, ms in rows)
    print(f"{'-- sum of stages':28s} {total:9.2f} ms")

    def f_full(scene, dl, params, lights):
        return jnp.sum(render_frame(scene, dl, params, lights,
                                    config=config, flags=flags))

    dt, _ = timeit(f_full, scene, dl, params, lights, n=n, rt=rt)
    print(f"{'== full frame':28s} {dt*1e3:9.2f} ms   ({1.0/max(dt,1e-6):.2f} fps)")

    # block coverage -> informs the sparse cap fractions
    cov = jax.jit(
        lambda go_v, gt_v: (
            jnp.sum(jnp.any(go_v.reshape(-1, 128), 1)),
            jnp.sum(jnp.any(gt_v.reshape(-1, 128), 1)),
        )
    )(g_o.valid, g_t.valid)
    print(f"coverage: opaque {int(cov[0])}/{nb} blocks "
          f"({int(cov[0])/nb:.3f}), transmission {int(cov[1])}/{nb} "
          f"({int(cov[1])/nb:.3f})")


if __name__ == "__main__":
    main()
