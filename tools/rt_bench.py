"""RT traversal economics: µs/ray on the real device, per lever.

Measures the batched BVH walk (ops/bvh.py::trace_rays) on the flagship
dragon BVH under the ray populations the frame actually traces, so
PERFORMANCE.md's RT section can cite per-lever numbers
(VERDICT r2 next #2):

  frame_rays      the opaque pass's real ray mix (sun + L point lights
                  from G-buffer positions) — coherent, mixed t_max
  frame_gated     same, with cluster-gating zeroing t_max on
                  (pixel, light) pairs outside the cluster list
                  (render/shading.py::cluster_light_mask)
  frame_halfres   the --half-res-shadow-rays population (rays / 4)
  incoherent      uniform-random directions from random scene points —
                  the adversarial upper bound the round-2 11 µs/ray
                  number was measured on

Timing follows bench.py's tunnel methodology: forced 4-byte readback,
round-trip measured before/after and the smaller estimate subtracted,
per-ray cost from the per-frame MIN of n reps.

Usage: python tools/rt_bench.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def measure_round_trip(n=6):
    one = jnp.zeros((), jnp.float32)
    float(one)  # warm transfer path
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(one + 1.0)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def timed(fn, *args, reps=5):
    """min seconds over reps, round-trip subtracted (bench.py method)."""
    out = fn(*args)
    jax.block_until_ready(out)
    float(jnp.asarray(out[0]).sum())  # force compile + warm readback
    rt0 = measure_round_trip()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        r = fn(*args)
        float(jnp.asarray(r[0]).sum())
        ts.append(time.perf_counter() - t0)
    rt1 = measure_round_trip()
    return min(ts) - min(rt0, rt1)


def main():
    args = [a for a in sys.argv[1:] if a != "--cpu"]
    cpu = "--cpu" in sys.argv
    if cpu:  # correctness smoke mode (tiny shapes, CPU)
        from transmission_renderer_tpu.utils.platform import force_cpu

        force_cpu()
    reps = int(args[0]) if args else 5

    from transmission_renderer_tpu.config import RenderConfig
    from transmission_renderer_tpu.models import build_dragon_scene
    from transmission_renderer_tpu.ops.bvh import refit_bvh, trace_rays
    from transmission_renderer_tpu.pbr.lights import pack_lights, point_light
    from transmission_renderer_tpu.render import make_frame_params
    from transmission_renderer_tpu.render.frame import render_frame
    from transmission_renderer_tpu.scene.camera import CameraRig

    print(f"backend={jax.default_backend()} "
          f"device={jax.devices()[0].device_kind}", file=sys.stderr)

    if cpu:
        builder = build_dragon_scene(
            stacks=60, sectors=120, roughness_override=0.25
        )
    else:
        builder = build_dragon_scene(roughness_override=0.25)
    scene, dl, flags = builder.finish_bundle()
    bvh = builder.build_rt_bvh()
    rig = CameraRig()
    w, h = (320, 180) if cpu else (1920, 1080)
    cfg = (
        RenderConfig(width=w, height=h, tile_w=32, tile_h=8,
                     max_tris_per_tile=4096, max_tiles_per_tri=64,
                     max_big_tris=256)
        if cpu else RenderConfig(width=w, height=h)
    )
    params = make_frame_params(
        cfg, rig.camera.view_matrix(), rig.camera.position, rig.sun_dir()
    )
    lights = pack_lights([
        point_light([0.0, 0.8, 0.0], [1.0, 0.0, 0.0], 5.0),
        point_light([8.0, 0.8, 0.0], [0.0, 1.0, 0.0], 10.0),
    ])

    # ---- recover the opaque G-buffer the frame traces from -------------
    # Spy-in-trace: patch the raster kernel's entry so the first call
    # (the opaque pass) captures its G-buffer tracers, and return them
    # from the jitted wrapper alongside the image — same trace, so the
    # captured tracers are legal outputs.
    import transmission_renderer_tpu.ops.raster_pallas_gbuf as rgb_mod
    import transmission_renderer_tpu.render.frame as frame_mod

    real_raster = rgb_mod.rasterize_gbuffer_pallas
    real_interp = frame_mod.interpolate_gbuffer
    captured = {}

    def spy(*a, **k):
        g = real_raster(*a, **k)
        captured.setdefault("g", g)
        return g

    def spy_interp(*a, **k):  # the CPU / pure-JAX raster path
        g = real_interp(*a, **k)
        captured.setdefault("g", g)
        return g

    rgb_mod.rasterize_gbuffer_pallas = spy
    frame_mod.interpolate_gbuffer = spy_interp

    def wrapper(scene, dl, params, lights):
        captured.clear()
        img = render_frame(
            scene, dl, params, lights, config=cfg, flags=flags
        )
        g = captured["g"]
        return img, g.position, g.valid, g.depth

    _, pos, valid2d, depth = jax.jit(wrapper)(scene, dl, params, lights)
    rgb_mod.rasterize_gbuffer_pallas = real_raster
    frame_mod.interpolate_gbuffer = real_interp
    jax.block_until_ready(pos)

    # world positions + refit BVH, exactly as render_frame does
    from transmission_renderer_tpu.scene.types import (
        Similarity,
        similarity_apply,
    )

    def world_positions(scene, dl):
        inst_t = Similarity(
            translation=scene.inst_transform.translation[dl.vtx_inst],
            scale=scene.inst_transform.scale[dl.vtx_inst],
            rotation=scene.inst_transform.rotation[dl.vtx_inst],
        )
        return similarity_apply(inst_t, scene.positions[dl.vtx_src])

    world_pos = jax.jit(world_positions)(scene, dl)
    bvh_r = jax.jit(refit_bvh)(bvh, dl.tri_vtx, world_pos)

    class _GO:
        pass

    g_o = _GO()
    g_o.position = pos
    g_o.valid = valid2d
    g_o.depth = depth

    origins = g_o.position.reshape(-1, 3)
    n = origins.shape[0]
    valid = g_o.valid.reshape(-1)

    sun = jnp.asarray(params.sun_dir)

    def ray_population(light_mask=None, stride=1):
        """Build the [K, n', 3] frame ray batch like shadow_factors."""
        o = origins.reshape(h, w, 3)[::stride, ::stride].reshape(-1, 3)
        va = valid.reshape(h, w)[::stride, ::stride].reshape(-1)
        m = o.shape[0]
        dirs = [jnp.broadcast_to(sun, (m, 3))]
        tmaxs = [jnp.where(va, 10_000.0, 0.0)]
        for li in range(lights.num):
            to_l = lights.position[li] - o
            dist = jnp.linalg.norm(to_l, axis=-1)
            dirs.append(to_l / jnp.maximum(dist[..., None], 1e-12))
            live = va
            if light_mask is not None:
                lm = light_mask[..., li].reshape(h, w)[::stride, ::stride]
                live = live & lm.reshape(-1)
            tmaxs.append(jnp.where(live, dist, 0.0))
        return (
            jnp.broadcast_to(o, (1 + lights.num, m, 3)),
            jnp.stack(dirs),
            jnp.stack(tmaxs),
        )

    trace = jax.jit(
        lambda o, d, t: trace_rays(
            bvh_r, dl.tri_vtx, world_pos, o, d, t_max=t, any_hit=True
        )
    )

    rows = []

    trace_t = jax.jit(
        lambda o, d, t: trace_rays(
            bvh_r, dl.tri_vtx, world_pos, o, d, t_max=t, any_hit=True,
            return_trips=True,
        )
    )

    def run(name, o, d, t, n_eff=None):
        sec = timed(trace, o, d, t, reps=reps)
        total = o.shape[0] * o.shape[1]
        n_eff = total if n_eff is None else n_eff
        rows.append((name, total, n_eff, sec))
        # traversal-economics telemetry: per-lane pop counts
        tr = np.asarray(trace_t(o, d, t)[-1]).reshape(-1)
        live = np.asarray(t).reshape(-1) > 0
        tl = tr[live] if live.any() else tr
        print(f"{name:>14}: {sec*1e3:8.1f} ms  {total/1e6:5.2f}M rays "
              f"({n_eff/1e6:5.2f}M live)  "
              f"{sec/total*1e6:6.2f} µs/ray  "
              f"{sec/max(n_eff,1)*1e6:6.2f} µs/live-ray  "
              f"pops mean={tl.mean():.1f} p99={np.percentile(tl, 99):.0f} "
              f"max={tl.max()}",
              file=sys.stderr, flush=True)

    # 1. the frame's real ray mix, ungated
    o, d, t = ray_population()
    run("frame_rays", o, d, t, n_eff=int((np.asarray(t) > 0).sum()))

    # 2. cluster-gated (what render_frame now traces) — rebuild the
    # cluster tables exactly as render_frame does (frame.py ---- 3.)
    from transmission_renderer_tpu.pbr.clustering import (
        assign_lights_to_clusters,
    )
    from transmission_renderer_tpu.render.frame import _static_cluster_data
    from transmission_renderer_tpu.render.shading import cluster_light_mask

    coeffs, aabb_min, aabb_max = _static_cluster_data(cfg)
    lp_h = jnp.concatenate(
        [lights.position, jnp.ones_like(lights.position[:, :1])], -1
    )
    light_pos_view = (lp_h @ params.view.T)[:, :3]
    spot_dir_view = lights.spot_direction @ params.view[:3, :3].T
    counts, indices = jax.jit(assign_lights_to_clusters, static_argnums=7)(
        aabb_min, aabb_max, light_pos_view, lights.falloff_distance_sq,
        lights.is_a_spotlight(), spot_dir_view, lights.spot_outer_angle,
        cfg.max_lights_per_cluster,
    )

    class _Ctx:
        pass

    shim = _Ctx()
    shim.num_clusters_xy = (cfg.num_clusters_x, cfg.num_clusters_y)
    shim.cluster_size_in_pixels = cfg.cluster_size_in_pixels
    shim.cluster_coeffs = coeffs
    shim.cluster_light_counts = counts
    shim.cluster_light_indices = indices
    shim.lights = lights

    px = jnp.broadcast_to(jnp.arange(w, dtype=jnp.int32)[None, :], (h, w))
    py = jnp.broadcast_to(jnp.arange(h, dtype=jnp.int32)[:, None], (h, w))
    mask = jax.jit(
        lambda depth: cluster_light_mask(shim, depth, px, py)
    )(g_o.depth)
    o, d, t = ray_population(light_mask=mask)
    run("frame_gated", o, d, t, n_eff=int((np.asarray(t) > 0).sum()))

    # 3. half-res population (the --half-res-shadow-rays flag), gated
    o, d, t = ray_population(light_mask=mask, stride=2)
    run("frame_halfres", o, d, t, n_eff=int((np.asarray(t) > 0).sum()))

    # 4. adversarial incoherent 1M rays (round-2 baseline population)
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    n_inc = 50_000 if cpu else 1_000_000
    ro = jax.random.uniform(k1, (1, n_inc, 3), minval=-3.0, maxval=3.0)
    rd = jax.random.normal(k2, (1, n_inc, 3))
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    rt = jnp.full((1, n_inc), 10_000.0)
    run("incoherent", ro, rd, rt)

    import json
    print(json.dumps({
        r[0]: {"ms": round(r[3] * 1e3, 2),
               "us_per_ray": round(r[3] / r[1] * 1e6, 3),
               "us_per_live_ray": round(r[3] / max(r[2], 1) * 1e6, 3)}
        for r in rows
    }))


if __name__ == "__main__":
    main()
