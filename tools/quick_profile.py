"""Single-scene TPU profile: frame time + in-frame per-pass device table.

Usage: python tools/quick_profile.py dragon [--frames 8] [--rt]
Scenes: dragon, helmet, stress, bindless, attenuation, smooth
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/trtpu_jit_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    frames = 8
    rt = False
    args = []
    it = iter(sys.argv[1:])
    for a in it:
        if a.startswith("--frames"):
            frames = int(a.split("=")[1] if "=" in a else next(it))
        elif a == "--rt":
            rt = True
        else:
            args.append(a)
    scene_name = args[0] if args else "dragon"

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])

    from transmission_renderer_tpu.config import RenderConfig
    from transmission_renderer_tpu.models import (
        bindless_lights,
        build_attenuation_scene,
        build_bindless_scene,
        build_dragon_scene,
        build_opaque_scene,
        build_stress_scene,
    )
    from transmission_renderer_tpu.pbr.lights import pack_lights, point_light
    from transmission_renderer_tpu.render import make_frame_params, render_frame
    from transmission_renderer_tpu.scene.camera import CameraRig

    config = RenderConfig(width=1920, height=1080, ray_traced_shadows=rt)
    lights = None
    if scene_name == "dragon":
        builder = build_dragon_scene(roughness_override=0.25)
    elif scene_name == "smooth":
        builder = build_dragon_scene(roughness_override=0.0)
    elif scene_name == "helmet":
        builder = build_opaque_scene()
        config = dataclasses.replace(config, opaque_block_cap_frac=0.625)
    elif scene_name == "stress":
        builder = build_stress_scene()
        config = dataclasses.replace(config, opaque_block_cap_frac=0.8125)
    elif scene_name == "bindless":
        builder = build_bindless_scene()
        config = dataclasses.replace(config, opaque_block_cap_frac=0.8125)
        lights = pack_lights(bindless_lights())
    elif scene_name == "attenuation":
        builder = build_attenuation_scene()
    else:
        raise SystemExit(f"unknown scene {scene_name}")

    scene, dl, flags = builder.finish_bundle()
    bvh = builder.build_rt_bvh() if rt else None
    rig = CameraRig()
    rig.camera.position = np.array([0.0, 2.2, 1.5], np.float32)
    rig.camera.pitch = -0.25
    if lights is None:
        lights = pack_lights([
            point_light([0.0, 0.8, 0.0], [1.0, 0.0, 0.0], 5.0),
            point_light([8.0, 0.8, 0.0], [0.0, 1.0, 0.0], 10.0),
        ])
    params = make_frame_params(
        config, rig.camera.view_matrix(), rig.camera.position, rig.sun_dir()
    )

    def checksum_render(scene, dl, params, lights, bvh):
        return jnp.sum(
            render_frame(scene, dl, params, lights, config=config,
                         flags=flags, bvh=bvh)
        )

    render = jax.jit(checksum_render)
    t0 = time.perf_counter()
    float(render(scene, dl, params, lights, bvh))
    print(f"first-call {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    def rtrip():
        one = jnp.zeros((), jnp.float32)
        float(one)
        ts = []
        for _ in range(6):
            t0 = time.perf_counter()
            float(one + 1.0)
            ts.append(time.perf_counter() - t0)
        return min(ts)

    times = []
    for i in range(frames):
        rig.target_yaw = 0.02 * i
        rig.update()
        p = make_frame_params(
            config, rig.camera.view_matrix(), rig.camera.position,
            rig.sun_dir()
        )
        t0 = time.perf_counter()
        float(render(scene, dl, p, lights, bvh))
        times.append(time.perf_counter() - t0)
    rt_ms = rtrip()
    dt = min(times) - rt_ms
    print(f"{scene_name}: {dt*1e3:.2f} ms/frame min ({1.0/dt:.2f} fps), "
          f"mean {sum(times)/len(times)*1e3 - rt_ms*1e3:.2f} ms, "
          f"round_trip {rt_ms*1e3:.2f} ms", file=sys.stderr)

    from tools.pass_timing import format_table, profile_pass_times

    hlo = render.lower(scene, dl, params, lights, bvh).compile().as_text()
    table = profile_pass_times(
        lambda: float(render(scene, dl, params, lights, bvh)), hlo_text=hlo
    )
    print(format_table(table), file=sys.stderr)


if __name__ == "__main__":
    main()
