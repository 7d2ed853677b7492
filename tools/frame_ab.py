"""Single-process in-frame A/B sweeps over layout knobs.

Cross-process A/Bs on the tunneled TPU are noisy (round-trip drift) and
slow (no compile cache across processes, occasional multi-minute process
-start stalls) — this harness measures every variant in ONE process with
bench.py's timing discipline (forced readback, round-trip subtracted,
per-frame MIN), mutating the layout module globals and rebuilding the
scene per variant.

Knobs understood (module globals read at build/trace time, so a plain
setattr + scene rebuild takes effect):
  row_elems   -> scene.textures.ATLAS_ROW_ELEMS (flat atlas row width;
                 0 = per-scene auto, see textures.AUTO_TARGET_ROWS)
  fused       -> scene.textures.ATLAS_FUSED + BLOCK_TEXELS (13/4)
  pyr_group   -> ops.mipchain.GROUP/_GSHIFT (pyramid row grouping)
  planar_pyr  -> ops.mipchain.PLANAR (channel-planar downsample chain)
  paired      -> ops.raster_pallas_gbuf.PAYLOAD_PAIRED (record-pair
                 source rows: half the gather-table rows, zero padding)
  bf16        -> RenderConfig.bf16_light_math (light-loop dtype A/B)
  k_pairs     -> RenderConfig.pallas_tiles_per_tri (binning tier K)
  cap_t16     -> RenderConfig.transmission_block_cap_frac * 16 (int:
                 cap_t16=3 -> 0.1875; 4 -> 0.25)
  peel        -> RenderConfig.alpha_clip_rounds (stress depth peel)
  retile16    -> RenderConfig.clip_retile_cap_frac * 16 (int)
  ocap16      -> RenderConfig.opaque_block_cap_frac * 16 (int; 0 = dense)

Usage:
    python tools/frame_ab.py dragon "base" "row_elems=256" "pyr_group=8" \
        [--frames 8]
    python tools/frame_ab.py helmet "base" "row_elems=256" "row_elems=512"
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def measure_round_trip(n=6):
    import jax.numpy as jnp

    one = jnp.zeros((), jnp.float32)
    float(one)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(one + 1.0)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def apply_knobs(spec: str) -> dict:
    import transmission_renderer_tpu.ops.mipchain as mip
    import transmission_renderer_tpu.ops.raster_pallas_gbuf as rg
    import transmission_renderer_tpu.scene.textures as tx

    # reset to shipped defaults first
    import transmission_renderer_tpu.render.shade_kernel as sk

    tx.ATLAS_FUSED = False
    tx.BLOCK_TEXELS = 4
    tx.ATLAS_ROW_ELEMS = 128
    mip.GROUP = 4
    mip._GSHIFT = 2
    mip.PLANAR = True
    mip.ROWS_FORM_MIN_TEXELS = 1_500_000
    mip.ROW_GROUP = 16
    mip._RGSHIFT = 4
    rg.PAYLOAD_PAIRED = False
    sk.ROWS_PER_STEP = 64
    applied = {}
    if spec != "base":
        for kv in spec.split(","):
            k, v = kv.split("=")
            v = int(v)
            if k == "row_elems":
                tx.ATLAS_ROW_ELEMS = v
            elif k == "fused":
                tx.ATLAS_FUSED = bool(v)
                tx.BLOCK_TEXELS = 13 if v else 4
            elif k == "pyr_group":
                mip.GROUP = v
                mip._GSHIFT = v.bit_length() - 1
            elif k == "planar_pyr":
                mip.PLANAR = bool(v)
            elif k == "paired":
                rg.PAYLOAD_PAIRED = bool(v)
            elif k == "shade_rows":
                import transmission_renderer_tpu.render.shade_kernel as sk

                sk.ROWS_PER_STEP = v
            elif k == "pyr_rows_min":
                mip.ROWS_FORM_MIN_TEXELS = v
            elif k == "pyr_row_group":
                mip.ROW_GROUP = v
                mip._RGSHIFT = v.bit_length() - 1
            elif k in ("bf16", "k_pairs", "cap_t16", "peel", "retile16",
                       "ocap16"):
                pass  # handled at config level in main()
            else:
                raise SystemExit(f"unknown knob {k}")
            applied[k] = v
    return applied


def main():
    frames = 8
    args = []
    it = iter(sys.argv[1:])
    for a in it:
        if a.startswith("--frames"):
            # accept both --frames=N and --frames N
            frames = int(a.split("=")[1] if "=" in a else next(it))
        elif not a.startswith("--"):
            args.append(a)
    scene_name, specs = args[0], args[1:]

    import jax
    from functools import partial

    from transmission_renderer_tpu.config import RenderConfig
    from transmission_renderer_tpu.models import (
        build_attenuation_scene,
        build_dragon_scene,
        build_opaque_scene,
        build_stress_scene,
    )
    from transmission_renderer_tpu.render import make_frame_params, render_frame
    from transmission_renderer_tpu.scene.camera import CameraRig
    from transmission_renderer_tpu.pbr.lights import pack_lights, point_light

    builders = {
        "dragon": lambda: build_dragon_scene(roughness_override=0.25),
        "helmet": build_opaque_scene,
        "attenuation": build_attenuation_scene,
        "stress": build_stress_scene,
        "smooth": lambda: build_dragon_scene(roughness_override=0.0),
    }

    print(f"backend={jax.default_backend()} "
          f"device={jax.devices()[0].device_kind}", file=sys.stderr)
    cfg = RenderConfig(width=1920, height=1080)
    rig = CameraRig()
    params = make_frame_params(
        cfg, rig.camera.view_matrix(), rig.camera.position, rig.sun_dir()
    )
    lights = pack_lights([
        point_light([0.0, 0.8, 0.0], [1.0, 0.0, 0.0], 5.0),
        point_light([8.0, 0.8, 0.0], [0.0, 1.0, 0.0], 10.0),
    ])

    results = {}
    for spec in specs:
        applied = apply_knobs(spec)
        import dataclasses
        cfg_kw = {"bf16_light_math": bool(applied.get("bf16", 0))}
        if "k_pairs" in applied:
            cfg_kw["pallas_tiles_per_tri"] = applied["k_pairs"]
        if "cap_t16" in applied:
            cfg_kw["transmission_block_cap_frac"] = applied["cap_t16"] / 16.0
        if "peel" in applied:
            cfg_kw["alpha_clip_rounds"] = applied["peel"]
        if "retile16" in applied:
            cfg_kw["clip_retile_cap_frac"] = applied["retile16"] / 16.0
        if "ocap16" in applied:
            # 0 -> None (dense); N -> N/16 block-sparse opaque cap
            cfg_kw["opaque_block_cap_frac"] = (
                applied["ocap16"] / 16.0 if applied["ocap16"] else None
            )
        cfg_v = dataclasses.replace(cfg, **cfg_kw)
        scene, dl, flags = builders[scene_name]().finish_bundle()
        render = jax.jit(partial(render_frame, config=cfg_v, flags=flags))

        def step():
            return float(render(scene, dl, params, lights).sum())

        t0 = time.perf_counter()
        step()  # compile + warm
        compile_s = time.perf_counter() - t0
        r0 = measure_round_trip()
        ts = []
        for _ in range(frames):
            t0 = time.perf_counter()
            step()
            ts.append(time.perf_counter() - t0)
        r1 = measure_round_trip()
        el = min(ts) - min(r0, r1)
        results[spec] = el
        print(f"{spec:>24}: {el*1e3:7.1f} ms/frame "
              f"(compile {compile_s:.0f}s, atlas "
              f"{tuple(scene.atlas_texels.shape)} {scene.atlas_texels.dtype})",
              file=sys.stderr, flush=True)

    import json
    print(json.dumps({k: round(v * 1e3, 1) for k, v in results.items()}))


if __name__ == "__main__":
    main()
