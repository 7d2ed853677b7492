"""Per-instruction device-time breakdown for ONE pass scope.

pass_timing.py aggregates per scope; this drills into a scope and prints
its top HLO instructions with their op_name paths — the data needed to
attack a pass's internals (e.g. which of mat_tap's ops carry the
non-gather cost).

Usage: python tools/scope_ops.py <scene> <scope> [top_n]
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/trtpu_jit_cache")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import re
import tempfile

import numpy as np


def main():
    scene_name = sys.argv[1] if len(sys.argv) > 1 else "helmet_opaque"
    scope = sys.argv[2] if len(sys.argv) > 2 else "mat_tap"
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 25

    import jax
    import jax.numpy as jnp

    from transmission_renderer_tpu.config import RenderConfig
    from transmission_renderer_tpu.models import (
        build_dragon_scene,
        build_opaque_scene,
        build_stress_scene,
    )
    from transmission_renderer_tpu.pbr.lights import pack_lights, point_light
    from transmission_renderer_tpu.render import make_frame_params, render_frame
    from transmission_renderer_tpu.scene.camera import CameraRig

    builders = {
        "helmet_opaque": build_opaque_scene,
        "dragon_attenuation": lambda: build_dragon_scene(roughness_override=0.25),
        "stress": build_stress_scene,
    }
    scene, dl, flags = builders[scene_name]().finish_bundle()
    config = RenderConfig(width=1920, height=1080)
    rig = CameraRig()
    rig.camera.position = np.array([0.0, 2.2, 1.5], np.float32)
    rig.camera.pitch = -0.25
    params = make_frame_params(
        config, rig.camera.view_matrix(), rig.camera.position, rig.sun_dir()
    )
    lights = pack_lights([
        point_light([0.0, 0.8, 0.0], [1.0, 0.0, 0.0], 5.0),
        point_light([8.0, 0.8, 0.0], [0.0, 1.0, 0.0], 10.0),
    ])
    render = jax.jit(
        lambda s, d, p, li: jnp.sum(
            render_frame(s, d, p, li, config=config, flags=flags)
        )
    )
    float(render(scene, dl, params, lights))
    hlo = render.lower(scene, dl, params, lights).compile().as_text()

    # instruction name -> (op_name, shape text)
    pat = re.compile(
        r"%?([\w.\-]+) = ([^ ]+) ([\w\-]+)\(.*?metadata=\{[^}]*op_name=\"([^\"]+)\"",
    )
    meta = {}
    for m in pat.finditer(hlo):
        meta[m.group(1)] = (m.group(4), m.group(2), m.group(3))

    from jax.profiler import ProfileData

    with tempfile.TemporaryDirectory(prefix="trtpu_scope_") as d:
        jax.profiler.start_trace(d)
        float(render(scene, dl, params, lights))
        jax.profiler.stop_trace()
        import glob

        paths = sorted(
            glob.glob(os.path.join(d, "**", "*.xplane.pb"), recursive=True),
            key=os.path.getmtime,
        )
        data = ProfileData.from_file(paths[-1])
        instr_pat = re.compile(r"^%?([\w.\-]+)\s*=")
        rows = {}
        for plane in data.planes:
            if "TPU" not in plane.name and "device" not in plane.name.lower():
                continue
            for line in plane.lines:
                if (line.name or "") != "XLA Ops":
                    continue
                for ev in line.events:
                    m = instr_pat.match(ev.name or "")
                    name = m.group(1) if m else (ev.name or "")[:40]
                    rows.setdefault(name, 0.0)
                    rows[name] += ev.duration_ns / 1e6

    picked = []
    total = 0.0
    for name, ms in rows.items():
        op_name, shape, kind = meta.get(name, ("?", "?", "?"))
        if f"/{scope}" in op_name or op_name.startswith(scope):
            picked.append((ms, name, kind, shape, op_name))
            total += ms
    picked.sort(reverse=True)
    print(f"scope '{scope}' total {total:.2f} ms, {len(picked)} instructions")
    for ms, name, kind, shape, op_name in picked[:top_n]:
        tail = op_name.split("/")[-1]
        print(f"  {ms:7.2f} ms  {kind:<12} {shape:<28} {name:<22} {tail}")


if __name__ == "__main__":
    main()
