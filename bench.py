"""Benchmark: DragonAttenuation-analogue at 1080p on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target (BASELINE.md): >= 30 fps per chip at 1080p for the rough
transmission flagship scene (roughness 0.25, ~130k triangles).

No glTF sample assets exist in this environment, so the scene is the
procedural flagship (models/procedural.py: build_dragon_scene) matched in
triangle count / material character to DragonAttenuation
--roughness-override 0.25.
"""

import json
import os
import sys
import time

# Persistent compilation cache — Pallas/XLA compiles are slow; the
# reference's analogue is the (never-persisted) vk::PipelineCache
# (src/main.rs:230-231) — ours actually persists (SURVEY.md §5.4).
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/trtpu_jit_cache")

import numpy as np  # noqa: E402
import jax  # noqa: E402
from functools import partial  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from transmission_renderer_tpu.config import RenderConfig  # noqa: E402
from transmission_renderer_tpu.models import build_dragon_scene  # noqa: E402
from transmission_renderer_tpu.pbr.lights import pack_lights, point_light  # noqa: E402
from transmission_renderer_tpu.render import (  # noqa: E402
    make_frame_params,
    render_frame,
)
from transmission_renderer_tpu.scene.camera import CameraRig  # noqa: E402


def main():
    jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])

    config = RenderConfig(width=1920, height=1080)
    scene, dl, flags = build_dragon_scene(roughness_override=0.25).finish_bundle()

    rig = CameraRig()
    rig.camera.position = np.array([0.0, 2.2, 1.5], np.float32)
    rig.camera.pitch = -0.25
    lights = pack_lights(
        [
            point_light([0.0, 0.8, 0.0], [1.0, 0.0, 0.0], 5.0),
            point_light([8.0, 0.8, 0.0], [0.0, 1.0, 0.0], 10.0),
        ]
    )
    params = make_frame_params(
        config, rig.camera.view_matrix(), rig.camera.position, rig.sun_dir()
    )

    import jax.numpy as jnp

    # NOTE on timing: on the tunneled 'axon' TPU platform,
    # block_until_ready() returns at enqueue, not at completion — timing
    # with it reports dispatch latency, not render time. We force real
    # synchronisation with a 4-byte readback per frame and subtract the
    # measured round-trip baseline.
    def checksum_render(scene, dl, params, lights):
        return jnp.sum(render_frame(scene, dl, params, lights,
                                    config=config, flags=flags))

    render = jax.jit(checksum_render)

    # compile + warmup (first readback initialises the transfer path)
    float(render(scene, dl, params, lights))

    # round-trip baseline (enqueue + tiny readback of a trivial kernel)
    trivial = jax.jit(lambda x: jnp.sum(x))
    small = jnp.ones((8,), jnp.float32)
    float(trivial(small))
    t0 = time.perf_counter()
    for _ in range(10):
        float(trivial(small))
    round_trip = (time.perf_counter() - t0) / 10

    # timed frames (camera params change per frame like a real loop)
    n_frames = 10
    t0 = time.perf_counter()
    for i in range(n_frames):
        rig.target_yaw = 0.02 * i
        rig.update()
        params = make_frame_params(
            config, rig.camera.view_matrix(), rig.camera.position, rig.sun_dir()
        )
        float(render(scene, dl, params, lights))
    dt = (time.perf_counter() - t0) / n_frames - round_trip
    dt = max(dt, 1e-6)

    fps = 1.0 / dt
    print(
        json.dumps(
            {
                "metric": "dragon_attenuation_1080p_fps_per_chip",
                "value": round(fps, 3),
                "unit": "fps",
                "vs_baseline": round(fps / 30.0, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
