"""Cross-backend fidelity check: render the golden scenes on the current
(TPU) backend and compare against the CPU-rendered goldens in
tests/goldens/. The RMSE budget matches the golden tests' — beyond 8-bit
quantisation noise means real divergence between backends.

Run: python tools/tpu_fidelity_check.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
from functools import partial

from transmission_renderer_tpu.config import RenderConfig
from transmission_renderer_tpu.models import build_attenuation_scene, build_test_scene
from transmission_renderer_tpu.pbr.lights import pack_lights, point_light
from transmission_renderer_tpu.render import make_frame_params, render_frame
from transmission_renderer_tpu.scene.camera import CameraRig
from transmission_renderer_tpu.scene.textures import linear_to_srgb
from transmission_renderer_tpu.utils import load_png

# two configs: the pure-JAX raster path and the Pallas(+G-buffer) kernel
# path (tile 128x8 is the kernel's native shape)
CFG_JAX = RenderConfig(
    width=128, height=72, tile_w=32, tile_h=8,
    max_tris_per_tile=1024, max_tiles_per_tri=16, max_big_tris=32,
    use_pallas_raster=False,
)
CFG_PAL = RenderConfig(
    width=128, height=72, tile_w=128, tile_h=8,
    max_tris_per_tile=1024, max_tiles_per_tri=16, max_big_tris=32,
    use_pallas_raster=True,
)
GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens")


def main() -> int:
    print("backend:", jax.default_backend(), flush=True)
    failures = 0
    for cfg_name, CFG in [("jax-path", CFG_JAX), ("pallas-path", CFG_PAL)]:
      for name, builder_fn, cam, pitch in [
        ("test_scene", build_test_scene, (0.0, 2.0, 2.0), -0.4),
        ("attenuation", build_attenuation_scene, (0.0, 5.0, 3.0), -0.75),
      ]:
        scene, dl, flags = builder_fn().finish_bundle()
        rig = CameraRig()
        rig.camera.position = np.array(cam, np.float32)
        rig.camera.pitch = pitch
        rig.sun_yaw = 0.5
        params = make_frame_params(
            CFG, rig.camera.view_matrix(), rig.camera.position, rig.sun_dir()
        )
        lights = pack_lights([point_light([0.0, 0.8, 0.0], [1, 0, 0], 5.0)])
        ldr = np.asarray(
            jax.jit(partial(render_frame, config=CFG, flags=flags))(
                scene, dl, params, lights
            )
        )
        got = linear_to_srgb(ldr)
        golden = load_png(os.path.join(GOLDEN_DIR, f"{name}.png"))[..., :3] / 255.0
        rmse = float(np.sqrt(np.mean((got - golden) ** 2)))
        ok = rmse < 4e-3
        print(f"{cfg_name}/{name}: RMSE vs CPU golden = {rmse:.5f} -> "
              f"{'OK' if ok else 'FAIL'}", flush=True)
        failures += 0 if ok else 1
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
