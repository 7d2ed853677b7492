"""Subprocess driver for the multi-device sharding tests.

Run as a script with a clean environment (no axon sitecustomize) so
``--xla_force_host_platform_device_count`` takes effect. Exits non-zero on
any mismatch. Invoked by test_sharding.py; can also be run by hand:

    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
        XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python tests/sharding_driver.py 8
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main(n_devices: int) -> int:
    import jax
    from functools import partial

    if len(jax.devices()) < n_devices:
        print(f"FATAL: only {len(jax.devices())} devices", file=sys.stderr)
        return 2

    from transmission_renderer_tpu.config import RenderConfig
    from transmission_renderer_tpu.models import (
        build_attenuation_scene,
        build_test_scene,
    )
    from transmission_renderer_tpu.parallel import make_band_mesh, render_frame_sharded
    from transmission_renderer_tpu.pbr.lights import pack_lights, point_light
    from transmission_renderer_tpu.render import make_frame_params, render_frame
    from transmission_renderer_tpu.scene.camera import CameraRig

    cfg = RenderConfig(
        width=128, height=64, tile_w=32, tile_h=8,
        max_tris_per_tile=1024, max_tiles_per_tri=16, max_big_tris=32,
    )

    failures = 0
    for name, builder_fn in [
        ("opaque", build_test_scene),
        ("transmission", build_attenuation_scene),
    ]:
        scene, dl, flags = builder_fn().finish_bundle()
        rig = CameraRig()
        rig.camera.position = np.array([0.0, 2.0, 2.0], np.float32)
        rig.camera.pitch = -0.4
        params = make_frame_params(
            cfg, rig.camera.view_matrix(), rig.camera.position, rig.sun_dir()
        )
        lights = pack_lights([point_light([0.0, 0.8, 0.0], [1, 0, 0], 5.0)])

        single = np.asarray(
            jax.jit(partial(render_frame, config=cfg, flags=flags))(
                scene, dl, params, lights
            )
        )
        for n in (2, n_devices):
            mesh = make_band_mesh(n)
            sharded = np.asarray(
                jax.jit(
                    partial(render_frame_sharded, config=cfg, mesh=mesh, flags=flags)
                )(scene, dl, params, lights)
            )
            diff = np.abs(sharded - single).max()
            ok = sharded.shape == single.shape and diff <= 2e-6
            print(f"{name} n={n}: max diff {diff:.2e} -> {'OK' if ok else 'FAIL'}")
            failures += 0 if ok else 1

    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(int(sys.argv[1]) if len(sys.argv) > 1 else 8))
