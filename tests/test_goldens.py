"""Golden-frame regression tests (SURVEY.md §4c).

The reference has no automated goldens (its 'golden' is the readme
collage); these pin this framework against itself so refactors can't
silently shift the image. Goldens were rendered on CPU; the comparison
tolerance absorbs backend-to-backend f32 reassociation.

Regenerate intentionally with: the script embedded in each golden's
sibling — render at the exact config below and overwrite the PNG.
"""

import os

import numpy as np
import jax
import pytest
from functools import partial

from transmission_renderer_tpu.config import RenderConfig
from transmission_renderer_tpu.models import build_attenuation_scene, build_test_scene
from transmission_renderer_tpu.pbr.lights import pack_lights, point_light
from transmission_renderer_tpu.render import make_frame_params, render_frame
from transmission_renderer_tpu.scene.camera import CameraRig
from transmission_renderer_tpu.scene.textures import linear_to_srgb
from transmission_renderer_tpu.utils import load_png

CFG = RenderConfig(
    width=128, height=72, tile_w=32, tile_h=8,
    max_tris_per_tile=1024, max_tiles_per_tri=16, max_big_tris=32,
)
GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


def _render(builder_fn, cam, pitch):
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
    return linear_to_srgb(ldr)


@pytest.mark.parametrize(
    "name,builder_fn,cam,pitch",
    [
        ("test_scene", build_test_scene, (0.0, 2.0, 2.0), -0.4),
        ("attenuation", build_attenuation_scene, (0.0, 5.0, 3.0), -0.75),
    ],
)
def test_golden(name, builder_fn, cam, pitch):
    golden = load_png(os.path.join(GOLDEN_DIR, f"{name}.png"))[..., :3] / 255.0
    got = _render(builder_fn, cam, pitch)
    rmse = float(np.sqrt(np.mean((got - golden) ** 2)))
    # 8-bit quantisation alone contributes ~0.001; anything beyond ~0.004
    # means the image actually changed.
    assert rmse < 4e-3, f"{name}: RMSE {rmse} vs golden"
