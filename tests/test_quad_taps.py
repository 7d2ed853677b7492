"""Quad-shared material taps (RenderConfig.quad_material_taps).

A quality flag must stay CLOSE to the exact image: one tap per 2x2 quad
is sub-texel error away from material silhouettes, so the frame-wide
RMSE against the exact render must be small, and pixels whose quad is
entirely one material with smooth uv must match closely.
"""

import numpy as np
import jax
from functools import partial

from transmission_renderer_tpu.config import RenderConfig
from transmission_renderer_tpu.models import build_test_scene
from transmission_renderer_tpu.pbr.lights import pack_lights, point_light
from transmission_renderer_tpu.render import make_frame_params, render_frame
from transmission_renderer_tpu.scene.camera import CameraRig


def _render(cfg):
    scene, dl, flags = build_test_scene().finish_bundle()
    rig = CameraRig()
    rig.camera.position = np.array([0.0, 2.2, 1.5], np.float32)
    rig.camera.pitch = -0.25
    params = make_frame_params(
        cfg, rig.camera.view_matrix(), rig.camera.position, rig.sun_dir()
    )
    lights = pack_lights([point_light([0.0, 0.8, 0.0], [1, 0, 0], 5.0)])
    return np.asarray(
        jax.jit(partial(render_frame, config=cfg, flags=flags))(
            scene, dl, params, lights
        )
    )


def test_quad_taps_close_to_exact():
    """Pins the flag's measured error on the ADVERSARIAL case: a minified
    checkerboard stays full-contrast at every mip level, so any shared
    tap smears half a pixel of it — this bound is the technique's worst
    case, not its typical cost (naturalistic textures are bandlimited
    under minification and shared taps are sub-texel there)."""
    kw = dict(width=128, height=72, tile_w=32, tile_h=8,
              max_tris_per_tile=1024, max_tiles_per_tri=16, max_big_tris=32)
    exact = _render(RenderConfig(**kw))
    quad = _render(RenderConfig(quad_material_taps=True, **kw))
    rmse = float(np.sqrt(np.mean((exact - quad) ** 2)))
    assert rmse < 0.1, rmse
    # untextured surfaces and the sky must be untouched by the flag
    same = np.abs(exact - quad).max(-1) == 0.0
    assert same.mean() > 0.5, same.mean()
