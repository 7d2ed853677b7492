"""End-to-end frame tests (small shapes, CPU): property-based oracles in
lieu of the reference's golden frames (SURVEY.md §4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from functools import partial

from transmission_renderer_tpu.config import RenderConfig
from transmission_renderer_tpu.models import (
    build_attenuation_scene,
    build_test_scene,
)
from transmission_renderer_tpu.pbr.lights import pack_lights, point_light
from transmission_renderer_tpu.render import make_frame_params, render_frame
from transmission_renderer_tpu.scene.camera import CameraRig

CFG = RenderConfig(
    width=128, height=72, tile_w=32, tile_h=8,
    max_tris_per_tile=1024, max_tiles_per_tri=16, max_big_tris=32,
)


def _render(builder, cfg=CFG, cam_pos=(0.0, 2.0, 2.0), pitch=-0.4, **kw):
    scene, dl, flags = builder.finish_bundle()
    rig = CameraRig()
    rig.camera.position = np.array(cam_pos, np.float32)
    rig.camera.pitch = pitch
    params = make_frame_params(
        cfg, rig.camera.view_matrix(), rig.camera.position, rig.sun_dir()
    )
    lights = pack_lights(
        [point_light([0.0, 0.8, 0.0], [1, 0, 0], 5.0)]
    )
    f = jax.jit(partial(render_frame, config=cfg, flags=flags, **kw))
    return np.asarray(f(scene, dl, params, lights))


@pytest.fixture(scope="module")
def test_frame():
    return _render(build_test_scene())


def test_frame_finite_and_in_range(test_frame):
    assert test_frame.shape == (72, 128, 3)
    assert np.isfinite(test_frame).all()
    assert test_frame.min() >= 0.0 and test_frame.max() <= 1.0


def test_frame_has_content(test_frame):
    # floor + objects cover most of the lower half
    lower = test_frame[40:]
    assert (lower.sum(-1) > 0.01).mean() > 0.8
    # sky is the clear colour (black)
    assert test_frame[0:4].max() == 0.0


def test_render_deterministic(test_frame):
    again = _render(build_test_scene())
    np.testing.assert_array_equal(test_frame, again)


def test_attenuation_scene_renders():
    frame = _render(build_attenuation_scene(), cam_pos=(0.0, 5.0, 3.0), pitch=-0.75)
    assert np.isfinite(frame).all()
    assert (frame.sum(-1) > 0.01).mean() > 0.3


def test_jit_no_recompile_on_param_change():
    """Changing camera params must not retrigger compilation."""
    scene, dl, flags = build_test_scene().finish_bundle()
    lights = pack_lights([point_light([0.0, 0.8, 0.0], [1, 0, 0], 5.0)])
    f = jax.jit(partial(render_frame, config=CFG, flags=flags))

    rig = CameraRig()
    p1 = make_frame_params(CFG, rig.camera.view_matrix(), rig.camera.position, rig.sun_dir())
    _ = f(scene, dl, p1, lights).block_until_ready()
    rig.camera.yaw = 0.3
    rig.camera.position = np.array([1.0, 2.5, 3.0], np.float32)
    p2 = make_frame_params(CFG, rig.camera.view_matrix(), rig.camera.position, rig.sun_dir())
    with jax.log_compiles():
        import logging, io

        stream = io.StringIO()
        handler = logging.StreamHandler(stream)
        logging.getLogger("jax").addHandler(handler)
        _ = f(scene, dl, p2, lights).block_until_ready()
        logging.getLogger("jax").removeHandler(handler)
        assert "Compiling" not in stream.getvalue()


def test_half_res_refraction_close_to_exact():
    """The half-res framebuffer fetch must stay close to the exact path on
    a volume-transmission scene (LOD >= 1 everywhere at this size)."""
    import dataclasses

    cfg_half = dataclasses.replace(CFG, half_res_refraction=True)
    exact = _render(build_attenuation_scene(), cam_pos=(0.0, 5.0, 3.0), pitch=-0.75)
    half = _render(
        build_attenuation_scene(), cfg=cfg_half, cam_pos=(0.0, 5.0, 3.0), pitch=-0.75
    )
    rmse = float(np.sqrt(np.mean((half - exact) ** 2)))
    assert rmse < 0.02, rmse
