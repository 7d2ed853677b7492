"""Many-light clustered shading: the lax-loop path must match the
unrolled path, and a 64-light scene must render sanely (VERDICT round-1
weak #7 / next #9)."""

import numpy as np
import jax.numpy as jnp

import transmission_renderer_tpu.render.shading as shading
from transmission_renderer_tpu.config import RenderConfig
from transmission_renderer_tpu.models import build_test_scene
from transmission_renderer_tpu.pbr.lights import pack_lights, point_light
from transmission_renderer_tpu.render import make_frame_params, render_frame
from transmission_renderer_tpu.scene.camera import CameraRig


def _render(num_lights, monkeypatch=None, unroll_max=None):
    config = RenderConfig(width=128, height=72, use_pallas_raster=False)
    scene, dl, flags = build_test_scene().finish_bundle()
    rig = CameraRig()
    rig.camera.position = np.array([0.0, 2.0, 2.0], np.float32)
    rig.camera.pitch = -0.4
    rng = np.random.default_rng(7)
    lights = pack_lights([
        point_light(
            rng.uniform(-3, 3, 3).tolist(),
            rng.uniform(0.2, 1.0, 3).tolist(),
            float(rng.uniform(1.0, 4.0)),
        )
        for _ in range(num_lights)
    ])
    params = make_frame_params(
        config, rig.camera.view_matrix(), rig.camera.position, rig.sun_dir()
    )
    if unroll_max is not None:
        monkeypatch.setattr(shading, "_UNROLL_MAX_SLOTS", unroll_max)
    return np.asarray(
        render_frame(scene, dl, params, lights, config=config, flags=flags)
    )


def test_lax_loop_matches_unroll(monkeypatch):
    """12 lights: force both loop strategies, images must match exactly."""
    unrolled = _render(12, monkeypatch, unroll_max=128)
    looped = _render(12, monkeypatch, unroll_max=1)
    # XLA fuses the two loop forms differently; only f32 reassociation
    # noise is acceptable
    np.testing.assert_allclose(looped, unrolled, atol=3e-5)


def test_64_light_scene_renders():
    img = _render(64)
    assert np.isfinite(img).all()
    assert img.max() > 0.05  # lights actually contribute
