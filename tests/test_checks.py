"""The checkify debug mode (SURVEY 5.2 — validation-layer analogue).

A clean frame must report no OOB index error, and the instrumented frame
must stay pixel-identical to the uninstrumented one (the validation layer
never changes the image). A deliberately OOB gather through the same
wrapper must be reported, proving the instrumentation is live.
"""

import io

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import checkify
from functools import partial

from transmission_renderer_tpu.config import RenderConfig
from transmission_renderer_tpu.models import build_test_scene
from transmission_renderer_tpu.pbr.lights import pack_lights, point_light
from transmission_renderer_tpu.render import make_frame_params, render_frame
from transmission_renderer_tpu.render.checks import checked_frame_fn
from transmission_renderer_tpu.render.frame import scene_flags
from transmission_renderer_tpu.scene.camera import CameraRig

CFG = RenderConfig(
    width=128, height=72, tile_w=32, tile_h=8,
    max_tris_per_tile=1024, max_tiles_per_tri=16, max_big_tris=32,
    use_pallas_raster=False,
)


def _bundle():
    scene, dl, flags = build_test_scene().finish_bundle()
    rig = CameraRig()
    rig.camera.position = np.array([0.0, 2.2, 1.5], np.float32)
    rig.camera.pitch = -0.25
    params = make_frame_params(
        CFG, rig.camera.view_matrix(), rig.camera.position, rig.sun_dir()
    )
    lights = pack_lights([point_light([0.0, 0.8, 0.0], [1, 0, 0], 5.0)])
    return scene, dl, flags, params, lights


def test_clean_frame_reports_nothing_and_matches():
    scene, dl, flags, params, lights = _bundle()
    log = io.StringIO()
    render = checked_frame_fn(config=CFG, flags=flags, out=log)
    img = np.asarray(render(scene, dl, params, lights))
    assert log.getvalue() == ""
    ref = np.asarray(
        jax.jit(partial(render_frame, config=CFG, flags=flags))(
            scene, dl, params, lights
        )
    )
    np.testing.assert_array_equal(img, ref)


def test_oob_gather_is_reported():
    err, _ = jax.jit(
        checkify.checkify(
            lambda t, i: t[i], errors=checkify.index_checks
        )
    )(jnp.arange(8.0), jnp.int32(11))
    assert err.get() is not None and "out-of-bounds" in err.get()
