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


def test_bitcast_int32_state_survives_data_movement():
    """The stacked clip-peel state (render/frame.py::_rasterize_clip_peeled)
    bitcasts int32 channels to f32 and relies on stack/concat/gather/
    select/scatter being PURE data movement: denormal and NaN bit
    patterns (tri=-1 is 0xFFFFFFFF = a quiet-NaN pattern; small tri ids
    are f32 denormals) must round-trip unchanged. Pins the invariant the
    advisor flagged as easy to break in a later edit."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    vals = np.array(
        [
            -1,  # 0xFFFFFFFF: NaN pattern (the invalid-tri marker)
            0, 1, 7, 12345,  # f32 denormal patterns (real tri ids)
            2**31 - 1,  # NaN pattern
            -(2**31),  # -0.0 pattern
            0x7F800000,  # +inf pattern
            0x00800001,  # smallest normal + 1
        ],
        np.int32,
    )
    a = jnp.asarray(np.tile(vals, 16).reshape(16, len(vals)))

    def roundtrip(a):
        # the exact op set the peel loop uses — stack, concat, gather,
        # where-select, scatter — with NO arithmetic anywhere (even
        # `f + 0 * f` would flush the denormal patterns to zero)
        f = jax.lax.bitcast_convert_type(a, jnp.float32)
        stk = jnp.stack([f, jnp.flip(f, axis=0)], axis=1)
        stk = jnp.concatenate([stk, jnp.zeros_like(stk[:1])], axis=0)
        ids = jnp.asarray([3, 1, 16, 0], jnp.int32)  # incl. the pad row
        sub = stk[ids]
        sel = jnp.where(jnp.asarray([True, False, True, True])[:, None, None],
                        sub, jnp.flip(sub, axis=1)[:, ::-1])
        stk = stk.at[ids].set(sel, mode="drop")
        return jax.lax.bitcast_convert_type(stk[:16, 0], jnp.int32)

    out = np.asarray(jax.jit(roundtrip)(a))
    np.testing.assert_array_equal(out, np.asarray(a))
