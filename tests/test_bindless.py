"""Bindless-texture-scale scene (VERDICT r3 missing #3).

Pins the atlas registry + per-slot tap machinery at many-image scale and
the cluster path at many-light scale: mixed-size images defeat the
single-bundle fast path, materials reading two different images defeat
slot grouping, and 20+ lights exercise the sorted top-K cluster
assignment with the lax-loop shading path (max_slots > unroll).
"""

import numpy as np
import pytest

from transmission_renderer_tpu.models import (
    bindless_lights,
    build_bindless_scene,
)
from transmission_renderer_tpu.pbr.lights import pack_lights


@pytest.fixture(scope="module")
def bundle():
    return build_bindless_scene(grid=5, n_images=48).finish_bundle()


def test_scene_defeats_fast_paths(bundle):
    scene, dl, flags = bundle
    assert flags.slot_bundles == (), "mixed-image materials must disable grouping"
    assert not flags.atlas_pot, "mixed sizes must include non-pow2 images"
    assert scene.atlas_meta.shape[0] >= 48
    assert scene.materials.metallic_factor.shape[0] >= 16


def test_render_no_capacity_overflow(bundle):
    import jax

    from tests.golden_defs import CFG, _rig
    from transmission_renderer_tpu.render import (
        make_frame_params,
        render_frame,
    )

    scene, dl, flags = bundle
    lights = pack_lights(bindless_lights(20))
    rig = _rig((0.0, 4.0, 3.0), -0.6)
    params = make_frame_params(
        CFG, rig.camera.view_matrix(), rig.camera.position, rig.sun_dir()
    )
    img, diags = jax.jit(
        lambda s, d, p, li: render_frame(
            s, d, p, li, config=CFG, flags=flags, return_diagnostics=True
        )
    )(scene, dl, params, lights)
    img = np.asarray(img)
    assert np.isfinite(img).all()
    assert img.mean() > 0.005
    diags = jax.tree_util.tree_map(np.asarray, diags)
    assert not diags.overflowed(), diags
    # distinct textures/materials must actually produce distinct pixels
    # (a broken registry collapsing every id to image 0 would not)
    mid = np.asarray(img[40:60, :, :]).reshape(-1, 3)
    assert np.unique((mid * 255).astype(np.uint8), axis=0).shape[0] > 30
