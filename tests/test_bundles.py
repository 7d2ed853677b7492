"""Texture bundles: N same-size textures in one atlas entry, one gather
per tap (scene/textures.py push_bundle + render/shading.py group taps).

The bundled render must equal the same scene built with separate
single-layer textures (which disables slot grouping): identical decoded
texels, identical lerps — only the gather structure differs.
"""

import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

from transmission_renderer_tpu.config import BUCKET_OPAQUE, RenderConfig
from transmission_renderer_tpu.models.procedural import (
    _helmet_texture_set,
    build_opaque_scene,
    make_plane_mesh,
    make_sphere_mesh,
)
from transmission_renderer_tpu.ops.texture import sample_texture
from transmission_renderer_tpu.pbr.lights import pack_lights, point_light
from transmission_renderer_tpu.render import make_frame_params, render_frame
from transmission_renderer_tpu.scene.builder import SceneBuilder
from transmission_renderer_tpu.scene.camera import CameraRig
from transmission_renderer_tpu.scene.textures import AtlasBuilder, texture_ref

CFG = RenderConfig(
    width=128, height=72, tile_w=32, tile_h=8,
    max_tris_per_tile=1024, max_tiles_per_tri=16, max_big_tris=32,
)


def test_bundle_layers_match_single_textures():
    rng = np.random.default_rng(9)
    imgs = [
        rng.integers(0, 256, (16, 16, 4)).astype(np.uint8) for _ in range(3)
    ]
    srgbs = [True, False, True]

    bundled = AtlasBuilder()
    bid = bundled.push_bundle(imgs, srgbs)
    bq, bm, bs = bundled.finish()

    uv = jnp.asarray(rng.uniform(0, 1, (64, 2)).astype(np.float32))
    lod = jnp.asarray(rng.uniform(0, 3, (64,)).astype(np.float32))

    for k, (img, srgb) in enumerate(zip(imgs, srgbs)):
        single = AtlasBuilder()
        tid = single.push_image(img, srgb)
        sq, sm, ss = single.finish()
        want = sample_texture(
            jnp.asarray(sq), jnp.asarray(sm), jnp.asarray(ss),
            jnp.full((64,), tid, jnp.int32), uv, lod,
        )
        got = sample_texture(
            jnp.asarray(bq), jnp.asarray(bm), jnp.asarray(bs),
            jnp.full((64,), texture_ref(bid, k), jnp.int32), uv, lod,
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def _build_helmet_unbundled(stacks=16, sectors=32, texture_size=64):
    """build_opaque_scene's twin with five SEPARATE textures (disables
    slot grouping: one material then references five distinct images)."""
    b = SceneBuilder()
    from transmission_renderer_tpu.models.procedural import (
        checkerboard_texture,
        _displaced_sphere,
    )

    checker = b.add_texture(checkerboard_texture(512, 16), srgb=True)
    d, mr, nm, em, oc = _helmet_texture_set(texture_size)
    refs = [
        b.add_texture(d, True), b.add_texture(mr, False),
        b.add_texture(nm, False), b.add_texture(em, True),
        b.add_texture(oc, False),
    ]
    floor_mat = b.add_material(tex_diffuse=checker, roughness_factor=0.9)
    helmet_mat = b.add_material(
        diffuse_factor=(1.0, 1.0, 1.0, 1.0),
        tex_diffuse=refs[0], tex_metallic_roughness=refs[1],
        tex_normal_map=refs[2], tex_emissive=refs[3], tex_occlusion=refs[4],
        emissive_factor=(2.0, 2.0, 2.0),
        roughness_factor=1.0, metallic_factor=1.0,
    )
    p_floor = b.add_primitive(*make_plane_mesh(8.0), bucket=BUCKET_OPAQUE)
    p_obj = b.add_primitive(
        *_displaced_sphere(stacks, sectors), bucket=BUCKET_OPAQUE
    )
    b.add_instance(p_floor, floor_mat)
    b.add_instance(p_obj, helmet_mat, translation=(0.0, 1.4, -3.5))
    return b


def _render(builder):
    scene, dl, flags = builder.finish_bundle()
    rig = CameraRig()
    rig.camera.position = np.array([0.0, 2.2, 1.5], np.float32)
    rig.camera.pitch = -0.25
    params = make_frame_params(
        CFG, rig.camera.view_matrix(), rig.camera.position, rig.sun_dir()
    )
    lights = pack_lights([point_light([0.0, 0.8, 0.0], [1, 0, 0], 5.0)])
    return np.asarray(
        jax.jit(partial(render_frame, config=CFG, flags=flags))(
            scene, dl, params, lights
        )
    ), flags


def test_bundled_helmet_matches_unbundled():
    img_b, flags_b = _render(
        build_opaque_scene(stacks=16, sectors=32, texture_size=64)
    )
    img_s, flags_s = _render(_build_helmet_unbundled())
    # the bundled build groups every sampled slot; the separate-texture
    # build must NOT (one material references five distinct images)
    assert flags_b.slot_bundles, flags_b
    assert not flags_s.slot_bundles, flags_s
    assert np.isfinite(img_b).all()
    rmse = float(np.sqrt(np.mean((img_b - img_s) ** 2)))
    assert rmse < 1e-6, rmse
