"""Real-asset GLB fixture end-to-end (tests/assets/multi.glb).

The checked-in binary (generated once by tools/make_glb_fixture.py)
combines the loader features a real exporter emits in ONE file: GLB
container, binary-chunk images, an interleaved vertex bufferView
(byteStride 32), u16 AND u32 indices, a 3-level node hierarchy mixing
TRS + matrix transforms, and one material per draw bucket. The synthetic
tests (test_gltf.py) cover the same features one at a time; this one
guards their composition — and actually renders the loaded scene
(reference flow: src/main.rs:342-370 always loads real models).
"""

import os

import numpy as np
import pytest

from transmission_renderer_tpu.scene.builder import SceneBuilder
from transmission_renderer_tpu.scene.gltf import GltfDocument, load_gltf

FIXTURE = os.path.join(os.path.dirname(__file__), "assets", "multi.glb")


@pytest.fixture(scope="module")
def bundle():
    b = SceneBuilder()
    load_gltf(FIXTURE, b)
    return b.finish_bundle()


def test_document_structure():
    g = GltfDocument.load(FIXTURE)
    # interleaved accessors share one bufferView with byteStride 32
    bv = g.doc["accessors"][0]["bufferView"]
    assert g.doc["bufferViews"][bv]["byteStride"] == 32
    pos = g.read_accessor(0)
    nrm = g.read_accessor(1)
    uv = g.read_accessor(2)
    assert pos.shape == (24, 3) and nrm.shape == (24, 3) and uv.shape == (24, 2)
    # interleave did not bleed: every position is a cube corner, every
    # normal is unit axis-aligned, every uv in [0, 1]
    np.testing.assert_allclose(np.abs(pos).max(axis=0), [0.5, 0.5, 0.5])
    np.testing.assert_allclose(np.linalg.norm(nrm, axis=1), 1.0, atol=1e-6)
    assert uv.min() >= 0.0 and uv.max() <= 1.0
    # both index widths decode
    assert g.read_accessor(3).dtype == np.uint16
    assert g.read_accessor(7).dtype == np.uint32
    # binary-chunk PNG decodes to RGBA8
    img = g.read_image(0)
    assert img.shape == (8, 8, 4) and img.dtype == np.uint8


def test_scene_assembly(bundle):
    scene, dl, flags = bundle
    # 12 (cube) + 8 (octa) + 2 (quad) triangles, one instance each
    assert scene.num_triangles == 22
    assert scene.num_instances == 3
    m = scene.materials
    buckets = np.asarray(scene.prim_draw_bucket)
    assert sorted(buckets.tolist()) == [0, 1, 2]  # opaque, mask, transmission

    # instance/material ids resolved through the primitive's bucket
    inst_prim = np.asarray(scene.inst_primitive_id)
    inst_of = {
        int(buckets[p]): i for i, p in enumerate(inst_prim.tolist())
    }
    cube_n, leaf_n, glass_n = inst_of[0], inst_of[1], inst_of[2]
    mat = np.asarray(scene.inst_material_id)
    cube_i, leaf_i, glass_i = mat[cube_n], mat[leaf_n], mat[glass_n]
    tr = np.asarray(scene.inst_transform.translation)
    sc = np.asarray(scene.inst_transform.scale)
    cube_i_t, leaf_i_t, glass_i_t = cube_n, leaf_n, glass_n
    # root T(0,1,0) . pivot (rot90Y, T(-0.9,0,0)) . cube
    np.testing.assert_allclose(tr[cube_i_t], [-0.9, 1.0, 0.0], atol=1e-6)
    assert sc[cube_i_t] == pytest.approx(1.0)
    # root . (scale 1.5, T(0.9,0,0)) . octa
    np.testing.assert_allclose(tr[glass_i_t], [0.9, 1.0, 0.0], atol=1e-6)
    assert sc[glass_i_t] == pytest.approx(1.5)
    # root . matrix(S 0.5, T(0,0.8,-0.4)) . T(0,0.4,0)
    np.testing.assert_allclose(tr[leaf_i_t], [0.0, 2.0, -0.4], atol=1e-6)
    assert sc[leaf_i_t] == pytest.approx(0.5)

    # material wiring across buckets
    assert float(m.metallic_factor[cube_i]) == pytest.approx(0.5)
    assert int(m.tex_diffuse[cube_i]) >= 0
    assert int(m.tex_metallic_roughness[cube_i]) >= 0
    assert float(m.transmission_factor[glass_i]) == pytest.approx(1.0)
    assert float(m.index_of_refraction[glass_i]) == pytest.approx(1.45)
    assert float(m.thickness_factor[glass_i]) == pytest.approx(0.5)
    assert float(m.attenuation_distance[glass_i]) == pytest.approx(1.5)
    assert float(m.specular_factor[glass_i]) == pytest.approx(0.7)
    assert float(m.alpha_clipping_cutoff[leaf_i]) == pytest.approx(0.5)
    assert int(m.tex_diffuse[leaf_i]) >= 0


def test_render_end_to_end(bundle):
    """All three buckets survive a real frame: opaque + alpha-mask +
    transmission pixels all land, and the MASK texture's alpha hole
    actually clips."""
    from functools import partial

    import jax

    from transmission_renderer_tpu.config import RenderConfig
    from transmission_renderer_tpu.pbr.lights import pack_lights, point_light
    from transmission_renderer_tpu.render import (
        make_frame_params,
        render_frame,
    )
    from transmission_renderer_tpu.scene.camera import CameraRig

    scene, dl, flags = bundle
    cfg = RenderConfig(
        width=128, height=72, tile_w=32, tile_h=8,
        max_tris_per_tile=1024, max_tiles_per_tri=16, max_big_tris=32,
    )
    rig = CameraRig()
    rig.camera.position = np.array([0.0, 1.2, 3.2], np.float32)
    rig.camera.pitch = 0.1
    params = make_frame_params(
        cfg, rig.camera.view_matrix(), rig.camera.position, rig.sun_dir()
    )
    lights = pack_lights(
        [point_light([0.0, 2.5, 1.5], [1.0, 1.0, 1.0], 6.0)]
    )
    ldr, hdr, diags = jax.jit(
        partial(
            render_frame, config=cfg, flags=flags, return_hdr=True,
            return_diagnostics=True,
        )
    )(scene, dl, params, lights)
    ldr = np.asarray(ldr)
    assert np.isfinite(ldr).all()
    assert not diags.overflowed()
    # scene coverage: a meaningful fraction of the frame is geometry
    # (HDR differs from the clear colour somewhere on each object's
    # expected side of the frame: cube left, glass right, leaf centre-top)
    hdr = np.asarray(hdr)
    bg = hdr[0, 0]
    covered = np.abs(hdr - bg).max(axis=-1) > 1e-6
    h, w = covered.shape
    assert covered[:, : w // 2].any(), "cube (left) missing"
    assert covered[:, w // 2 :].any(), "glass (right) missing"
    assert covered.mean() > 0.02
