"""glTF loader tests against synthetic assets written on the fly."""

import base64
import json
import struct

import numpy as np
import pytest

from transmission_renderer_tpu.scene.builder import SceneBuilder
from transmission_renderer_tpu.scene.gltf import GltfDocument, load_gltf


def _buffer_uri(data: bytes) -> str:
    return "data:application/octet-stream;base64," + base64.b64encode(data).decode()


def _png_data_uri(rgba: np.ndarray) -> str:
    from PIL import Image
    import io

    buf = io.BytesIO()
    Image.fromarray(rgba).save(buf, format="PNG")
    return "data:image/png;base64," + base64.b64encode(buf.getvalue()).decode()


def make_tri_gltf(tmp_path, *, transmission=False, alpha_mask=False, scale=2.0):
    positions = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    normals = np.tile(np.array([0, 0, 1], np.float32), (3, 1))
    uvs = np.array([[0, 0], [1, 0], [0, 1]], np.float32)
    indices = np.array([0, 1, 2], np.uint16)
    blob = (
        positions.tobytes() + normals.tobytes() + uvs.tobytes() + indices.tobytes()
    )
    tex = np.zeros((4, 4, 4), np.uint8)
    tex[..., 0] = 255
    tex[..., 3] = 255

    material = {
        "pbrMetallicRoughness": {
            "baseColorFactor": [0.5, 0.6, 0.7, 1.0],
            "baseColorTexture": {"index": 0},
            "metallicFactor": 0.25,
            "roughnessFactor": 0.75,
        },
        "emissiveFactor": [0.1, 0.2, 0.3],
        "extensions": {"KHR_materials_ior": {"ior": 1.33}},
    }
    if transmission:
        material["extensions"]["KHR_materials_transmission"] = {
            "transmissionFactor": 0.9
        }
        material["extensions"]["KHR_materials_volume"] = {
            "thicknessFactor": 0.4,
            "attenuationDistance": 2.0,
            "attenuationColor": [0.9, 0.5, 0.2],
        }
    if alpha_mask:
        material["alphaMode"] = "MASK"
        material["alphaCutoff"] = 0.25

    doc = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [
            {"mesh": 0, "translation": [1, 2, 3], "scale": [scale, scale, scale]}
        ],
        "meshes": [
            {
                "primitives": [
                    {
                        "attributes": {"POSITION": 0, "NORMAL": 1, "TEXCOORD_0": 2},
                        "indices": 3,
                        "material": 0,
                    }
                ]
            }
        ],
        "materials": [material],
        "textures": [{"source": 0}],
        "images": [{"uri": _png_data_uri(tex)}],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 3, "type": "VEC3"},
            {"bufferView": 1, "componentType": 5126, "count": 3, "type": "VEC3"},
            {"bufferView": 2, "componentType": 5126, "count": 3, "type": "VEC2"},
            {"bufferView": 3, "componentType": 5123, "count": 3, "type": "SCALAR"},
        ],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 36},
            {"buffer": 0, "byteOffset": 36, "byteLength": 36},
            {"buffer": 0, "byteOffset": 72, "byteLength": 24},
            {"buffer": 0, "byteOffset": 96, "byteLength": 6},
        ],
        "buffers": [{"uri": _buffer_uri(blob), "byteLength": len(blob)}],
    }
    p = tmp_path / "tri.gltf"
    p.write_text(json.dumps(doc))
    return str(p)


def test_load_simple_triangle(tmp_path):
    path = make_tri_gltf(tmp_path)
    b = SceneBuilder()
    load_gltf(path, b)
    scene = b.finish()
    assert scene.num_triangles == 1
    assert scene.num_instances == 1
    np.testing.assert_allclose(
        np.asarray(scene.inst_transform.translation)[0], [1, 2, 3]
    )
    assert float(scene.inst_transform.scale[0]) == 2.0
    m = scene.materials
    assert float(m.metallic_factor[0]) == 0.25
    assert float(m.roughness_factor[0]) == 0.75
    assert float(m.index_of_refraction[0]) == pytest.approx(1.33)
    np.testing.assert_allclose(
        np.asarray(m.diffuse_factor)[0], [0.5, 0.6, 0.7, 1.0]
    )
    assert int(m.tex_diffuse[0]) == 0
    assert int(m.tex_normal_map[0]) == -1
    assert int(scene.prim_draw_bucket[0]) == 0  # opaque
    # infinite attenuation distance by default
    assert np.isinf(float(m.attenuation_distance[0]))


def test_transmission_material_classification(tmp_path):
    path = make_tri_gltf(tmp_path, transmission=True)
    b = SceneBuilder()
    load_gltf(path, b, base_scale=3.0)
    scene = b.finish()
    assert int(scene.prim_draw_bucket[0]) == 2  # transmission bucket
    m = scene.materials
    assert float(m.transmission_factor[0]) == pytest.approx(0.9)
    assert float(m.thickness_factor[0]) == pytest.approx(0.4)
    # attenuation distance scaled by model scale (src/model_loading.rs:315-318)
    assert float(m.attenuation_distance[0]) == pytest.approx(2.0 * 3.0)
    # node scale composes with base scale
    assert float(scene.inst_transform.scale[0]) == pytest.approx(6.0)


def test_alpha_mask_bucket(tmp_path):
    path = make_tri_gltf(tmp_path, alpha_mask=True)
    b = SceneBuilder()
    load_gltf(path, b)
    scene = b.finish()
    assert int(scene.prim_draw_bucket[0]) == 1
    assert float(scene.materials.alpha_clipping_cutoff[0]) == pytest.approx(0.25)


def test_glb_roundtrip(tmp_path):
    """Pack the same document as GLB and check it parses identically."""
    gltf_path = make_tri_gltf(tmp_path)
    with open(gltf_path) as f:
        doc = json.load(f)
    # move the buffer into the binary chunk
    blob = base64.b64decode(doc["buffers"][0]["uri"].split(",", 1)[1])
    doc["buffers"][0] = {"byteLength": len(blob)}
    json_bytes = json.dumps(doc).encode()
    json_bytes += b" " * (-len(json_bytes) % 4)
    blob_p = blob + b"\x00" * (-len(blob) % 4)
    glb = (
        struct.pack("<III", 0x46546C67, 2, 12 + 8 + len(json_bytes) + 8 + len(blob_p))
        + struct.pack("<II", len(json_bytes), 0x4E4F534A)
        + json_bytes
        + struct.pack("<II", len(blob_p), 0x004E4942)
        + blob_p
    )
    glb_path = tmp_path / "tri.glb"
    glb_path.write_bytes(glb)

    g = GltfDocument.load(str(glb_path))
    pos = g.read_accessor(0)
    np.testing.assert_allclose(pos, [[0, 0, 0], [1, 0, 0], [0, 1, 0]])
    b = SceneBuilder()
    load_gltf(str(glb_path), b)
    scene = b.finish()
    assert scene.num_triangles == 1


def test_node_hierarchy_composition(tmp_path):
    """Parent/child TRS composes through the Similarity product."""
    doc = {
        "asset": {"version": "2.0"},
        "scenes": [{"nodes": [0]}],
        "nodes": [
            {"children": [1], "translation": [10, 0, 0], "scale": [2, 2, 2]},
            {"mesh": 0, "translation": [1, 0, 0]},
        ],
        "meshes": [
            {"primitives": [{"attributes": {"POSITION": 0}, "indices": 1}]}
        ],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 3, "type": "VEC3"},
            {"bufferView": 1, "componentType": 5125, "count": 3, "type": "SCALAR"},
        ],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 36},
            {"buffer": 0, "byteOffset": 36, "byteLength": 12},
        ],
        "buffers": [None],
    }
    blob = (
        np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32).tobytes()
        + np.array([0, 1, 2], np.uint32).tobytes()
    )
    doc["buffers"][0] = {"uri": _buffer_uri(blob), "byteLength": len(blob)}
    p = tmp_path / "h.gltf"
    p.write_text(json.dumps(doc))
    b = SceneBuilder()
    load_gltf(str(p), b)
    scene = b.finish()
    # world = parent * child: translation 10 + 2*1 = 12, scale 2
    np.testing.assert_allclose(
        np.asarray(scene.inst_transform.translation)[0], [12, 0, 0]
    )
    assert float(scene.inst_transform.scale[0]) == 2.0
    # default material appended for primitives without one
    assert scene.materials.num == 1


def test_strided_accessor(tmp_path):
    """Interleaved vertex buffer (byteStride) decodes correctly."""
    import numpy as np

    # interleave position (12B) + normal (12B): stride 24
    pos = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    nrm = np.tile(np.array([0, 0, 1], np.float32), (3, 1))
    inter = np.concatenate([pos, nrm], axis=1).astype(np.float32)  # [3, 6]
    idx = np.array([0, 1, 2], np.uint32)
    blob = inter.tobytes() + idx.tobytes()
    doc = {
        "asset": {"version": "2.0"},
        "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0}],
        "meshes": [
            {"primitives": [{"attributes": {"POSITION": 0, "NORMAL": 1}, "indices": 2}]}
        ],
        "accessors": [
            {"bufferView": 0, "byteOffset": 0, "componentType": 5126, "count": 3, "type": "VEC3"},
            {"bufferView": 0, "byteOffset": 12, "componentType": 5126, "count": 3, "type": "VEC3"},
            {"bufferView": 1, "componentType": 5125, "count": 3, "type": "SCALAR"},
        ],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 72, "byteStride": 24},
            {"buffer": 0, "byteOffset": 72, "byteLength": 12},
        ],
        "buffers": [{"uri": _buffer_uri(blob), "byteLength": len(blob)}],
    }
    p = tmp_path / "strided.gltf"
    p.write_text(json.dumps(doc))
    g = GltfDocument.load(str(p))
    np.testing.assert_allclose(g.read_accessor(0), pos)
    np.testing.assert_allclose(g.read_accessor(1), nrm)


def test_specular_and_texture_transform(tmp_path):
    """KHR_materials_specular factors and KHR_texture_transform's
    base-colour uv scale (the only transform the reference applies,
    src/model_loading.rs:87-94) survive the load."""
    path = make_tri_gltf(tmp_path)
    with open(path) as f:
        doc = json.load(f)
    mat = doc["materials"][0]
    mat["extensions"]["KHR_materials_specular"] = {
        "specularFactor": 0.5,
        "specularColorFactor": [0.9, 0.8, 0.7],
    }
    mat["pbrMetallicRoughness"]["baseColorTexture"]["extensions"] = {
        "KHR_texture_transform": {"scale": [4.0, 5.0]}
    }
    p = tmp_path / "spec.gltf"
    p.write_text(json.dumps(doc))
    b = SceneBuilder()
    load_gltf(str(p), b)
    scene = b.finish()
    m = scene.materials
    assert float(m.specular_factor[0]) == pytest.approx(0.5)
    np.testing.assert_allclose(
        np.asarray(m.specular_colour_factor)[0], [0.9, 0.8, 0.7], rtol=1e-6
    )
    # uv scale applied to the primitive's TEXCOORD_0 (base colour only)
    uvs = np.asarray(scene.uvs)
    np.testing.assert_allclose(uvs[1], [4.0, 0.0], rtol=1e-6)
    np.testing.assert_allclose(uvs[2], [0.0, 5.0], rtol=1e-6)


def _two_mat_gltf(tmp_path, img_sizes, specular_shares_diffuse=False):
    """Two materials, parameterised texture sizes per slot, optional
    KHR_materials_specular whose specularTexture (DontCare format)
    shares the diffuse (sRGB) image."""
    positions = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    normals = np.tile(np.array([0, 0, 1], np.float32), (3, 1))
    uvs = np.array([[0, 0], [1, 0], [0, 1]], np.float32)
    indices = np.array([0, 1, 2], np.uint16)
    blob = (
        positions.tobytes() + normals.tobytes() + uvs.tobytes()
        + indices.tobytes()
    )
    images, textures = [], []
    for k, s in enumerate(img_sizes):
        tex = np.full((s, s, 4), 40 * (k + 1), np.uint8)
        images.append({"uri": _png_data_uri(tex)})
        textures.append({"source": k})

    def mat(d, mr):
        m = {
            "pbrMetallicRoughness": {
                "baseColorTexture": {"index": d},
                "metallicRoughnessTexture": {"index": mr},
            },
        }
        if specular_shares_diffuse:
            m["extensions"] = {
                "KHR_materials_specular": {
                    "specularColorTexture": {"index": d},
                    "specularTexture": {"index": d},
                }
            }
        return m

    doc = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0, 1]}],
        "nodes": [{"mesh": 0}, {"mesh": 1}],
        "meshes": [
            {"primitives": [{
                "attributes": {"POSITION": 0, "NORMAL": 1, "TEXCOORD_0": 2},
                "indices": 3, "material": i,
            }]} for i in range(2)
        ],
        "materials": [mat(0, 1), mat(2, 3 if len(img_sizes) > 3 else 2)],
        "textures": textures,
        "images": images,
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 3, "type": "VEC3"},
            {"bufferView": 1, "componentType": 5126, "count": 3, "type": "VEC3"},
            {"bufferView": 2, "componentType": 5126, "count": 3, "type": "VEC2"},
            {"bufferView": 3, "componentType": 5123, "count": 3, "type": "SCALAR"},
        ],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 36},
            {"buffer": 0, "byteOffset": 36, "byteLength": 36},
            {"buffer": 0, "byteOffset": 72, "byteLength": 24},
            {"buffer": 0, "byteOffset": 96, "byteLength": 6},
        ],
        "buffers": [{"uri": _buffer_uri(blob), "byteLength": len(blob)}],
    }
    p = tmp_path / "two.gltf"
    p.write_text(json.dumps(doc))
    return str(p)


def test_dontcare_specular_reuses_srgb_decode(tmp_path):
    """A DontCare-format specularTexture sharing its image with the
    material's sRGB specularColorTexture must reuse the sRGB entry
    (reference src/model_loading.rs:179-194 + field order :274-291) —
    not bundle a second linear decode of the same image."""
    path = _two_mat_gltf(tmp_path, [4, 4, 4, 4], specular_shares_diffuse=True)
    b = SceneBuilder()
    load_gltf(path, b)
    scene, dl, flags = b.finish_bundle()
    m = scene.materials
    # specular and specular_colour resolve to the SAME packed ref
    assert int(m.tex_specular[0]) == int(m.tex_specular_colour[0])


def test_mixed_size_material_disables_bundling_scene_wide(tmp_path):
    """One material with mixed-size sampled images must disable
    auto-bundling for the whole scene (a partial bundle would widen
    every atlas row by L layers while compute_slot_bundles returns (),
    so every tap would pay the L-wide gather with no sharing)."""
    from transmission_renderer_tpu.ops.texture import atlas_layers

    path = _two_mat_gltf(tmp_path, [4, 4, 4, 8])  # mat 1: 4px + 8px
    b = SceneBuilder()
    load_gltf(path, b)
    scene, dl, flags = b.finish_bundle()
    assert atlas_layers(scene.atlas_meta) == 1, "mixed-size material must keep the atlas single-layer"


def test_same_image_two_slots_reuses_cache_not_bundle(tmp_path):
    """A material reusing ONE image in two same-colour-space slots
    (baseColor + emissive, both sRGB) must resolve both through the
    per-image cache — NOT a pointless 1-layer bundle that would
    duplicate the decoded texels once more for every other material
    loading the image standalone (the >= 2 bundle threshold applies
    AFTER key dedup)."""
    from transmission_renderer_tpu.ops.texture import atlas_layers

    positions = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    normals = np.tile(np.array([0, 0, 1], np.float32), (3, 1))
    uvs = np.array([[0, 0], [1, 0], [0, 1]], np.float32)
    indices = np.array([0, 1, 2], np.uint16)
    blob = (
        positions.tobytes() + normals.tobytes() + uvs.tobytes()
        + indices.tobytes()
    )
    tex = np.full((4, 4, 4), 77, np.uint8)
    doc = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0, 1]}],
        "nodes": [{"mesh": 0}, {"mesh": 1}],
        "meshes": [
            {"primitives": [{
                "attributes": {"POSITION": 0, "NORMAL": 1, "TEXCOORD_0": 2},
                "indices": 3, "material": i,
            }]} for i in range(2)
        ],
        "materials": [
            {   # same sRGB image in two slots
                "pbrMetallicRoughness": {"baseColorTexture": {"index": 0}},
                "emissiveTexture": {"index": 0},
            },
            {   # second material loads the image standalone
                "pbrMetallicRoughness": {"baseColorTexture": {"index": 0}},
            },
        ],
        "textures": [{"source": 0}],
        "images": [{"uri": _png_data_uri(tex)}],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 3, "type": "VEC3"},
            {"bufferView": 1, "componentType": 5126, "count": 3, "type": "VEC3"},
            {"bufferView": 2, "componentType": 5126, "count": 3, "type": "VEC2"},
            {"bufferView": 3, "componentType": 5123, "count": 3, "type": "SCALAR"},
        ],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 36},
            {"buffer": 0, "byteOffset": 36, "byteLength": 36},
            {"buffer": 0, "byteOffset": 72, "byteLength": 24},
            {"buffer": 0, "byteOffset": 96, "byteLength": 6},
        ],
        "buffers": [{"uri": _buffer_uri(blob), "byteLength": len(blob)}],
    }
    p = tmp_path / "dup.gltf"
    p.write_text(json.dumps(doc))
    b = SceneBuilder()
    load_gltf(str(p), b)
    scene, dl, flags = b.finish_bundle()
    m = scene.materials
    # one cached atlas entry serves all three references
    assert int(m.tex_diffuse[0]) == int(m.tex_emissive[0])
    assert int(m.tex_diffuse[0]) == int(m.tex_diffuse[1])
    assert atlas_layers(scene.atlas_meta) == 1


def test_sparse_accessor_substitution(tmp_path):
    """accessor.sparse scatters `values` rows at `indices` over the base
    view (glTF 2.0 §3.6.2.4) — previously silently dropped."""
    positions = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    normals = np.tile(np.array([0, 0, 1], np.float32), (3, 1))
    uvs = np.array([[0, 0], [1, 0], [0, 1]], np.float32)
    indices = np.array([0, 1, 2], np.uint16)
    sp_idx = np.array([1], np.uint16)
    sp_val = np.array([[5.0, 6.0, 7.0]], np.float32)
    blob = (
        positions.tobytes() + normals.tobytes() + uvs.tobytes()
        + indices.tobytes() + sp_idx.tobytes() + sp_val.tobytes()
    )
    doc = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0}],
        "meshes": [{"primitives": [{
            "attributes": {"POSITION": 0, "NORMAL": 1, "TEXCOORD_0": 2},
            "indices": 3,
        }]}],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 3,
             "type": "VEC3",
             "sparse": {
                 "count": 1,
                 "indices": {"bufferView": 4, "componentType": 5123},
                 "values": {"bufferView": 5},
             }},
            {"bufferView": 1, "componentType": 5126, "count": 3, "type": "VEC3"},
            {"bufferView": 2, "componentType": 5126, "count": 3, "type": "VEC2"},
            {"bufferView": 3, "componentType": 5123, "count": 3, "type": "SCALAR"},
        ],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 36},
            {"buffer": 0, "byteOffset": 36, "byteLength": 36},
            {"buffer": 0, "byteOffset": 72, "byteLength": 24},
            {"buffer": 0, "byteOffset": 96, "byteLength": 6},
            {"buffer": 0, "byteOffset": 102, "byteLength": 2},
            {"buffer": 0, "byteOffset": 104, "byteLength": 12},
        ],
        "buffers": [{"uri": _buffer_uri(blob), "byteLength": len(blob)}],
    }
    p = tmp_path / "sparse.gltf"
    p.write_text(json.dumps(doc))
    g = GltfDocument.load(str(p))
    got = g.read_accessor(0)
    np.testing.assert_array_equal(
        got, np.array([[0, 0, 0], [5, 6, 7], [0, 1, 0]], np.float32)
    )


def test_zero_material_document_gets_spec_default(tmp_path):
    """A document with no materials array: the reference's unwrap_or(0)
    would alias a previous model's material (UB); here a spec-default
    material (metallic=1, roughness=1, white) is appended instead, and
    the instance points at it."""
    path = make_tri_gltf(tmp_path)
    import json as _json
    with open(path) as f:
        doc = _json.load(f)
    del doc["materials"]
    del doc["meshes"][0]["primitives"][0]["material"]
    # textures/images may dangle unused
    p = tmp_path / "nomat.gltf"
    p.write_text(_json.dumps(doc))
    b = SceneBuilder()
    load_gltf(str(p), b)
    scene, dl, flags = b.finish_bundle()
    m = scene.materials
    assert m.num == 1
    assert float(m.metallic_factor[0]) == 1.0
    assert float(m.roughness_factor[0]) == 1.0
    assert int(scene.inst_material_id[0]) == 0


def test_non_triangle_mode_rejected(tmp_path):
    """Primitive modes other than TRIANGLES raise a clear error instead
    of reshaping a strip's indices into garbage triangles."""
    import pytest

    path = make_tri_gltf(tmp_path)
    import json as _json
    with open(path) as f:
        doc = _json.load(f)
    doc["meshes"][0]["primitives"][0]["mode"] = 5  # TRIANGLE_STRIP
    p = tmp_path / "strip.gltf"
    p.write_text(_json.dumps(doc))
    b = SceneBuilder()
    with pytest.raises(ValueError, match="primitive mode 5"):
        load_gltf(str(p), b)
