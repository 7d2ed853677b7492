"""Hybrid Pallas+JAX raster path (alpha-clip merge) vs the pure-JAX path.

Runs the Pallas kernel in interpreter mode on CPU; the merged image must
match the pure-JAX render exactly.
"""

import numpy as np
import jax
import pytest
from functools import partial

from transmission_renderer_tpu.config import (
    BUCKET_ALPHA_CLIP,
    BUCKET_OPAQUE,
    BUCKET_TRANSMISSION,
    RenderConfig,
)
from transmission_renderer_tpu.models import checkerboard_texture, make_plane_mesh, make_sphere_mesh
from transmission_renderer_tpu.pbr.lights import pack_lights, point_light
from transmission_renderer_tpu.render import make_frame_params, render_frame
from transmission_renderer_tpu.scene.builder import SceneBuilder
from transmission_renderer_tpu.scene.camera import CameraRig

# Pallas-native tile shape (the kernel requires 8x128)
CFG_JAX = RenderConfig(
    width=256, height=64, tile_w=128, tile_h=8,
    max_tris_per_tile=1024, max_tiles_per_tri=16, max_big_tris=32,
    use_pallas_raster=False,
)
import dataclasses

CFG_PAL = dataclasses.replace(CFG_JAX, use_pallas_raster=True, pallas_interpret=True)


def _scene_with_alpha_clip():
    b = SceneBuilder()
    # checkered alpha texture: alpha 255 on light cells, 0 on dark cells
    tex = checkerboard_texture(64, 8, 255, 40)
    tex[..., 3] = np.where(tex[..., 0] > 128, 255, 0).astype(np.uint8)
    tid = b.add_texture(tex, srgb=True)
    floor_mat = b.add_material(roughness_factor=0.8, metallic_factor=0.0,
                               diffuse_factor=(0.6, 0.6, 0.6, 1.0))
    clip_mat = b.add_material(
        tex_diffuse=tid, alpha_clipping_cutoff=0.5, roughness_factor=0.7,
        metallic_factor=0.0,
    )
    glass_mat = b.add_material(
        transmission_factor=1.0, metallic_factor=0.0, roughness_factor=0.1,
        thickness_factor=0.3, attenuation_distance=1.0,
        attenuation_colour=(0.5, 0.8, 0.9),
    )
    p_floor = b.add_primitive(*make_plane_mesh(6.0), bucket=BUCKET_OPAQUE)
    p_sphere = b.add_primitive(*make_sphere_mesh(8, 16), bucket=BUCKET_OPAQUE)
    p_clip = b.add_primitive(*make_plane_mesh(1.5, y=1.0, uv_scale=1.0),
                             bucket=BUCKET_ALPHA_CLIP)
    p_glass = b.add_primitive(*make_sphere_mesh(8, 16), bucket=BUCKET_TRANSMISSION)
    b.add_instance(p_floor, floor_mat)
    b.add_instance(p_sphere, floor_mat, translation=(-1.5, 0.8, -3.0), scale=0.8)
    b.add_instance(p_clip, clip_mat, translation=(0.5, 0.4, -2.0))
    b.add_instance(p_glass, glass_mat, translation=(1.5, 0.9, -2.5), scale=0.7)
    return b.finish_bundle()


def test_hybrid_matches_jax_path():
    scene, dl, flags = _scene_with_alpha_clip()
    assert flags.has_alpha_clip and flags.has_transmission
    rig = CameraRig()
    rig.camera.position = np.array([0.0, 2.2, 2.0], np.float32)
    rig.camera.pitch = -0.5
    params = make_frame_params(
        CFG_JAX, rig.camera.view_matrix(), rig.camera.position, rig.sun_dir()
    )
    lights = pack_lights([point_light([0.0, 1.5, 0.0], [1, 1, 1], 4.0)])

    ref = np.asarray(
        jax.jit(partial(render_frame, config=CFG_JAX, flags=flags))(
            scene, dl, params, lights
        )
    )
    got = np.asarray(
        jax.jit(partial(render_frame, config=CFG_PAL, flags=flags))(
            scene, dl, params, lights
        )
    )
    # The depth race is exact between backends; the only permitted
    # differences are triangle attribution at *bitwise-equal depth* seams
    # (UV-sphere poles), where the winner is iteration-order-dependent.
    # Those are isolated pixels: bound their fraction and the global RMSE.
    # Tie pixels can differ arbitrarily much in colour: a different (equal
    # depth) winner means different barycentrics, and through refraction a
    # minutely different exit UV can land on a different checker cell. The
    # invariant is that such pixels are rare, not that they are close.
    diff = np.abs(got - ref)
    frac = (diff > 1e-5).mean()
    assert frac < 0.01, f"max {diff.max()}, frac {frac}"
    # the alpha-clipped plane must actually show holes (checker pattern)
    assert (ref.sum(-1) > 0).any()


def test_sparse_tile_raster_matches_dense_pallas():
    """Sparse-tile transmission/clip raster (active-tile worklists) must be
    bit-identical to the dense Pallas path: inactive tiles' defaults mirror
    the kernel's cleared output, active tiles run the same kernel."""
    scene, dl, flags = _scene_with_alpha_clip()
    rig = CameraRig()
    rig.camera.position = np.array([0.0, 2.2, 2.0], np.float32)
    rig.camera.pitch = -0.5
    params = make_frame_params(
        CFG_PAL, rig.camera.view_matrix(), rig.camera.position, rig.sun_dir()
    )
    lights = pack_lights([point_light([0.0, 1.5, 0.0], [1, 1, 1], 4.0)])

    cfg_dense = dataclasses.replace(
        CFG_PAL, transmission_tile_cap_frac=None, clip_tile_cap_frac=None
    )
    # floor 1 so the 16-tile test frame actually takes the sparse path
    cfg_sparse = dataclasses.replace(
        CFG_PAL, transmission_tile_cap_frac=0.75, clip_tile_cap_frac=0.75,
        sparse_raster_tile_floor=1,
    )
    dense = np.asarray(
        jax.jit(partial(render_frame, config=cfg_dense, flags=flags))(
            scene, dl, params, lights
        )
    )
    sparse, diag = jax.jit(
        partial(render_frame, config=cfg_sparse, flags=flags,
                return_diagnostics=True)
    )(scene, dl, params, lights)
    np.testing.assert_array_equal(np.asarray(sparse), dense)
    # worklists saw real work and stayed under their caps
    assert 0 < int(diag.transmission_tiles) <= diag.transmission_tile_capacity
    assert 0 < int(diag.clip_tiles) <= diag.clip_tile_capacity
    assert not type(diag)(*[
        int(np.asarray(v)) if hasattr(v, "shape") else v for v in diag
    ]).overflowed()


def test_sparse_tile_raster_overflow_detected():
    """An undersized tile worklist must be surfaced via FrameDiagnostics
    (dropped tiles = silently missing glass otherwise)."""
    scene, dl, flags = _scene_with_alpha_clip()
    rig = CameraRig()
    rig.camera.position = np.array([0.0, 2.2, 2.0], np.float32)
    rig.camera.pitch = -0.5
    params = make_frame_params(
        CFG_PAL, rig.camera.view_matrix(), rig.camera.position, rig.sun_dir()
    )
    lights = pack_lights([point_light([0.0, 1.5, 0.0], [1, 1, 1], 4.0)])
    cfg = dataclasses.replace(
        CFG_PAL, transmission_tile_cap_frac=1e-9, clip_tile_cap_frac=1e-9,
        sparse_raster_tile_floor=1,
    )
    _, diag = jax.jit(
        partial(render_frame, config=cfg, flags=flags,
                return_diagnostics=True)
    )(scene, dl, params, lights)
    host = type(diag)(*[
        int(np.asarray(v)) if hasattr(v, "shape") else v for v in diag
    ])
    assert host.transmission_tiles > host.transmission_tile_capacity
    assert host.overflowed()


def _scene_transmission_only():
    b = SceneBuilder()
    floor_mat = b.add_material(roughness_factor=0.8, metallic_factor=0.0,
                               diffuse_factor=(0.6, 0.6, 0.6, 1.0))
    glass_mat = b.add_material(
        transmission_factor=1.0, metallic_factor=0.0, roughness_factor=0.25,
        thickness_factor=0.3, attenuation_distance=1.0,
        attenuation_colour=(0.5, 0.8, 0.9),
    )
    p_floor = b.add_primitive(*make_plane_mesh(6.0), bucket=BUCKET_OPAQUE)
    p_glass = b.add_primitive(*make_sphere_mesh(8, 16),
                              bucket=BUCKET_TRANSMISSION)
    b.add_instance(p_floor, floor_mat)
    b.add_instance(p_glass, glass_mat, translation=(0.5, 0.9, -2.5))
    return b.finish_bundle()


def test_fused_sparse_transmission_matches_dense_pallas():
    """The fused sparse-raster -> sparse-shade transmission path (tile
    rows feeding the shading blocks directly) must match the dense Pallas
    path bit-for-bit on a clip-free scene."""
    scene, dl, flags = _scene_transmission_only()
    assert flags.has_transmission and not flags.has_alpha_clip
    rig = CameraRig()
    rig.camera.position = np.array([0.0, 2.2, 2.0], np.float32)
    rig.camera.pitch = -0.5
    params = make_frame_params(
        CFG_PAL, rig.camera.view_matrix(), rig.camera.position, rig.sun_dir()
    )
    lights = pack_lights([point_light([0.0, 1.5, 0.0], [1, 1, 1], 4.0)])
    cfg_dense = dataclasses.replace(
        CFG_PAL, transmission_tile_cap_frac=None, clip_tile_cap_frac=None
    )
    cfg_fused = dataclasses.replace(
        CFG_PAL, transmission_tile_cap_frac=0.75, sparse_raster_tile_floor=1
    )
    dense = np.asarray(
        jax.jit(partial(render_frame, config=cfg_dense, flags=flags))(
            scene, dl, params, lights
        )
    )
    fused, diag = jax.jit(
        partial(render_frame, config=cfg_fused, flags=flags,
                return_diagnostics=True)
    )(scene, dl, params, lights)
    np.testing.assert_array_equal(np.asarray(fused), dense)
    assert 0 < int(diag.transmission_tiles) <= diag.transmission_tile_capacity
    assert int(diag.transmission_blocks) > 0
