"""Block-sparse shading: primitives + end-to-end equivalence vs dense."""

import numpy as np
import jax.numpy as jnp

from transmission_renderer_tpu.render.sparse import (
    BLOCK,
    block_gather,
    block_scatter,
    compact_blocks,
    pixel_coords,
)


def test_compact_gather_scatter_roundtrip():
    rng = np.random.default_rng(3)
    h, w = 24, 256  # 48 blocks
    img = rng.standard_normal((h, w, 3)).astype(np.float32)
    mask = np.zeros((h, w), bool)
    mask[3:9, 40:200] = True
    wk = compact_blocks(jnp.asarray(mask), cap_b=30)
    n_active = len(
        {i // BLOCK for i in np.flatnonzero(mask.reshape(-1))}
    )
    assert int(wk.count) == n_active
    assert int(wk.overflow()) == 0

    flat = block_gather(wk, jnp.asarray(img))
    out = block_scatter(wk, flat, jnp.zeros((h, w, 3), jnp.float32))
    out = np.asarray(out)
    # active blocks round-trip exactly; untouched blocks stay zero
    blk_mask = mask.reshape(-1, BLOCK).any(1)
    pix_mask = np.repeat(blk_mask, BLOCK).reshape(h, w)
    np.testing.assert_array_equal(out[pix_mask], img[pix_mask])
    assert np.all(out[~pix_mask] == 0.0)


def test_compact_overflow_reported():
    mask = jnp.ones((8, 256), bool)  # 16 blocks, cap 4
    wk = compact_blocks(mask, cap_b=4)
    assert int(wk.count) == 16
    assert int(wk.overflow()) == 12


def test_pixel_coords_match_flat_index():
    h, w = 16, 256
    mask = np.zeros((h, w), bool)
    mask[5, 130] = True
    mask[9, 2] = True
    wk = compact_blocks(jnp.asarray(mask), cap_b=8)
    px, py = pixel_coords(wk)
    img = np.arange(h * w, dtype=np.float32).reshape(h, w)
    flat = np.asarray(block_gather(wk, jnp.asarray(img)))
    sel = flat[: int(wk.count) * BLOCK]
    pxs = np.asarray(px)[: int(wk.count) * BLOCK]
    pys = np.asarray(py)[: int(wk.count) * BLOCK]
    np.testing.assert_array_equal(sel, (pys * w + pxs).astype(np.float32))


def test_sparse_frame_matches_dense():
    """The flagship-style scene renders identically with sparse shading."""
    import dataclasses

    from transmission_renderer_tpu.config import RenderConfig
    from transmission_renderer_tpu.models import build_dragon_scene
    from transmission_renderer_tpu.pbr.lights import pack_lights, point_light
    from transmission_renderer_tpu.render import make_frame_params, render_frame
    from transmission_renderer_tpu.scene.camera import CameraRig

    config_dense = RenderConfig(
        width=256, height=144, use_pallas_raster=False,
        opaque_block_cap_frac=None, transmission_block_cap_frac=None,
    )
    config_sparse = dataclasses.replace(
        config_dense, opaque_block_cap_frac=1.0, transmission_block_cap_frac=0.5
    )
    scene, dl, flags = build_dragon_scene(stacks=24, sectors=48).finish_bundle()
    rig = CameraRig()
    rig.camera.position = np.array([0.0, 2.2, 1.5], np.float32)
    rig.camera.pitch = -0.25
    lights = pack_lights([point_light([0.0, 0.8, 0.0], [1.0, 0.0, 0.0], 5.0)])
    params = make_frame_params(
        config_dense, rig.camera.view_matrix(), rig.camera.position, rig.sun_dir()
    )
    dense = np.asarray(
        render_frame(scene, dl, params, lights, config=config_dense, flags=flags)
    )
    sparse, diags = render_frame(
        scene, dl, params, lights, config=config_sparse, flags=flags,
        return_diagnostics=True,
    )
    assert not diags_overflow(diags)
    np.testing.assert_allclose(np.asarray(sparse), dense, atol=1e-6)


def diags_overflow(diags):
    import jax

    diags = jax.tree_util.tree_map(
        lambda x: np.asarray(x) if hasattr(x, "shape") else x, diags
    )
    return diags.overflowed()
