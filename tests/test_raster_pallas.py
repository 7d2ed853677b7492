"""Pallas raster kernel vs the pure-JAX reference rasteriser
(interpret mode on CPU — SURVEY.md §4b kernel-vs-lax strategy)."""

import numpy as np
import jax.numpy as jnp
import pytest

from transmission_renderer_tpu.ops.raster import (
    bin_triangles,
    rasterize,
    setup_triangles,
)
from transmission_renderer_tpu.ops.raster_pallas import (
    TILE_H,
    TILE_W,
    rasterize_pallas,
)
from transmission_renderer_tpu.scene.camera import look_at_rh, perspective_matrix_reversed

W, H = 256, 64  # 2 x 8 tiles of 128 x 8


def project(positions, pv):
    ph = np.concatenate([positions, np.ones((len(positions), 1), np.float32)], -1)
    return (ph @ pv.T).astype(np.float32)


def _both(clip, tris, init_depth=None):
    setup = setup_triangles(
        jnp.asarray(clip), jnp.asarray(tris, jnp.int32),
        jnp.ones(len(tris), bool), W, H, TILE_W, TILE_H,
    )
    bins = bin_triangles(setup, W // TILE_W, H // TILE_H, 16, 64, 16)
    ref = rasterize(
        setup, bins, W, H, TILE_W, TILE_H, init_depth=init_depth
    )
    got = rasterize_pallas(
        setup, bins, W, H, init_depth=init_depth, interpret=True
    )
    return ref, got


def _random_scene(seed=0, n_tris=25):
    rng = np.random.default_rng(seed)
    pv = perspective_matrix_reversed(W, H) @ look_at_rh(
        (0.0, 1.0, 5.0), (0.0, 1.0, 0.0), (0, 1, 0)
    )
    pts = rng.uniform(-2, 2, (30, 3)).astype(np.float32)
    tris = rng.integers(0, 30, (n_tris, 3))
    tris = tris[
        (tris[:, 0] != tris[:, 1])
        & (tris[:, 1] != tris[:, 2])
        & (tris[:, 0] != tris[:, 2])
    ]
    return project(pts, pv), tris


def test_pallas_matches_jax_raster():
    clip, tris = _random_scene()
    ref, got = _both(clip, tris)
    np.testing.assert_array_equal(np.asarray(got.tri_id), np.asarray(ref.tri_id))
    np.testing.assert_allclose(np.asarray(got.depth), np.asarray(ref.depth), atol=1e-7)
    np.testing.assert_allclose(np.asarray(got.bary), np.asarray(ref.bary), atol=1e-6)


def test_pallas_matches_with_init_depth():
    clip, tris = _random_scene(seed=3)
    # seed half the screen with a near depth: those pixels must stay empty
    init = np.zeros((H, W), np.float32)
    init[:, : W // 2] = 0.9
    ref, got = _both(clip, tris, init_depth=jnp.asarray(init))
    np.testing.assert_array_equal(np.asarray(got.tri_id), np.asarray(ref.tri_id))
    np.testing.assert_allclose(np.asarray(got.depth), np.asarray(ref.depth), atol=1e-7)


def test_pallas_big_triangle_list():
    """A fullscreen-bbox triangle (vertex behind camera) exercises the
    big-triangle path."""
    pv = perspective_matrix_reversed(W, H) @ look_at_rh(
        (0.0, 1.0, 0.0), (0.0, 0.5, -3.0), (0, 1, 0)
    )
    s = 50.0
    pts = np.array([[-s, 0, -s], [s, 0, -s], [s, 0, s], [-s, 0, s]], np.float32)
    clip = project(pts, pv)
    tris = [[0, 2, 1], [0, 3, 2]]
    ref, got = _both(clip, tris)
    assert (np.asarray(ref.tri_id) >= 0).sum() > 1000  # plane covers lower half
    np.testing.assert_array_equal(np.asarray(got.tri_id), np.asarray(ref.tri_id))
    np.testing.assert_allclose(np.asarray(got.depth), np.asarray(ref.depth), atol=1e-7)
