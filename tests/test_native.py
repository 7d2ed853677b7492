"""Native C++ host components vs their NumPy fallbacks."""

import numpy as np
import pytest

from transmission_renderer_tpu import native
from transmission_renderer_tpu.models import make_sphere_mesh
from transmission_renderer_tpu.ops import bvh as B


needs_native = pytest.mark.skipif(
    native.load() is None, reason="no C++ toolchain available"
)


@needs_native
def test_native_bvh_matches_python():
    pos, _, _, tri = make_sphere_mesh(8, 16)
    bvh_native = B.build_bvh(tri, pos)
    orig = native.wide_fold
    try:
        native.wide_fold = lambda *a: None  # force python path
        bvh_py = B.build_bvh(tri, pos)
    finally:
        native.wide_fold = orig
    np.testing.assert_array_equal(
        np.asarray(bvh_native.leaf_tri), np.asarray(bvh_py.leaf_tri)
    )
    np.testing.assert_array_equal(
        np.asarray(bvh_native.node_boxes), np.asarray(bvh_py.node_boxes)
    )
    assert bvh_native.level_offsets == bvh_py.level_offsets
    assert bvh_native.level_counts == bvh_py.level_counts


@needs_native
def test_native_morton_matches_python():
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (2048, 3)).astype(np.float32)
    np.testing.assert_array_equal(native.morton3(x), B._morton3(x))


@needs_native
def test_native_transform_points():
    rng = np.random.default_rng(1)
    n = 512
    pos = rng.normal(size=(n, 3)).astype(np.float32)
    trans = rng.normal(size=(n, 3)).astype(np.float32)
    scale = rng.uniform(0.5, 2.0, n).astype(np.float32)
    axis = rng.normal(size=(n, 3))
    axis /= np.linalg.norm(axis, axis=1, keepdims=True)
    ang = rng.uniform(0, np.pi, n)
    quat = np.concatenate(
        [axis * np.sin(ang / 2)[:, None], np.cos(ang / 2)[:, None]], 1
    ).astype(np.float32)

    got = native.transform_points(pos, trans, scale, quat)

    # numpy oracle
    qv, qw = quat[:, :3], quat[:, 3:4]
    t = 2.0 * np.cross(qv, pos)
    rotated = pos + qw * t + np.cross(qv, t)
    expected = trans + scale[:, None] * rotated
    np.testing.assert_allclose(got, expected, atol=1e-5)
