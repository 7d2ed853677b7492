"""Rasteriser tests vs an independent brute-force float64 oracle.

The oracle rasterises by classic perspective division + screen-space edge
functions per pixel; the production path is clipless homogeneous. They
must agree on coverage (away from exact edges), depth, and barycentrics.
"""

import numpy as np
import jax.numpy as jnp

from transmission_renderer_tpu.ops.raster import (
    bin_triangles,
    rasterize,
    setup_triangles,
)
from transmission_renderer_tpu.scene.camera import look_at_rh, perspective_matrix_reversed

W, H = 128, 80
TILE_W, TILE_H = 32, 8


def project(positions, proj_view):
    ph = np.concatenate([positions, np.ones((len(positions), 1), np.float32)], -1)
    return (ph @ proj_view.T).astype(np.float32)


def run_raster(clip, tris, cull_backfaces=True):
    setup = setup_triangles(
        jnp.asarray(clip),
        jnp.asarray(tris, jnp.int32),
        jnp.ones(len(tris), bool),
        W, H, TILE_W, TILE_H,
        cull_backfaces=cull_backfaces,
    )
    bins = bin_triangles(setup, W // TILE_W, H // TILE_H, 16, 64, 16)
    vis = rasterize(setup, bins, W, H, TILE_W, TILE_H)
    return (
        np.asarray(vis.tri_id),
        np.asarray(vis.depth),
        np.asarray(vis.bary),
        np.asarray(setup.valid),
    )


def oracle_raster(clip, tris, cull_backfaces=True):
    """float64 brute-force: perspective divide, screen-space edges."""
    clip = clip.astype(np.float64)
    tri_id = np.full((H, W), -1, np.int32)
    depth = np.zeros((H, W), np.float64)
    bary = np.zeros((H, W, 2), np.float64)
    px, py = np.meshgrid(np.arange(W) + 0.5, np.arange(H) + 0.5)
    for t, (i0, i1, i2) in enumerate(tris):
        v = clip[[i0, i1, i2]]
        if np.any(v[:, 3] <= 1e-9):
            continue  # oracle only handles fully-in-front triangles
        ndc = v[:, :3] / v[:, 3:4]
        sx = (ndc[:, 0] + 1) * 0.5 * W
        sy = (ndc[:, 1] + 1) * 0.5 * H
        # signed area in y-down screen space
        area = (sx[1] - sx[0]) * (sy[2] - sy[0]) - (sx[2] - sx[0]) * (sy[1] - sy[0])
        if cull_backfaces and area >= 0:
            # CCW-in-world front faces have negative screen-space area here
            continue
        if area == 0:
            continue
        w0 = ((sx[1] - px) * (sy[2] - py) - (sx[2] - px) * (sy[1] - py)) / area
        w1 = ((sx[2] - px) * (sy[0] - py) - (sx[0] - px) * (sy[2] - py)) / area
        w2 = 1.0 - w0 - w1
        inside = (w0 > 1e-9) & (w1 > 1e-9) & (w2 > 1e-9)  # strict: skip edges
        z = w0 * ndc[0, 2] + w1 * ndc[1, 2] + w2 * ndc[2, 2]
        inside &= (z >= 0) & (z <= 1)
        # perspective-correct barycentrics
        iw = w0 / v[0, 3] + w1 / v[1, 3] + w2 / v[2, 3]
        pb1 = (w1 / v[1, 3]) / iw
        pb2 = (w2 / v[2, 3]) / iw
        win = inside & (z > depth)
        tri_id[win] = t
        depth[win] = z[win]
        bary[win, 0] = pb1[win]
        bary[win, 1] = pb2[win]
    return tri_id, depth, bary


def camera_matrices(eye=(0.0, 1.5, 4.0), center=(0.0, 1.0, 0.0)):
    proj = perspective_matrix_reversed(W, H)
    view = look_at_rh(eye, center, [0, 1, 0])
    return proj @ view


def test_front_face_winding():
    """A CCW (glTF front-face) triangle facing the camera must survive
    backface culling and be rasterised."""
    pv = camera_matrices()
    # CCW when viewed from +z (towards camera at (0,1.5,4))
    positions = np.array(
        [[0.0, 2.0, 0.0], [-1.0, 0.0, 0.0], [1.0, 0.0, 0.0]], np.float32
    )
    clip = project(positions, pv)
    tri_id, depth, bary, valid = run_raster(clip, [[0, 1, 2]])
    assert valid[0], "front face must not be culled"
    assert (tri_id == 0).sum() > 100, "triangle must cover pixels"
    # Reversed winding must be culled
    tri_id2, _, _, valid2 = run_raster(clip, [[0, 2, 1]])
    assert not valid2[0]
    assert (tri_id2 == -1).all()


def test_coverage_and_depth_vs_oracle():
    rng = np.random.default_rng(11)
    pv = camera_matrices()
    positions = rng.uniform(-2, 2, (30, 3)).astype(np.float32)
    positions[:, 2] -= 1.0  # keep in front of the camera
    tris = rng.integers(0, 30, (40, 3))
    tris = tris[(tris[:, 0] != tris[:, 1]) & (tris[:, 1] != tris[:, 2]) & (tris[:, 0] != tris[:, 2])]
    clip = project(positions, pv)

    got_tri, got_depth, got_bary, _ = run_raster(clip, tris, cull_backfaces=False)
    exp_tri, exp_depth, exp_bary = oracle_raster(clip, tris, cull_backfaces=False)

    # Compare only away from triangle edges (the strict-inside oracle pixels)
    both = exp_tri >= 0
    agree = got_tri[both] == exp_tri[both]
    assert agree.mean() > 0.995, f"coverage agreement {agree.mean()}"
    m = both & (got_tri == exp_tri)
    np.testing.assert_allclose(got_depth[m], exp_depth[m], atol=1e-5)
    np.testing.assert_allclose(got_bary[m], exp_bary[m], atol=1e-4)


def test_watertight_shared_edge():
    """Two triangles sharing a diagonal: every quad pixel covered exactly
    once (no double-hit along the diagonal, no gaps)."""
    pv = camera_matrices(eye=(0.0, 0.0, 3.0), center=(0.0, 0.0, 0.0))
    positions = np.array(
        [[-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0]], np.float32
    )
    clip = project(positions, pv)
    # both CCW from +z
    tris = [[0, 1, 2], [0, 2, 3]]
    tri_id, depth, bary, valid = run_raster(clip, tris)
    assert valid.all()
    covered = tri_id >= 0
    # The quad projects to a rectangle; inside it there must be no gaps.
    ys, xs = np.nonzero(covered)
    x0, x1, y0, y1 = xs.min(), xs.max(), ys.min(), ys.max()
    interior = covered[y0 + 1 : y1, x0 + 1 : x1]
    assert interior.all(), "gap along the shared diagonal"
    # Depth continuity across the diagonal (flat quad -> constant depth)
    d = depth[covered]
    assert d.std() < 1e-6


def test_depth_ordering():
    """Nearer triangle wins the reversed-Z GREATER race."""
    pv = camera_matrices(eye=(0.0, 0.0, 5.0), center=(0.0, 0.0, 0.0))
    positions = np.array(
        [
            # far triangle (z=0)
            [-1.5, -1.5, 0.0], [1.5, -1.5, 0.0], [0.0, 1.5, 0.0],
            # near triangle (z=2), smaller
            [-0.5, -0.5, 2.0], [0.5, -0.5, 2.0], [0.0, 0.5, 2.0],
        ],
        np.float32,
    )
    clip = project(positions, pv)
    tri_id, depth, _, _ = run_raster(clip, [[0, 1, 2], [3, 4, 5]])
    assert (tri_id == 1).sum() > 20
    assert (tri_id == 0).sum() > 200
    # centre pixel belongs to the near triangle
    assert tri_id[H // 2, W // 2] == 1


def test_near_plane_crossing_plane():
    """A huge ground plane extending behind the camera rasterises without
    NaN/garbage and covers the lower half of the frame."""
    pv = camera_matrices(eye=(0.0, 1.0, 0.0), center=(0.0, 0.5, -3.0))
    s = 50.0
    positions = np.array(
        [[-s, 0, -s], [s, 0, -s], [s, 0, s], [-s, 0, s]], np.float32
    )
    clip = project(positions, pv)
    tris = [[0, 2, 1], [0, 3, 2]]  # wound to face +y
    tri_id, depth, bary, valid = run_raster(clip, tris)
    assert valid.all()
    covered = tri_id >= 0
    assert np.isfinite(depth).all()
    # lower rows covered, horizon rows empty
    assert covered[H - 4].mean() > 0.95
    assert covered[4].mean() < 0.05
    # depth decreases with distance (reversed-Z): bottom rows nearer
    assert depth[H - 4, W // 2] > depth[H // 2 + 6, W // 2] > 0


def test_barycentric_interpolation_perspective_correct():
    """Interpolate per-vertex 1/w-varying attribute; compare to oracle."""
    pv = camera_matrices(eye=(0.0, 0.0, 4.0), center=(0.0, 0.0, 0.0))
    positions = np.array(
        [[-2.0, -1.0, 1.5], [2.0, -1.0, -3.0], [0.0, 1.5, -1.0]], np.float32
    )
    clip = project(positions, pv)
    got_tri, _, got_bary, _ = run_raster(clip, [[0, 1, 2]])
    exp_tri, _, exp_bary = oracle_raster(clip, np.array([[0, 1, 2]]))
    m = (exp_tri == 0) & (got_tri == 0)
    assert m.sum() > 100
    np.testing.assert_allclose(got_bary[m], exp_bary[m], atol=2e-4)


def test_top_left_fill_rule_horizontal_edges():
    """Vulkan top-left rule: a pixel centre EXACTLY on a triangle's top
    horizontal edge (interior below, y-down) is covered; one exactly on
    a bottom horizontal edge is not. Regression for the b<0 variant that
    covered bottom edges instead."""
    # axis-aligned quad in NDC (w=1), horizontal edges EXACTLY through
    # pixel-centre rows r0 (top) and r1 (bottom)
    r0, r1 = 20, 40
    ny0 = (r0 + 0.5) * 2.0 / H - 1.0
    ny1 = (r1 + 0.5) * 2.0 / H - 1.0
    x0, x1 = -0.5, 0.5
    quad = np.array(
        [
            [x0, ny0, 0.5, 1.0],  # top-left
            [x1, ny0, 0.5, 1.0],  # top-right
            [x1, ny1, 0.5, 1.0],  # bottom-right
            [x0, ny1, 0.5, 1.0],  # bottom-left
        ],
        np.float32,
    )
    tris = [[0, 1, 2], [0, 2, 3]]
    tri_id, _, _, valid = run_raster(quad, tris, cull_backfaces=False)
    covered = tri_id >= 0
    assert valid.all()
    cx = W // 2  # column well inside the quad's x range
    assert covered[r0, cx], "top edge through the pixel centre must cover"
    assert not covered[r1, cx], "bottom edge through the centre must NOT"
    assert covered[r0 + 1 : r1, cx].all(), "interior rows covered"
    assert not covered[r0 - 1, cx], "row above the quad uncovered"
