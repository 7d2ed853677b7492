"""LBVH build + traversal vs brute-force ray casting."""

import numpy as np
import jax.numpy as jnp

from transmission_renderer_tpu.models import make_box_mesh, make_sphere_mesh
from transmission_renderer_tpu.ops.bvh import build_bvh, refit_bvh, trace_rays


def brute_force(tri, pos, o, d, t_min=0.001, t_max=10000.0):
    """Closest hit per ray, float64."""
    v = pos[tri]  # [T, 3, 3]
    best_t = np.full(len(o), t_max)
    best_tri = np.full(len(o), -1, np.int64)
    for ti in range(len(tri)):
        v0, v1, v2 = v[ti].astype(np.float64)
        e1, e2 = v1 - v0, v2 - v0
        pvec = np.cross(d, e2)
        det = (e1 * pvec).sum(-1)
        ok = np.abs(det) > 1e-12
        inv = np.where(ok, 1.0 / np.where(ok, det, 1.0), 0.0)
        tvec = o - v0
        u = (tvec * pvec).sum(-1) * inv
        qvec = np.cross(tvec, e1)
        vv = (d * qvec).sum(-1) * inv
        t = (e2 * qvec).sum(-1) * inv
        hit = ok & (u >= 0) & (vv >= 0) & (u + vv <= 1) & (t > t_min) & (t < best_t)
        best_t = np.where(hit, t, best_t)
        best_tri = np.where(hit, ti, best_tri)
    return best_tri, best_t


def test_bvh_vs_bruteforce_sphere():
    pos, _, _, tri = make_sphere_mesh(8, 16)
    bvh = build_bvh(tri, pos)
    rng = np.random.default_rng(7)
    o = np.tile(np.array([0.0, 0.0, 4.0], np.float32), (64, 1))
    targets = rng.uniform(-1.2, 1.2, (64, 3)).astype(np.float32)
    d = targets - o
    d = d / np.linalg.norm(d, axis=1, keepdims=True)

    hit, t, tri_id, u, v = trace_rays(
        bvh, jnp.asarray(tri.astype(np.int32)), jnp.asarray(pos),
        jnp.asarray(o), jnp.asarray(d),
    )
    bf_tri, bf_t = brute_force(tri.astype(np.int64), pos, o, d)
    hit, t, tri_id = np.asarray(hit), np.asarray(t), np.asarray(tri_id)
    np.testing.assert_array_equal(hit, bf_tri >= 0)
    m = hit
    np.testing.assert_allclose(t[m], bf_t[m], rtol=1e-4)
    # closest-hit triangle matches (modulo exact shared-edge ties)
    agree = (tri_id[m] == bf_tri[m]).mean()
    assert agree > 0.95


def test_bvh_any_hit_shadows():
    """Point behind a box is occluded from a light in front of it."""
    pos, _, _, tri = make_box_mesh((1.0, 1.0, 0.2))
    bvh = build_bvh(tri, pos)
    origins = jnp.asarray(
        np.array([[0.0, 0.0, -2.0], [3.0, 3.0, -2.0]], np.float32)
    )
    # ray towards a light at z=+5 straight ahead
    dirs = jnp.asarray(np.tile(np.array([0.0, 0.0, 1.0], np.float32), (2, 1)))
    hit, *_ = trace_rays(
        bvh, jnp.asarray(tri.astype(np.int32)), jnp.asarray(pos),
        origins, dirs, any_hit=True,
    )
    hit = np.asarray(hit)
    assert hit[0]  # blocked by the box
    assert not hit[1]  # clear path


def test_bvh_refit_translation():
    pos, _, _, tri = make_sphere_mesh(6, 12)
    bvh = build_bvh(tri, pos)
    moved = pos + np.array([5.0, 0.0, 0.0], np.float32)
    bvh2 = refit_bvh(bvh, jnp.asarray(tri.astype(np.int32)), jnp.asarray(moved))
    # the root row's valid child AABBs follow the move (the root is the
    # single node of the coarsest level — the last node_boxes row)
    root_row = np.asarray(bvh2.node_boxes[-1]).reshape(8, 6)
    valid = np.isfinite(root_row[:, 0])
    assert valid.any() and (root_row[valid, 0] > 3.5).all()
    # rays at the new location hit, at the old location miss
    o = jnp.asarray(np.array([[5.0, 0.0, 4.0], [0.0, 0.0, 4.0]], np.float32))
    d = jnp.asarray(np.tile(np.array([0.0, 0.0, -1.0], np.float32), (2, 1)))
    hit, *_ = trace_rays(
        bvh2, jnp.asarray(tri.astype(np.int32)), jnp.asarray(moved), o, d
    )
    hit = np.asarray(hit)
    assert hit[0] and not hit[1]


def test_refit_reproduces_build():
    """A refit with unmoved vertices must bit-match the host build
    (same fold order, f32 min/max are exact)."""
    pos, _, _, tri = make_sphere_mesh(7, 13)
    bvh = build_bvh(tri, pos)
    bvh2 = refit_bvh(bvh, jnp.asarray(tri.astype(np.int32)), jnp.asarray(pos))
    np.testing.assert_array_equal(
        np.asarray(bvh.node_boxes), np.asarray(bvh2.node_boxes)
    )


def test_chunked_trace_matches_flat(monkeypatch):
    """The lax.map ray-chunking path (taken above _RAY_CHUNK rays) must
    be invisible: same results as the flat vmap walk."""
    from transmission_renderer_tpu.ops import bvh as B

    pos, _, _, tri = make_sphere_mesh(6, 12)
    bvh = build_bvh(tri, pos)
    rng = np.random.default_rng(5)
    n = 333  # deliberately not a multiple of the patched chunk
    o = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    args = (bvh, jnp.asarray(tri.astype(np.int32)), jnp.asarray(pos),
            jnp.asarray(o), jnp.asarray(d))
    flat = trace_rays(*args)
    monkeypatch.setattr(B, "_RAY_CHUNK", 64)
    chunked = trace_rays(*args)
    for a, b, name in zip(flat, chunked, ["hit", "t", "tri", "u", "v"]):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b), err_msg=name
        )


def test_tiny_scene_single_leaf_row():
    """T=2 triangles -> one leaf row, one internal level; the bitstack
    walk must handle the degenerate tree."""
    pos = np.array(
        [[0, 0, 0], [1, 0, 0], [0, 1, 0], [3, 0, 0], [4, 0, 0], [3, 1, 0]],
        np.float32,
    )
    tri = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
    bvh = build_bvh(tri, pos)
    assert bvh.num_leaves == 1 and bvh.num_levels == 1
    o = jnp.asarray(np.array(
        [[0.3, 0.3, 5.0], [3.3, 0.3, 5.0], [10.0, 10.0, 5.0]], np.float32
    ))
    d = jnp.asarray(np.tile(np.array([0, 0, -1], np.float32), (3, 1)))
    hit, t, tri_id, *_ = trace_rays(bvh, jnp.asarray(tri), jnp.asarray(pos), o, d)
    hit = np.asarray(hit)
    assert hit[0] and hit[1] and not hit[2]
    assert int(tri_id[0]) == 0 and int(tri_id[1]) == 1


def test_chunked_trace_liveness_presort(monkeypatch):
    """Dead rays (t_max = 0 — cluster/N·L-gated lanes) are pre-sorted
    into all-done chunks before phase 1; results must stay in original
    ray order and match the flat walk exactly."""
    from transmission_renderer_tpu.ops import bvh as B

    pos, _, _, tri = make_sphere_mesh(6, 12)
    bvh = build_bvh(tri, pos)
    rng = np.random.default_rng(7)
    n = 333
    o = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    # kill a scattered ~half of the rays
    t_max = np.where(rng.random(n) < 0.5, 0.0, 1e4).astype(np.float32)
    args = (bvh, jnp.asarray(tri.astype(np.int32)), jnp.asarray(pos),
            jnp.asarray(o), jnp.asarray(d))
    flat = trace_rays(*args, t_max=jnp.asarray(t_max))
    monkeypatch.setattr(B, "_RAY_CHUNK", 64)
    chunked = trace_rays(*args, t_max=jnp.asarray(t_max))
    for a, b, name in zip(flat, chunked, ["hit", "t", "tri", "u", "v"]):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b), err_msg=name
        )
    assert not np.asarray(flat[0])[t_max == 0.0].any()


def test_bfs_matches_walk_anyhit(monkeypatch):
    """The level-synchronous frontier traversal (trace_shadow_bfs) must
    report exactly the walk's any-hit occlusion for mixed-t_max rays,
    across the chunked and single-chunk paths."""
    from transmission_renderer_tpu.ops import bvh as B
    from transmission_renderer_tpu.ops.bvh import trace_shadow_bfs

    pos, _, _, tri = make_sphere_mesh(9, 18)
    bvh = build_bvh(tri, pos)
    rng = np.random.default_rng(21)
    n = 1777
    o = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    t_max = np.where(
        rng.random(n) < 0.2, 0.0,
        np.where(rng.random(n) < 0.5, 1e4, rng.uniform(0.1, 3.0, n)),
    ).astype(np.float32)
    args = (bvh, jnp.asarray(tri.astype(np.int32)), jnp.asarray(pos),
            jnp.asarray(o), jnp.asarray(d))
    walk_hit = np.asarray(
        trace_rays(*args, t_max=jnp.asarray(t_max), any_hit=True)[0]
    )
    bfs_hit, overflow = trace_shadow_bfs(*args, t_max=jnp.asarray(t_max))
    assert int(overflow) == 0
    np.testing.assert_array_equal(np.asarray(bfs_hit), walk_hit)
    # chunked path (several lax.map chunks + padding)
    monkeypatch.setattr(B, "_BFS_CHUNK", 256)
    bfs_hit2, overflow2 = trace_shadow_bfs(*args, t_max=jnp.asarray(t_max))
    assert int(overflow2) == 0
    np.testing.assert_array_equal(np.asarray(bfs_hit2), walk_hit)
    # overflow is REPORTED when capacity is too small, not silent
    bfs_hit3, overflow3 = trace_shadow_bfs(
        *args, t_max=jnp.asarray(t_max), chunk=256, cap_factor=1
    )
    assert int(overflow3) > 0


def test_occlusion_mode_matches_closest(monkeypatch):
    """any_hit=True without alpha test runs the occlusion-only walk (no
    id/uv bookkeeping): its hit mask must equal the closest-hit walk's
    (existence of an intersection is mode-independent), flat and
    chunked."""
    from transmission_renderer_tpu.ops import bvh as B

    pos, _, _, tri = make_sphere_mesh(8, 16)
    bvh = build_bvh(tri, pos)
    rng = np.random.default_rng(31)
    n = 999
    o = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    t_max = np.where(rng.random(n) < 0.3, 0.6, 1e4).astype(np.float32)
    args = (bvh, jnp.asarray(tri.astype(np.int32)), jnp.asarray(pos),
            jnp.asarray(o), jnp.asarray(d))
    closest = np.asarray(trace_rays(*args, t_max=jnp.asarray(t_max))[0])
    occl = np.asarray(
        trace_rays(*args, t_max=jnp.asarray(t_max), any_hit=True)[0]
    )
    np.testing.assert_array_equal(occl, closest)
    monkeypatch.setattr(B, "_RAY_CHUNK", 128)
    occl_c = np.asarray(
        trace_rays(*args, t_max=jnp.asarray(t_max), any_hit=True)[0]
    )
    np.testing.assert_array_equal(occl_c, closest)


def test_tiny_negative_direction_component():
    """inv_dir fallback regression: a direction component in
    (-1e-20, 0) — denormal residue from cross products on a near-
    axis-aligned ray — used to map to inv_dir = 0 (sign(d)*1e20 + 1e20),
    which corrupted that axis's slab interval to [0, 0]: hits ahead of
    the ray were rejected and origin-straddling boxes falsely accepted.
    Traversal must treat it exactly like a -0/at-zero component."""
    pos, _, _, tri = make_sphere_mesh(8, 16)
    bvh = build_bvh(tri, pos)
    o = np.tile(np.array([0.0, 0.0, 4.0], np.float32), (4, 1))
    d_clean = np.tile(np.array([0.0, 0.0, -1.0], np.float32), (4, 1))
    d_dirty = d_clean.copy()
    d_dirty[:, 0] = -1e-21  # tiny NEGATIVE x component
    d_dirty[:, 1] = +1e-21  # tiny positive y (was already fine)

    args = (bvh, jnp.asarray(tri.astype(np.int32)), jnp.asarray(pos))
    hit_c, t_c, tri_c, *_ = trace_rays(*args, jnp.asarray(o), jnp.asarray(d_clean))
    hit_d, t_d, tri_d, *_ = trace_rays(*args, jnp.asarray(o), jnp.asarray(d_dirty))
    np.testing.assert_array_equal(np.asarray(hit_c), np.asarray(hit_d))
    np.testing.assert_array_equal(np.asarray(tri_c), np.asarray(tri_d))
    np.testing.assert_allclose(np.asarray(t_c), np.asarray(t_d), rtol=1e-6)
    assert bool(np.asarray(hit_d).all()), "ray straight at the sphere must hit"


def test_dead_rays_start_done():
    """Rays with t_max <= t_min (padding, cluster-gated shadow pairs)
    must report 0 pops — they start done instead of walking their
    AABB-containment path (the liveness pre-sort's early-exit chunks
    rely on this)."""
    pos, _, _, tri = make_sphere_mesh(8, 16)
    bvh = build_bvh(tri, pos)
    o = np.zeros((8, 3), np.float32)  # origin INSIDE the sphere's AABBs
    d = np.tile(np.array([0.0, 0.0, -1.0], np.float32), (8, 1))
    t_max = np.zeros((8,), np.float32)
    hit, t, tri_id, u, v, trips = trace_rays(
        bvh, jnp.asarray(tri.astype(np.int32)), jnp.asarray(pos),
        jnp.asarray(o), jnp.asarray(d), t_max=jnp.asarray(t_max),
        any_hit=True, return_trips=True,
    )
    assert not bool(np.asarray(hit).any())
    np.testing.assert_array_equal(np.asarray(trips), 0)
