"""Cluster math tests — closed-form checks of the Filament-style slicing
and set-equality checks of the sort-based light assignment vs a brute-force
oracle."""

import numpy as np
import jax.numpy as jnp

from transmission_renderer_tpu.pbr import (
    cluster_aabb_distance_sq,
    cluster_coefficients,
    get_depth_slice,
    linear_depth,
    slice_to_depth,
)
from transmission_renderer_tpu.pbr.clustering import assign_lights_to_clusters

Z_NEAR, Z_FAR, SLICES = 0.01, 500.0, 16


def test_coefficients():
    c = cluster_coefficients(Z_NEAR, Z_FAR, SLICES)
    log_ratio = np.log2(Z_FAR / Z_NEAR)
    assert np.isclose(c.scale, SLICES / log_ratio)
    assert np.isclose(c.bias, -SLICES * np.log2(Z_NEAR) / log_ratio)


def test_linear_depth_endpoints():
    c = cluster_coefficients(Z_NEAR, Z_FAR, SLICES)
    # Reversed-Z: frag_depth 1 = near plane, 0 = far plane
    assert np.isclose(float(linear_depth(c, jnp.float32(1.0))), Z_NEAR, rtol=1e-4)
    # The far endpoint suffers f32 cancellation in (f+n) - r(f-n); the
    # reference computes the identical expression in f32, so ~0.1% error at
    # the far plane is the *correct* (reference-matching) behaviour.
    assert np.isclose(float(linear_depth(c, jnp.float32(0.0))), Z_FAR, rtol=2e-3)


def test_slice_to_depth_endpoints():
    c = cluster_coefficients(Z_NEAR, Z_FAR, SLICES)
    assert np.isclose(float(slice_to_depth(c, jnp.float32(0))), -Z_NEAR, rtol=1e-5)
    assert np.isclose(float(slice_to_depth(c, jnp.float32(SLICES))), -Z_FAR, rtol=1e-5)


def test_depth_slice_roundtrip():
    """A fragment exactly on slice boundary k maps to slice k."""
    c = cluster_coefficients(Z_NEAR, Z_FAR, SLICES)
    for k in [0, 3, 8, 15]:
        # view distance of slice boundary k
        dist = Z_NEAR * (Z_FAR / Z_NEAR) ** (k / SLICES)
        # invert linear_depth to get frag_depth (reversed-Z projection-style)
        # linear = 2nf / (f + n - r(f-n)), r = 2(1-d) - 1
        r = (Z_FAR + Z_NEAR - 2 * Z_NEAR * Z_FAR / dist) / (Z_FAR - Z_NEAR)
        d = 1.0 - (r + 1.0) / 2.0
        got = int(get_depth_slice(c, jnp.float32(d)))
        # mid-slice distances stay in slice k; boundaries can round either
        # way in f32, allow +-1 at exact boundaries
        assert abs(got - k) <= 1
    # strictly-inside-slice check
    for k in [0, 5, 12]:
        dist = Z_NEAR * (Z_FAR / Z_NEAR) ** ((k + 0.5) / SLICES)
        r = (Z_FAR + Z_NEAR - 2 * Z_NEAR * Z_FAR / dist) / (Z_FAR - Z_NEAR)
        d = 1.0 - (r + 1.0) / 2.0
        assert int(get_depth_slice(c, jnp.float32(d))) == k


def test_aabb_distance_sq():
    mn = jnp.array([-1.0, -1.0, -1.0], jnp.float32)
    mx = jnp.array([1.0, 1.0, 1.0], jnp.float32)
    # inside -> 0
    assert float(cluster_aabb_distance_sq(mn, mx, jnp.zeros(3))) == 0.0
    # outside along +x by 2
    assert np.isclose(
        float(cluster_aabb_distance_sq(mn, mx, jnp.array([3.0, 0.0, 0.0]))), 4.0
    )
    # corner distance
    p = jnp.array([2.0, 2.0, 2.0], jnp.float32)
    assert np.isclose(float(cluster_aabb_distance_sq(mn, mx, p)), 3.0)


def test_assign_lights_matches_bruteforce():
    rng = np.random.default_rng(42)
    C, L, K = 32, 20, 8
    mn = rng.uniform(-10, 0, (C, 3)).astype(np.float32)
    mx = mn + rng.uniform(0.5, 4, (C, 3)).astype(np.float32)
    pos = rng.uniform(-12, 12, (L, 3)).astype(np.float32)
    falloff_sq = rng.uniform(1, 50, L).astype(np.float32)

    counts, indices = assign_lights_to_clusters(
        jnp.asarray(mn),
        jnp.asarray(mx),
        jnp.asarray(pos),
        jnp.asarray(falloff_sq),
        jnp.zeros(L, bool),
        jnp.zeros((L, 3), jnp.float32),
        jnp.zeros(L, jnp.float32),
        max_lights_per_cluster=K,
    )
    counts = np.asarray(counts)
    indices = np.asarray(indices)

    for ci in range(C):
        d = np.maximum(np.maximum(mn[ci] - pos, pos - mx[ci]), 0.0)
        accept = (d * d).sum(-1) <= falloff_sq
        expected = set(np.nonzero(accept)[0][:K].tolist())
        got = set(indices[ci, : counts[ci]].tolist())
        assert len(got) == counts[ci]
        if len(expected) <= K:
            assert got == expected


def test_assign_lights_clamps_to_k():
    # All lights hit all clusters; count must clamp at K and indices must be
    # the first K light ids (order-preserving compaction).
    C, L, K = 4, 12, 5
    mn = jnp.tile(jnp.array([-1.0, -1.0, -1.0], jnp.float32), (C, 1))
    mx = jnp.tile(jnp.array([1.0, 1.0, 1.0], jnp.float32), (C, 1))
    pos = jnp.zeros((L, 3), jnp.float32)
    falloff = jnp.full((L,), 100.0, jnp.float32)
    counts, indices = assign_lights_to_clusters(
        mn, mx, pos, falloff,
        jnp.zeros(L, bool), jnp.zeros((L, 3), jnp.float32), jnp.zeros(L, jnp.float32),
        max_lights_per_cluster=K,
    )
    assert np.all(np.asarray(counts) == K)
    np.testing.assert_array_equal(np.asarray(indices)[:, :K], np.tile(np.arange(K), (C, 1)))
