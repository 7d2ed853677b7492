"""Pallas packet occlusion walk vs the XLA bitstack walk.

Occlusion (any-hit, no alpha test) is an existence predicate, so the two
traversals must agree EXACTLY on every ray — same slab test, same
Moller-Trumbore, same ragged-tail guards.
"""

import numpy as np
import pytest

from transmission_renderer_tpu.models.procedural import (
    _displaced_sphere,
    make_plane_mesh,
)
from transmission_renderer_tpu.ops.bvh import build_bvh, trace_rays
from transmission_renderer_tpu.ops.bvh_packet import trace_occlusion_packets


@pytest.fixture(scope="module")
def scene_geo():
    import numpy as np

    p1, _, _, i1 = _displaced_sphere(24, 48)
    p2, _, _, i2 = make_plane_mesh(4.0, y=-1.2)
    pos = np.concatenate([p1, p2])
    idx = np.concatenate([i1, i2 + len(p1)]).astype(np.int32)
    return idx, pos.astype(np.float32)


def _rays(n, seed=3):
    rng = np.random.default_rng(seed)
    # mix of coherent bundles (shadow-like) and random rays
    origins = np.repeat(rng.uniform(-2, 2, (n // 128, 3)), 128, axis=0)
    origins += rng.normal(0, 0.02, (n, 3))
    dirs = np.repeat(rng.normal(size=(n // 128, 3)), 128, axis=0)
    dirs += rng.normal(0, 0.05, (n, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    t_max = rng.uniform(0.5, 50.0, n).astype(np.float32)
    t_max[:: 7] = 0.0  # dead rays (cluster-gated / invalid pixels)
    return (
        origins.astype(np.float32),
        dirs.astype(np.float32),
        t_max,
    )


def test_packet_walk_matches_xla_walk(scene_geo):
    tri, pos = scene_geo
    bvh = build_bvh(tri, pos)
    o, d, tm = _rays(4096)
    ref_hit, *_ = trace_rays(bvh, tri, pos, o, d, t_max=tm, any_hit=True)
    hit = trace_occlusion_packets(
        bvh, tri, pos, o, d, t_max=tm, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(hit), np.asarray(ref_hit))
    assert np.asarray(ref_hit).any() and not np.asarray(ref_hit).all()


def test_packet_walk_padding_and_scalar_tmax(scene_geo):
    tri, pos = scene_geo
    bvh = build_bvh(tri, pos)
    # a count that is NOT a multiple of the packet/group width
    o, d, tm = _rays(4096)
    o, d = o[:1111], d[:1111]
    ref_hit, *_ = trace_rays(bvh, tri, pos, o, d, t_max=25.0, any_hit=True)
    hit = trace_occlusion_packets(
        bvh, tri, pos, o, d, t_max=25.0, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(hit), np.asarray(ref_hit))
