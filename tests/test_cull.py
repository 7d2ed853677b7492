"""Frustum-culling tests vs the reference semantics."""

import numpy as np
import jax.numpy as jnp

from transmission_renderer_tpu.models import build_test_scene
from transmission_renderer_tpu.ops.cull import (
    bucket_triangle_masks,
    cull_instances,
    frustum_planes_from_projection,
)
from transmission_renderer_tpu.scene.camera import look_at_rh, perspective_matrix_reversed


def _setup(eye=(0.0, 1.0, 5.0), center=(0.0, 1.0, 0.0)):
    proj = perspective_matrix_reversed(640, 360)
    view = look_at_rh(eye, center, [0, 1, 0])
    fx, fy = frustum_planes_from_projection(proj)
    return view, fx, fy


def _scene_with_spheres(centers, radius=1.0):
    """One-primitive-per-instance scene with given world positions."""
    from transmission_renderer_tpu.scene.builder import SceneBuilder
    from transmission_renderer_tpu.models import make_sphere_mesh

    b = SceneBuilder()
    m = b.add_material()
    p = b.add_primitive(*make_sphere_mesh(4, 8, radius), bucket=0)
    for c in centers:
        b.add_instance(p, m, translation=c)
    return b.finish()


def test_visible_in_front():
    scene = _scene_with_spheres([(0.0, 1.0, 0.0)])
    view, fx, fy = _setup()
    vis = cull_instances(scene, jnp.asarray(view), jnp.asarray(fx), jnp.asarray(fy), 0.01)
    assert bool(vis[0])


def test_culled_behind_camera():
    scene = _scene_with_spheres([(0.0, 1.0, 20.0)])  # behind eye at z=5
    view, fx, fy = _setup()
    vis = cull_instances(scene, jnp.asarray(view), jnp.asarray(fx), jnp.asarray(fy), 0.01)
    assert not bool(vis[0])


def test_culled_far_side():
    scene = _scene_with_spheres([(100.0, 1.0, 0.0), (-100.0, 1.0, 0.0), (0.0, 1.0, 0.0)])
    view, fx, fy = _setup()
    vis = np.asarray(
        cull_instances(scene, jnp.asarray(view), jnp.asarray(fx), jnp.asarray(fy), 0.01)
    )
    assert list(vis) == [False, False, True]


def test_sphere_straddling_plane_kept():
    """A sphere partially inside the frustum must be kept (radius test)."""
    # ~at the left frustum edge at z=0 (fov 59 deg, aspect 16/9): x ~ z*tan
    scene = _scene_with_spheres([(-3.0, 1.0, 2.2)], radius=1.5)
    view, fx, fy = _setup()
    vis = cull_instances(scene, jnp.asarray(view), jnp.asarray(fx), jnp.asarray(fy), 0.01)
    assert bool(vis[0])


def test_bucket_triangle_masks():
    tri_inst = jnp.array([0, 0, 1, 2], jnp.int32)
    tri_bucket = jnp.array([0, 1, 2, 0], jnp.int32)
    visible = jnp.array([True, False, True])
    m = np.asarray(bucket_triangle_masks(tri_inst, tri_bucket, visible, (0, 1)))
    assert list(m) == [True, True, False, True]
    m2 = np.asarray(bucket_triangle_masks(tri_inst, tri_bucket, visible, (2,)))
    assert list(m2) == [False, False, False, False]  # instance 1 invisible


def test_uninstanced_primitive_does_not_gate_passes():
    """A pool primitive no instance references must not enable the
    clip-peel rounds or the transmission pipeline (pass gating keys off
    INSTANCED primitives) — in BOTH flag derivations: the host-side
    finish_bundle and the device-side scene_flags."""
    import numpy as np
    from transmission_renderer_tpu.config import (
        BUCKET_ALPHA_CLIP,
        BUCKET_OPAQUE,
        BUCKET_TRANSMISSION,
    )
    from transmission_renderer_tpu.models import make_box_mesh
    from transmission_renderer_tpu.render.frame import scene_flags
    from transmission_renderer_tpu.scene.builder import SceneBuilder

    b = SceneBuilder()
    pos, nrm, uv, tri = make_box_mesh()
    mid = b.add_material()
    p_opaque = b.add_primitive(pos, nrm, uv, tri, BUCKET_OPAQUE)
    # pool-only primitives: never instanced
    b.add_primitive(pos, nrm, uv, tri, BUCKET_ALPHA_CLIP)
    b.add_primitive(pos, nrm, uv, tri, BUCKET_TRANSMISSION)
    b.add_instance(p_opaque, mid, translation=np.zeros(3, np.float32))
    scene, dl, flags = b.finish_bundle()
    assert not flags.has_alpha_clip
    assert not flags.has_transmission
    f2 = scene_flags(scene)
    assert not f2.has_alpha_clip
    assert not f2.has_transmission
