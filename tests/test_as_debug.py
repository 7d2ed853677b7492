"""AS-debug ray caster (the reference's T-key toggle) — in particular the
alpha-clip candidate confirmation (shader/src/lib.rs:777-784), which the
wide-BVH walk feeds in [LEAF_TRIS]-candidate batches."""

import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

from transmission_renderer_tpu.config import BUCKET_ALPHA_CLIP, BUCKET_OPAQUE, RenderConfig
from transmission_renderer_tpu.render.raytrace import render_as_debug_frame
from transmission_renderer_tpu.scene.builder import SceneBuilder
from transmission_renderer_tpu.models.procedural import make_plane_mesh


def test_caster_sees_through_clipped_texels():
    b = SceneBuilder()
    # front quad: left half transparent (alpha 0), right half opaque red
    tex = np.zeros((8, 8, 4), np.uint8)
    tex[:, 4:] = (255, 0, 0, 255)
    clip_tex = b.add_texture(tex, srgb=True)
    clip_mat = b.add_material(tex_diffuse=clip_tex, alpha_clipping_cutoff=0.5)
    back_mat = b.add_material(diffuse_factor=(0.0, 1.0, 0.0, 1.0))
    # make_plane_mesh gives an XZ plane; rotate onto XY via instance quats
    pos, nrm, uv, idx = make_plane_mesh(2.0)
    p_quad = b.add_primitive(pos, nrm, uv, idx, bucket=BUCKET_ALPHA_CLIP)
    p_back = b.add_primitive(pos, nrm, uv, idx, bucket=BUCKET_OPAQUE)
    rot = np.array([np.sin(np.pi / 4), 0, 0, np.cos(np.pi / 4)], np.float32)
    b.add_instance(p_quad, clip_mat, translation=(0, 0, -2.0), rotation=rot)
    b.add_instance(p_back, back_mat, translation=(0, 0, -4.0), rotation=rot)

    scene, dl, flags = b.finish_bundle()
    bvh = b.build_rt_bvh()
    cfg = RenderConfig(width=64, height=64, ray_traced_shadows=True)
    from transmission_renderer_tpu.render import make_frame_params
    from transmission_renderer_tpu.scene.camera import CameraRig

    rig = CameraRig()
    rig.camera.position = np.array([0.0, 0.0, 1.0], np.float32)
    rig.camera.pitch = 0.0
    params = make_frame_params(
        cfg, rig.camera.view_matrix(), rig.camera.position, rig.sun_dir()
    )
    img = np.asarray(
        jax.jit(partial(render_as_debug_frame, config=cfg, bvh=bvh))(
            scene, dl, params, None
        )
    )
    h, w = img.shape[:2]
    left = img[h // 2, w // 4]
    right = img[h // 2, 3 * w // 4]
    # one side shows the green back plane through the clipped texels, the
    # other the red front quad (which side is which depends on uv
    # orientation; assert the *split* rather than the handedness)
    sides = {tuple((left > 0.25).tolist()), tuple((right > 0.25).tolist())}
    assert (True, False, False) in sides, (left, right)   # red front
    assert (False, True, False) in sides, (left, right)   # green through
