"""Camera/projection math tests vs the reference's conventions."""

import math

import numpy as np

from transmission_renderer_tpu.scene.camera import (
    Camera,
    CameraRig,
    look_at_rh,
    perspective_matrix_reversed,
    sun_normal,
)


def test_reversed_z_endpoints():
    """depth = 1 at z_near, 0 at z_far (src/main.rs:39-54)."""
    m = perspective_matrix_reversed(1920, 1080, z_near=0.01, z_far=500.0)
    for z, expected in [(-0.01, 1.0), (-500.0, 0.0)]:
        clip = m @ np.array([0, 0, z, 1], np.float32)
        assert np.isclose(clip[2] / clip[3], expected, atol=1e-4), z


def test_projection_y_flip():
    """World-up projects to negative NDC y (Vulkan y-down framebuffer)."""
    m = perspective_matrix_reversed(1920, 1080)
    clip = m @ np.array([0.0, 1.0, -5.0, 1.0], np.float32)
    assert clip[1] / clip[3] < 0


def test_fov():
    """Vertical FoV 59 deg: a point at y = tan(29.5deg)*d hits ndc y = -1."""
    m = perspective_matrix_reversed(1000, 1000)  # square aspect
    d = 10.0
    y = math.tan(math.radians(29.5)) * d
    clip = m @ np.array([0.0, y, -d, 1.0], np.float32)
    assert np.isclose(clip[1] / clip[3], -1.0, atol=1e-5)


def test_look_at_rh():
    v = look_at_rh([0, 0, 5], [0, 0, 0], [0, 1, 0])
    # camera at origin in view space
    p = v @ np.array([0, 0, 5, 1], np.float32)
    np.testing.assert_allclose(p[:3], 0, atol=1e-6)
    # point ahead of the camera has negative view z (RH convention)
    p = v @ np.array([0, 0, 0, 1], np.float32)
    assert p[2] < 0


def test_camera_forward_yaw0_faces_minus_z():
    c = Camera(pitch=0.0, yaw=0.0)
    np.testing.assert_allclose(c.forward(), [0, 0, -1], atol=1e-6)


def test_sun_normal_matches_reference_formula():
    # src/main.rs:2715-2722
    pitch, yaw = 1.1, 4.8
    n = sun_normal(pitch, yaw)
    np.testing.assert_allclose(
        n,
        [
            math.cos(pitch) * math.sin(yaw),
            math.sin(pitch),
            math.cos(pitch) * math.cos(yaw),
        ],
        atol=1e-7,
    )
    assert np.isclose(np.linalg.norm(n), 1.0)


def test_rig_sun_velocity_damping():
    """Arrow-key sun control accelerates, clamps and damps
    (src/main.rs:1198-1228)."""
    rig = CameraRig()
    p0 = rig.sun_pitch
    for _ in range(10):
        rig.update_sun(up=True, down=False, cw=False, ccw=False, delta_time=1 / 60)
    assert rig.sun_pitch > p0
    assert np.linalg.norm(rig.sun_velocity) <= 0.05 + 1e-6  # clamped
    v_after = rig.sun_velocity.copy()
    rig.update_sun(False, False, False, False, 1 / 60)
    assert np.linalg.norm(rig.sun_velocity) < np.linalg.norm(v_after)  # damped
    # pitch clamps at pi/2
    for _ in range(300):
        rig.update_sun(True, False, False, False, 1 / 60)
    assert rig.sun_pitch <= math.pi / 2 + 1e-6
