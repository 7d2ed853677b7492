"""Camera: reversed-Z projection, look-at view, sun direction, and a
dolly-style smoothed rig.

Mirrors the reference's host math: ``perspective_matrix_reversed``
(src/main.rs:39-54), the winit/dolly camera (src/main.rs:514-518,
1173-1196) and ``Sun::as_normal`` (src/main.rs:2710-2723).
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np


def perspective_matrix_reversed(
    width: int, height: int, vertical_fov: float = math.radians(59.0),
    z_near: float = 0.01, z_far: float = 500.0,
) -> np.ndarray:
    """Reversed-Z Vulkan-convention projection (src/main.rs:39-54).

    Returns a row-major [4,4] matrix for the ``clip = M @ [p, 1]``
    convention. depth = 1 at z_near, 0 at z_far; NDC y points down
    (the -focal_length row flips world-up into Vulkan's y-down NDC).
    """
    aspect_ratio = width / height
    focal_length = 1.0 / math.tan(vertical_fov / 2.0)
    a = z_near / (z_far - z_near)
    b = z_far * a
    m = np.zeros((4, 4), np.float32)
    m[0, 0] = focal_length / aspect_ratio
    m[1, 1] = -focal_length
    m[2, 2] = a
    m[2, 3] = b
    m[3, 2] = -1.0
    return m


def look_at_rh(eye, center, up) -> np.ndarray:
    """Right-handed look-at view matrix (glam Mat4::look_at_rh semantics,
    used at src/main.rs:520-525). Row-major, ``view = M @ [p, 1]``."""
    eye = np.asarray(eye, np.float32)
    f = np.asarray(center, np.float32) - eye
    f = f / np.linalg.norm(f)
    up = np.asarray(up, np.float32)
    s = np.cross(f, up)
    s = s / np.linalg.norm(s)
    u = np.cross(s, f)
    m = np.eye(4, dtype=np.float32)
    m[0, :3] = s
    m[1, :3] = u
    m[2, :3] = -f
    m[0, 3] = -s @ eye
    m[1, 3] = -u @ eye
    m[2, 3] = f @ eye
    return m


def sun_normal(pitch: float, yaw: float) -> np.ndarray:
    """Sun direction from pitch/yaw (src/main.rs:2715-2722). Unit vector
    pointing *towards* the sun."""
    return np.array(
        [
            math.cos(pitch) * math.sin(yaw),
            math.sin(pitch),
            math.cos(pitch) * math.cos(yaw),
        ],
        np.float32,
    )


@dataclasses.dataclass
class Camera:
    """Static camera pose; defaults mirror the reference's start pose
    (src/main.rs:514-518: position (0, 3, 1), pitch -15 deg, yaw 0)."""

    position: np.ndarray = dataclasses.field(
        default_factory=lambda: np.array([0.0, 3.0, 1.0], np.float32)
    )
    yaw: float = 0.0
    pitch: float = math.radians(-15.0)

    def forward(self) -> np.ndarray:
        # dolly YawPitch: yaw about +y, pitch about +x; yaw 0 faces -z.
        cp, sp = math.cos(self.pitch), math.sin(self.pitch)
        cy, sy = math.cos(self.yaw), math.sin(self.yaw)
        return np.array([-sy * cp, sp, -cy * cp], np.float32)

    def view_matrix(self) -> np.ndarray:
        return look_at_rh(self.position, self.position + self.forward(), [0, 1, 0])


@dataclasses.dataclass
class CameraRig:
    """Smoothed WASD/mouse camera, approximating dolly's
    Position+YawPitch+Smooth rig (src/main.rs:514-518) with exponential
    position/rotation smoothing. Also hosts the arrow-key sun controller
    with velocity damping (src/main.rs:1198-1228)."""

    camera: Camera = dataclasses.field(default_factory=Camera)
    target_position: np.ndarray = dataclasses.field(
        default_factory=lambda: np.array([0.0, 3.0, 1.0], np.float32)
    )
    target_yaw: float = 0.0
    target_pitch: float = math.radians(-15.0)
    position_smoothing: float = 0.5
    rotation_smoothing: float = 0.25
    sun_pitch: float = 1.1  # src/main.rs:531-534
    sun_yaw: float = 4.8
    sun_velocity: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(2, np.float32)
    )

    def move_relative(self, forwards: float, right: float, up: float, speed: float = 3.0):
        f = self.camera.forward()
        r = np.cross(f, np.array([0.0, 1.0, 0.0], np.float32))
        r /= max(np.linalg.norm(r), 1e-8)
        self.target_position = (
            self.target_position + (f * forwards + r * right) * speed
        ).astype(np.float32)
        self.target_position[1] += up * speed

    def rotate(self, d_yaw: float, d_pitch: float):
        self.target_yaw += d_yaw
        self.target_pitch = float(
            np.clip(self.target_pitch + d_pitch, -math.pi / 2 + 1e-3, math.pi / 2 - 1e-3)
        )

    def update_sun(self, up: bool, down: bool, cw: bool, ccw: bool, delta_time: float):
        """Arrow-key sun control with acceleration + damping
        (src/main.rs:1198-1228)."""
        acceleration = 0.05
        max_velocity = 0.05
        v = self.sun_velocity.copy()
        if up:
            v[1] += acceleration
        if down:
            v[1] -= acceleration
        if cw:
            v[0] += acceleration
        if ccw:
            v[0] -= acceleration
        magnitude = float(np.linalg.norm(v))
        if magnitude > max_velocity:
            v *= max_velocity / magnitude
        self.sun_yaw -= float(v[0])
        self.sun_pitch = float(np.clip(self.sun_pitch + v[1], 0.0, math.pi / 2))
        self.sun_velocity = v * 0.95

    def update(self, delta_time: float = 1.0 / 60.0):
        """Exponential smoothing toward targets (dolly Smooth driver)."""
        # dolly's smoothing: lerp factor 1 - exp(-ln(2) * dt / half_time)
        def factor(half_time):
            if half_time <= 0.0:
                return 1.0
            return 1.0 - math.exp(-math.log(2.0) * delta_time / (half_time / 4.0))

        pf = factor(self.position_smoothing)
        rf = factor(self.rotation_smoothing)
        self.camera.position = (
            self.camera.position + (self.target_position - self.camera.position) * pf
        ).astype(np.float32)
        self.camera.yaw += (self.target_yaw - self.camera.yaw) * rf
        self.camera.pitch += (self.target_pitch - self.camera.pitch) * rf

    def sun_dir(self) -> np.ndarray:
        return sun_normal(self.sun_pitch, self.sun_yaw)
