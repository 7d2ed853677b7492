"""Light representation — SoA mirror of the reference's packed ``Light``
struct (shared-structs/src/lib.rs:74-139).

The reference packs point/spot lights into three Vec4s; we keep the same
information as a struct-of-arrays pytree so per-pixel shading can gather
fields independently.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class Lights(NamedTuple):
    """[L]-batched light table.

    ``colour_emission`` is colour * intensity; ``falloff_distance_sq`` is
    the distance^2 at which intensity drops to 5%
    (shared-structs/src/lib.rs:86-88, 95). ``spot_outer_angle != 0``
    flags a spotlight (shared-structs/src/lib.rs:125-127).
    """

    position: jnp.ndarray  # [L, 3]
    colour_emission: jnp.ndarray  # [L, 3]
    falloff_distance_sq: jnp.ndarray  # [L]
    spot_epsilon: jnp.ndarray  # [L]  cos(inner) - cos(outer)
    spot_direction: jnp.ndarray  # [L, 3]
    spot_outer_angle: jnp.ndarray  # [L]

    @property
    def num(self) -> int:
        return self.position.shape[0]

    def is_a_spotlight(self) -> jnp.ndarray:
        return self.spot_outer_angle != 0.0


def point_light(position, colour, intensity: float) -> dict:
    """shared-structs/src/lib.rs:94-103."""
    return dict(
        position=np.asarray(position, np.float32),
        colour_emission=np.asarray(colour, np.float32) * intensity,
        falloff_distance_sq=np.float32(intensity / 0.05),
        spot_epsilon=np.float32(0.0),
        spot_direction=np.zeros(3, np.float32),
        spot_outer_angle=np.float32(0.0),
    )


def spot_light(
    position, colour, intensity: float, direction, inner_angle_rad: float,
    outer_angle_rad: float,
) -> dict:
    """shared-structs/src/lib.rs:105-123."""
    return dict(
        position=np.asarray(position, np.float32),
        colour_emission=np.asarray(colour, np.float32) * intensity,
        falloff_distance_sq=np.float32(intensity / 0.05),
        spot_epsilon=np.float32(np.cos(inner_angle_rad) - np.cos(outer_angle_rad)),
        spot_direction=np.asarray(direction, np.float32),
        spot_outer_angle=np.float32(outer_angle_rad),
    )


def pack_lights(lights: list[dict]) -> Lights:
    """Stack a list of point_light()/spot_light() dicts into a Lights SoA."""
    if not lights:
        # Zero-light table: keep one dummy entry with zero emission so the
        # shading loop shapes stay static; falloff 0 means it never passes
        # cluster assignment.
        lights = [point_light([0.0, 0.0, 0.0], [0.0, 0.0, 0.0], 0.0)]
        lights[0]["falloff_distance_sq"] = np.float32(0.0)
    return Lights(
        position=jnp.stack([jnp.asarray(l["position"]) for l in lights]),
        colour_emission=jnp.stack([jnp.asarray(l["colour_emission"]) for l in lights]),
        falloff_distance_sq=jnp.stack(
            [jnp.asarray(l["falloff_distance_sq"]) for l in lights]
        ),
        spot_epsilon=jnp.stack([jnp.asarray(l["spot_epsilon"]) for l in lights]),
        spot_direction=jnp.stack([jnp.asarray(l["spot_direction"]) for l in lights]),
        spot_outer_angle=jnp.stack(
            [jnp.asarray(l["spot_outer_angle"]) for l in lights]
        ),
    )


def spotlight_factor(
    direction_to_light: jnp.ndarray,  # [..., 3]
    spot_direction: jnp.ndarray,  # [..., 3]
    spot_outer_angle: jnp.ndarray,  # [...]
    spot_epsilon: jnp.ndarray,  # [...]
) -> jnp.ndarray:
    """Smooth spot cone falloff (shared-structs/src/lib.rs:129-138).

    Note: unclamped above 1 inside the inner cone, exactly like the
    reference (only ``.max(0.0)``).
    """
    theta = jnp.sum(-direction_to_light * spot_direction, axis=-1)
    return jnp.maximum((theta - jnp.cos(spot_outer_angle)) / spot_epsilon, 0.0)
