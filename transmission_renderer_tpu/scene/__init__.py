"""Scene ingestion: glTF loading, transforms, materials, textures, lights.

Replaces the reference's host-side asset pipeline (src/model_loading.rs)
with a NumPy loader producing a frozen ``Scene`` pytree of device arrays.
"""

from transmission_renderer_tpu.scene.types import (  # noqa: F401
    Similarity,
    similarity_identity,
    similarity_mul,
    similarity_apply,
    similarity_to_mat4,
    quat_mul,
    quat_rotate,
    quat_from_rotation_y,
    Scene,
    MaterialsSoA,
)
from transmission_renderer_tpu.scene.camera import (  # noqa: F401
    perspective_matrix_reversed,
    look_at_rh,
    sun_normal,
    Camera,
    CameraRig,
)
