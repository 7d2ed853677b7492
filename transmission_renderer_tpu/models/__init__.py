"""Procedural scene families + the benchmark flagship scene.

No glTF sample assets ship in this environment, so the benchmark/test
scenes are procedural stand-ins matched in triangle count and material
character to the reference's headline configs (BASELINE.md): an opaque-PBR
scene (DamagedHelmet analogue), a rough-transmission scene
(DragonAttenuation analogue), and volume/Beer's-law scenes
(MosquitoInAmber / AttenuationTest analogues). Real glTF files load
through scene/gltf.py.
"""

from transmission_renderer_tpu.models.procedural import (  # noqa: F401
    make_sphere_mesh,
    make_box_mesh,
    make_plane_mesh,
    checkerboard_texture,
    build_test_scene,
    build_opaque_scene,
    build_dragon_scene,
    build_stress_scene,
    build_attenuation_scene,
    build_bindless_scene,
    bindless_lights,
)
