"""Pure-JAX PBR math core.

Ports the reference's ``glam-pbr`` crate, ``shader/src/lighting.rs``,
``shader/src/tonemapping.rs`` and the cluster-coefficient math from
``shared-structs/src/lib.rs`` as vectorised JAX functions. This is the
RMSE-critical layer; everything is float32 and broadcastable over pixel
batches.
"""

from transmission_renderer_tpu.pbr.brdf import (  # noqa: F401
    MaterialParams,
    BrdfResult,
    basic_brdf,
    material_invariants,
    transmission_btdf,
    ibl_volume_refraction,
    d_ggx,
    v_smith_ggx_correlated,
    fresnel_schlick,
    refract,
    apply_volume_attenuation,
    light_direction_and_attenuation,
    perceptual_to_actual_roughness,
    apply_ior_to_roughness,
    ior_to_dielectric_f0,
    combined_f0,
    combined_f90,
)
from transmission_renderer_tpu.pbr.tonemap import (  # noqa: F401
    LottesParams,
    BakedLottesParams,
    bake_lottes_params,
    lottes_tonemap,
    lottes_tonemap_planes,
)
from transmission_renderer_tpu.pbr.clustering import (  # noqa: F401
    ClusterCoefficients,
    cluster_coefficients,
    get_depth_slice,
    slice_to_depth,
    linear_depth,
    cluster_aabb_distance_sq,
    cull_spotlight,
)
from transmission_renderer_tpu.pbr.lights import (  # noqa: F401
    Lights,
    point_light,
    spot_light,
    pack_lights,
    spotlight_factor,
)
