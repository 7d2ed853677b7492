"""Device-side ops: rasterisation, texture sampling, culling, mip chains,
BVH build/traversal. Pure-JAX reference implementations live next to the
Pallas fast paths; tests pin one against the other."""
