"""Multi-chip scaling over an ICI mesh.

The reference is single-GPU; its 'communication backend' is the Vulkan
queue + barriers (SURVEY.md §2.6, §5.8). The TPU build's one real
distributed feature (per the BASELINE.json north star) is a framebuffer
sharded row-band-wise across chips via ``shard_map``, with collectives for
the cross-band data the transmission pass needs.
"""

from transmission_renderer_tpu.parallel.sharded import (  # noqa: F401
    make_band_mesh,
    render_frame_sharded,
)
