"""The frame graph: one jitted function per frame.

Replaces the reference's command-buffer recording (``record()``,
src/main.rs:1551-2263) — render passes, subpasses and ~20 barriers — with
plain array dataflow that XLA schedules.
"""

from transmission_renderer_tpu.render.frame import (  # noqa: F401
    DrawList,
    FrameParams,
    SceneFlags,
    build_draw_list,
    make_frame_params,
    render_frame,
    scene_flags,
)
