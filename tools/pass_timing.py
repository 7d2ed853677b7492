"""In-frame per-pass device timing from a profiler trace.

The reference wraps every pass in Tracy GPU timestamp zones and collects
them per frame (src/profiling.rs:101-131); the TPU analogue captures ONE
profiled frame (jax.profiler trace) and aggregates XLA op device time by
the `pass_scope` names baked into op metadata (jax.named_scope →
HLO op_name paths). Unlike tools/stage_bench.py (isolated-jit stages,
whose sums overestimate the fused frame), these numbers come from the
REAL fused frame's device trace and sum to ~the measured frame time.

Usage:
    from tools.pass_timing import profile_pass_times
    table = profile_pass_times(lambda: run_one_frame())
    # {'shade_opaque': 43.1, ..., '<unattributed>': 8.2, '<total>': 97.0}

Ops whose metadata carries no scope (XLA-fused across scopes, or outside
any pass_scope) land in '<unattributed>'.
"""

from __future__ import annotations

import glob
import os
import tempfile

# every pass_scope name used by render/frame.py (order = frame order)
PASS_SCOPES = (
    # sub-scopes FIRST: attribution picks the first match, and these
    # appear nested under shade_* in the op_name path
    "mat_row",
    "mat_tap",
    "mat_normal",
    "material_taps",
    "shade_kernel",
    "cluster_fetch",
    "brdf_sun",
    "brdf_slots",
    "light_loop",
    "pyr_down",
    "pyr_quads",
    "geometry",
    "binning",
    "payload",
    "raster_opaque",
    "clip_round_1",
    "clip_round_2",
    "clip_round_3",
    "clip_round_4",
    "clip_round_5",
    "clip_alpha_test",
    "raster_clip_peel",
    "clustering",
    "shadow_rays_opaque",
    "shade_opaque",
    "mip_pyramid",
    "raster_transmission",
    "shadow_rays_transmission",
    "shade_transmission",
    "tonemap",
)


def _attribute(text: str, scopes) -> str | None:
    for s in scopes:
        if f"/{s}" in text or text.startswith(s):
            return s
    return None


def build_scope_map(hlo_text: str, scopes=PASS_SCOPES) -> dict:
    """Compiled-HLO text -> {instruction name: scope}.

    TPU trace events are named after HLO instructions (fusion.123 etc.)
    whose metadata op_name carries the jax.named_scope path — the only
    place the pass structure survives compilation."""
    import re

    out = {}
    pat = re.compile(r"%?([\w.\-]+) = .*metadata=\{[^}]*op_name=\"([^\"]+)\"")
    for m in pat.finditer(hlo_text):
        name, op_name = m.group(1), m.group(2)
        scope = _attribute(op_name, scopes)
        if scope:
            out[name] = scope
    return out


def collect_pass_times(
    trace_dir: str, scopes=PASS_SCOPES, scope_map: dict | None = None,
) -> dict:
    """Parse the newest xplane in ``trace_dir`` -> {scope: device_ms}.

    ``scope_map`` (from build_scope_map) resolves HLO instruction names;
    string stats / event names are also scanned. Includes
    '<unattributed>' (device ops without a recognised scope) and
    '<total>' (all device op time)."""
    import re

    from jax.profiler import ProfileData

    paths = sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime,
    )
    if not paths:
        raise FileNotFoundError(f"no xplane.pb under {trace_dir}")
    data = ProfileData.from_file(paths[-1])
    scope_map = scope_map or {}

    # TPU 'XLA Ops' event names are the FULL instruction text
    # ('%fusion.3 = f32[...] fusion(...), calls=...') — the instruction
    # NAME must be parsed out to key into scope_map (the metadata
    # op_name does not survive into the event text).
    instr_pat = re.compile(r"^%?([\w.\-]+)\s*=")

    sums = {s: 0.0 for s in scopes}
    unattributed = 0.0
    total = 0.0
    unattr_top = {}
    for plane in data.planes:
        name = plane.name
        is_device = (
            "TPU" in name or "GPU" in name or "device" in name
        )
        for line in plane.lines:
            lname = line.name or ""
            if is_device:
                # ONLY the 'XLA Ops' per-op track: 'XLA Modules', 'Steps',
                # 'Async XLA Ops' (DMAs already inside op spans) and
                # 'TC Overlay' overlap it and would double-count.
                if lname != "XLA Ops":
                    continue
            elif not lname.startswith("tf_"):
                # on CPU the XLA client line lives under /host:CPU as
                # tf_XLAPjRt...; host python lines are excluded
                continue
            for ev in line.events:
                dur = ev.duration_ns / 1e6
                ev_name = ev.name or ""
                texts = [ev_name.lstrip("%")]
                m = instr_pat.match(ev_name)
                if m:
                    texts.insert(0, m.group(1))
                try:
                    for k, v in ev.stats:
                        if isinstance(v, str):
                            texts.append(v.lstrip("%"))
                except Exception:
                    pass
                scope = None
                for t in texts:
                    scope = scope_map.get(t) or _attribute(t, scopes)
                    if scope:
                        break
                total += dur
                if scope:
                    sums[scope] += dur
                else:
                    unattributed += dur
                    key = texts[0][:60]
                    unattr_top[key] = unattr_top.get(key, 0.0) + dur
    sums["<unattributed>"] = unattributed
    sums["<total>"] = total
    sums["<unattributed_top>"] = dict(
        sorted(unattr_top.items(), key=lambda kv: -kv[1])[:8]
    )
    return sums


def profile_pass_times(
    run_frame, scopes=PASS_SCOPES, hlo_text: str | None = None,
) -> dict:
    """Trace one call of ``run_frame`` (should render + sync one frame)
    and return its per-pass device-ms table. ``hlo_text`` (the compiled
    module's as_text) resolves fusion names to scopes — without it, only
    ops whose trace metadata carries the scope string attribute."""
    import jax

    scope_map = build_scope_map(hlo_text, scopes) if hlo_text else None
    with tempfile.TemporaryDirectory(prefix="trtpu_trace_") as d:
        jax.profiler.start_trace(d)
        try:
            run_frame()
        finally:
            jax.profiler.stop_trace()
        return collect_pass_times(d, scopes, scope_map)


def format_table(sums: dict) -> str:
    lines = []
    for s in PASS_SCOPES:
        if sums.get(s):
            lines.append(f"  {s:<26} {sums[s]:8.2f} ms")
    lines.append(f"  {'<unattributed>':<26} {sums.get('<unattributed>', 0.0):8.2f} ms")
    lines.append(f"  {'<total device>':<26} {sums.get('<total>', 0.0):8.2f} ms")
    top = sums.get("<unattributed_top>") or {}
    for k, v in top.items():
        if v >= 1.0:  # only name the unattributed ops that matter (>=1 ms)
            lines.append(f"    ? {k:<55} {v:7.2f} ms")
    return "\n".join(lines)
