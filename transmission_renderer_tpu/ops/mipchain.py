"""Opaque-framebuffer mip pyramid + clamp-sampled trilinear LOD fetch.

The reference blits the opaque-sampled HDR framebuffer down a full mip
chain every frame (``generate_mips`` call, src/main.rs:2054-2063) and the
transmission pass samples it at arbitrary UV with an explicit LOD
(``sample_by_lod`` closure, shader/src/lib.rs:135-138).

TPU layout: like the texture atlas (scene/textures.py), every level is
stored as 2x2 texel blocks in four phase-shifted copies, so a bilinear tap
is ONE [12]-f32 row gather and the trilinear fetch is two (TPU gathers
cost by index count, ~13 ms per 2M on v5e — the row-major layout's 8
taps were the transmission pass's biggest cost). Building the phase
copies is dense reshape/pad work (~130 MB of writes at 1080p, well under
a millisecond of HBM bandwidth). Level sizes/offsets are static Python
ints (select chains, no meta gathers). CLAMP_TO_EDGE is baked into the
edge blocks, matching the reference's clamp framebuffer sampler.
"""

from __future__ import annotations

from typing import NamedTuple

import os

import jax
import jax.numpy as jnp

from transmission_renderer_tpu.scene.textures import mip_levels_for_size


# Levels at or above this many texels store ROW form ([lw*lh, 3] — the
# level image itself) instead of a quad table when built with a static
# level_set: the quad build costs 4 phase copies + transposes of the
# level (measured 27.7 ms/frame on the stress scene whose roughness-0
# glass pulls levels 0-1 into the set — ~130 MB of layout shuffling),
# while the row-form tap is 4 small-table gathers instead of 1, paid
# only per covered TRANSMISSION pixel (a small screen fraction).
# Bit-exact: same texels, same lerp expression, same clamp. The
# threshold admits only level 0 at 1080p: level 1's quad build (~25 MB)
# measured cheaper than its 4-gather fetch at stress-scene transmission
# coverage (shade_transmission 21 -> 31 ms when level 1 went row-form).
ROWS_FORM_MIN_TEXELS = int(
    os.environ.get("TRTPU_PYR_ROWS_MIN", str(1_500_000))
)

# Texels per physical row in ROW-form levels ([ceil(wh/G), 3*G] instead
# of [wh, 3]): TPU gather cost is dominated by table ROW COUNT (see
# MipPyramid.level_quads), so packing G texels per row cuts the 4-gather
# tap's per-index cost ~(row-count regime) x while the build stays a
# contiguous reshape (no phase-copy shuffles — the reason ROW form exists).
# G=16 puts 1080p level 0 at ~130k rows (the ~2.3 ns/idx regime) at
# 192 B/row; the sub-texel select is G-1 cheap wheres per tap.
ROW_GROUP = int(os.environ.get("TRTPU_PYR_ROW_GROUP", "16"))
assert ROW_GROUP & (ROW_GROUP - 1) == 0 and ROW_GROUP >= 1
_RGSHIFT = ROW_GROUP.bit_length() - 1


class MipPyramid(NamedTuple):
    # Per-LEVEL quad tables, GROUP quad-blocks per physical row
    # ([ceil(4 * bh_k * bw_k / GROUP), 12 * GROUP] f32 each). Split per
    # level because TPU gather cost is dominated by table ROW COUNT
    # (nearly independent of row width — measured v5e @2M idx, 16.8 MB:
    # 350k-row [12]f32 ~10 ms vs 87.5k-row [48]f32 ~1 ms), so a fetch
    # restricted to a static level set only ever touches small tables and
    # the row grouping cuts the rest ~4x. The concatenated view
    # (``quads``) serves per-pixel dynamic levels; levels outside a
    # static ``level_set`` passed to build_pyramid hold None (their quad
    # construction is skipped at trace time — cheaper and more reliable
    # than hoping XLA DCEs a 100 MB level-0 phase-copy chain).
    level_quads: tuple  # tuple of [G_k, 12 * GROUP] float32 (or None)
    # static per-level metadata (Python ints; the pyramid never crosses a
    # jit boundary, it is built and consumed inside the frame function)
    offsets: tuple  # GROUPED-row offset of each level in the concat view
    widths: tuple  # texel sizes
    heights: tuple
    # ROW-form levels ([lw_k * lh_k, 3] f32 — the level image itself) for
    # big levels in a static level_set (see ROWS_FORM_MIN_TEXELS); a
    # level has either its quad table or its row form, never both
    level_rows: tuple = ()

    @property
    def quads(self) -> jnp.ndarray:
        assert all(q is not None for q in self.level_quads), (
            "dynamic-level sampling needs a full pyramid "
            "(build_pyramid(level_set=None))"
        )
        return jnp.concatenate(self.level_quads, axis=0)

    @property
    def num_levels(self) -> int:
        return len(self.offsets)


# Quad-blocks per physical row. 12 f32/block -> the device tiles rows
# to 128-element multiples either way (G4: 48->128 pad 2.67x; G8:
# 96->128 pad 1.33x at HALF the rows and the same physical 512 B row) —
# sweepable on hardware via TRTPU_PYRAMID_GROUP (pow2).
GROUP = int(os.environ.get("TRTPU_PYRAMID_GROUP", "4"))
assert GROUP & (GROUP - 1) == 0 and GROUP >= 1
_GSHIFT = GROUP.bit_length() - 1
# Channel-planar downsample chain: slice [H, W, 3] into three [H, W]
# planes and box-filter each (identical adds per element -> bit-exact;
# pinned by tests/test_mipchain.py). The interleaved chain reduces over
# a 3-wide minor axis, which maps to mostly-empty 128-lane VPU registers
# on device. DEFAULT ON since round 4: -3.4 ms on the stress scene
# (whose set reaches level 0, the biggest chain) and neutral-to-noise on
# scenes with coarse-only sets (round-3 dragon sweep) — hardware A/B
# knob (tools/frame_ab.py: planar_pyr).
PLANAR = os.environ.get("TRTPU_PLANAR_PYR", "1") == "1"


def pyramid_shapes(width: int, height: int) -> list[tuple[int, int]]:
    """(w, h) per level, floor(n/2) per step (Vulkan blit convention)."""
    shapes = [(width, height)]
    for _ in range(mip_levels_for_size(width, height) - 1):
        w, h = shapes[-1]
        shapes.append((max(w // 2, 1), max(h // 2, 1)))
    return shapes


def _downsample2x(img: jnp.ndarray) -> jnp.ndarray:
    """2x2 box downsample of [H, W] or [H, W, C]; odd trailing row/col
    dropped (floor(n/2) sizing, like the reference's LINEAR blit chain).

    The 4-texel average is EXPLICIT elementwise adds (not a reduce op) in
    a pinned order, and one shape-generic body serves both the
    interleaved [H, W, 3] chain and the channel-planar [H, W] variant —
    bit-exactness between them holds by construction (multi-axis
    jnp.mean would lower with shape-dependent reduction order)."""
    h, w = img.shape[:2]
    c = img.shape[2:]  # () for a channel plane, (3,) interleaved
    nh, nw = max(h // 2, 1), max(w // 2, 1)
    if h == 1:
        img2 = img[:, : nw * 2].reshape(1, nw, 2, *c)
        return (img2[:, :, 0] + img2[:, :, 1]) * 0.5
    if w == 1:
        img2 = img[: nh * 2].reshape(nh, 2, 1, *c)
        return (img2[:, 0] + img2[:, 1]) * 0.5
    img2 = img[: nh * 2, : nw * 2].reshape(nh, 2, nw, 2, *c)
    return (
        (img2[:, 0, :, 0] + img2[:, 0, :, 1])
        + (img2[:, 1, :, 0] + img2[:, 1, :, 1])
    ) * 0.25


# the channel-planar chain (PLANAR knob) downsample — same function; the
# name records that bit-exactness with the interleaved chain is pinned
# by tests/test_mipchain.py
_downsample2x_plane = _downsample2x


def _pair_matrix(n: int) -> jnp.ndarray:
    """[n, max(n//2, 1)] 0/1 f32 matrix pairing element 2j, 2j+1 -> j
    (rows beyond 2*(n//2) are zero — the floor(n/2) odd-edge drop)."""
    m = max(n // 2, 1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, m), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n, m), 1)
    return jnp.asarray((rows >> 1) == cols, jnp.float32) * jnp.asarray(
        rows < 2 * m, jnp.float32
    )


def _downsample2x_plane_mxu(plane: jnp.ndarray) -> jnp.ndarray:
    """2x2 box downsample of ONE [H, W] channel plane via two MXU
    matmuls with 0/1 pairing matrices.

    Why: the reshape-based ``_downsample2x`` materialises [nh, 2, nw, 2]
    intermediates whose trailing size-2 axis pads to 128 device lanes
    (64x physical bytes — measured 9.2 ms of the dragon frame's
    pyr_down); a dot against a 0/1 matrix keeps every tensor in natural
    [rows, lanes] layout and runs on the MXU.

    Exactness: horizontal-pair-add first, then vertical — the SAME
    association ``(a+b) + (c+d)`` as ``_downsample2x`` (top-row sum plus
    bottom-row sum, then * 0.25). Each output accumulates exactly two
    nonzero products of exact 1.0 coefficients, so on CPU the result is
    BIT-identical to the explicit adds (pinned by tests/test_mipchain.py
    ::test_mxu_downsample_bit_exact); the TPU MXU's split-mantissa f32
    passes may differ by <= 2 ulp, far inside the 1e-3 fidelity budget.
    """
    h, w = plane.shape
    if h <= 1 or w <= 1:
        return _downsample2x(plane)
    t = plane @ _pair_matrix(w)  # [h, w//2]: img[i,2j] + img[i,2j+1]
    out = _pair_matrix(h).T @ t  # [h//2, w//2]: top + bottom
    return out * 0.25


def _quad_level(img: jnp.ndarray) -> jnp.ndarray:
    """[H, W, 3] -> [ceil(4 * bh * bw / GROUP), 12 * GROUP] phase-shifted
    2x2 blocks, GROUP per row, CLAMP edges baked (the framebuffer sampler
    is clamp-to-edge)."""
    h, w = img.shape[:2]
    bw, bh = (w + 1) // 2, (h + 1) // 2
    padded = jnp.pad(
        img, ((0, 2 * bh + 1 - h), (0, 2 * bw + 1 - w), (0, 0)), mode="edge"
    )
    phases = []
    for py in (0, 1):
        for px in (0, 1):
            sub = padded[py : py + 2 * bh, px : px + 2 * bw]
            blk = sub.reshape(bh, 2, bw, 2, 3).transpose(0, 2, 1, 3, 4)
            phases.append(blk.reshape(bh * bw, 12))
    q = jnp.concatenate(phases, axis=0)
    pad = (-q.shape[0]) % GROUP
    if pad:
        q = jnp.pad(q, ((0, pad), (0, 0)))
    return q.reshape(-1, 12 * GROUP)


def _grouped_rows(n_quads: int) -> int:
    return -(-n_quads // GROUP)


def _fetch_quad(table: jnp.ndarray, grouped_off, qidx: jnp.ndarray):
    """Gather LEVEL-LOCAL quad-block ``qidx`` from a GROUP-packed table
    whose level starts at grouped row ``grouped_off`` -> [..., 4, 3]."""
    row = table[grouped_off + (qidx >> _GSHIFT)]
    # see ops/texture.py: barrier keeps the wide row gather intact
    row = jax.lax.optimization_barrier(row)
    grp = row.reshape(row.shape[:-1] + (GROUP, 12))
    sub = qidx & (GROUP - 1)
    out = grp[..., 0, :]
    for k in range(1, GROUP):
        out = jnp.where((sub == k)[..., None], grp[..., k, :], out)
    return out.reshape(out.shape[:-1] + (4, 3))


def build_pyramid(
    framebuffer, level_set: tuple | None = None
) -> MipPyramid:
    """[H, W, 3] (or a (r, g, b) tuple of [H, W] planes) -> quad-block
    mip pyramid (level 0 included).

    ``level_set`` (static level indices, see
    render/frame.py::refraction_level_set) restricts the build: the
    downsample chain stops at the coarsest needed level and quad tables
    are only constructed for levels IN the set (others hold None). The
    reference regenerates its full chain every frame
    (src/main.rs:2054-2063); with an untextured transmissive roughness
    the fetch provably touches only the set, so matching its work would
    be pure waste.

    Planes input is the fast path: the downsample chain runs per
    channel plane on the MXU (``_downsample2x_plane_mxu``) and channels
    interleave only for the (small) per-level quad/ROW tables — an
    interleaved [H, W, 3] frame pays a lane-padded channel split first."""
    if isinstance(framebuffer, (tuple, list)):
        in_planes = tuple(framebuffer)
        h, w = in_planes[0].shape
    else:
        h, w = framebuffer.shape[:2]
        in_planes = tuple(framebuffer[..., c] for c in range(3))
    shapes = pyramid_shapes(w, h)
    n_levels = len(shapes)
    max_needed = n_levels - 1 if level_set is None else min(
        max(level_set), n_levels - 1
    )
    with jax.named_scope("pyr_down"):
        planes = [list(in_planes)]
        for _ in range(max_needed):
            planes.append([_downsample2x_plane_mxu(p) for p in planes[-1]])

    def interleave(k):
        return jnp.stack(planes[k], axis=-1)

    offsets, off = [], 0
    for lw, lh in shapes:
        offsets.append(off)
        off += _grouped_rows(4 * ((lw + 1) // 2) * ((lh + 1) // 2))
    with jax.named_scope("pyr_quads"):
        level_quads, level_rows = [], []
        for k in range(n_levels):
            needed = (
                level_set is None or k in level_set
            ) and k <= max_needed
            lw, lh = shapes[k]
            if not needed:
                level_quads.append(None)
                level_rows.append(None)
            elif level_set is not None and lw * lh >= ROWS_FORM_MIN_TEXELS:
                level_quads.append(None)
                # CHANNEL-BLOCKED row form ([G reds | G greens | G
                # blues] per row), built straight from the planar
                # downsample chain: per plane a contiguous reshape to
                # [wh/G, G], then one concat. The texel-interleaved
                # [wh, 3] form this replaces forced a planar ->
                # interleaved relayout of the whole level (~8 ms of the
                # stress scene's 11.6 ms pyr_quads at level 0, v5e).
                chans = []
                for p in planes[k]:
                    flat = p.reshape(-1)
                    pad = (-flat.shape[0]) % ROW_GROUP
                    if pad:
                        flat = jnp.pad(flat, (0, pad))
                    chans.append(flat.reshape(-1, ROW_GROUP))
                level_rows.append(jnp.concatenate(chans, axis=1))
            else:
                level_quads.append(_quad_level(interleave(k)))
                level_rows.append(None)
    return MipPyramid(
        level_quads=tuple(level_quads),
        offsets=tuple(offsets),
        widths=tuple(s[0] for s in shapes),
        heights=tuple(s[1] for s in shapes),
        level_rows=tuple(level_rows),
    )


def _select_level_meta(pyr: MipPyramid, level: jnp.ndarray):
    """Static select chain -> per-pixel (offset, w, h) int32."""
    off = jnp.full(level.shape, pyr.offsets[0], jnp.int32)
    w = jnp.full(level.shape, pyr.widths[0], jnp.int32)
    h = jnp.full(level.shape, pyr.heights[0], jnp.int32)
    for k in range(1, pyr.num_levels):
        pick = level == k
        off = jnp.where(pick, pyr.offsets[k], off)
        w = jnp.where(pick, pyr.widths[k], w)
        h = jnp.where(pick, pyr.heights[k], h)
    return off, w, h


def _bilinear_clamp_quad(pyr: MipPyramid, level: jnp.ndarray, uv: jnp.ndarray):
    """Clamp-to-edge bilinear tap at a (per-pixel dynamic) level: ONE
    gather of a 12-float block row."""
    qoff, w, h = _select_level_meta(pyr, level)
    x = uv[..., 0] * w.astype(jnp.float32) - 0.5
    y = uv[..., 1] * h.astype(jnp.float32) - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    # clamp: below-zero footprints collapse onto the block's first
    # column/row (both Vulkan taps clamp to texel 0); the upper edge is
    # baked into the boundary blocks.
    fx = jnp.where((x0 < 0)[..., None], 0.0, fx)
    fy = jnp.where((y0 < 0)[..., None], 0.0, fy)
    x0 = jnp.clip(x0, 0, w - 1)
    y0 = jnp.clip(y0, 0, h - 1)
    bw = (w + 1) >> 1
    bh = (h + 1) >> 1
    phase = (y0 & 1) * 2 + (x0 & 1)
    qidx = phase * (bw * bh) + (y0 >> 1) * bw + (x0 >> 1)
    q = _fetch_quad(pyr.quads, qoff, qidx)
    c00, c10, c01, c11 = q[..., 0, :], q[..., 1, :], q[..., 2, :], q[..., 3, :]
    top = c00 + (c10 - c00) * fx
    bot = c01 + (c11 - c01) * fx
    return top + (bot - top) * fy


def _bilinear_level_static(pyr: MipPyramid, k: int, uv: jnp.ndarray):
    """Clamp-to-edge bilinear tap at STATIC level k: one gather from the
    level's (small) quad table, or four row gathers when the level is in
    ROW form (big level_set levels — same texels, same lerp, bit-exact)."""
    w, h = pyr.widths[k], pyr.heights[k]
    x = uv[..., 0] * float(w) - 0.5
    y = uv[..., 1] * float(h) - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    fx = jnp.where((x0 < 0)[..., None], 0.0, fx)
    fy = jnp.where((y0 < 0)[..., None], 0.0, fy)
    x0 = jnp.clip(x0, 0, w - 1)
    y0 = jnp.clip(y0, 0, h - 1)
    if pyr.level_rows and pyr.level_rows[k] is not None:
        rows = pyr.level_rows[k]  # [ceil(w*h/G), 3*G] grouped texels
        x1 = jnp.minimum(x0 + 1, w - 1)
        y1 = jnp.minimum(y0 + 1, h - 1)

        def tap(idx):
            grp = rows[idx >> _RGSHIFT]
            # keep the wide row gather intact (see _fetch_quad)
            grp = jax.lax.optimization_barrier(grp)
            sub = idx & (ROW_GROUP - 1)
            # channel-blocked rows (see build_pyramid): channel c's
            # texel j sits at c * G + j
            chans = []
            for c in range(3):
                v = grp[..., c * ROW_GROUP]
                for j in range(1, ROW_GROUP):
                    v = jnp.where(
                        sub == j, grp[..., c * ROW_GROUP + j], v
                    )
                chans.append(v)
            return jnp.stack(chans, axis=-1)

        c00 = tap(y0 * w + x0)
        c10 = tap(y0 * w + x1)
        c01 = tap(y1 * w + x0)
        c11 = tap(y1 * w + x1)
    else:
        bw = (w + 1) >> 1
        bh = (h + 1) >> 1
        phase = (y0 & 1) * 2 + (x0 & 1)
        qidx = phase * (bw * bh) + (y0 >> 1) * bw + (x0 >> 1)
        q = _fetch_quad(pyr.level_quads[k], 0, qidx)
        c00, c10, c01, c11 = (
            q[..., 0, :], q[..., 1, :], q[..., 2, :], q[..., 3, :]
        )
    top = c00 + (c10 - c00) * fx
    bot = c01 + (c11 - c01) * fx
    return top + (bot - top) * fy


def _bilinear_level_set_dynamic(
    pyr: MipPyramid, level: jnp.ndarray, uv: jnp.ndarray, lmin: int, hi: int
):
    """Clamp-to-edge bilinear tap at a PER-PIXEL level inside the static
    range [lmin, hi] (``lmin`` is the smallest level this tap can hit:
    the set's floor for the lod-floor tap, one above it for the lod-ceil
    tap — which spares the ceil tap the floor level's ROW-form gathers):
    one gather from the range's concatenated quad tables (+ the row-form
    taps where a range level stores ROW form, selected per pixel).
    Value-identical to ``_bilinear_level_static`` at the same level:
    identical coordinate math on the per-pixel-selected level size,
    identical fetch expressions."""
    quad_levels = [
        k for k in range(lmin, hi + 1) if pyr.level_quads[k] is not None
    ]
    row_levels = [
        k
        for k in range(lmin, hi + 1)
        if pyr.level_rows and pyr.level_rows[k] is not None
    ]
    # per-pixel level geometry (static select chain over the range)
    w = jnp.full(level.shape, pyr.widths[lmin], jnp.int32)
    h = jnp.full(level.shape, pyr.heights[lmin], jnp.int32)
    for k in range(lmin + 1, hi + 1):
        pick = level == k
        w = jnp.where(pick, pyr.widths[k], w)
        h = jnp.where(pick, pyr.heights[k], h)
    x = uv[..., 0] * w.astype(jnp.float32) - 0.5
    y = uv[..., 1] * h.astype(jnp.float32) - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    fx = jnp.where((x0 < 0)[..., None], 0.0, fx)
    fy = jnp.where((y0 < 0)[..., None], 0.0, fy)
    x0 = jnp.clip(x0, 0, w - 1)
    y0 = jnp.clip(y0, 0, h - 1)

    out = None
    if quad_levels:
        quads_set = jnp.concatenate(
            [pyr.level_quads[k] for k in quad_levels], axis=0
        )
        goffs, go = {}, 0
        for k in quad_levels:
            goffs[k] = go
            go += pyr.level_quads[k].shape[0]
        goff = jnp.full(level.shape, goffs[quad_levels[0]], jnp.int32)
        for k in quad_levels[1:]:
            goff = jnp.where(level == k, goffs[k], goff)
        bw = (w + 1) >> 1
        bh = (h + 1) >> 1
        phase = (y0 & 1) * 2 + (x0 & 1)
        qidx = phase * (bw * bh) + (y0 >> 1) * bw + (x0 >> 1)
        # pixels on a ROW-form level would compute qidx from that level's
        # LARGE geometry (far past the concatenated quad tables) before
        # the row-level where below overwrites their value — zero their
        # index instead of relying on XLA's clamp-mode gather semantics
        for k in row_levels:
            qidx = jnp.where(level == k, 0, qidx)
        q = _fetch_quad(quads_set, goff, qidx)
        c00, c10, c01, c11 = (
            q[..., 0, :], q[..., 1, :], q[..., 2, :], q[..., 3, :]
        )
        top = c00 + (c10 - c00) * fx
        bot = c01 + (c11 - c01) * fx
        out = top + (bot - top) * fy
    for k in row_levels:
        ck = _bilinear_level_static(pyr, k, uv)
        out = ck if out is None else jnp.where((level == k)[..., None], ck, out)
    return out


def _dynamic_tap_parts(
    pyr: MipPyramid, level: jnp.ndarray, uv: jnp.ndarray, lmin: int, hi: int
):
    """The footprint + ROW-GATHER halves of _bilinear_level_set_dynamic
    (quad-form levels only — caller guarantees no ROW-form level in
    [lmin, hi]): returns (rows [..., 12*GROUP] natural-layout gather,
    sub in [0, GROUP), fx, fy). The sub-block select + lerp happen in
    the Pallas fetch-finish kernel (ops/tap_finish.py), which consumes
    the gather output in-register — no optimization_barrier relayout."""
    w = jnp.full(level.shape, pyr.widths[lmin], jnp.int32)
    h = jnp.full(level.shape, pyr.heights[lmin], jnp.int32)
    for k in range(lmin + 1, hi + 1):
        pick = level == k
        w = jnp.where(pick, pyr.widths[k], w)
        h = jnp.where(pick, pyr.heights[k], h)
    x = uv[..., 0] * w.astype(jnp.float32) - 0.5
    y = uv[..., 1] * h.astype(jnp.float32) - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    fx = jnp.where(x0 < 0, 0.0, fx)
    fy = jnp.where(y0 < 0, 0.0, fy)
    x0 = jnp.clip(x0, 0, w - 1)
    y0 = jnp.clip(y0, 0, h - 1)

    quads_set = jnp.concatenate(
        [pyr.level_quads[k] for k in range(lmin, hi + 1)], axis=0
    )
    goffs, go = {}, 0
    for k in range(lmin, hi + 1):
        goffs[k] = go
        go += pyr.level_quads[k].shape[0]
    goff = jnp.full(level.shape, goffs[lmin], jnp.int32)
    for k in range(lmin + 1, hi + 1):
        goff = jnp.where(level == k, goffs[k], goff)
    bw = (w + 1) >> 1
    bh = (h + 1) >> 1
    phase = (y0 & 1) * 2 + (x0 & 1)
    qidx = phase * (bw * bh) + (y0 >> 1) * bw + (x0 >> 1)
    ridx = goff + (qidx >> _GSHIFT)
    if ridx.ndim > 1:
        # 2-D index chain (see pyramid_fetch_parts): pin the compute
        # shape, flatten only the gather operand
        ridx = jax.lax.optimization_barrier(ridx).reshape(-1)
    rows = quads_set[ridx]
    return rows, qidx & (GROUP - 1), fx, fy


def _static_tap_parts(pyr: MipPyramid, k: int, uv: jnp.ndarray):
    """Footprint + row-gather halves of _bilinear_level_static's
    quad-form branch at static level k."""
    w, h = pyr.widths[k], pyr.heights[k]
    x = uv[..., 0] * float(w) - 0.5
    y = uv[..., 1] * float(h) - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    fx = jnp.where(x0 < 0, 0.0, fx)
    fy = jnp.where(y0 < 0, 0.0, fy)
    x0 = jnp.clip(x0, 0, w - 1)
    y0 = jnp.clip(y0, 0, h - 1)
    bw = (w + 1) >> 1
    bh = (h + 1) >> 1
    phase = (y0 & 1) * 2 + (x0 & 1)
    qidx = phase * (bw * bh) + (y0 >> 1) * bw + (x0 >> 1)
    ridx = qidx >> _GSHIFT
    if ridx.ndim > 1:
        ridx = jax.lax.optimization_barrier(ridx).reshape(-1)
    rows = pyr.level_quads[k][ridx]
    return rows, qidx & (GROUP - 1), fx, fy


def pyramid_fetch_parts(
    pyr: MipPyramid, uv: jnp.ndarray, lod: jnp.ndarray, level_set
):
    """sample_pyramid_lod's level-set fetch split into per-tap
    (rows, sub, fx, fy, weight) tuples for the Pallas fetch-finish
    kernel (ops/tap_finish.py::transmission_fetch_planes):

    * small sets (<= 3 levels): one STATIC tap per level with its tent
      weight — the weighted ascending sum matches the XLA small-set
      loop term for term;
    * wider sets: the TWO dynamic bracketing taps with the same tent
      weights sample_pyramid_lod applies.

    None when sample_pyramid_lod would take a path the kernel doesn't
    reproduce (no set, or any ROW-form level in range)."""
    if level_set is None:
        return None
    lo, hi = min(level_set), max(level_set)
    if tuple(level_set) != tuple(range(lo, hi + 1)):
        return None
    if any(pyr.level_quads[k] is None for k in range(lo, hi + 1)):
        return None  # ROW-form level in range: XLA path handles it
    # Run the footprint/index chains on [M/128, 128] 2-D shapes: flat
    # [M]-shaped s32 select chains get a T(1,128) layout (1 sublane per
    # 8-sublane register, ~8x VPU waste — see
    # tap_finish.sample_bundle_planes); the tap helpers flatten only the
    # gather operands. All reshapes are exact; the returned planes stay
    # flat [M] (the fetch-finish kernel re-tiles them itself).
    two_d = uv.ndim == 2 and uv.shape[0] % 128 == 0 and uv.shape[0] > 0
    if two_d:
        m = uv.shape[0]
        uv = uv.reshape(m // 128, 128, 2)
        lod = lod.reshape(m // 128, 128)

    def flat(tap):
        if not two_d:
            return tap
        rows, sub, fx, fy, wk = tap
        return (rows, sub.reshape(m), fx.reshape(m), fy.reshape(m),
                wk.reshape(m))

    lod = jnp.clip(lod, float(lo), float(hi))
    if hi - lo + 1 <= 3:
        taps = []
        for k in range(lo, hi + 1):
            wk = jnp.clip(1.0 - jnp.abs(lod - float(k)), 0.0, 1.0)
            taps.append(flat(_static_tap_parts(pyr, k, uv) + (wk,)))
        return taps
    l0 = jnp.floor(lod).astype(jnp.int32)
    l1 = jnp.minimum(l0 + 1, hi)
    t0 = _dynamic_tap_parts(pyr, l0, uv, lo, hi)
    t1 = _dynamic_tap_parts(pyr, l1, uv, min(lo + 1, hi), hi)
    l0f = l0.astype(jnp.float32)
    w0 = jnp.clip(1.0 - jnp.abs(lod - l0f), 0.0, 1.0)
    w1 = jnp.clip(1.0 - jnp.abs(lod - (l0f + 1.0)), 0.0, 1.0)
    w1 = jnp.where(l1 == l0, 0.0, w1)
    return [flat(t0 + (w0,)), flat(t1 + (w1,))]


def sample_pyramid_lod(
    pyr: MipPyramid,
    uv: jnp.ndarray,
    lod: jnp.ndarray,
    level_set: tuple | None = None,
) -> jnp.ndarray:
    """Trilinear clamp sample -> [..., 3]; the framebuffer_sampler closure
    of the transmission shader (shader/src/lib.rs:135-138).

    ``level_set`` (a static, contiguous tuple of level indices) restricts
    the fetch to those levels: the lod is clamped into the set's range.
    Small sets (<= 3 levels) sum one tent-weighted bilinear tap per level
    from that level's own small quad table; wider sets tap only the TWO
    levels bracketing each pixel's lod through a per-pixel dynamic fetch
    (``_bilinear_level_set_dynamic``) — a 9-level set (e.g. a scene
    whose glass spans roughness 0..0.4) costs 2 gathers/px instead of 9+.
    Both forms produce BIT-identical results: the skipped taps carry
    exact tent weight 0.0, and 0.0 * finite-texel terms add exactly
    nothing to the ascending-level sum the small-set form computes.
    Callers must guarantee every lod that survives to the image lies
    inside the set (render_frame derives it from static per-material
    ior-adjusted roughness — see SceneFlags.transmission_ior_roughness);
    out-of-set lods (e.g. on pixels that are masked away afterwards)
    clamp harmlessly. Equals the two-level lerp up to fp reassociation.
    """
    max_level = pyr.num_levels - 1
    if level_set is not None:
        lo, hi = min(level_set), max(level_set)
        assert tuple(level_set) == tuple(range(lo, hi + 1)), (
            "level_set must be contiguous"
        )
        lod = jnp.clip(lod, float(lo), float(hi))
        if hi - lo + 1 <= 3:
            out = None
            for k in range(lo, hi + 1):
                wk = jnp.clip(
                    1.0 - jnp.abs(lod - float(k)), 0.0, 1.0
                )[..., None]
                ck = _bilinear_level_static(pyr, k, uv) * wk
                out = ck if out is None else out + ck
            return out
        l0 = jnp.floor(lod).astype(jnp.int32)
        l1 = jnp.minimum(l0 + 1, hi)
        c0 = _bilinear_level_set_dynamic(pyr, l0, uv, lo, hi)
        c1 = _bilinear_level_set_dynamic(pyr, l1, uv, min(lo + 1, hi), hi)
        l0f = l0.astype(jnp.float32)
        # the SAME tent expression the per-level loop evaluates, so the
        # two bracketing terms match it bit-for-bit; the l1 == l0 edge
        # (lod exactly at the set's top) would double-count level hi —
        # its tent weight is forced to the exact 0.0 every other level
        # contributes there
        w0 = jnp.clip(1.0 - jnp.abs(lod - l0f), 0.0, 1.0)[..., None]
        w1 = jnp.clip(1.0 - jnp.abs(lod - (l0f + 1.0)), 0.0, 1.0)[..., None]
        w1 = jnp.where((l1 == l0)[..., None], 0.0, w1)
        return c0 * w0 + c1 * w1
    lod = jnp.clip(lod, 0.0, float(max_level))
    l0 = jnp.floor(lod).astype(jnp.int32)
    l1 = jnp.minimum(l0 + 1, max_level)
    c0 = _bilinear_clamp_quad(pyr, l0, uv)
    c1 = _bilinear_clamp_quad(pyr, l1, uv)
    frac = (lod - l0.astype(jnp.float32))[..., None]
    return c0 + (c1 - c0) * frac
