"""Pallas raster kernel variant that emits an interpolated G-buffer.

The plain kernel (ops/raster_pallas.py) outputs a visibility buffer that a
separate gather-based pass (render/gbuffer.py) expands into attributes —
two ~6M-index gathers per pass on TPU. This variant carries the three
vertices' attributes *in the record stream* (they're SMEM scalars anyway)
and interpolates at depth-race win time, writing the G-buffer channels
directly: no per-pixel attribute gathers at all.

Record layout: 64 f32 per record (48 used + 16 pad), 2 records per
128-lane row:
  [0:9]   adjugate rows (a0 b0 c0 a1 b1 c1 a2 b2 c2)
  [9:12]  z_clip,  [12:15] w_clip
  [15]    tri id + CLASS_BIT * draw_class, as float value. Classes map
          the reference's 4 draw buckets (model_loading.rs:68-78):
          0 = opaque, 1 = transmission, 2 = alpha-clip,
          3 = transmission-alpha-clip (tri ids < CLASS_BIT = 2^22 keep
          the encoding exact in f32)
  [16:24] v0: pos.xyz, nrm.xyz, uv.xy
  [24:32] v1, [32:40] v2
  [40]    material id (float value), [41] instance scale
  [42:64] padding

Alpha-clip classes rasterise through the same kernel via depth PEELING
(render/frame.py::_rasterize_clip_peeled): race ignoring alpha, test the
winners' diffuse alpha densely in XLA (implicit-LOD, matching the clip
pre-pass shader/src/lib.rs:270-295), then re-race only the failing tiles
with ``max_depth`` bounding out the rejected fragment — exact once the
number of rejected layers above the true winner is below the round count.

Derivatives are the same closed forms as render/gbuffer.py: for an
attribute with vertex values A_i, N = sum(e_i A_i), D = sum(e_i),
dA/dnx = (sum(a_i A_i) D - N sum(a_i)) / D^2 — and sum(a_i A_i) is a
per-record *scalar*, so the per-pixel cost is a handful of VPU ops.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from transmission_renderer_tpu.ops.raster import TileBins, TriangleSetup
from transmission_renderer_tpu.ops.raster_pallas import CLASS_BIT, CLASS_SHIFT

TILE_H = 8
TILE_W = 128
REC_F32 = 64
RECS_PER_ROW = 128 // REC_F32  # 2
CHUNK_ROWS = 16  # 32 records / chunk, 8 KB
# Payload-gather source layout: the record table is [T, 64] f32, whose
# minor axis pads to a whole 128-element device tile (2x physical bytes,
# docs/PERFORMANCE.md "device-tile padding") — and XLA gather cost steps
# with table ROW count. Packing record PAIRS into one flat 128-element
# row ([ceil(T/2), 128]) halves both at zero real-byte cost; the per-id
# half select is register work on rows the gather already fetched.
# Sweepable on hardware (the win rides the measured row-count gather
# model; flip the default once measured in-frame).
PAYLOAD_PAIRED = os.environ.get("TRTPU_PAYLOAD_PAIRED", "0") == "1"

# output channel order (each [n_tiles, TILE_H, TILE_W] f32 unless noted)
GBUF_CHANNELS = (
    "tri",  # int32
    "depth",
    "pos_x", "pos_y", "pos_z",
    "nrm_x", "nrm_y", "nrm_z",
    "uv_u", "uv_v",
    "duvdx_u", "duvdx_v", "duvdy_u", "duvdy_v",
    "dposdx_x", "dposdx_y", "dposdx_z",
    "dposdy_x", "dposdy_y", "dposdy_z",
    "material",  # int32
    "scale",
)

# position-derivative channels only feed normal mapping's cotangent frame
# (render/shading.py; shader/src/lighting.rs:243-259) — a pass whose
# materials use no normal_map texture skips computing and storing them
# (``pos_derivs=False``), ~1/4 of the per-record interpolation work
DPOS_CHANNELS = (
    "dposdx_x", "dposdx_y", "dposdx_z",
    "dposdy_x", "dposdy_y", "dposdy_z",
)
# uv + uv-derivative channels only feed texture taps (and the alpha-clip
# coverage test) — a pass whose materials sample NO texture slot at all
# (e.g. an untextured-glass transmission pass) skips them too
UV_CHANNELS = (
    "uv_u", "uv_v",
    "duvdx_u", "duvdx_v", "duvdy_u", "duvdy_v",
)


def active_channels(pos_derivs: bool, uv_channels: bool = True) -> tuple:
    drop = () if pos_derivs else DPOS_CHANNELS
    if not uv_channels:
        drop = drop + UV_CHANNELS
    return tuple(c for c in GBUF_CHANNELS if c not in drop)


def pack_gbuf_payload(
    setup: TriangleSetup,
    tri_vertices: jnp.ndarray,  # [T, 3]
    tri_material: jnp.ndarray,  # [T]
    tri_scale: jnp.ndarray,  # [T]
    world_positions: jnp.ndarray,  # [VV, 3]
    world_normals: jnp.ndarray,  # [VV, 3]
    uvs: jnp.ndarray,  # [VV, 2]
    class_flags: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """[T, 64] records (per-frame; the vertex gathers here are T-sized,
    not pixel-sized)."""
    t = setup.adj.shape[0]
    # the id + CLASS_BIT*class encoding (and its exact-f32 storage)
    # requires ids below the class field
    assert t <= CLASS_BIT, f"{t} records exceed the 2^22 tri-id field"
    ids = jnp.arange(t, dtype=jnp.int32)
    if class_flags is not None:
        ids = ids + CLASS_BIT * class_flags.astype(jnp.int32)
    attr8 = jnp.concatenate([world_positions, world_normals, uvs], axis=1)
    v = attr8[tri_vertices]  # [T, 3, 8]
    rec = jnp.concatenate(
        [
            setup.adj.reshape(t, 9),
            setup.z_clip,
            setup.w_clip,
            ids.astype(jnp.float32)[:, None],
            v.reshape(t, 24),
            tri_material.astype(jnp.float32)[:, None],
            tri_scale[:, None],
            jnp.zeros((t, REC_F32 - 42), jnp.float32),
        ],
        axis=1,
    )
    return rec


def gather_gbuf_payload(records: jnp.ndarray, bins: TileBins):
    """Sorted/big payload rows for the kernel ([R, 128] lane-aligned)."""
    t = records.shape[0]
    degenerate = jnp.zeros((1, REC_F32), jnp.float32).at[0, 15].set(-1.0)
    rec_ext = jnp.concatenate([records, degenerate], axis=0)
    sorted_ids = jnp.where(bins.sorted_tri_ids >= 0, bins.sorted_tri_ids, t)
    big_ids = jnp.where(bins.big_tri_ids >= 0, bins.big_tri_ids, t)

    if PAYLOAD_PAIRED:
        n = rec_ext.shape[0]
        paired = jnp.pad(rec_ext, ((0, (-n) % 2), (0, 0)))
        paired = paired.reshape(-1, 2 * REC_F32)  # [ceil/2, 128]: no pad

        def fetch(ids):
            rows = jax.lax.optimization_barrier(paired[ids >> 1])
            odd = (ids & 1).astype(bool)[:, None]
            return jnp.where(odd, rows[:, REC_F32:], rows[:, :REC_F32])

    else:

        def fetch(ids):
            return rec_ext[ids]

    def pack_rows(recs, extra_pad):
        n = recs.shape[0]
        pad = (-n) % RECS_PER_ROW
        recs = jnp.pad(recs, ((0, pad), (0, 0)))
        rows = recs.reshape(-1, 128)
        if extra_pad:
            rows = jnp.pad(rows, ((0, extra_pad), (0, 0)))
        return rows

    return (
        pack_rows(fetch(sorted_ids), CHUNK_ROWS),
        pack_rows(fetch(big_ids), 0),
    )


def _kernel(
    # scalar prefetch
    tile_start_ref,  # i32[num_classes * n_tiles_global + 1] (global)
    tile_ids_ref,  # i32[K] global tile ids for this call
    big_count_ref,
    # inputs
    payload_hbm,  # ANY (HBM)
    big_payload_ref,  # SMEM
    init_depth_ref,  # VMEM [1, TILE_H, TILE_W]
    max_depth_ref,  # VMEM [1, TILE_H, TILE_W] (peeling bound; all-inf when off)
    # outputs: one per-tile block per active channel
    *refs,
    tiles_x: int,
    width: int,
    height: int,
    pass_class: int | None,
    num_classes: int,
    use_max_depth: bool,
    pos_derivs: bool,
    uv_channels: bool,
):
    names = active_channels(pos_derivs, uv_channels)
    outs = refs[:len(names)]
    chunk_ref, sems = refs[len(names)], refs[len(names) + 1]
    # VMEM accumulators live in the output blocks directly; statically
    # disabled channels (see DPOS_CHANNELS / UV_CHANNELS) have no ref.
    ch = dict(zip(names, outs))
    get = ch.get
    tri_o, depth_o = ch["tri"], ch["depth"]
    px_o, py_o, pz_o = ch["pos_x"], ch["pos_y"], ch["pos_z"]
    nx_o, ny_o, nz_o = ch["nrm_x"], ch["nrm_y"], ch["nrm_z"]
    u_o, v_o = get("uv_u"), get("uv_v")
    duxu_o, duxv_o = get("duvdx_u"), get("duvdx_v")
    duyu_o, duyv_o = get("duvdy_u"), get("duvdy_v")
    dpxx_o, dpxy_o, dpxz_o = (
        get("dposdx_x"), get("dposdx_y"), get("dposdx_z"))
    dpyx_o, dpyy_o, dpyz_o = (
        get("dposdy_x"), get("dposdy_y"), get("dposdy_z"))
    mat_o, scale_o = ch["material"], ch["scale"]

    t = pl.program_id(0)
    tile_id = tile_ids_ref[t]
    ty = tile_id // tiles_x
    tx = tile_id % tiles_x

    rows_f = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0).astype(
        jnp.float32
    )
    cols_f = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1).astype(
        jnp.float32
    )
    pxc = tx.astype(jnp.float32) * TILE_W + cols_f + 0.5
    pyc = ty.astype(jnp.float32) * TILE_H + rows_f + 0.5
    nx = pxc * (2.0 / width) - 1.0
    ny = pyc * (2.0 / height) - 1.0

    zero = jnp.zeros((TILE_H, TILE_W), jnp.float32)
    tri_o[0] = jnp.full((TILE_H, TILE_W), -1, jnp.int32)
    depth_o[0] = init_depth_ref[0]
    for ref in (px_o, py_o, pz_o, nx_o, ny_o, u_o, v_o, duxu_o, duxv_o,
                duyu_o, duyv_o, dpxx_o, dpxy_o, dpxz_o, dpyx_o, dpyy_o,
                dpyz_o, mat_o):
        if ref is None:
            continue
        if ref is mat_o:
            ref[0] = jnp.zeros((TILE_H, TILE_W), jnp.int32)
        else:
            ref[0] = zero
    nz_o[0] = zero + 1.0  # background normal = +z (gbuffer convention)
    scale_o[0] = zero + 1.0

    # class-split bins: tile T's records live at bins [nc*T, nc*T+nc);
    # a single-class pass streams only its run. Indexed by the GLOBAL
    # tile id so arbitrary tile lists (bands, failing-tile re-races)
    # share one tile_start. (Big records are always class-mixed and rely
    # on the per-record filter below.)
    if num_classes == 1:
        start = tile_start_ref[tile_id]
        count = tile_start_ref[tile_id + 1] - start
    elif pass_class is None:
        start = tile_start_ref[num_classes * tile_id]
        count = tile_start_ref[num_classes * tile_id + num_classes] - start
    else:
        start = tile_start_ref[num_classes * tile_id + pass_class]
        count = tile_start_ref[num_classes * tile_id + pass_class + 1] - start

    def record_body(ref, row, off):
        # KEEP IN SYNC with raster_pallas.py::record_body: the decode /
        # edge-function / top-left-rule / depth-race core is identical
        # by contract (differences: 64-f32 records, 4-class filter, and
        # the attribute-interpolation tail). A raster-rule fix applied
        # to one kernel MUST be applied to the other.
        rec = lambda k: ref[row, off + k]
        a0, b0, c0 = rec(0), rec(1), rec(2)
        a1, b1_, c1 = rec(3), rec(4), rec(5)
        a2, b2_, c2 = rec(6), rec(7), rec(8)
        z0, z1, z2 = rec(9), rec(10), rec(11)
        w0, w1, w2 = rec(12), rec(13), rec(14)
        tri_enc = rec(15).astype(jnp.int32)
        cls = tri_enc >> CLASS_SHIFT
        tri = tri_enc & (CLASS_BIT - 1)
        # the degenerate pad record encodes tri = -1: keep it negative
        tri = jnp.where(tri_enc < 0, tri_enc, tri)

        e0 = a0 * nx + b0 * ny + c0
        e1 = a1 * nx + b1_ * ny + c1
        e2 = a2 * nx + b2_ * ny + c2

        def covered(e, a, b):
            tl = (a > 0) | ((a == 0) & (b > 0))
            return (e > 0) | ((e == 0) & tl)

        inside = (
            covered(e0, a0, b0) & covered(e1, a1, b1_) & covered(e2, a2, b2_)
        )
        w_int = e0 * w0 + e1 * w1 + e2 * w2
        z_int = e0 * z0 + e1 * z1 + e2 * z2
        depth = z_int / w_int
        inside &= (w_int > 0) & (depth >= 0.0) & (depth <= 1.0)
        if pass_class is not None:
            inside &= cls == pass_class

        win = inside & (depth > depth_o[0])
        if use_max_depth:
            # depth-peeling bound: fragments at/above the rejected layer
            # stay excluded (render/frame.py::_rasterize_clip_peeled)
            win &= depth < max_depth_ref[0]

        d_sum = e0 + e1 + e2
        inv_d = 1.0 / d_sum
        a_sum = a0 + a1 + a2
        b_sum = b0 + b1_ + b2_
        inv_d2x = inv_d * inv_d * (2.0 / width)
        inv_d2y = inv_d * inv_d * (2.0 / height)

        def store(out_ref, val):
            out_ref[0] = jnp.where(win, val, out_ref[0])

        # 8 attribute channels: v0 at 16.., v1 at 24.., v2 at 32..
        attr_outs = (px_o, py_o, pz_o, nx_o, ny_o, nz_o, u_o, v_o)
        dx_outs = (dpxx_o, dpxy_o, dpxz_o, None, None, None, duxu_o, duxv_o)
        dy_outs = (dpyx_o, dpyy_o, dpyz_o, None, None, None, duyu_o, duyv_o)
        for k in range(8):
            if attr_outs[k] is None and dx_outs[k] is None:
                continue
            A0, A1, A2 = rec(16 + k), rec(24 + k), rec(32 + k)
            n_attr = e0 * A0 + e1 * A1 + e2 * A2
            if attr_outs[k] is not None:
                store(attr_outs[k], n_attr * inv_d)
            if dx_outs[k] is not None:
                na = a0 * A0 + a1 * A1 + a2 * A2
                nb = b0 * A0 + b1_ * A1 + b2_ * A2
                store(dx_outs[k], (na * d_sum - n_attr * a_sum) * inv_d2x)
                store(dy_outs[k], (nb * d_sum - n_attr * b_sum) * inv_d2y)

        store(tri_o, tri)
        store(mat_o, rec(40).astype(jnp.int32))
        store(scale_o, rec(41))
        # depth LAST (the win mask reads depth_o)
        store(depth_o, depth)

    def big_body(j, _):
        record_body(
            big_payload_ref, j // RECS_PER_ROW, (j % RECS_PER_ROW) * REC_F32
        )
        return 0

    jax.lax.fori_loop(0, big_count_ref[0], big_body, 0)

    row0 = start // RECS_PER_ROW
    rem = start - row0 * RECS_PER_ROW
    total = rem + count
    chunk_recs = CHUNK_ROWS * RECS_PER_ROW
    num_chunks = pl.cdiv(total, chunk_recs)

    def get_dma(slot, ci):
        return pltpu.make_async_copy(
            payload_hbm.at[pl.ds(row0 + ci * CHUNK_ROWS, CHUNK_ROWS)],
            chunk_ref.at[slot],
            sems.at[slot],
        )

    @pl.when(num_chunks > 0)
    def _():
        get_dma(0, 0).start()

    def chunk_body(ci, _):
        slot = ci % 2

        @pl.when(ci + 1 < num_chunks)
        def _():
            get_dma(1 - slot, ci + 1).start()

        get_dma(slot, ci).wait()
        l_lo = jnp.maximum(rem - ci * chunk_recs, 0)
        l_hi = jnp.minimum(total - ci * chunk_recs, chunk_recs)

        def rec_loop(l, _):
            record_body(
                chunk_ref.at[slot], l // RECS_PER_ROW,
                (l % RECS_PER_ROW) * REC_F32,
            )
            return 0

        jax.lax.fori_loop(l_lo, l_hi, rec_loop, 0)
        return 0

    jax.lax.fori_loop(0, num_chunks, chunk_body, 0)


def rasterize_gbuffer_tiles(
    payload: tuple,  # (payload_rows, big_rows) from gather_gbuf_payload
    tile_ids: jnp.ndarray,  # [K] global tile ids handled by this call
    tile_start: jnp.ndarray,  # [num_classes * n_tiles_global + 1] (GLOBAL)
    big_count: jnp.ndarray,  # [] int32 (already clamped)
    width: int,
    height: int,
    init_depth_tiles: jnp.ndarray | None = None,  # [K, TILE_H, TILE_W]
    max_depth_tiles: jnp.ndarray | None = None,  # [K, TILE_H, TILE_W] peel bound
    pass_class: int | None = None,
    interpret: bool = False,
    n_tiles_global: int | None = None,  # bins' tile-grid size when padded
    # beyond the frame (the sharded path bins over a band-aligned grid)
    pos_derivs: bool = True,
    uv_channels: bool = True,
) -> dict:
    """Run the G-buffer kernel over an arbitrary tile list (the building
    block shared by the single-chip frame, the row-band sharded path, and
    the alpha-clip peeling re-races). ``tile_start`` is the GLOBAL bins
    array; the per-tile class count is inferred from its length. Returns
    {channel: [K, TILE_H, TILE_W]} (no dpos channels when
    ``pos_derivs=False`` — see DPOS_CHANNELS)."""
    k_tiles = tile_ids.shape[0]
    tiles_x = -(-width // TILE_W)
    tiles_y = -(-height // TILE_H)
    if n_tiles_global is None:
        n_tiles_global = tiles_x * tiles_y
    num_classes = (tile_start.shape[0] - 1) // n_tiles_global
    payload_rows, big_rows = payload
    init_tiles = (
        init_depth_tiles
        if init_depth_tiles is not None
        else jnp.zeros((k_tiles, TILE_H, TILE_W), jnp.float32)
    )
    use_max_depth = max_depth_tiles is not None
    maxd_tiles = (
        max_depth_tiles
        if use_max_depth
        else jnp.zeros((1, TILE_H, TILE_W), jnp.float32)
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(k_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                big_rows.shape, lambda t, *_: (0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec((1, TILE_H, TILE_W), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, TILE_H, TILE_W),
                (lambda t, *_: (t, 0, 0)) if use_max_depth else (lambda t, *_: (0, 0, 0)),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec((1, TILE_H, TILE_W), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(len(active_channels(pos_derivs, uv_channels)))
        ],
        scratch_shapes=[
            pltpu.SMEM((2, CHUNK_ROWS, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out_shapes = [
        jax.ShapeDtypeStruct(
            (k_tiles, TILE_H, TILE_W),
            jnp.int32 if name in ("tri", "material") else jnp.float32,
        )
        for name in active_channels(pos_derivs, uv_channels)
    ]
    kernel = functools.partial(
        _kernel, tiles_x=tiles_x, width=width, height=height,
        pass_class=pass_class, num_classes=num_classes,
        use_max_depth=use_max_depth, pos_derivs=pos_derivs,
        uv_channels=uv_channels,
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        interpret=interpret,
    )(
        tile_start.astype(jnp.int32),
        tile_ids,
        big_count[None] if big_count.ndim == 0 else big_count,
        payload_rows,
        big_rows,
        init_tiles,
        maxd_tiles,
    )
    return {
        name: a
        for name, a in zip(active_channels(pos_derivs, uv_channels), outs)
    }


def rasterize_gbuffer_pallas(
    records: jnp.ndarray,  # [T, 64] from pack_gbuf_payload
    bins: TileBins,
    width: int,
    height: int,
    init_depth: jnp.ndarray | None = None,
    pass_class: int | None = None,
    payload=None,  # optional precomputed (rows, big_rows)
    interpret: bool = False,
    pos_derivs: bool = True,
    uv_channels: bool = True,
):
    """Full-frame G-buffer raster. Returns a render.gbuffer.GBuffer."""
    from transmission_renderer_tpu.ops.raster import tile_image, untile_image

    tiles_x = -(-width // TILE_W)
    tiles_y = -(-height // TILE_H)
    n_tiles = tiles_x * tiles_y
    tile_ids = jnp.arange(n_tiles, dtype=jnp.int32)
    payload = (
        payload if payload is not None else gather_gbuf_payload(records, bins)
    )
    init_tiles = (
        tile_image(init_depth, TILE_W, TILE_H) if init_depth is not None else None
    )
    n_big_recs = bins.big_tri_ids.shape[0]
    # a length-1 all(-1) big list means big tris ride the sorted stream
    big_count = (
        jnp.zeros((), jnp.int32)
        if n_big_recs <= 1
        else jnp.minimum(bins.big_tri_count, n_big_recs).astype(jnp.int32)
    )

    raw = rasterize_gbuffer_tiles(
        payload, tile_ids, bins.tile_start, big_count, width, height,
        init_depth_tiles=init_tiles, pass_class=pass_class,
        interpret=interpret, pos_derivs=pos_derivs, uv_channels=uv_channels,
    )

    def ut(a):
        return untile_image(a, tiles_x, tiles_y, TILE_W, TILE_H, width, height)

    ch = {name: ut(a) for name, a in raw.items()}
    return gbuffer_from_channels(ch)


def gbuffer_from_channels(ch: dict):
    """Assemble a render.gbuffer.GBuffer from untiled channel images.
    Missing dpos/uv channels (``pos_derivs=False`` / ``uv_channels=False``
    passes) become zeros — exactly the kernel's cleared value, and unread
    by shading when no material uses the corresponding texture slots."""
    from transmission_renderer_tpu.render.gbuffer import GBuffer

    zero = jnp.zeros_like(ch["depth"])
    for grp in (DPOS_CHANNELS, UV_CHANNELS):
        if grp[0] not in ch:
            ch = {**ch, **{name: zero for name in grp}}
    valid = ch["tri"] >= 0
    vmask = valid[..., None]
    stack3 = lambda a, b, c: jnp.stack([ch[a], ch[b], ch[c]], axis=-1)
    stack2 = lambda a, b: jnp.stack([ch[a], ch[b]], axis=-1)
    return GBuffer(
        valid=valid,
        depth=ch["depth"],
        position=jnp.where(vmask, stack3("pos_x", "pos_y", "pos_z"), 0.0),
        normal=jnp.where(
            vmask, stack3("nrm_x", "nrm_y", "nrm_z"),
            jnp.array([0.0, 0.0, 1.0]),
        ),
        uv=jnp.where(vmask, stack2("uv_u", "uv_v"), 0.0),
        duv_dx=jnp.where(vmask, stack2("duvdx_u", "duvdx_v"), 0.0),
        duv_dy=jnp.where(vmask, stack2("duvdy_u", "duvdy_v"), 0.0),
        dpos_dx=jnp.where(vmask, stack3("dposdx_x", "dposdx_y", "dposdx_z"), 0.0),
        dpos_dy=jnp.where(vmask, stack3("dposdy_x", "dposdy_y", "dposdy_z"), 0.0),
        material_id=jnp.where(valid, ch["material"], 0),
        model_scale=jnp.where(valid, ch["scale"], 1.0),
        tri_id=ch["tri"],
    )
