"""Pallas TPU rasterisation kernel.

The pure-JAX raster (ops/raster.py) vmaps a dynamically-bounded loop over
tiles; under vmap that batches to a single while_loop whose trip count is
the *maximum* bin size over all tiles — every tile pays for the worst
tile. This kernel gives each tile its own trip count (scalar-prefetched
bin offsets), the standard GPU-style binned-raster shape mapped to TPU:

  grid = (n_tiles,), one program per 8x128 pixel tile;
  per-tile triangle records are contiguous in HBM (sorted by tile, the
  payload gathered at bin time), streamed into SMEM in chunks (scalar memory — record fields broadcast into vector ops) with a
  manual double-buffered DMA;
  per record: 9 edge coefficients broadcast against the tile's pixel
  coordinates (pure VPU work), reversed-Z GREATER depth race carried in
  VMEM scratch.

Record layout: 16 f32 — adj row-major (9), z_clip (3), w_clip (3),
tri_id as float value (1). Records are packed 8 per 128-lane row so HBM
DMA slices stay lane-aligned (Mosaic requires 128-lane slicing).
Alpha-clip batches fall back to the JAX path (the flagship transmission
scenes have none). Unlike the JAX path's materialised bins, this kernel
has NO per-tile triangle cap.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from transmission_renderer_tpu.ops.raster import TileBins, TriangleSetup

TILE_H = 8
TILE_W = 128
REC_F32 = 16  # floats per record
RECS_PER_ROW = 128 // REC_F32  # 8
CHUNK_ROWS = 16  # rows DMA'd per step -> 128 records, 8 KB


# Draw-class flag folded into the id slot: transmissive records carry
# id + CLASS_BIT so both passes can share ONE binning sort and filter per
# record (ids < 2^24 stay exact in f32 either way).
CLASS_SHIFT = 22
CLASS_BIT = 1 << CLASS_SHIFT  # tri ids must stay below 2^22 (f32-exact
# encoding of tri + CLASS_BIT * class for classes 0..3)


def pack_payload(
    setup: TriangleSetup, class_flags: jnp.ndarray | None = None
) -> jnp.ndarray:
    """[T, 16] f32 records from triangle setup. ``class_flags`` ([T] bool,
    True = transmissive bucket) selects the record's draw class."""
    t = setup.adj.shape[0]
    # ids stored as float *values* (exact below 2^25) — a bitcast would
    # produce denormals that TPU float paths flush to zero.
    assert t <= CLASS_BIT, f"{t} records exceed the 2^22 tri-id field"
    ids = jnp.arange(t, dtype=jnp.int32)
    if class_flags is not None:
        ids = ids + CLASS_BIT * class_flags.astype(jnp.int32)
    tri_ids = ids.astype(jnp.float32)
    return jnp.concatenate(
        [
            setup.adj.reshape(t, 9),
            setup.z_clip,
            setup.w_clip,
            tri_ids[:, None],
        ],
        axis=1,
    )


def _pack_rows(records: jnp.ndarray, extra_row_pad: int = 0) -> jnp.ndarray:
    """[N, 16] -> [ceil(N/8) (+pad), 128] lane-aligned rows."""
    n = records.shape[0]
    pad_recs = (-n) % RECS_PER_ROW
    records = jnp.pad(records, ((0, pad_recs), (0, 0)))
    rows = records.reshape(-1, 128)
    if extra_row_pad:
        rows = jnp.pad(rows, ((0, extra_row_pad), (0, 0)))
    return rows


def gather_bin_payload(
    setup: TriangleSetup, bins: TileBins, class_flags: jnp.ndarray | None = None
):
    """(payload_rows [R, 128], big_rows [Rb, 128]). Invalid/big slots get a
    degenerate record (never wins coverage)."""
    payload = pack_payload(setup, class_flags)
    # degenerate record: all-zero edges never pass coverage
    degenerate = jnp.zeros((1, REC_F32), jnp.float32).at[0, 15].set(-1.0)
    pay_ext = jnp.concatenate([payload, degenerate], axis=0)
    t = payload.shape[0]
    sorted_ids = jnp.where(bins.sorted_tri_ids >= 0, bins.sorted_tri_ids, t)
    big_ids = jnp.where(bins.big_tri_ids >= 0, bins.big_tri_ids, t)
    payload_rows = _pack_rows(pay_ext[sorted_ids], extra_row_pad=CHUNK_ROWS)
    big_rows = _pack_rows(pay_ext[big_ids])
    return payload_rows, big_rows


def _raster_kernel(
    # scalar prefetch
    tile_start_ref,  # i32[n_tiles + 1]
    tile_ids_ref,  # i32[n_tiles] global tile index (for band offsets)
    big_count_ref,  # i32[1]
    # inputs
    payload_hbm,  # f32[R, 128] in ANY/HBM
    big_payload_ref,  # f32[Rb, 128] in SMEM (replicated per tile)
    init_depth_ref,  # f32[1, TILE_H, TILE_W] in VMEM (per-tile block)
    # outputs (per-tile blocks)
    tri_out_ref,
    depth_out_ref,
    b1_out_ref,
    b2_out_ref,
    # scratch
    chunk_ref,  # f32[2, CHUNK_ROWS, 128] SMEM double buffer
    best_depth,
    best_tri,
    best_b1,
    best_b2,
    sems,  # DMA semaphores [2]
    *,
    tiles_x: int,
    width: int,
    height: int,
    pass_class: int | None = None,
):
    t = pl.program_id(0)
    tile_id = tile_ids_ref[t]
    ty = tile_id // tiles_x
    tx = tile_id % tiles_x

    # pixel-centre NDC coordinates for this tile (integer iota, then cast)
    rows_f = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0).astype(
        jnp.float32
    )
    cols_f = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1).astype(
        jnp.float32
    )
    px = tx.astype(jnp.float32) * TILE_W + cols_f + 0.5
    py = ty.astype(jnp.float32) * TILE_H + rows_f + 0.5
    nx = px * (2.0 / width) - 1.0
    ny = py * (2.0 / height) - 1.0

    best_depth[...] = init_depth_ref[0]
    best_tri[...] = jnp.full((TILE_H, TILE_W), -1, jnp.int32)
    best_b1[...] = jnp.zeros((TILE_H, TILE_W), jnp.float32)
    best_b2[...] = jnp.zeros((TILE_H, TILE_W), jnp.float32)

    start = tile_start_ref[t]
    count = tile_start_ref[t + 1] - start

    def record_body(ref, row, off):
        """Rasterise one record (16 floats at [row, off:off+16] of an SMEM
        ref) into the scratch race. SMEM scalar loads support the dynamic
        indices (VMEM lane-dynamic extracts do not lower on TPU).

        KEEP IN SYNC with raster_pallas_gbuf.py::record_body — the
        decode / edge-function / top-left-rule / depth-race core is
        identical by contract; a raster-rule fix here MUST be applied
        there too (both kernels are pinned to the same JAX oracle by
        exact tri-id tests, which catches divergence)."""
        rec = lambda k: ref[row, off + k]
        a0, b0, c0 = rec(0), rec(1), rec(2)
        a1, b1_, c1 = rec(3), rec(4), rec(5)
        a2, b2_, c2 = rec(6), rec(7), rec(8)
        z0, z1, z2 = rec(9), rec(10), rec(11)
        w0, w1, w2 = rec(12), rec(13), rec(14)
        tri_enc = rec(15).astype(jnp.int32)
        cls = tri_enc >> CLASS_SHIFT
        is_trans = (cls & 1) == 1
        tri = tri_enc & (CLASS_BIT - 1)
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
            inside &= is_trans == (pass_class == 1)

        esum = e0 + e1 + e2
        inv = 1.0 / esum
        win = inside & (depth > best_depth[...])
        best_tri[...] = jnp.where(win, tri, best_tri[...])
        best_b1[...] = jnp.where(win, e1 * inv, best_b1[...])
        best_b2[...] = jnp.where(win, e2 * inv, best_b2[...])
        best_depth[...] = jnp.where(win, depth, best_depth[...])

    # ---- big-triangle list (small, in SMEM) --------------------------------
    def big_body(j, _):
        record_body(
            big_payload_ref, j // RECS_PER_ROW, (j % RECS_PER_ROW) * REC_F32
        )
        return 0

    jax.lax.fori_loop(0, big_count_ref[0], big_body, 0)

    # ---- binned records: chunked double-buffered DMA ------------------------
    # records are packed 8/row; a tile's records may start mid-row.
    row0 = start // RECS_PER_ROW
    rem = start - row0 * RECS_PER_ROW
    total = rem + count  # records covered from row0*8
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
                chunk_ref.at[slot], l // RECS_PER_ROW, (l % RECS_PER_ROW) * REC_F32
            )
            return 0

        jax.lax.fori_loop(l_lo, l_hi, rec_loop, 0)
        return 0

    jax.lax.fori_loop(0, num_chunks, chunk_body, 0)

    tri_out_ref[0] = best_tri[...]
    depth_out_ref[0] = best_depth[...]
    b1_out_ref[0] = best_b1[...]
    b2_out_ref[0] = best_b2[...]


def rasterize_pallas_tiles(
    setup: TriangleSetup,
    bins: TileBins,
    tile_ids: jnp.ndarray,  # [K] global tile indices handled by this call
    tile_start: jnp.ndarray,  # [K + 1] i32 into the sorted payload
    width: int,
    height: int,
    tiles_x: int,
    init_depth_tiles: jnp.ndarray | None = None,  # [K, TILE_H, TILE_W]
    interpret: bool = False,
    pass_class: int | None = None,
    payload: tuple[jnp.ndarray, jnp.ndarray] | None = None,
):
    """Run the kernel over a tile list. Returns (tri_id, depth, b1, b2),
    each [K, TILE_H, TILE_W].

    ``pass_class`` filters records by draw class (0 = opaque buckets,
    1 = transmissive; None = no filter). ``payload`` injects the
    (payload_rows, big_rows) pair so two passes can share one gather."""
    n_tiles = tile_ids.shape[0]
    payload_rows, big_rows = (
        payload if payload is not None else gather_bin_payload(setup, bins)
    )

    if init_depth_tiles is None:
        init_depth_tiles = jnp.zeros((n_tiles, TILE_H, TILE_W), jnp.float32)

    n_big_recs = bins.big_tri_ids.shape[0]
    # a length-1 all(-1) big list means big tris ride the sorted stream
    big_count = (
        jnp.zeros((1,), jnp.int32)
        if n_big_recs <= 1
        else jnp.minimum(bins.big_tri_count, n_big_recs).astype(jnp.int32)[None]
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # payload stays in HBM
            pl.BlockSpec(
                big_rows.shape, lambda t, *_: (0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (1, TILE_H, TILE_W), lambda t, *_: (t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec((1, TILE_H, TILE_W), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(4)
        ],
        scratch_shapes=[
            pltpu.SMEM((2, CHUNK_ROWS, 128), jnp.float32),
            pltpu.VMEM((TILE_H, TILE_W), jnp.float32),
            pltpu.VMEM((TILE_H, TILE_W), jnp.int32),
            pltpu.VMEM((TILE_H, TILE_W), jnp.float32),
            pltpu.VMEM((TILE_H, TILE_W), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    kernel = functools.partial(
        _raster_kernel, tiles_x=tiles_x, width=width, height=height,
        pass_class=pass_class,
    )
    out_shapes = [
        jax.ShapeDtypeStruct((n_tiles, TILE_H, TILE_W), jnp.int32),
        jax.ShapeDtypeStruct((n_tiles, TILE_H, TILE_W), jnp.float32),
        jax.ShapeDtypeStruct((n_tiles, TILE_H, TILE_W), jnp.float32),
        jax.ShapeDtypeStruct((n_tiles, TILE_H, TILE_W), jnp.float32),
    ]
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        interpret=interpret,
    )(
        tile_start.astype(jnp.int32),
        tile_ids.astype(jnp.int32),
        big_count,
        payload_rows,
        big_rows,
        init_depth_tiles,
    )


def rasterize_pallas(
    setup: TriangleSetup,
    bins: TileBins,
    width: int,
    height: int,
    init_depth: jnp.ndarray | None = None,
    interpret: bool = False,
    pass_class: int | None = None,
    payload: tuple[jnp.ndarray, jnp.ndarray] | None = None,
):
    """Full-frame Pallas raster -> VisibilityBuffer (tile size fixed at
    8x128; config.tile_w/tile_h must match)."""
    from transmission_renderer_tpu.ops.raster import (
        VisibilityBuffer,
        tile_image,
        untile_image,
    )

    tiles_x = -(-width // TILE_W)
    tiles_y = -(-height // TILE_H)
    n_tiles = tiles_x * tiles_y
    tile_ids = jnp.arange(n_tiles, dtype=jnp.int32)
    init_tiles = (
        tile_image(init_depth, TILE_W, TILE_H) if init_depth is not None else None
    )
    tri, depth, b1, b2 = rasterize_pallas_tiles(
        setup, bins, tile_ids, bins.tile_start, width, height, tiles_x,
        init_depth_tiles=init_tiles, interpret=interpret,
        pass_class=pass_class, payload=payload,
    )

    def untile(a):
        return untile_image(a, tiles_x, tiles_y, TILE_W, TILE_H, width, height)

    return VisibilityBuffer(
        tri_id=untile(tri),
        depth=untile(depth),
        bary=jnp.stack([untile(b1), untile(b2)], axis=-1),
    )
