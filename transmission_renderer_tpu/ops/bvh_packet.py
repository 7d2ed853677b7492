"""Pallas PACKET traversal for occlusion (shadow) rays.

VERDICT r3 #2: the XLA bitstack walk's cost is its per-LANE in-loop
gather (~3-12 ns/lane/pop) plus batched-while bookkeeping — measured
~47 ns/lane/pop, ~300x off VPU peak, 6.9 s/frame for the dragon's 6.2M
shadow rays. Shadow rays from adjacent pixels toward one light are
highly coherent, so this kernel walks 128-ray PACKETS: one scalar
dynamic-slice row fetch per packet pop (VMEM-resident BVH — no gather at
all), with all 128 lanes testing the fetched 8 child AABBs / 16 leaf
triangles as full-width VPU ops. Packets pay the UNION of their rays'
pops (~1.5-2x a single ray for coherent shadows) but each pop costs
~1000 dense vector ops instead of a multi-microsecond gather round.

Scope: any-hit occlusion with no alpha test (exactly the frame's shadow
rays, shader/src/lighting.rs:97-125). Hit/miss is a pure existence
predicate — independent of traversal order — so results are bit-identical
to ops/bvh.py::trace_rays(any_hit=True) by construction (same slab test,
same Moller-Trumbore, same ragged-tail guards); pinned by
tests/test_bvh_packet.py. Closest-hit / alpha-tested walks (the AS-debug
caster) stay on the XLA walk.

Layout: 8 packets per [8, 128] register tile (sublane = packet, lane =
ray); per-packet traversal state (bitstack trail words, node index,
level) lives in while-carry SCALARS. The whole unified node+leaf table
sits in VMEM (~5.5 MB for the 134k-tri dragon); scenes whose table
exceeds the VMEM budget fall back to the XLA walk.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from transmission_renderer_tpu.ops.bvh import BVH, LEAF_TRIS, WIDE

PACKET = 128  # rays per packet (one lane row)
PACKETS_PER_TILE = 8  # packets per [8, 128] register tile
# packet-tiles per grid step (amortises grid-step overhead; the group
# loop walks them sequentially inside one kernel invocation)
GROUPS_PER_STEP = int(os.environ.get("TRTPU_PACKET_GROUPS", "16"))
# 1 (default): the leaf/inner halves run under a per-tile vote
# (lax.cond) — most pops are inner pops and skip the ~720-op leaf half.
# 0: straight-line both halves every pop (the v1 behaviour; compile-safe
# fallback if a Mosaic version rejects the cond's layout join).
PACKET_GATE = os.environ.get("TRTPU_PACKET_GATE", "1") != "0"
# VMEM budget for the unified table (leave room for ray planes + rows)
TABLE_VMEM_BUDGET = int(os.environ.get("TRTPU_PACKET_TABLE_BYTES",
                                       str(9 * 1024 * 1024)))


def packet_walk_table(bvh: BVH, tri_vertices, positions):
    """Unified [R + L, LEAF_TRIS*9] f32 table: node rows (WIDE*6 cols
    used) then leaf triangle rows — the packet kernel's VMEM payload."""
    tri_xyz = positions[tri_vertices]  # [T, 3, 3]
    leaf_xyz = tri_xyz[bvh.leaf_tri.reshape(-1)].reshape(
        bvh.num_leaves, LEAF_TRIS * 9
    )
    width = LEAF_TRIS * 9
    nodes = jnp.pad(bvh.node_boxes, ((0, 0), (0, width - bvh.node_boxes.shape[1])))
    return jnp.concatenate([nodes, leaf_xyz], axis=0)


def packet_walk_supported(bvh: BVH) -> bool:
    rows = bvh.node_boxes.shape[0] + bvh.num_leaves
    return rows * LEAF_TRIS * 9 * 4 <= TABLE_VMEM_BUDGET


def _make_kernel(bvh: BVH, t_min: float, n_groups_step: int):
    D = bvh.num_levels
    R = int(bvh.node_boxes.shape[0])
    num_leaves = bvh.num_leaves
    num_tris = bvh.num_tris
    level_offsets = bvh.level_offsets
    children_below = [bvh.children_below(k) for k in range(D)]
    root_code = D
    root_mask = 1 << ((root_code & 3) * 8)
    P8 = PACKETS_PER_TILE

    def kernel(table_ref, ox, oy, oz, ivx, ivy, ivz, dx, dy, dz, tmax,
               out_ref):
        def group_body(g, _):
            r0 = pl.multiple_of(g * P8, P8)
            o = (ox[pl.ds(r0, P8), :], oy[pl.ds(r0, P8), :],
                 oz[pl.ds(r0, P8), :])
            iv = (ivx[pl.ds(r0, P8), :], ivy[pl.ds(r0, P8), :],
                  ivz[pl.ds(r0, P8), :])
            d = (dx[pl.ds(r0, P8), :], dy[pl.ds(r0, P8), :],
                 dz[pl.ds(r0, P8), :])
            tm = tmax[pl.ds(r0, P8), :]
            live = tm > t_min
            # hit/done ride the while carry as int32: Mosaic cannot
            # legalize an i1 vector (or reliably i1 scalars) in an
            # scf.while yield (observed 'failed to legalize scf.yield'
            # with a vector<8x128xi1> operand on v5e).
            # packet done when no live unhit lane remains (dead packets
            # start done — mirrors trace_rays' dead-on-arrival flag)
            alive_ct = jnp.sum(live.astype(jnp.int32), axis=1,
                               keepdims=True)  # [8, 1]

            # Per-packet traversal state as LANE-REPLICATED [P8, PACKET]
            # vectors (sublane = packet, every lane carries the packet's
            # value): the bitstack advance and the trail push then run
            # as ~50 vector ops per pop instead of ~50 SEQUENTIAL scalar
            # ops x 8 packets — the v1 kernel's scalar epilogue measured
            # ~40% of the whole walk (1.56 us vs ~0.9 us of modelled VPU
            # work per tile-iteration). Full-width rather than [P8, 1]
            # columns because Mosaic cannot relayout a {0,*} sublane
            # vector across the while-loop carry boundary ("Invalid
            # relayout ... replicated in destination but not in source",
            # v5e); a [P8, PACKET] op costs the same one VPU register op.
            # Only the row FETCH needs scalars (a dynamic slice per
            # packet); those extract lane 0 right before use.
            # Derive every lane-replicated carry init from a [P8, 1]
            # zero COLUMN (not jnp.full splats): Mosaic assigns splats
            # the fully-replicated {*,*} layout but the body yields
            # lane-replicated {0,*} values, and the {0,*} -> {*,*}
            # relayout at the carry join is invalid ("replicated in
            # destination but not in source", v5e). hit, conversely, is
            # genuinely lane-VARYING, so its init derives from the dense
            # tm plane to start {0,0} like the body's yield.
            # min(alive_ct, 0) == 0 for the nonneg count, but is not
            # constant-foldable (x * 0 IS, and folding back to a splat
            # would resurrect the invalid {*,*} join)
            zcol = jnp.broadcast_to(
                jnp.minimum(alive_ct, 0), (P8, PACKET)
            )
            lvl0 = zcol + (root_code + 1)
            idx0 = zcol
            tlo0 = zcol + (root_mask if root_code < 4 else 0)
            thi0 = zcol + (root_mask if root_code >= 4 else 0)
            done0 = zcol + (alive_ct == 0).astype(jnp.int32)
            hit0 = (tm * 0.0).astype(jnp.int32)

            def shl_byte(v, byte):
                """v << (byte * 8) with byte in {0,1,2,3} — where-chain
                (variable-amount vector shifts don't legalize on all
                Mosaic versions)."""
                out = v
                for b in (1, 2, 3):
                    out = jnp.where(byte == b, v << (8 * b), out)
                return out

            def cond(carry):
                done = carry[4]
                # done is lane-replicated 0/1; any packet still walking?
                return jnp.min(done) == 0

            def body(carry):
                lvl, idx, tlo, thi, done, hit = carry

                # ---- bitstack advance (ops/bvh.py::pop), vectorized ----
                dn = done != 0
                empty = (tlo == 0) & (thi == 0)
                have_lo = tlo != 0
                wrd = jnp.where(have_lo, tlo, thi)
                b0 = wrd & 0xFF
                b1 = (wrd >> 8) & 0xFF
                b2 = (wrd >> 16) & 0xFF
                b3 = (wrd >> 24) & 0xFF
                byte = jnp.where(
                    b0 != 0, 0,
                    jnp.where(b1 != 0, 1, jnp.where(b2 != 0, 2, 3)),
                )
                mask = jnp.where(
                    b0 != 0, b0,
                    jnp.where(b1 != 0, b1, jnp.where(b2 != 0, b2, b3)),
                )
                bit = mask & -mask
                j = jnp.zeros((P8, PACKET), jnp.int32)
                for kk in range(1, WIDE):
                    j = jnp.where(bit == (1 << kk), kk, j)
                clear = shl_byte(bit, byte)
                tlo = jnp.where(have_lo, tlo ^ clear, tlo)
                thi = jnp.where(have_lo | empty, thi, thi ^ clear)
                code = byte + jnp.where(have_lo, 0, 4)
                # ancestor at +k levels = idx >> 3k; shift amount
                # 3 * (code + 1 - lvl) in [0, 3D] — where-chain over the
                # D + 2 possible values
                sh = jnp.maximum(3 * (code + 1 - lvl), 0)
                anc = idx
                for k in range(1, D + 2):
                    anc = jnp.where(sh == 3 * k, idx >> (3 * k), anc)
                idx = jnp.where(empty, idx, anc * WIDE + j)
                lvl = jnp.where(empty, lvl, code)
                dn = dn | empty
                done = dn.astype(jnp.int32)
                is_leaf = (lvl == 0) & jnp.logical_not(dn)

                # ---- unified row index ([P8, 1] ints -> 8 scalar
                # dynamic-slice fetches) ----
                li = jnp.clip(idx, 0, num_leaves - 1)
                clvl = jnp.maximum(lvl - 1, 0)
                row_off = jnp.full((P8, PACKET), level_offsets[0],
                                   jnp.int32)
                n_below = jnp.full((P8, PACKET), children_below[0],
                                   jnp.int32)
                for k in range(1, D):
                    row_off = jnp.where(clvl == k, level_offsets[k], row_off)
                    n_below = jnp.where(clvl == k, children_below[k], n_below)
                uidx = jnp.where(
                    is_leaf, R + li, jnp.clip(row_off + idx, 0, R - 1)
                )
                rows = [
                    table_ref[pl.ds(uidx[p, 0], 1), :] for p in range(P8)
                ]
                rs = jnp.concatenate(rows, axis=0)  # [8, 144]

                done_v = done > 0
                is_inner_v = jnp.logical_not(is_leaf) & jnp.logical_not(
                    done_v
                )
                hit_b = hit != 0
                want = live & jnp.logical_not(hit_b)  # still searching

                # ---- leaf half: LEAF_TRIS Moller-Trumbore tests, gated
                # on a per-tile vote (most pops are inner pops — the
                # ~720-op leaf half at LEAF_TRIS=16 is ~85% of the v1
                # kernel's vector work and ran EVERY pop) ----
                def leaf_half():
                    leaf_hit = jnp.zeros((P8, PACKET), jnp.bool_)
                    for t in range(LEAF_TRIS):
                        base = t * 9

                        def col(c):
                            return rs[:, base + c : base + c + 1]

                        e1 = (col(3) - col(0), col(4) - col(1),
                              col(5) - col(2))
                        e2 = (col(6) - col(0), col(7) - col(1),
                              col(8) - col(2))
                        pv0 = d[1] * e2[2] - d[2] * e2[1]
                        pv1 = d[2] * e2[0] - d[0] * e2[2]
                        pv2 = d[0] * e2[1] - d[1] * e2[0]
                        det = e1[0] * pv0 + e1[1] * pv1 + e1[2] * pv2
                        inv_det = jnp.where(
                            jnp.abs(det) > 1e-12, 1.0 / det, 0.0
                        )
                        tv = (o[0] - col(0), o[1] - col(1), o[2] - col(2))
                        u = (tv[0] * pv0 + tv[1] * pv1 + tv[2] * pv2) * inv_det
                        qv0 = tv[1] * e1[2] - tv[2] * e1[1]
                        qv1 = tv[2] * e1[0] - tv[0] * e1[2]
                        qv2 = tv[0] * e1[1] - tv[1] * e1[0]
                        v = (d[0] * qv0 + d[1] * qv1 + d[2] * qv2) * inv_det
                        tt = (e2[0] * qv0 + e2[1] * qv1 + e2[2] * qv2) * inv_det
                        h = (
                            (jnp.abs(det) > 1e-12)
                            & (u >= 0.0)
                            & (v >= 0.0)
                            & (u + v <= 1.0)
                            & (tt > t_min)
                            & (tt < tm)
                        )
                        # ragged-tail guard (t-th tri of leaf li exists)
                        h = h & (li * LEAF_TRIS + t < num_tris)
                        leaf_hit = leaf_hit | h
                    return (leaf_hit & want & is_leaf).astype(jnp.int32)

                if PACKET_GATE:
                    any_leaf = jnp.sum(is_leaf.astype(jnp.int32)) > 0
                    # else-branch zero derives from the dense tm plane so
                    # both branches yield a dense {0,0} vector (a splat
                    # zero would force an invalid {*,*} -> dense join)
                    hit = hit | jax.lax.cond(
                        any_leaf, leaf_half,
                        lambda: (tm * 0.0).astype(jnp.int32),
                    )
                else:
                    hit = hit | leaf_half()

                # ---- inner half: WIDE slab tests + per-packet vote ----
                want2 = live & (hit == 0)

                def inner_half():
                    m8 = jnp.zeros((P8, PACKET), jnp.int32)
                    for c in range(WIDE):
                        base = c * 6

                        def bcol(k):
                            return rs[:, base + k : base + k + 1]

                        t00 = (bcol(0) - o[0]) * iv[0]
                        t10 = (bcol(3) - o[0]) * iv[0]
                        t01 = (bcol(1) - o[1]) * iv[1]
                        t11 = (bcol(4) - o[1]) * iv[1]
                        t02 = (bcol(2) - o[2]) * iv[2]
                        t12 = (bcol(5) - o[2]) * iv[2]
                        enter = jnp.maximum(
                            jnp.maximum(
                                jnp.minimum(t00, t10), jnp.minimum(t01, t11)
                            ),
                            jnp.minimum(t02, t12),
                        )
                        exit_ = jnp.minimum(
                            jnp.minimum(
                                jnp.maximum(t00, t10), jnp.maximum(t01, t11)
                            ),
                            jnp.maximum(t02, t12),
                        )
                        h8 = (
                            (enter <= exit_) & (exit_ >= 0.0) & (enter <= tm)
                            & want2 & is_inner_v
                            & (c < n_below - idx * WIDE)
                        )
                        m8 = m8 | jnp.where(
                            jnp.sum(h8.astype(jnp.int32), axis=1,
                                    keepdims=True) > 0,
                            jnp.int32(1) << c, 0,
                        )
                    return m8

                if PACKET_GATE:
                    any_inner = jnp.sum(is_inner_v.astype(jnp.int32)) > 0
                    m8 = jax.lax.cond(
                        any_inner, inner_half,
                        lambda: zcol + 0,
                    )
                else:
                    m8 = inner_half()

                # ---- vector epilogue: push child masks, settle done ----
                add = shl_byte(m8, clvl & 3)
                is_inner_push = (lvl > 0) & (done == 0)
                in_lo = clvl < 4
                tlo = jnp.where(is_inner_push & in_lo, tlo | add, tlo)
                thi = jnp.where(
                    is_inner_push & jnp.logical_not(in_lo), thi | add, thi
                )
                unhit = jnp.sum(want2.astype(jnp.int32), axis=1,
                                keepdims=True)
                done = done | (unhit == 0).astype(jnp.int32)
                return (lvl, idx, tlo, thi, done, hit)

            final = jax.lax.while_loop(
                cond, body, (lvl0, idx0, tlo0, thi0, done0, hit0)
            )
            out_ref[pl.ds(r0, P8), :] = (final[5] != 0).astype(jnp.float32)
            return 0

        jax.lax.fori_loop(0, n_groups_step, group_body, 0)

    return kernel


def trace_occlusion_packets(
    bvh: BVH,
    tri_vertices: jnp.ndarray,
    positions: jnp.ndarray,
    origins: jnp.ndarray,  # [..., 3]
    directions: jnp.ndarray,  # [..., 3]
    t_min: float = 0.001,
    t_max=10_000.0,
    interpret: bool = False,
) -> jnp.ndarray:
    """Any-hit occlusion -> hit bool [...]; bit-identical to
    trace_rays(any_hit=True, alpha_test_fn=None)."""
    shape = origins.shape[:-1]
    o = origins.reshape(-1, 3)
    d = directions.reshape(-1, 3)
    n = o.shape[0]
    t_max_arr = jnp.broadcast_to(
        jnp.asarray(t_max, jnp.float32), shape
    ).reshape(-1)
    inv_d = jnp.where(
        jnp.abs(d) > 1e-20, 1.0 / d, jnp.where(d < 0, -1e20, 1e20)
    )

    table = packet_walk_table(bvh, tri_vertices, positions)

    rays_per_step = GROUPS_PER_STEP * PACKETS_PER_TILE * PACKET
    n_pad = -(-max(n, 1) // rays_per_step) * rays_per_step
    pad = n_pad - n

    def plane(a, fill=0.0):
        a = jnp.pad(a, (0, pad), constant_values=fill)
        return a.reshape(-1, PACKET)

    planes = [
        plane(o[:, 0]), plane(o[:, 1]), plane(o[:, 2]),
        plane(inv_d[:, 0], 1e20), plane(inv_d[:, 1], 1e20),
        plane(inv_d[:, 2], 1e20),
        plane(d[:, 0], 1.0), plane(d[:, 1], 1.0), plane(d[:, 2], 1.0),
        plane(t_max_arr),  # padding rays: t_max 0 -> dead
    ]
    np_rows = planes[0].shape[0]
    rows_step = GROUPS_PER_STEP * PACKETS_PER_TILE

    kernel = _make_kernel(bvh, float(t_min), GROUPS_PER_STEP)
    row_spec = pl.BlockSpec(
        (rows_step, PACKET), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    hit_f = pl.pallas_call(
        kernel,
        grid=(np_rows // rows_step,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]
        + [row_spec] * len(planes),
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct((np_rows, PACKET), jnp.float32),
        interpret=interpret,
    )(table, *planes)
    return (hit_f.reshape(-1)[:n] > 0.5).reshape(shape)
