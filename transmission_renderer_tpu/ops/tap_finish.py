"""Pallas tap-finish kernel: consume raw gathered atlas rows in-register.

The material-tap pass (render/shading.py::bundle_tap_samples) is the
frame's biggest pass on the dragon flagship. Its XLA formulation pays,
PER trilinear tap level, on top of the unavoidable row gather:

  * a full-array layout transpose ({1,0} -> {0,1}) of the gathered
    bf16 [M, 128] rows, inserted by XLA because the narrow select/lerp
    consumers want pixel-in-lane layouts (measured 1.57 ms each at 2.07M
    pixels — the `optimization_barrier` copies in the r4 profile);
  * the sub-block select + f32 convert fusions ([M, 16] outputs);
  * [M, 4, 4] reshape fusions and ~13 materialised [M] predicate
    arrays for the `sub == k` compares.

Together ~9 of mat_tap's 16.9 profiled ms are post-gather layout work
(tools/scope_ops.py, dragon @1080p v5e). This kernel replaces all of it:
the two level gathers stay in XLA (their output feeds the kernel in its
NATURAL {1,0} layout — the transpose copies vanish), and the sub-block
select, bf16->f32 convert, bilinear lerp and mip-level blend happen on
VMEM-resident registers, writing only the 4*Lmax bundle-channel planes.

Kernel layout (the important trick): the gathered rows arrive pixel-in-
SUBLANE ([128 px, row_elems]); narrow per-pixel math wants pixel-in-LANE.
Each 128-pixel group's row tile is transposed ONCE in-kernel
([128, row_elems] -> [row_elems, 128], Mosaic lane/sublane transpose);
after that every op is full-width VPU work: the sub-block select is a
where-chain over [blkw, 128] sublane slices with [1, 128] lane masks,
the lerp runs on [4L, 128] registers, and each output channel row is
written straight to its [NB, 128] plane — no output transpose needed.

Exactness: reproduces ops/texture.py::sample_bundle_rows (fused=False,
trilinear) op for op — same select semantics, same f32 convert point,
same lerp order — pinned bit-exact by tests/test_tap_finish.py. The
reference counterpart is Vulkan trilinear sampler hardware invoked from
the fragment shader (shader/src/lighting.rs:261-301).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from transmission_renderer_tpu.ops.texture import (
    _class_geometry,
    _flat_row_index,
    _level_meta_from_rows,
    _tap_footprint,
)
from transmission_renderer_tpu.scene.textures import META_LAYERS_COL

# 128-pixel groups per grid step. VMEM per step ~= 2 levels x GROUPS x
# 128 x row_elems x 2 B (bf16 rows), double-buffered: GROUPS=8 at
# row_elems=128 is ~1 MB — far under the 16 MB budget, and enough rows
# per step to amortise grid overhead.
FINISH_GROUPS = int(os.environ.get("TRTPU_FINISH_GROUPS", "8"))


class PlanarBundle:
    """Bundle tap result as flat per-(layer, channel) [M] planes —
    avoids the [M, L, 4] stack/re-slice round trip between the finish
    kernel and the fused shade kernel's plane inputs."""

    __slots__ = ("chans", "n_layers")

    def __init__(self, chans: list, n_layers: int):
        assert len(chans) == 4 * n_layers
        self.chans = tuple(chans)
        self.n_layers = n_layers

    def stacked(self) -> jnp.ndarray:
        """[M, L, 4] view for XLA-path consumers."""
        m = self.chans[0].shape[0]
        return jnp.stack(self.chans, axis=-1).reshape(m, self.n_layers, 4)


def _lerp4_planes(acc, lc, fx, fy):
    """Bilinear lerp of a [16*lc, 128] selected block -> [4*lc, 128].

    Texel-major block layout (texel t, layer l, channel c at
    t*4*lc + 4*l + c — scene/textures.py); fx/fy are [1, 128] lane
    vectors. Same op order as ops/texture.py::_lerp4.
    """
    w = 4 * lc
    c00 = acc[0 * w : 1 * w, :]
    c10 = acc[1 * w : 2 * w, :]
    c01 = acc[2 * w : 3 * w, :]
    c11 = acc[3 * w : 4 * w, :]
    top = c00 + (c10 - c00) * fx
    bot = c01 + (c11 - c01) * fx
    return top + (bot - top) * fy


def _make_finish_kernel(classes: tuple, row_elems: int, n_groups: int,
                        two_levels: bool):
    l_max = max(classes)
    multi = len(classes) > 1

    def kernel(*refs):
        it = iter(refs)
        rows0_ref = next(it)  # [G*128, row_elems] bf16
        rows1_ref = next(it) if two_levels else None
        q0_ref = next(it)  # [G, 128] int32 virtual block index, level 0
        q1_ref = next(it) if two_levels else None
        fx0_ref = next(it)  # [G, 128] f32
        fy0_ref = next(it)
        fx1_ref = next(it) if two_levels else None
        fy1_ref = next(it) if two_levels else None
        frac_ref = next(it) if two_levels else None
        lay_ref = next(it) if multi else None
        outs = [next(it) for _ in range(4 * l_max)]

        for j in range(n_groups):
            def level(rows_ref, q_ref, fx_ref, fy_ref):
                gt = jnp.transpose(
                    rows_ref[128 * j : 128 * (j + 1), :]
                )  # [row_elems, 128] bf16, pixel-in-lane
                qidx = q_ref[j : j + 1, :]  # [1, 128] int32
                fx = fx_ref[j : j + 1, :]
                fy = fy_ref[j : j + 1, :]
                out = None
                for lc in classes:
                    g, _, blkw = _class_geometry(row_elems, lc)
                    sub = qidx & (g - 1)
                    acc = gt[0:blkw, :]
                    for k in range(1, g):
                        acc = jnp.where(
                            sub == k, gt[k * blkw : (k + 1) * blkw, :], acc
                        )
                    val = _lerp4_planes(acc.astype(jnp.float32), lc, fx, fy)
                    if lc < l_max:
                        # zero-fill absent layers to the bundle width
                        # (per-texel interleave already collapsed by the
                        # lerp: channel 4*l + c survives, l >= lc reads 0)
                        zeros = jnp.zeros((4 * (l_max - lc), 128), jnp.float32)
                        val = jnp.concatenate([val, zeros], axis=0)
                    if out is None:
                        out = val
                    else:
                        pick = lay_ref[j : j + 1, :] == lc
                        out = jnp.where(pick, val, out)
                return out  # [4*l_max, 128] f32

            v = level(rows0_ref, q0_ref, fx0_ref, fy0_ref)
            if two_levels:
                v1 = level(rows1_ref, q1_ref, fx1_ref, fy1_ref)
                frac = frac_ref[j : j + 1, :]
                v = v + (v1 - v) * frac
            for ch in range(4 * l_max):
                outs[ch][j : j + 1, :] = v[ch : ch + 1, :]

    return kernel


def finish_supported(quads: jnp.ndarray, m_pixels: int, fused: bool,
                     trilinear: bool) -> bool:
    """Static gate: flat pools, classic 2-gather trilinear, whole blocks."""
    return (
        quads.ndim == 2
        and trilinear
        and not fused
        and m_pixels % 128 == 0
        and quads.shape[-1] % 128 == 0
    )


def sample_bundle_planes(
    quads: jnp.ndarray,  # [R, row_elems] flat bf16/f32 pool
    rows: jnp.ndarray,  # [M, META_COLS] pre-gathered meta rows
    uv: jnp.ndarray,  # [M, 2]
    lod: jnp.ndarray,  # [M]
    wrap_mode: int,
    classes: tuple,
    interpret: bool = False,
) -> list:
    """sample_bundle_rows(fused=False, trilinear=True) with the
    post-gather work fused into the Pallas finish kernel. Returns the
    4*Lmax bundle channel planes as flat [M] f32 arrays ordered
    (layer, channel) — exactly the plane order the fused shade kernel
    consumes (render/shade_kernel.py::slot_sample)."""
    m = uv.shape[0]
    assert m % 128 == 0
    row_elems = quads.shape[-1]
    l_max = max(classes)
    nb = m // 128

    # The whole index chain (level meta selects + footprint math + flat
    # row index) runs on [nb, 128] 2-D shapes: at flat [M] / [M, 1]
    # shapes XLA lays the s32 select fusions out as T(1,128) —
    # 1 sublane per 8-sublane register, an 8x VPU waste that measured
    # 4.0 ms vs 1.26 ms for the identical math in 2-D (per-level
    # microbench, v5e; the in-frame mat_tap scope showed the same two
    # 2.09 ms compare_select fusions). The barrier pins the [nb, 128]
    # -> [M] flatten AFTER the compute so the relayout can't be hoisted
    # back into the chain (same trick as ops/raster.py's binning pin).
    rows2 = rows.reshape(nb, 128, rows.shape[-1])
    uv2 = uv.reshape(nb, 128, 2)
    layers_pix = (
        rows2[..., META_LAYERS_COL] if len(classes) > 1 else None
    )

    lod2 = jnp.maximum(lod.reshape(nb, 128), 0.0)
    l0 = jnp.floor(lod2).astype(jnp.int32)
    frac = lod2 - l0.astype(jnp.float32)

    def level_inputs(level):
        o, w, h = _level_meta_from_rows(rows2, level)
        qidx, fx, fy, _, _ = _tap_footprint(o, w, h, uv2, wrap_mode)
        row_idx = _flat_row_index(qidx, row_elems, classes, layers_pix)
        return qidx, fx, fy, jax.lax.optimization_barrier(row_idx)

    q0, fx0, fy0, r0 = level_inputs(l0)
    q1, fx1, fy1, r1 = level_inputs(l0 + 1)

    ng = min(FINISH_GROUPS, nb)
    nb_pad = -(-nb // ng) * ng
    pad_px = (nb_pad - nb) * 128

    def gather_rows(row_idx):
        # pad the INDEX stream (cheap) so the gather itself produces the
        # grid-aligned shape — padding the 0.5 GB gather output would copy
        row_idx = row_idx.reshape(m)
        if pad_px:
            row_idx = jnp.concatenate(
                [row_idx, jnp.zeros((pad_px,), row_idx.dtype)]
            )
        return quads[row_idx]  # [M_pad, row_elems], natural {1,0} layout

    def plane(a, dtype=jnp.float32):
        p = a.astype(dtype).reshape(nb, 128)
        if nb_pad != nb:
            p = jnp.pad(p, ((0, nb_pad - nb), (0, 0)))
        return p

    inputs = [gather_rows(r0), gather_rows(r1), plane(q0, jnp.int32),
              plane(q1, jnp.int32), plane(fx0), plane(fy0), plane(fx1),
              plane(fy1), plane(frac)]
    rows_spec = pl.BlockSpec(
        (ng * 128, row_elems), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    plane_spec = pl.BlockSpec(
        (ng, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    in_specs = [rows_spec, rows_spec] + [plane_spec] * 7
    if len(classes) > 1:
        inputs.append(plane(layers_pix, jnp.int32))
        in_specs.append(plane_spec)

    kernel = _make_finish_kernel(classes, row_elems, ng, two_levels=True)
    n_out = 4 * l_max
    outs = pl.pallas_call(
        kernel,
        grid=(nb_pad // ng,),
        in_specs=in_specs,
        out_specs=[plane_spec] * n_out,
        out_shape=[jax.ShapeDtypeStruct((nb_pad, 128), jnp.float32)] * n_out,
        interpret=interpret,
    )(*inputs)
    return [o[:nb].reshape(m) for o in outs]


def _transmission_fetch_kernel(n_groups: int, n_taps: int,
                               pyr_groups: tuple, lut_group: int):
    """Pallas kernel: pyramid fetch (n_taps tent-weighted quad-row taps
    — 2 static levels for small level sets, 2 dynamic bracketing taps
    for wide ones) + GGX LUT bilinear (1 quad row), consumed
    in-register -> 5 channel planes (t_rgb, brdf_ab). Same trick as the
    material tap-finish kernel above: the gathered rows arrive in their
    natural {1,0} layout, one in-kernel lane/sublane transpose per
    128-px group replaces the XLA path's optimization_barrier relayouts
    + [M, 4, 3] select/squeeze chains (measured ~2.4 of
    shade_transmission's 6.4 ms on the dragon)."""

    def kernel(*refs):
        it = iter(refs)
        tap_rows = [next(it) for _ in range(n_taps)]
        lrows_ref = next(it)
        tap_planes = [
            tuple(next(it) for _ in range(4)) for _ in range(n_taps)
        ]  # (sub, fx, fy, w) each
        lsub_ref, lfx_ref, lfy_ref = next(it), next(it), next(it)
        outs = list(it)

        for j in range(n_groups):
            def quad_tap(rows_ref, sub_ref, fx_ref, fy_ref, g, width):
                gt = jnp.transpose(
                    rows_ref[128 * j : 128 * (j + 1), :]
                )  # [g*width, 128]
                sub = sub_ref[j : j + 1, :]
                blk = gt[0:width, :]
                for k in range(1, g):
                    blk = jnp.where(
                        sub == k, gt[k * width : (k + 1) * width, :], blk
                    )
                c = width // 4
                c00 = blk[0 * c : 1 * c, :]
                c10 = blk[1 * c : 2 * c, :]
                c01 = blk[2 * c : 3 * c, :]
                c11 = blk[3 * c : 4 * c, :]
                fx = fx_ref[j : j + 1, :]
                fy = fy_ref[j : j + 1, :]
                top = c00 + (c10 - c00) * fx
                bot = c01 + (c11 - c01) * fx
                return top + (bot - top) * fy  # [c, 128]

            v = None
            for t in range(n_taps):
                sub_r, fx_r, fy_r, w_r = tap_planes[t]
                vt = quad_tap(tap_rows[t], sub_r, fx_r, fy_r,
                              pyr_groups[t], 12)
                vt = vt * w_r[j : j + 1, :]
                v = vt if v is None else v + vt
            b = quad_tap(lrows_ref, lsub_ref, lfx_ref, lfy_ref,
                         lut_group, 8)
            for ch in range(3):
                outs[ch][j : j + 1, :] = v[ch : ch + 1, :]
            for ch in range(2):
                outs[3 + ch][j : j + 1, :] = b[ch : ch + 1, :]

    return kernel


def transmission_fetch_planes(
    pyr_taps: list,  # pyramid_fetch_parts(...) output: [(rows, sub,
    # fx, fy, weight), ...] flat [M] per-tap arrays
    lut_rows: jnp.ndarray,  # [M, 8 * QUAD_GROUP]
    lut_sub: jnp.ndarray,  # [M] int32
    lut_fx: jnp.ndarray,
    lut_fy: jnp.ndarray,
    interpret: bool = False,
) -> tuple:
    """(transmitted r, g, b, brdf_a, brdf_b) [M] f32 planes. Exactness:
    identical select/lerp/weighted-sum expressions to
    sample_pyramid_lod + sample_lut_2ch_quad, in the same order —
    pinned by tests/test_tap_finish.py."""
    n_taps = len(pyr_taps)
    m = pyr_taps[0][1].shape[0]
    assert m % 128 == 0
    nb = m // 128
    ng = min(FINISH_GROUPS, nb)
    nb_pad = -(-nb // ng) * ng

    def plane(a, dtype=jnp.float32):
        p = a.astype(dtype).reshape(nb, 128)
        if nb_pad != nb:
            p = jnp.pad(p, ((0, nb_pad - nb), (0, 0)))
        return p

    def rows(r):
        if nb_pad != nb:
            r = jnp.pad(r, ((0, (nb_pad - nb) * 128), (0, 0)))
        return r

    def rows_spec(width):
        return pl.BlockSpec(
            (ng * 128, width), lambda i: (i, 0), memory_space=pltpu.VMEM
        )

    plane_spec = pl.BlockSpec(
        (ng, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    lut_w = lut_rows.shape[-1]
    inputs = [rows(t[0]) for t in pyr_taps] + [rows(lut_rows)]
    in_specs = [rows_spec(t[0].shape[-1]) for t in pyr_taps] + [
        rows_spec(lut_w)
    ]
    for _, sub, fx, fy, wgt in pyr_taps:
        inputs += [plane(sub, jnp.int32), plane(fx), plane(fy), plane(wgt)]
        in_specs += [plane_spec] * 4
    inputs += [plane(lut_sub, jnp.int32), plane(lut_fx), plane(lut_fy)]
    in_specs += [plane_spec] * 3

    kernel = _transmission_fetch_kernel(
        ng, n_taps, tuple(t[0].shape[-1] // 12 for t in pyr_taps),
        lut_w // 8,
    )
    outs = pl.pallas_call(
        kernel,
        grid=(nb_pad // ng,),
        in_specs=in_specs,
        out_specs=[plane_spec] * 5,
        out_shape=[jax.ShapeDtypeStruct((nb_pad, 128), jnp.float32)] * 5,
        interpret=interpret,
    )(*inputs)
    return tuple(o[:nb].reshape(m) for o in outs)


def sample_bundle_rows_finish(
    quads: jnp.ndarray,
    rows: jnp.ndarray,
    uv: jnp.ndarray,
    lod: jnp.ndarray,
    wrap_mode: int,
    classes: tuple,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in [M, Lmax, 4] variant of sample_bundle_rows for callers
    that want the stacked bundle (the XLA material path)."""
    chans = sample_bundle_planes(
        quads, rows, uv, lod, wrap_mode, classes, interpret=interpret
    )
    l_max = max(classes)
    return jnp.stack(chans, axis=-1).reshape(uv.shape[0], l_max, 4)
