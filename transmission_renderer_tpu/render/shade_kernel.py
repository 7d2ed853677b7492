"""Fused Pallas deferred-shade kernel — the opaque fragment shader as ONE
TPU kernel (shader/src/lib.rs:164-249 + lighting.rs:145-220).

Why this exists (round-4 structural move, VERDICT r3 #1): the XLA
formulation of the opaque shade spends 44 ms/frame at 1080p on v5e, but
only ~10 ms of that is true gather floor (atlas taps 2 x 2.26 ns/idx,
cluster rows 2.5 ns/idx — tools/gather_study.py). The remaining ~30 ms is
elementwise BRDF/material math that XLA fragments across dozens of
fusions, materialising [2M, 3] f32 intermediates in HBM each time. A
single Pallas kernel holds the whole per-pixel dataflow in registers:
the same math measures ~0.2 ms per 400 ops/pixel at 2M pixels
(gather_study case E), ~30x under the XLA path.

Division of labour:
  * XLA (outside): the data-dependent gathers at their measured floor —
    atlas texture taps (ops/texture.py::sample_bundle_rows) and a small
    per-BLOCK cluster candidate gather (32 rows per 128-px block instead
    of 1 row per pixel: 16k indices instead of 2M).
  * Pallas (this kernel): everything else — material-row fetch
    (where-chain over the small material matrix: measured ~free,
    gather_study), texture-factor application, normal mapping, the
    clustered light loop with per-lane cluster-candidate select, the
    full BRDF, emission, valid masking.

Layout: every per-pixel quantity is an f32/i32 plane [NB, 128] (NB =
pixels / 128 — one flat 128-px block per row, matching render/sparse.py's
BLOCK). The kernel grid walks row-groups of ``ROWS_PER_STEP``.

Exactness: the kernel reproduces render/shading.py's op sequence
(clamped dots, eps guards, where-select semantics) term for term; the
XLA path stays as the oracle (tests/test_shade_kernel.py pins them to
~1e-5, and goldens are unchanged). The one device-semantics risk is
transcendental ULP (log2 in the cluster z-slice, sqrt/pow in the BRDF)
— measure-zero cluster-boundary pixels may differ on real hardware;
interpret mode (CPU tests) is bit-identical by construction.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from transmission_renderer_tpu.pbr.brdf import F32_EPSILON, _FRAC_1_PI

# grid step height: ROWS_PER_STEP flat blocks (x 128 lanes) per kernel
# invocation. Sets VMEM footprint: ~30 input planes x RB x 128 x 4 B,
# double-buffered, PLUS the kernel's live intermediates (the unrolled
# material/light chains hold tens of [RB, 128] registers) — RB=256
# measured 20 MB scoped VMEM (OOM at the 16 MB limit); 64 fits with
# headroom. Env-swept via TRTPU_SHADE_ROWS.
import os as _os

ROWS_PER_STEP = int(_os.environ.get("TRTPU_SHADE_ROWS", "64"))

# transmission pre-kernel output planes: d(3) s(3) t(3) uv(2) lod raylen
# nov rough tf att_dist att_colour(3) diffuse(3) f0(3) f90(3) emission(3)
N_TRANS_OUT = 32


# ---------------------------------------------------------------------------
# vec3-on-planes shading core (ports pbr/brdf.py onto channel registers)
# ---------------------------------------------------------------------------

class V3(NamedTuple):
    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray

    def __add__(self, o):
        return V3(self.x + o.x, self.y + o.y, self.z + o.z)

    def __sub__(self, o):
        return V3(self.x - o.x, self.y - o.y, self.z - o.z)

    def scale(self, s):
        return V3(self.x * s, self.y * s, self.z * s)

    def mul(self, o):
        return V3(self.x * o.x, self.y * o.y, self.z * o.z)


def _v3dot_raw(a: V3, b: V3):
    return (a.x * b.x + a.y * b.y) + a.z * b.z


def _v3dot(a: V3, b: V3):
    """Clamped shading dot (glam-pbr/src/lib.rs:92-99)."""
    return jnp.maximum(_v3dot_raw(a, b), F32_EPSILON)


def _v3norm(v: V3) -> V3:
    inv = 1.0 / jnp.sqrt(_v3dot_raw(v, v))
    return V3(v.x * inv, v.y * inv, v.z * inv)


def _v3max(v: V3):
    return jnp.maximum(jnp.maximum(v.x, v.y), v.z)


def _pow5(x):
    x2 = x * x
    return x2 * x2 * x


def _d_ggx(noh, actual_roughness):
    a2 = actual_roughness * actual_roughness
    f = (noh * noh) * (a2 - 1.0) + 1.0
    return jnp.where(f * f > 0.0, a2 / (np.float32(np.pi) * f * f), 0.0)


def _v_smith(nov, nol, actual_roughness):
    a2 = actual_roughness * actual_roughness
    ggx_v = nol * jnp.sqrt(nov * nov * (1.0 - a2) + a2)
    ggx_l = nov * jnp.sqrt(nol * nol * (1.0 - a2) + a2)
    ggx = ggx_v + ggx_l
    return jnp.where(ggx > 0.0, 0.5 / ggx, 0.0)


def _fresnel(voh, f0: V3, f90: V3) -> V3:
    t = _pow5(1.0 - voh)
    return V3(
        f0.x + (f90.x - f0.x) * t,
        f0.y + (f90.y - f0.y) * t,
        f0.z + (f90.z - f0.z) * t,
    )


class _Material(NamedTuple):
    diffuse: V3
    alpha: jnp.ndarray
    metallic: jnp.ndarray
    roughness: jnp.ndarray
    ior: jnp.ndarray
    spec_colour: V3
    spec_factor: jnp.ndarray
    emission: V3
    # light-independent invariants (pbr/brdf.py::material_invariants)
    actual_roughness: jnp.ndarray = None
    c_diff: V3 = None
    f0: V3 = None
    f90: V3 = None


def _invariants(m: _Material) -> _Material:
    ar = m.roughness * m.roughness
    one_minus_metal = 1.0 - m.metallic
    c_diff = m.diffuse.scale(one_minus_metal)
    root = (m.ior - 1.0) / (m.ior + 1.0)
    dielectric_f0 = root * root
    d0 = m.spec_colour.scale(dielectric_f0 * m.spec_factor)
    f0 = V3(
        d0.x + (m.diffuse.x - d0.x) * m.metallic,
        d0.y + (m.diffuse.y - d0.y) * m.metallic,
        d0.z + (m.diffuse.z - d0.z) * m.metallic,
    )
    f90s = m.spec_factor
    f90v = f90s + (1.0 - f90s) * m.metallic
    return m._replace(
        actual_roughness=ar, c_diff=c_diff, f0=f0,
        f90=V3(f90v, f90v, f90v),
    )


def _basic_brdf(normal: V3, light: V3, intensity: V3, view: V3,
                m: _Material) -> tuple[V3, V3]:
    """pbr/brdf.py::basic_brdf on planes -> (diffuse, specular)."""
    halfway = _v3norm(view + light)
    noh = _v3dot(normal, halfway)
    nov = _v3dot(normal, view)
    nol = _v3dot(normal, light)
    voh = _v3dot(view, halfway)
    fresnel = _fresnel(voh, m.f0, m.f90)
    radiance = intensity.scale(nol)
    dweight = (1.0 - _v3max(fresnel)) * np.float32(_FRAC_1_PI)
    diffuse = radiance.mul(m.c_diff.scale(dweight))
    dv = _d_ggx(noh, m.actual_roughness) * _v_smith(
        nov, nol, m.actual_roughness
    )
    specular = radiance.scale(dv).mul(fresnel)
    return diffuse, specular


def _spot_factor(direction: V3, spot_dir: V3, outer_angle, eps):
    theta = _v3dot_raw(V3(-direction.x, -direction.y, -direction.z), spot_dir)
    return jnp.maximum((theta - jnp.cos(outer_angle)) / eps, 0.0)


# ---------------------------------------------------------------------------
# static kernel spec
# ---------------------------------------------------------------------------

class OpaqueShadeSpec(NamedTuple):
    """Everything the kernel closure needs statically."""

    n_mat: int
    n_lights: int
    max_slots: int  # cluster light slots (S)
    n_layers: int  # bundle layers in the sample planes (0 = no samples)
    tex_slots: tuple  # the 9 SceneFlags slot flags
    has_sun_factor: bool
    has_light_factors: bool
    # cluster grid statics
    ncx: int
    ncy: int
    csx: float
    csy: float
    n_slices: int
    coeff_scale: float
    coeff_bias: float
    z_near: float
    z_far: float
    cand_cols: int  # padded candidate-table width
    n_x_cand: int  # cluster-x candidates per 128-px block
    # transmission pre-pass mode (fragment_transmission's light loop +
    # BTDF + refraction-ray math; the pyramid/LUT gathers and the small
    # combine tail stay in XLA — see shade_transmission_pallas_pre)
    transmission: bool = False
    fb_width: float = 0.0  # static framebuffer width (refraction lod)
    # many-light MASK mode (> 16 lights, e.g. the 48-light bindless
    # scene): the candidate table carries ceil(L/16) 16-bit membership
    # chunks per (x, z) cell instead of (count, idx_0..idx_{S-1}), and
    # the light loop runs over ALL L lights with STATIC light-matrix
    # rows gated per lane by the mask bit — O(L * BRDF) instead of the
    # O(S * L * 12) index where-chains that forced the XLA fallback.
    # Exact: cluster lists are id-ascending (pbr/clustering.py), so the
    # accumulation order matches the slot loop, and skipped lights add
    # exact zeros just like the slot loop's padded slots.
    n_mask_chunks: int = 0  # 0 = slot mode
    # bundle index per _MAT_SLOTS entry (mixed-image scenes carry one
    # bundle of sample planes per distinct meta block — see
    # shading.bundle_tap_samples; single-block scenes map everything
    # to bundle 0). Each bundle contributes n_layers * 4 planes.
    slot_bundle: tuple = (0,) * 8


# material-matrix column layout (render/shading.py::build_material_matrix)
_C_METALLIC = 0
_C_ROUGHNESS = 1
_C_DIFFUSE = 2  # ..5 (rgba)
_C_EMISSIVE = 6  # ..8
_C_IOR = 9
_C_TRANSMISSION = 10
_C_THICKNESS = 11
_C_ATT_DIST = 12
_C_ATT_COLOUR = 13  # ..15
_C_SPEC_FACTOR = 16
_C_SPEC_COLOUR = 17  # ..19
_C_ATT_ISINF = 20
_C_TID0 = 21  # 8 texture-id columns (shading._MAT_SLOTS order)

# _MAT_SLOTS index per tex_slots flag position (see render/shading.py)
_SLOT_TO_IMAT = {0: 0, 1: 1, 2: 2, 3: 3, 5: 4, 6: 5, 7: 6, 8: 7}


def _mat_cols_needed(spec: OpaqueShadeSpec) -> tuple:
    cols = [
        _C_METALLIC, _C_ROUGHNESS,
        _C_DIFFUSE, _C_DIFFUSE + 1, _C_DIFFUSE + 2, _C_DIFFUSE + 3,
        _C_EMISSIVE, _C_EMISSIVE + 1, _C_EMISSIVE + 2,
        _C_IOR, _C_SPEC_FACTOR,
        _C_SPEC_COLOUR, _C_SPEC_COLOUR + 1, _C_SPEC_COLOUR + 2,
    ]
    if spec.transmission:
        cols += [
            _C_TRANSMISSION, _C_THICKNESS, _C_ATT_DIST,
            _C_ATT_COLOUR, _C_ATT_COLOUR + 1, _C_ATT_COLOUR + 2,
            _C_ATT_ISINF,
        ]
    for flag_pos, imat in _SLOT_TO_IMAT.items():
        if spec.tex_slots[flag_pos]:
            cols.append(_C_TID0 + imat)
    return tuple(sorted(set(cols)))


def _transmission_btdf(normal: V3, light: V3, view: V3, m: _Material,
                       trans_rough) -> V3:
    """pbr/brdf.py::transmission_btdf on planes (glam-pbr lib.rs:200-233)."""
    l_dot_n = _v3dot_raw(V3(-light.x, -light.y, -light.z), normal)
    lm = _v3norm(light + normal.scale(2.0 * l_dot_n))
    halfway = _v3norm(view + lm)
    noh = _v3dot(normal, halfway)
    voh = _v3dot(view, halfway)
    nov = _v3dot(normal, view)
    nol_m = _v3dot(normal, lm)
    dv = _d_ggx(noh, trans_rough) * _v_smith(nov, nol_m, trans_rough)
    fres = _fresnel(voh, m.f0, m.f90)
    return V3(
        (1.0 - fres.x) * dv * m.diffuse.x,
        (1.0 - fres.y) * dv * m.diffuse.y,
        (1.0 - fres.z) * dv * m.diffuse.z,
    )


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------

def _make_kernel(spec: OpaqueShadeSpec, n_sample_planes: int):
    (use_diffuse, use_mr, use_normal, use_emissive, _occ, use_tr, use_th,
     use_spec, use_spec_col) = spec.tex_slots
    S = spec.max_slots
    L = spec.n_lights
    T = spec.transmission
    needed = _mat_cols_needed(spec)

    def kernel(*refs):
        it = iter(refs)
        scal_ref = next(it)  # [1, 32] SMEM per-frame scalars
        mat_ref = next(it)  # [n_mat, 29] VMEM
        lmat_ref = next(it) if L else None  # [L, 12] VMEM
        cand_ref = next(it)  # [RB, cand_cols] VMEM per-block candidates
        px0_ref = next(it)  # [RB, 128] lane-global pixel x (f32)
        pos = V3(next(it)[:], next(it)[:], next(it)[:])
        nrm = V3(next(it)[:], next(it)[:], next(it)[:])
        depth_ref = next(it)
        valid_ref = next(it)
        mid_ref = next(it)
        mscale_ref = next(it) if T else None
        samples = [next(it)[:] for _ in range(n_sample_planes)]
        if use_normal:
            dpx = V3(next(it)[:], next(it)[:], next(it)[:])
            dpy = V3(next(it)[:], next(it)[:], next(it)[:])
            duvx_u, duvx_v = next(it)[:], next(it)[:]
            duvy_u, duvy_v = next(it)[:], next(it)[:]
        sun_f = next(it)[:] if spec.has_sun_factor else None
        light_f = (
            [next(it)[:] for _ in range(L)] if spec.has_light_factors else None
        )
        outs = [next(it) for _ in range(N_TRANS_OUT if T else 3)]

        depth = depth_ref[:]
        valid = valid_ref[:] > 0.5
        mid = mid_ref[:]
        mt = mat_ref[:]  # [n_mat, 29] register-resident
        lt = lmat_ref[:] if L else None  # [L, 12]

        # ---- material row fetch: where-chain over the small matrix ----
        mvals = {}
        for c in needed:
            acc = jnp.full(mid.shape, mt[0, c], jnp.float32)
            for mrow in range(1, spec.n_mat):
                acc = jnp.where(mid == mrow, mt[mrow, c], acc)
            mvals[c] = acc

        def slot_sample(flag_pos):
            """(tid int32, sample [4-channel tuple]) for a texture slot —
            the slot's bundle's sample planes hold ALL layers; select by
            the packed ref's layer bits (scene/textures.py::texture_ref).
            Mixed-image scenes route each slot to its own bundle via the
            static slot_bundle map."""
            imat = _SLOT_TO_IMAT[flag_pos]
            tid_f = mvals[_C_TID0 + imat]
            tid = tid_f.astype(jnp.int32)
            layer = jnp.maximum(tid, 0) >> 16  # LAYER_SHIFT
            base = spec.slot_bundle[imat] * 4 * spec.n_layers
            ch = []
            for c in range(4):
                v = samples[base + c]
                for k in range(1, spec.n_layers):
                    v = jnp.where(layer == k, samples[base + 4 * k + c], v)
                ch.append(v)
            return tid, ch

        # ---- texture-factor application (shading.py order) ----
        diffuse = V3(mvals[_C_DIFFUSE], mvals[_C_DIFFUSE + 1],
                     mvals[_C_DIFFUSE + 2])
        alpha = mvals[_C_DIFFUSE + 3]
        if use_diffuse:
            tid, s = slot_sample(0)
            hit = tid >= 0
            diffuse = V3(
                jnp.where(hit, diffuse.x * s[0], diffuse.x),
                jnp.where(hit, diffuse.y * s[1], diffuse.y),
                jnp.where(hit, diffuse.z * s[2], diffuse.z),
            )
            alpha = jnp.where(hit, alpha * s[3], alpha)

        metallic = mvals[_C_METALLIC]
        roughness = mvals[_C_ROUGHNESS]
        if use_mr:
            tid, s = slot_sample(1)
            hit = tid >= 0
            metallic = jnp.where(hit, metallic * s[2], metallic)
            roughness = jnp.where(hit, roughness * s[1], roughness)

        spec_colour = V3(mvals[_C_SPEC_COLOUR], mvals[_C_SPEC_COLOUR + 1],
                         mvals[_C_SPEC_COLOUR + 2])
        if use_spec_col:
            tid, s = slot_sample(8)
            hit = tid >= 0
            spec_colour = V3(
                jnp.where(hit, spec_colour.x * s[0], spec_colour.x),
                jnp.where(hit, spec_colour.y * s[1], spec_colour.y),
                jnp.where(hit, spec_colour.z * s[2], spec_colour.z),
            )
        spec_factor = mvals[_C_SPEC_FACTOR]
        if use_spec:
            tid, s = slot_sample(7)
            spec_factor = jnp.where(tid >= 0, spec_factor * s[3], spec_factor)

        emission = V3(mvals[_C_EMISSIVE], mvals[_C_EMISSIVE + 1],
                      mvals[_C_EMISSIVE + 2])
        if use_emissive:
            tid, s = slot_sample(3)
            hit = tid >= 0
            emission = V3(
                jnp.where(hit, emission.x * s[0], emission.x),
                jnp.where(hit, emission.y * s[1], emission.y),
                jnp.where(hit, emission.z * s[2], emission.z),
            )

        # ---- geometric normal (+ optional normal mapping) ----
        ninv = 1.0 / jnp.maximum(jnp.sqrt(_v3dot_raw(nrm, nrm)), 1e-12)
        normal = V3(nrm.x * ninv, nrm.y * ninv, nrm.z * ninv)
        if use_normal:
            tid, s = slot_sample(2)
            mn = V3(*(s[c] * (255.0 / 127.0) - (128.0 / 127.0)
                      for c in range(3)))
            dp2perp = V3(
                dpy.y * normal.z - dpy.z * normal.y,
                dpy.z * normal.x - dpy.x * normal.z,
                dpy.x * normal.y - dpy.y * normal.x,
            )
            dp1perp = V3(
                normal.y * dpx.z - normal.z * dpx.y,
                normal.z * dpx.x - normal.x * dpx.z,
                normal.x * dpx.y - normal.y * dpx.x,
            )
            t = dp2perp.scale(duvx_u) + dp1perp.scale(duvy_u)
            bt = dp2perp.scale(duvx_v) + dp1perp.scale(duvy_v)
            invmax = 1.0 / jnp.sqrt(jnp.maximum(
                jnp.maximum(_v3dot_raw(t, t), _v3dot_raw(bt, bt)), 1e-20
            ))
            mapped = (
                t.scale(invmax * mn.x) + bt.scale(invmax * mn.y)
                + normal.scale(mn.z)
            )
            minv = 1.0 / jnp.maximum(
                jnp.sqrt(_v3dot_raw(mapped, mapped)), 1e-12
            )
            hit = tid >= 0
            normal = V3(
                jnp.where(hit, mapped.x * minv, normal.x),
                jnp.where(hit, mapped.y * minv, normal.y),
                jnp.where(hit, mapped.z * minv, normal.z),
            )

        m = _invariants(_Material(
            diffuse=diffuse, alpha=alpha, metallic=metallic,
            roughness=roughness, ior=mvals[_C_IOR],
            spec_colour=spec_colour, spec_factor=spec_factor,
            emission=emission,
        ))
        if T:
            # transmission & thickness (fragment_transmission,
            # shader/src/lib.rs:120-124)
            trans_factor = mvals[_C_TRANSMISSION]
            if use_tr:
                tid, s = slot_sample(5)
                trans_factor = jnp.where(
                    tid >= 0, trans_factor * s[0], trans_factor
                )
            thickness = mvals[_C_THICKNESS]
            if use_th:
                tid, s = slot_sample(6)
                thickness = jnp.where(tid >= 0, thickness * s[1], thickness)
            trans_rough = m.actual_roughness * jnp.clip(
                m.ior * 2.0 - 2.0, 0.0, 1.0
            )

        # ---- view vector ----
        vp = V3(scal_ref[0, 0], scal_ref[0, 1], scal_ref[0, 2])
        view_vec = V3(vp.x - pos.x, vp.y - pos.y, vp.z - pos.z)
        vinv = 1.0 / jnp.maximum(jnp.sqrt(_v3dot_raw(view_vec, view_vec)),
                                 1e-12)
        view = V3(view_vec.x * vinv, view_vec.y * vinv, view_vec.z * vinv)

        # ---- sun (shader/src/lighting.rs:145-170, 13-40) ----
        sun_dir = V3(scal_ref[0, 3], scal_ref[0, 4], scal_ref[0, 5])
        sun_int = V3(scal_ref[0, 6], scal_ref[0, 7], scal_ref[0, 8])
        if sun_f is not None:
            # ambient floor on ray-traced sun shadows (lighting.rs:166) —
            # the transmission variant applies the raw factor (:22-37)
            f = sun_f if T else jnp.maximum(sun_f, 0.1)
            sun_i = V3(sun_int.x * f, sun_int.y * f, sun_int.z * f)
        else:
            ones = jnp.ones_like(depth)
            sun_i = V3(sun_int.x * ones, sun_int.y * ones, sun_int.z * ones)
        sdir = V3(*(jnp.broadcast_to(c, depth.shape) for c in sun_dir))
        acc_d, acc_s = _basic_brdf(normal, sdir, sun_i, view, m)
        if T:
            acc_t = sun_i.mul(
                _transmission_btdf(normal, sdir, view, m, trans_rough)
            )

        # ---- cluster z-slice + per-lane candidate select ----
        # (shader/src/lib.rs:205-215 + shared-structs/src/lib.rs:54-63)
        if S or spec.n_mask_chunks:
            depth_range = 2.0 * (1.0 - depth) - 1.0
            zn, zf = spec.z_near, spec.z_far
            lin = (2.0 * zn * zf) / (zf + zn - depth_range * (zf - zn))
            slice_f = (
                jnp.log2(lin) * np.float32(spec.coeff_scale)
                + np.float32(spec.coeff_bias)
            )
            zsl = jnp.maximum(slice_f, 0.0).astype(jnp.int32)
            zsl = jnp.minimum(zsl, spec.n_slices - 1)
            # per-lane cluster x from the global pixel x (same formula as
            # shading._cluster_index; candidates cover exactly {x0c, x1c})
            fx = px0_ref[:] + 0.5
            cx_lane = jnp.minimum(
                (fx / np.float32(spec.csx)).astype(jnp.int32), spec.ncx - 1
            )
            cand = cand_ref[:]
            x0c = cand[:, spec.cand_cols - 1 :].astype(jnp.int32)
            xi = cx_lane - x0c  # 0 .. n_x_cand-1 by construction
            # candidate layout: [x offset (n_x_cand)] x [z slice] x
            # [1 + S] (slot mode) or [mask chunks] (mask mode)
            stride = spec.n_mask_chunks or (1 + S)

            def cand_select(col):
                v = cand[:, col : col + 1]
                for j in range(spec.n_x_cand):
                    for k in range(spec.n_slices):
                        if j == 0 and k == 0:
                            continue
                        c = (j * spec.n_slices + k) * stride + col
                        pick = (xi == j) & (zsl == k)
                        v = jnp.where(pick, cand[:, c : c + 1], v)
                return v

            def add_light(active, lrow, lf):
                """One light's contribution (lighting.rs:178-208).
                ``lrow`` entries are [?, 128] planes in slot mode and
                0-d light-matrix scalars in mask mode (broadcast)."""
                nonlocal acc_d, acc_s, acc_t
                l_pos = V3(lrow[0], lrow[1], lrow[2])
                vec = l_pos - pos
                dist_sq = _v3dot_raw(vec, vec)
                dist = jnp.sqrt(dist_sq)
                dinv = 1.0 / dist
                direction = V3(vec.x * dinv, vec.y * dinv, vec.z * dinv)
                attenuation = 1.0 / dist_sq
                factor = jnp.where(active, 1.0, 0.0)
                if lf is not None:
                    factor = factor * lf
                if not T:
                    # only evaluate_lights applies the spot factor
                    # (shader/src/lighting.rs:201-203)
                    is_spot = lrow[11] > 0.5
                    eps = jnp.where(lrow[10] == 0.0, 1.0, lrow[10])
                    spot = _spot_factor(
                        direction, V3(lrow[6], lrow[7], lrow[8]), lrow[9],
                        eps,
                    )
                    factor = factor * jnp.where(is_spot, spot, 1.0)
                w = factor * attenuation
                radiance = V3(lrow[3] * w, lrow[4] * w, lrow[5] * w)
                d, sp = _basic_brdf(normal, direction, radiance, view, m)
                acc_d = acc_d + d
                acc_s = acc_s + sp
                if T:
                    acc_t = acc_t + radiance.mul(
                        _transmission_btdf(normal, direction, view, m,
                                           trans_rough)
                    )

            if spec.n_mask_chunks:
                # ---- many-light MASK loop: all L lights, static rows,
                # per-lane membership bit (see OpaqueShadeSpec) ----
                masks = [
                    cand_select(k).astype(jnp.int32)
                    for k in range(spec.n_mask_chunks)
                ]
                for li in range(L):
                    active = ((masks[li >> 4] >> (li & 15)) & 1) > 0
                    lrow = [lt[li, c] for c in range(12)]
                    add_light(
                        active, lrow,
                        light_f[li] if light_f is not None else None,
                    )
            else:
                count = cand_select(0).astype(jnp.int32)
                slot_idx = [
                    cand_select(1 + s).astype(jnp.int32) for s in range(S)
                ]

                # ---- clustered light loop (lighting.rs:178-208) ----
                for s in range(S):
                    active = s < count
                    lidx = slot_idx[s]
                    # light-row fetch: where-chain over the light matrix
                    lrow = [
                        jnp.full(depth.shape, lt[0, c], jnp.float32)
                        for c in range(12)
                    ]
                    for li in range(1, L):
                        for c in range(12):
                            lrow[c] = jnp.where(
                                lidx == li, lt[li, c], lrow[c]
                            )
                    lf = None
                    if light_f is not None:
                        lf = light_f[0]
                        for li in range(1, L):
                            lf = jnp.where(lidx == li, light_f[li], lf)
                    add_light(active, lrow, lf)

        zero = jnp.zeros_like(depth)

        def write(ref, val):
            ref[:] = jnp.where(valid, val, zero)

        if not T:
            out = acc_d + acc_s + m.emission
            write(outs[0], out.x)
            write(outs[1], out.y)
            write(outs[2], out.z)
            return

        # ---- refraction-ray setup (glam-pbr ibl_volume_refraction,
        # lib.rs:292-354, up to the framebuffer fetch) ----
        # refract(-view, normal, ior) with eta = 1/ior; the reference's
        # unguarded sqrt (NaN on TIR) is preserved (pbr/brdf.py::refract)
        eta = 1.0 / m.ior
        inc = V3(-view.x, -view.y, -view.z)
        n_dot_i = _v3dot_raw(normal, inc)
        kk = 1.0 - eta * eta * (1.0 - n_dot_i * n_dot_i)
        coef = eta * n_dot_i + jnp.sqrt(kk)
        refr = V3(
            eta * inc.x - coef * normal.x,
            eta * inc.y - coef * normal.y,
            eta * inc.z - coef * normal.z,
        )
        rinv = 1.0 / jnp.sqrt(_v3dot_raw(refr, refr))
        ray_len = thickness * mscale_ref[:]
        ray = V3(
            refr.x * rinv * ray_len,
            refr.y * rinv * ray_len,
            refr.z * rinv * ray_len,
        )
        exit_p = pos + ray
        # project with proj_view (SMEM rows 16:32): clip = M @ exit_h
        def dc(row):
            o = 16 + 4 * row
            return (
                scal_ref[0, o] * exit_p.x
                + scal_ref[0, o + 1] * exit_p.y
                + scal_ref[0, o + 2] * exit_p.z
                + scal_ref[0, o + 3]
            )

        dcw = dc(3)
        uv_x = (dc(0) / dcw + 1.0) / 2.0
        uv_y = (dc(1) / dcw + 1.0) / 2.0
        lod = np.float32(np.log2(np.float32(spec.fb_width))) * (
            m.roughness * jnp.clip(m.ior * 2.0 - 2.0, 0.0, 1.0)
        )
        nov_unclamped = _v3dot_raw(normal, view)  # lib.rs:345 (no clamp)
        att_dist = jnp.where(
            mvals[_C_ATT_ISINF] > 0.5, jnp.inf, mvals[_C_ATT_DIST]
        )
        vals = [
            acc_d.x, acc_d.y, acc_d.z,
            acc_s.x, acc_s.y, acc_s.z,
            acc_t.x, acc_t.y, acc_t.z,
            uv_x, uv_y, lod, ray_len, nov_unclamped,
            m.roughness, trans_factor, att_dist,
            mvals[_C_ATT_COLOUR], mvals[_C_ATT_COLOUR + 1],
            mvals[_C_ATT_COLOUR + 2],
            m.diffuse.x, m.diffuse.y, m.diffuse.z,
            m.f0.x, m.f0.y, m.f0.z,
            m.f90.x, m.f90.y, m.f90.z,
            m.emission.x, m.emission.y, m.emission.z,
        ]
        assert len(vals) == N_TRANS_OUT
        for ref, val in zip(outs, vals):
            write(ref, val)

    return kernel


# ---------------------------------------------------------------------------
# host-side wrapper
# ---------------------------------------------------------------------------

def _plane(a: jnp.ndarray) -> jnp.ndarray:
    """[M] -> [M/128, 128] f32 plane."""
    return a.reshape(-1, 128).astype(jnp.float32)


def n_x_candidates(csx: float, ncx: int) -> int:
    """Cluster-x values a 128-px block can span (the lane range px0 ..
    px0+127 crosses at most floor(127/csx) cluster boundaries, +1 for the
    start column, +1 for the fractional straddle)."""
    return min(int(np.floor(127.0 / csx)) + 2, ncx)


def build_cluster_candidates(ctx, block_py, block_px0):
    """Per-block cluster candidate rows -> ([NB, Wc] f32, S, Wc, nxc).

    One gather of NB x (n_x_cand x n_slices) cluster-table rows (vs one
    row per PIXEL in the XLA path): each 128-px flat block spans one
    framebuffer row, so its cluster_y is a constant and cluster_x takes
    at most ``n_x_candidates`` consecutive values from x0c; z remains
    per-pixel and is selected in-kernel. Layout per block row:
    [x offset][z slice][count, idx_0..idx_{S-1}], then x0c in the LAST
    column (the kernel reads cand[:, -1]).
    """
    ncx, ncy = ctx.num_clusters_xy
    csx, csy = ctx.cluster_size_in_pixels
    n_slices = int(ctx.cluster_coeffs.num_depth_slices)
    nxc = n_x_candidates(float(csx), ncx)
    S = min(ctx.lights.num, ctx.cluster_light_indices.shape[1])
    n_chunks = _mask_chunks(ctx)
    if n_chunks:
        # many-light MASK mode: ceil(L/16) 16-bit membership chunks per
        # cluster (16 bits stay f32-exact), built from the SAME
        # truncated first-S id-ascending list the slot loop iterates
        idx = ctx.cluster_light_indices[:, :S].astype(jnp.int32)
        in_list = (
            jnp.arange(S, dtype=jnp.int32)[None, :]
            < ctx.cluster_light_counts[:, None].astype(jnp.int32)
        )
        chunks = [
            jnp.sum(
                jnp.where(
                    in_list & ((idx >> 4) == k), 1 << (idx & 15), 0
                ),
                axis=1,
            )
            for k in range(n_chunks)
        ]
        table = jnp.stack(chunks, axis=1).astype(jnp.float32)
    else:
        table = jnp.concatenate(
            [
                ctx.cluster_light_counts[:, None].astype(jnp.int32),
                ctx.cluster_light_indices[:, :S].astype(jnp.int32),
            ],
            axis=1,
        ).astype(jnp.float32)  # [C, 1+S]; counts/ids small ints, f32-exact

    cy = jnp.minimum(
        ((block_py.astype(jnp.float32) + 0.5) / csy).astype(jnp.uint32),
        ncy - 1,
    ).astype(jnp.int32)
    x0c = jnp.minimum(
        ((block_px0.astype(jnp.float32) + 0.5) / csx).astype(jnp.uint32),
        ncx - 1,
    ).astype(jnp.int32)
    z = jnp.arange(n_slices, dtype=jnp.int32)
    xs = jnp.minimum(x0c[:, None] + jnp.arange(nxc, dtype=jnp.int32)[None, :],
                     ncx - 1)  # [NB, nxc]
    base = cy[:, None] * ncx + xs  # [NB, nxc]
    idx = (
        z[None, None, :] * (ncx * ncy) + base[:, :, None]
    )  # [NB, nxc, n_slices]
    rows = table[idx.reshape(idx.shape[0], -1)]  # [NB, nxc*n_slices, 1+S]
    flat = rows.reshape(rows.shape[0], -1)
    used = flat.shape[1] + 1
    wc = -(-used // 128) * 128
    cand = jnp.pad(flat, ((0, 0), (0, wc - flat.shape[1] - 1)))
    cand = jnp.concatenate(
        [cand, x0c[:, None].astype(jnp.float32)], axis=1
    )
    return cand, S, wc, nxc


def _mask_chunks(ctx) -> int:
    """ceil(L/16) when the many-light MASK loop applies, else 0 (slot
    mode). > 16 lights makes the per-slot index where-chain O(S*L*12);
    the mask loop is O(L * BRDF) with static light rows instead."""
    return -(-int(ctx.lights.num) // 16) if ctx.lights.num > 16 else 0


def pallas_shade_supported(ctx, n_mat: int, w: int) -> bool:
    """Static gate for the fused kernel (XLA path otherwise)."""
    S = min(ctx.lights.num, ctx.cluster_light_indices.shape[1])
    return (
        not ctx.debug_clusters
        and not ctx.quad_taps
        and not ctx.bf16_lights
        # slot mode: light-row where-chain stays cheap; mask mode
        # covers 16 < L <= 64 (the loop is L BRDF evaluations)
        and (ctx.lights.num <= 16 and S <= 8 or 16 < ctx.lights.num <= 64)
        and w % 128 == 0  # flat blocks must be single-row segments
        # material where-chain: (n_mat-1) selects per needed column but
        # each select covers the whole [RB, 128] block, ~2-4 ops/px at
        # n_mat ~100 — raising 64 -> 128 engaged the kernel for the
        # 82-material bindless scene (XLA light_loop was 205 ms there)
        and n_mat <= 128
    )


def _call_shade_kernel(
    scene,
    g,  # flat GBuffer [M]
    ctx,
    block_py: jnp.ndarray,  # [NB] framebuffer row of each flat block
    block_px0: jnp.ndarray,  # [NB] first pixel x of each flat block
    sample_list: list,  # pre-gathered bundle samples, [] or [[M, L, 4]]
    tex_slots: tuple,
    transmission: bool,
    interpret: bool = False,
) -> list:
    """Assemble planes, run the fused kernel, return [M]-flat outputs."""
    m_pixels = g.depth.shape[0]
    nb = m_pixels // 128
    assert nb * 128 == m_pixels

    from transmission_renderer_tpu.ops.tap_finish import PlanarBundle

    cand, S, wc, nxc = build_cluster_candidates(ctx, block_py, block_px0)
    coeffs = ctx.cluster_coeffs
    n_mat = int(ctx.mat_matrix.table.shape[0])
    L = int(ctx.lights.num)
    n_layers = 0
    slot_bundle = (0,) * 8
    if sample_list:
        s0 = sample_list[0]
        n_layers = (
            s0.n_layers if isinstance(s0, PlanarBundle) else s0.shape[-2]
        )
        if len(sample_list) > 1:
            # mixed-image scene: one bundle per distinct meta block, in
            # bundle_tap_samples' used_meta_cols order — derive the
            # static slot -> bundle map the kernel routes through
            from transmission_renderer_tpu.render.shading import (
                _MAT_SLOTS,
                used_meta_cols,
            )

            used = used_meta_cols(ctx.mat_matrix, tex_slots)
            assert len(used) == len(sample_list)
            slot_bundle = tuple(
                used.index(ctx.mat_matrix.meta_col[name])
                if ctx.mat_matrix.meta_col[name] in used
                else 0
                for name in _MAT_SLOTS
            )

    spec = OpaqueShadeSpec(
        n_mat=n_mat,
        n_lights=L,
        max_slots=S,
        n_layers=n_layers,
        tex_slots=tuple(tex_slots),
        has_sun_factor=ctx.sun_shadow_factor is not None,
        has_light_factors=ctx.light_shadow_factors is not None,
        ncx=ctx.num_clusters_xy[0],
        ncy=ctx.num_clusters_xy[1],
        csx=float(ctx.cluster_size_in_pixels[0]),
        csy=float(ctx.cluster_size_in_pixels[1]),
        n_slices=int(coeffs.num_depth_slices),
        coeff_scale=float(coeffs.scale),
        coeff_bias=float(coeffs.bias),
        z_near=float(coeffs.z_near),
        z_far=float(coeffs.z_far),
        cand_cols=wc,
        n_x_cand=nxc,
        transmission=transmission,
        fb_width=float(ctx.framebuffer_size[0]),
        n_mask_chunks=_mask_chunks(ctx),
        slot_bundle=slot_bundle,
    )

    scalars = jnp.concatenate(
        [
            ctx.view_position.astype(jnp.float32),
            ctx.sun_dir.astype(jnp.float32),
            ctx.sun_intensity.astype(jnp.float32),
            jnp.zeros((7,), jnp.float32),
            ctx.proj_view.astype(jnp.float32).reshape(-1),
        ]
    ).reshape(1, 32)

    mat_small = ctx.mat_matrix.table[:, :29]

    lane = jnp.arange(128, dtype=jnp.float32)
    px_plane = block_px0.astype(jnp.float32)[:, None] + lane[None, :]

    use_normal = tex_slots[2]
    inputs = [scalars, mat_small]
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ]
    if L:
        from transmission_renderer_tpu.render.shading import _light_matrix

        inputs.append(_light_matrix(ctx.lights))
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))

    rb = min(ROWS_PER_STEP, nb)
    # pad the block dimension to a whole number of grid steps
    nb_pad = -(-nb // rb) * rb
    pad_rows = nb_pad - nb

    def prep(plane_2d):
        if pad_rows:
            plane_2d = jnp.pad(plane_2d, ((0, pad_rows), (0, 0)))
        return plane_2d

    def row_spec(width=128):
        return pl.BlockSpec(
            (rb, width), lambda i: (i, 0), memory_space=pltpu.VMEM
        )

    def add(plane_2d, width=128):
        inputs.append(prep(plane_2d))
        in_specs.append(row_spec(width))

    add(cand, wc)
    add(px_plane)
    for c in range(3):
        add(_plane(g.position[:, c]))
    for c in range(3):
        add(_plane(g.normal[:, c]))
    add(_plane(g.depth))
    add(_plane(g.valid.astype(jnp.float32)))
    inputs.append(prep(g.material_id.reshape(-1, 128).astype(jnp.int32)))
    in_specs.append(row_spec())
    if transmission:
        add(_plane(g.model_scale))

    n_sample_planes = 0
    for smp in sample_list:
        if isinstance(smp, PlanarBundle):
            # tap-finish planes feed straight through — (layer, channel)
            # order matches slot_sample's samples[4*k + c] indexing
            for ch in smp.chans:
                add(_plane(ch))
                n_sample_planes += 1
            continue
        for layer in range(smp.shape[-2]):
            for c in range(4):
                add(_plane(smp[:, layer, c]))
                n_sample_planes += 1
    if use_normal:
        for c in range(3):
            add(_plane(g.dpos_dx[:, c]))
        for c in range(3):
            add(_plane(g.dpos_dy[:, c]))
        add(_plane(g.duv_dx[:, 0]))
        add(_plane(g.duv_dx[:, 1]))
        add(_plane(g.duv_dy[:, 0]))
        add(_plane(g.duv_dy[:, 1]))
    if spec.has_sun_factor:
        add(_plane(ctx.sun_shadow_factor))
    if spec.has_light_factors:
        for li in range(L):
            add(_plane(ctx.light_shadow_factors[:, li]))

    kernel = _make_kernel(spec, n_sample_planes)
    n_out = N_TRANS_OUT if transmission else 3
    out_shape = [jax.ShapeDtypeStruct((nb_pad, 128), jnp.float32)] * n_out
    out_specs = [row_spec()] * n_out

    outs = pl.pallas_call(
        kernel,
        grid=(nb_pad // rb,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*inputs)
    return [o[:nb].reshape(m_pixels) for o in outs]


def shade_opaque_pallas(
    scene,
    g,  # flat GBuffer [M]
    ctx,
    block_py: jnp.ndarray,
    block_px0: jnp.ndarray,
    sample_list: list,
    tex_slots: tuple,
    interpret: bool = False,
) -> jnp.ndarray:
    """The fused opaque shade -> [M, 3] HDR (oracle: shade_opaque_flat)."""
    return jnp.stack(
        shade_opaque_pallas_planes(
            scene, g, ctx, block_py, block_px0, sample_list, tex_slots,
            interpret=interpret,
        ),
        axis=-1,
    )


def shade_opaque_pallas_planes(
    scene,
    g,  # flat GBuffer [M]
    ctx,
    block_py: jnp.ndarray,
    block_px0: jnp.ndarray,
    sample_list: list,
    tex_slots: tuple,
    interpret: bool = False,
) -> tuple:
    """The fused opaque shade in its native output form: (r, g, b) [M]
    channel planes — no [M, 3] interleave (the frame's back half stays
    planar, see shade_opaque_flat(return_planes=True))."""
    return tuple(
        _call_shade_kernel(
            scene, g, ctx, block_py, block_px0, sample_list, tex_slots,
            transmission=False, interpret=interpret,
        )
    )


def shade_transmission_pallas_pre(
    scene,
    g,
    ctx,
    block_py: jnp.ndarray,
    block_px0: jnp.ndarray,
    sample_list: list,
    tex_slots: tuple,
    interpret: bool = False,
) -> dict:
    """fragment_transmission's per-pixel math UP TO the framebuffer/LUT
    fetches (shader/src/lib.rs:37-162 + glam-pbr lib.rs:292-345) as one
    fused kernel. Returns named [M] planes; the caller performs the
    pyramid + GGX-LUT gathers and the small combine tail in XLA
    (render/shading.py::shade_transmission_flat — the oracle)."""
    outs = _call_shade_kernel(
        scene, g, ctx, block_py, block_px0, sample_list, tex_slots,
        transmission=True, interpret=interpret,
    )
    names = [
        "d_r", "d_g", "d_b", "s_r", "s_g", "s_b", "t_r", "t_g", "t_b",
        "uv_x", "uv_y", "lod", "ray_len", "nov", "rough", "tf",
        "att_dist", "att_r", "att_g", "att_b",
        "dc_r", "dc_g", "dc_b", "f0_r", "f0_g", "f0_b",
        "f90_r", "f90_g", "f90_b", "em_r", "em_g", "em_b",
    ]
    assert len(names) == N_TRANS_OUT
    return dict(zip(names, outs))
