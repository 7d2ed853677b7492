"""Traversal-cost decay of the refit-only BVH under sustained rotation
(VERDICT r2 #10 / docs/PERFORMANCE.md).

The reference builds one BLAS per primitive + an instance TLAS and
refits only the TLAS per frame (src/acceleration_structures.rs:6-267);
this repo refits a single flat world-space BVH whose Morton topology is
never re-sorted. Under model rotation (--rotate-model) the sorted order
decorrelates from space and AABB overlap grows. This script quantifies
it: mean/percentile traversal pop counts for sun shadow rays after
refitting the frame-0 topology to rotated geometry, vs a fresh rebuild
at each angle.

Run (CPU, ~2 min): python tools/bvh_decay.py
"""

import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

from transmission_renderer_tpu.utils.platform import force_cpu

force_cpu()

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import transmission_renderer_tpu.ops.bvh as B  # noqa: E402
from transmission_renderer_tpu.models import build_dragon_scene  # noqa: E402
from transmission_renderer_tpu.scene.types import (  # noqa: E402
    Similarity,
    quat_from_axis_angle,
    similarity_apply,
)


def trace_mean_pops(bvh, tri_vtx, world_pos, origins, dirs, t_max):
    """Instrumented any-hit walk -> per-ray pop counts (see ops/bvh.py)."""
    leaf_xyz = world_pos[tri_vtx][bvh.leaf_tri.reshape(-1)].reshape(
        bvh.num_leaves, B.LEAF_TRIS * 9
    )
    leaf_ids = bvh.leaf_tri
    num_rows = bvh.node_boxes.shape[0]
    lanes_t = jnp.arange(B.LEAF_TRIS, dtype=jnp.int32)
    lanes_w = jnp.arange(B.WIDE, dtype=jnp.int32)

    def walk(o_i, inv_i, d_i, t_max_i):
        def cond(s):
            return ~s[-2]

        def body(s):
            lvl, idx, tlo, thi, best_t, best_tri, done, cnt = s
            cnt = cnt + 1
            empty = (tlo == 0) & (thi == 0)
            have_lo = tlo != 0
            w = jnp.where(have_lo, tlo, thi)
            b0 = w & 0xFF
            b1 = (w >> 8) & 0xFF
            b2 = (w >> 16) & 0xFF
            b3 = (w >> 24) & 0xFF
            byte = jnp.where(
                b0 != 0, 0, jnp.where(b1 != 0, 1, jnp.where(b2 != 0, 2, 3))
            )
            mask = jnp.where(
                b0 != 0, b0,
                jnp.where(b1 != 0, b1, jnp.where(b2 != 0, b2, b3)),
            )
            bit = mask & -mask
            j = jnp.int32(0)
            for kk in range(1, B.WIDE):
                j = jnp.where(bit == (1 << kk), kk, j)
            clear = bit << (byte * 8)
            tlo = jnp.where(have_lo, tlo ^ clear, tlo)
            thi = jnp.where(have_lo | empty, thi, thi ^ clear)
            code = byte + jnp.where(have_lo, 0, 4)
            anc = idx >> jnp.maximum(3 * (code + 1 - lvl), 0)
            idx = jnp.where(empty, idx, anc * B.WIDE + j)
            lvl = jnp.where(empty, lvl, code)
            done = done | empty
            is_leaf = (lvl == 0) & ~done
            is_inner = (lvl > 0) & ~done
            li = jnp.clip(idx, 0, bvh.num_leaves - 1)
            tv = leaf_xyz[li].reshape(B.LEAF_TRIS, 3, 3)
            hit4, t4, _, _ = B._ray_tri(
                o_i, d_i, 0.001, best_t, tv[:, 0], tv[:, 1], tv[:, 2]
            )
            hit4 = hit4 & is_leaf & (
                lanes_t < bvh.num_tris - li * B.LEAF_TRIS
            )
            t4m = jnp.where(hit4, t4, jnp.inf)
            jt = jnp.argmin(t4m)
            take = hit4[jt]
            best_t = jnp.where(take, t4m[jt], best_t)
            best_tri = jnp.where(take, leaf_ids[li][jt], best_tri)
            done = done | take  # any-hit
            clvl = jnp.maximum(lvl - 1, 0)
            row_off = jnp.int32(bvh.level_offsets[0])
            n_below = jnp.int32(bvh.children_below(0))
            for k in range(1, bvh.num_levels):
                row_off = jnp.where(clvl == k, bvh.level_offsets[k], row_off)
                n_below = jnp.where(clvl == k, bvh.children_below(k), n_below)
            row = bvh.node_boxes[jnp.clip(row_off + idx, 0, num_rows - 1)]
            boxes = row.reshape(B.WIDE, 6)
            hit8 = (
                B._ray_aabb(o_i, inv_i, best_t, boxes[:, :3], boxes[:, 3:])
                & is_inner
                & (lanes_w < n_below - idx * B.WIDE)
            )
            m8 = jnp.sum(jnp.where(hit8, jnp.int32(1) << lanes_w, 0))
            add = m8 << ((clvl & 3) * 8)
            in_lo = clvl < 4
            tlo = jnp.where(is_inner & in_lo, tlo | add, tlo)
            thi = jnp.where(is_inner & ~in_lo, thi | add, thi)
            return lvl, idx, tlo, thi, best_t, best_tri, done, cnt

        root_code = bvh.num_levels
        root_mask = jnp.int32(1) << ((root_code & 3) * 8)
        init = (
            jnp.int32(root_code + 1), jnp.int32(0),
            root_mask if root_code < 4 else jnp.int32(0),
            root_mask if root_code >= 4 else jnp.int32(0),
            t_max_i, jnp.int32(-1), False, jnp.int32(0),
        )
        return jax.lax.while_loop(cond, body, init)[-1]

    inv = jnp.where(jnp.abs(dirs) > 1e-20, 1.0 / dirs, 1e20)
    return np.asarray(jax.jit(jax.vmap(walk))(origins, inv, dirs, t_max))


def main():
    builder = build_dragon_scene(stacks=90, sectors=180)
    scene, dl, flags = builder.finish_bundle()
    bvh0 = builder.build_rt_bvh()
    obj_pos = scene.positions[dl.vtx_src]

    rng = np.random.default_rng(0)
    n = 50_000
    # shadow-ray proxy workload: origins on a disc above the floor,
    # direction = a fixed sun
    origins = np.stack(
        [
            rng.uniform(-4, 4, n),
            rng.uniform(0.0, 0.5, n),
            rng.uniform(-7, 0, n),
        ],
        -1,
    ).astype(np.float32)
    sun = np.array([0.3, 0.8, 0.52], np.float32)
    sun /= np.linalg.norm(sun)
    dirs = np.broadcast_to(sun, (n, 3)).astype(np.float32)
    t_max = np.full(n, 1e4, np.float32)

    print("angle  refit-mean  refit-p99  rebuild-mean  rebuild-p99")
    for deg in (0, 30, 90, 180):
        rot = quat_from_axis_angle([0.0, 1.0, 0.0], np.radians(deg))
        t = Similarity(
            translation=scene.inst_transform.translation[dl.vtx_inst],
            scale=scene.inst_transform.scale[dl.vtx_inst],
            rotation=jnp.asarray(
                np.broadcast_to(rot, (dl.vtx_inst.shape[0], 4)).astype(
                    np.float32
                )
            ),
        )
        world = similarity_apply(t, obj_pos)
        refit = B.refit_bvh(bvh0, dl.tri_vtx, world)
        c_refit = trace_mean_pops(
            refit, dl.tri_vtx, world, jnp.asarray(origins),
            jnp.asarray(dirs), jnp.asarray(t_max),
        )
        rebuild = B.build_bvh(
            np.asarray(dl.tri_vtx), np.asarray(world)
        )
        c_re = trace_mean_pops(
            rebuild, dl.tri_vtx, world, jnp.asarray(origins),
            jnp.asarray(dirs), jnp.asarray(t_max),
        )
        print(
            f"{deg:5d}  {c_refit.mean():9.1f}  {np.percentile(c_refit, 99):8.0f}"
            f"  {c_re.mean():11.1f}  {np.percentile(c_re, 99):10.0f}"
        )


if __name__ == "__main__":
    main()
