"""LBVH build + ray traversal — the TPU replacement for
VK_KHR_acceleration_structure / ray_query (SURVEY.md §2.5).

The reference builds one BLAS per primitive plus a TLAS over instances
(src/acceleration_structures.rs) and traverses with hardware ray queries
(shader/src/lighting.rs:97-125, shader/src/lib.rs:742-797). Here:

  * build: LBVH — Morton codes of triangle centroids, sort, balanced
    median-split hierarchy, bottom-up AABBs. Host-side (NumPy) at scene
    freeze; scenes with animated instances refit world AABBs with
    ``refit_bvh`` (the UPDATE-mode analogue of
    src/acceleration_structures.rs:192-267).
  * traversal: stack-based iterative walk as a jittable batched
    while_loop. Shadow rays are any-hit and — exactly like the
    reference's ``trace_shadow_ray``, which confirms every candidate
    unconditionally (shader/src/lighting.rs:115-118) — ignore alpha
    clipping. The AS-debug caster's alpha-tested closest-hit walk
    (shader/src/lib.rs:742-797) lives in render/raytrace.py.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class BVH(NamedTuple):
    """Flattened binary radix tree over world-space triangles.

    nodes: internal nodes first ([T-1]), then leaves ([T]). children
    index into this combined array; child >= num_internal means leaf
    (triangle sorted_tri[child - num_internal]).
    """

    child_left: jnp.ndarray  # [T-1] int32
    child_right: jnp.ndarray  # [T-1] int32
    aabb_min: jnp.ndarray  # [2T-1, 3] f32
    aabb_max: jnp.ndarray  # [2T-1, 3] f32
    sorted_tri: jnp.ndarray  # [T] int32 — leaf order -> original triangle id

    @property
    def num_internal(self) -> int:
        return self.child_left.shape[0]


def _morton3(x: np.ndarray) -> np.ndarray:
    """[N, 3] floats in [0,1] -> 30-bit Morton codes (uint32)."""
    q = np.clip(x * 1024.0, 0, 1023).astype(np.uint32)

    def expand(v):
        v = (v | (v << 16)) & 0x030000FF
        v = (v | (v << 8)) & 0x0300F00F
        v = (v | (v << 4)) & 0x030C30C3
        v = (v | (v << 2)) & 0x09249249
        return v

    return (expand(q[:, 0]) << 2) | (expand(q[:, 1]) << 1) | expand(q[:, 2])


def build_bvh(tri_vertices: np.ndarray, positions: np.ndarray) -> BVH:
    """Host-side LBVH build over [T, 3] triangles of [V, 3] positions.

    Median split over Morton order: leaves sorted by centroid Morton code,
    internal nodes split their leaf range at the count median — a balanced
    tree (depth = ceil(log2 T), which bounds refit passes and traversal
    stacks) with LBVH-grade spatial quality.
    """
    tri = np.asarray(tri_vertices, np.int64)
    pos = np.asarray(positions, np.float32)
    v = pos[tri]  # [T, 3, 3]
    t = len(tri)
    assert t >= 2, "BVH needs at least 2 triangles"

    tri_min = v.min(1)
    tri_max = v.max(1)
    centroid = (tri_min + tri_max) * 0.5
    scene_min = tri_min.min(0)
    scene_max = tri_max.max(0)
    extent = np.maximum(scene_max - scene_min, 1e-9)
    codes = _morton3((centroid - scene_min) / extent)
    order = np.lexsort((np.arange(t), codes)).astype(np.int64)

    # fast path: native C++ builder (same layout contract)
    from transmission_renderer_tpu import native

    built = native.bvh_median_build(tri_min[order], tri_max[order])
    if built is not None:
        child_left, child_right, aabb_min, aabb_max = built
        return BVH(
            child_left=jnp.asarray(child_left),
            child_right=jnp.asarray(child_right),
            aabb_min=jnp.asarray(aabb_min),
            aabb_max=jnp.asarray(aabb_max),
            sorted_tri=jnp.asarray(order.astype(np.int32)),
        )

    num_internal = t - 1
    child_left = np.zeros(num_internal, np.int32)
    child_right = np.zeros(num_internal, np.int32)
    aabb_min = np.zeros((2 * t - 1, 3), np.float32)
    aabb_max = np.zeros((2 * t - 1, 3), np.float32)
    leaf_min = tri_min[order]
    leaf_max = tri_max[order]
    aabb_min[num_internal:] = leaf_min
    aabb_max[num_internal:] = leaf_max

    # iterative two-phase DFS (build children, then fold AABBs on unwind)
    next_id = [0]

    def alloc():
        i = next_id[0]
        next_id[0] += 1
        return i

    # stack entries: (lo, hi, node_id, phase)
    root = alloc()
    stack = [(0, t, root, 0)]
    while stack:
        lo, hi, node, phase = stack.pop()
        if phase == 0:
            mid = (lo + hi) // 2
            left = (
                num_internal + lo if mid - lo == 1 else alloc()
            )
            right = (
                num_internal + mid if hi - mid == 1 else alloc()
            )
            child_left[node] = left
            child_right[node] = right
            stack.append((lo, hi, node, 1))
            if hi - mid > 1:
                stack.append((mid, hi, right, 0))
            if mid - lo > 1:
                stack.append((lo, mid, left, 0))
        else:
            l, r = child_left[node], child_right[node]
            aabb_min[node] = np.minimum(aabb_min[l], aabb_min[r])
            aabb_max[node] = np.maximum(aabb_max[l], aabb_max[r])

    assert next_id[0] == num_internal, (next_id[0], num_internal)

    return BVH(
        child_left=jnp.asarray(child_left),
        child_right=jnp.asarray(child_right),
        aabb_min=jnp.asarray(aabb_min),
        aabb_max=jnp.asarray(aabb_max),
        sorted_tri=jnp.asarray(order.astype(np.int32)),
    )


def refit_bvh(
    bvh: BVH, tri_vertices: jnp.ndarray, positions: jnp.ndarray,
    passes: int | None = None,
) -> BVH:
    """Refresh AABBs for moved vertices, keeping the topology — the
    UPDATE-mode TLAS refit analogue (src/acceleration_structures.rs:192-267).
    Jittable. ``passes`` defaults to the tree height, which is exactly
    ceil(log2 T) for the median-split build (build_bvh docstring) — no
    wasted sequential folds in the per-frame hot path."""
    if passes is None:
        passes = max(int(np.ceil(np.log2(bvh.num_internal + 1))), 1)
    v = positions[tri_vertices[bvh.sorted_tri]]  # [T, 3, 3]
    leaf_min = jnp.min(v, axis=1)
    leaf_max = jnp.max(v, axis=1)
    n_int = bvh.num_internal
    aabb_min = jnp.concatenate([bvh.aabb_min[:n_int], leaf_min], axis=0)
    aabb_max = jnp.concatenate([bvh.aabb_max[:n_int], leaf_max], axis=0)

    def body(_, mm):
        mn, mx = mm
        new_min = jnp.minimum(mn[bvh.child_left], mn[bvh.child_right])
        new_max = jnp.maximum(mx[bvh.child_left], mx[bvh.child_right])
        mn = mn.at[:n_int].set(new_min)
        mx = mx.at[:n_int].set(new_max)
        return mn, mx

    aabb_min, aabb_max = jax.lax.fori_loop(0, passes, body, (aabb_min, aabb_max))
    return bvh._replace(aabb_min=aabb_min, aabb_max=aabb_max)


STACK_DEPTH = 48


def _ray_aabb(origin, inv_dir, t_max, bmin, bmax):
    """Slab test -> bool (handles inf inv_dir per IEEE)."""
    t0 = (bmin - origin) * inv_dir
    t1 = (bmax - origin) * inv_dir
    tmin = jnp.minimum(t0, t1)
    tmax = jnp.maximum(t0, t1)
    enter = jnp.max(tmin, axis=-1)
    exit_ = jnp.min(tmax, axis=-1)
    return (enter <= exit_) & (exit_ >= 0.0) & (enter <= t_max)


def _ray_tri(origin, direction, t_min, t_max, v0, v1, v2):
    """Moller-Trumbore -> (hit bool, t, u, v)."""
    e1 = v1 - v0
    e2 = v2 - v0
    pvec = jnp.cross(direction, e2)
    det = jnp.sum(e1 * pvec, axis=-1)
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
    tvec = origin - v0
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, e1)
    v = jnp.sum(direction * qvec, axis=-1) * inv_det
    t = jnp.sum(e2 * qvec, axis=-1) * inv_det
    hit = (
        (jnp.abs(det) > 1e-12)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > t_min)
        & (t < t_max)
    )
    return hit, t, u, v


def trace_rays(
    bvh: BVH,
    tri_vertices: jnp.ndarray,  # [T, 3] int32 (into world positions)
    positions: jnp.ndarray,  # [V, 3] world-space
    origins: jnp.ndarray,  # [..., 3]
    directions: jnp.ndarray,  # [..., 3]
    t_min: float = 0.001,
    t_max: float | jnp.ndarray = 10_000.0,
    any_hit: bool = False,
    alpha_test_fn=None,
):
    """Batched BVH walk.

    Returns (hit [...] bool, t [...], tri_id [...] int32 (-1 = miss),
    u [...], v [...]). ``any_hit=True`` terminates on the first accepted
    intersection (shadow rays, shader/src/lighting.rs:97-125); otherwise
    the closest hit wins (the AS-debug caster's committed intersection).
    ``t_max`` may be per-ray (point-light shadow rays use the light
    distance, shader/src/lighting.rs:64-71). ``alpha_test_fn(tri_id, u, v)
    -> bool`` confirms candidates (the caster's alpha-clip re-test,
    shader/src/lib.rs:777-784); None confirms everything.
    """
    shape = origins.shape[:-1]
    o = origins.reshape(-1, 3)
    d = directions.reshape(-1, 3)
    n = o.shape[0]
    n_int = bvh.num_internal
    t_max_arr = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), shape).reshape(-1)

    # Pre-gather each triangle's vertices ONCE, outside the batched walk
    # ([T, 3, 3], ~5 MB at 134k tris). The naive in-leaf double gather
    # positions[tri_vertices[tri_id]] makes XLA broadcast the whole
    # positions table across the ray batch inside the while body
    # (f32[rays, verts, 3] — hundreds of GB at 1080p); a single row
    # gather from this flat table batches as a plain dynamic-slice.
    tri_xyz = positions[tri_vertices]

    inv_d = jnp.where(jnp.abs(d) > 1e-20, 1.0 / d, jnp.sign(d) * 1e20 + 1e20)

    def walk(o_i, inv_i, d_i, t_max_i):
        stack = jnp.zeros((STACK_DEPTH,), jnp.int32)

        def cond(s):
            _, sp, _, _, _, _, done = s
            return (sp > 0) & ~done

        def body(s):
            # Straight-line masked leaf+inner work, NO lax.cond: batching
            # a cond (vmap over rays) broadcasts its unbatched closure
            # operands — the [2T-1, 3] AABB tables — across the whole ray
            # batch (f32[rays, nodes, 3], tens of GB at 1080p). A select
            # of both masked halves is also exactly what the vectorised
            # machine executes anyway.
            stack, sp, best_t, best_tri, bu, bv, done = s
            node = stack[sp - 1]
            sp = sp - 1

            is_leaf = node >= n_int

            # -- leaf half (masked by is_leaf) --
            tri_id = bvh.sorted_tri[jnp.maximum(node - n_int, 0)]
            tv = tri_xyz[tri_id]
            hit, t, u, v = _ray_tri(o_i, d_i, t_min, best_t, tv[0], tv[1], tv[2])
            hit = hit & is_leaf
            if alpha_test_fn is not None:
                hit = hit & alpha_test_fn(tri_id, u, v)
            best_t = jnp.where(hit, t, best_t)
            best_tri = jnp.where(hit, tri_id, best_tri)
            bu = jnp.where(hit, u, bu)
            bv = jnp.where(hit, v, bv)
            done = done | (hit if any_hit else False)

            # -- inner half (masked by ~is_leaf) --
            ni = jnp.minimum(node, n_int - 1)
            l = bvh.child_left[ni]
            r = bvh.child_right[ni]
            hit_l = ~is_leaf & _ray_aabb(
                o_i, inv_i, best_t, bvh.aabb_min[l], bvh.aabb_max[l]
            )
            hit_r = ~is_leaf & _ray_aabb(
                o_i, inv_i, best_t, bvh.aabb_min[r], bvh.aabb_max[r]
            )
            stack = jnp.where(hit_l, stack.at[sp].set(l), stack)
            sp = jnp.where(hit_l, sp + 1, sp)
            stack = jnp.where(
                hit_r, stack.at[jnp.minimum(sp, STACK_DEPTH - 1)].set(r), stack
            )
            sp = jnp.where(hit_r, jnp.minimum(sp + 1, STACK_DEPTH), sp)
            return stack, sp, best_t, best_tri, bu, bv, done

        stack = stack.at[0].set(0)
        init = (stack, jnp.int32(1), t_max_i, jnp.int32(-1),
                jnp.float32(0), jnp.float32(0), False)
        final = jax.lax.while_loop(cond, body, init)
        _, _, best_t, best_tri, bu, bv, _ = final
        return best_t, best_tri, bu, bv

    # Chunk the ray batch: one flat 2M-ray batched while-loop overflows
    # the TPU compiler's int32 loop index space (llo_loop Check
    # index_space_.limit at 1080p) and balloons live state (the [N, 64]
    # traversal stacks). lax.map walks 256k-ray chunks sequentially —
    # each chunk is still plenty to saturate the VPU.
    chunk = 1 << 18
    if n > chunk:
        pad = (-n) % chunk
        o_p = jnp.pad(o, ((0, pad), (0, 0)))
        inv_p = jnp.pad(inv_d, ((0, pad), (0, 0)), constant_values=1e20)
        d_p = jnp.pad(d, ((0, pad), (0, 0)), constant_values=1.0)
        # padding rays get t_max=0: every AABB/triangle test fails against
        # an empty (t_min, 0) interval, so they walk the root and stop.
        t_p = jnp.pad(t_max_arr, (0, pad))
        args = jax.tree.map(
            lambda a: a.reshape((n + pad) // chunk, chunk, *a.shape[1:]),
            (o_p, inv_p, d_p, t_p),
        )
        best_t, best_tri, bu, bv = jax.tree.map(
            lambda a: a.reshape(-1)[:n],
            jax.lax.map(lambda x: jax.vmap(walk)(*x), args),
        )
    else:
        best_t, best_tri, bu, bv = jax.vmap(walk)(o, inv_d, d, t_max_arr)
    hit = best_tri >= 0
    return (
        hit.reshape(shape),
        best_t.reshape(shape),
        best_tri.reshape(shape),
        bu.reshape(shape),
        bv.reshape(shape),
    )
