// Native LBVH construction — the host-side analogue of the reference's
// acceleration-structure build driver (src/acceleration_structures.rs),
// which records BLAS/TLAS builds for the GPU. TPUs have no AS hardware,
// so the build runs on the host CPU; this C++ implementation replaces the
// interpreted Python loop in ops/bvh.py for large scenes (~100x faster).
//
// Exposed via a plain C ABI and loaded with ctypes (no pybind11 in this
// toolchain). All arrays are caller-allocated.
//
// Layout contract (must match ops/bvh.py BVH):
//   leaves sorted by Morton code; internal nodes split their leaf range at
//   the count median; node ids: internal [0, t-1), leaves [t-1, 2t-1).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Morton-encode [n,3] normalised centroids -> 30-bit codes.
void trtpu_morton3(int64_t n, const float* xyz, uint32_t* codes) {
  auto expand = [](uint32_t v) {
    v = (v | (v << 16)) & 0x030000FFu;
    v = (v | (v << 8)) & 0x0300F00Fu;
    v = (v | (v << 4)) & 0x030C30C3u;
    v = (v | (v << 2)) & 0x09249249u;
    return v;
  };
  for (int64_t i = 0; i < n; ++i) {
    uint32_t q[3];
    for (int k = 0; k < 3; ++k) {
      float f = xyz[i * 3 + k] * 1024.0f;
      if (f < 0.0f) f = 0.0f;
      if (f > 1023.0f) f = 1023.0f;
      q[k] = (uint32_t)f;
    }
    codes[i] = (expand(q[0]) << 2) | (expand(q[1]) << 1) | expand(q[2]);
  }
}

// Median-split hierarchy + bottom-up AABB fold over pre-sorted leaves.
//   t:          number of leaves (triangles), t >= 2
//   leaf_min:   [t, 3] f32 (already in sorted-leaf order)
//   leaf_max:   [t, 3] f32
//   child_left: [t-1] i32 out
//   child_right:[t-1] i32 out
//   aabb_min:   [2t-1, 3] f32 out (leaf slots pre-fill not required)
//   aabb_max:   [2t-1, 3] f32 out
void trtpu_bvh_median_build(int64_t t, const float* leaf_min,
                            const float* leaf_max, int32_t* child_left,
                            int32_t* child_right, float* aabb_min,
                            float* aabb_max) {
  const int64_t num_internal = t - 1;
  std::memcpy(aabb_min + num_internal * 3, leaf_min, sizeof(float) * t * 3);
  std::memcpy(aabb_max + num_internal * 3, leaf_max, sizeof(float) * t * 3);

  struct Frame {
    int64_t lo, hi, node;
    int phase;
  };
  std::vector<Frame> stack;
  stack.reserve(64);
  int64_t next_id = 0;
  const int64_t root = next_id++;
  stack.push_back({0, t, root, 0});
  while (!stack.empty()) {
    Frame f = stack.back();
    stack.pop_back();
    if (f.phase == 0) {
      const int64_t mid = (f.lo + f.hi) / 2;
      const int64_t left =
          (mid - f.lo == 1) ? num_internal + f.lo : next_id++;
      const int64_t right =
          (f.hi - mid == 1) ? num_internal + mid : next_id++;
      child_left[f.node] = (int32_t)left;
      child_right[f.node] = (int32_t)right;
      stack.push_back({f.lo, f.hi, f.node, 1});
      if (f.hi - mid > 1) stack.push_back({mid, f.hi, right, 0});
      if (mid - f.lo > 1) stack.push_back({f.lo, mid, left, 0});
    } else {
      const int64_t l = child_left[f.node];
      const int64_t r = child_right[f.node];
      for (int k = 0; k < 3; ++k) {
        aabb_min[f.node * 3 + k] =
            std::min(aabb_min[l * 3 + k], aabb_min[r * 3 + k]);
        aabb_max[f.node * 3 + k] =
            std::max(aabb_max[l * 3 + k], aabb_max[r * 3 + k]);
      }
    }
  }
}

// World-space Similarity transform of gathered vertices:
//   out[i] = trans[i] + scale[i] * rotate(quat[i] (xyzw), pos[i])
void trtpu_transform_points(int64_t n, const float* pos, const float* trans,
                            const float* scale, const float* quat,
                            float* out) {
  for (int64_t i = 0; i < n; ++i) {
    const float* p = pos + i * 3;
    const float* q = quat + i * 4;
    // t = 2 * cross(q.xyz, p); r = p + q.w * t + cross(q.xyz, t)
    float tx = 2.0f * (q[1] * p[2] - q[2] * p[1]);
    float ty = 2.0f * (q[2] * p[0] - q[0] * p[2]);
    float tz = 2.0f * (q[0] * p[1] - q[1] * p[0]);
    float rx = p[0] + q[3] * tx + (q[1] * tz - q[2] * ty);
    float ry = p[1] + q[3] * ty + (q[2] * tx - q[0] * tz);
    float rz = p[2] + q[3] * tz + (q[0] * ty - q[1] * tx);
    out[i * 3 + 0] = trans[i * 3 + 0] + scale[i] * rx;
    out[i * 3 + 1] = trans[i * 3 + 1] + scale[i] * ry;
    out[i * 3 + 2] = trans[i * 3 + 2] + scale[i] * rz;
  }
}

}  // extern "C"
