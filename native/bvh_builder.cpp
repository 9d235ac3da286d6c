// Native flattened-BVH builder.
//
// Same construction policy as the reference
// (/root/reference/src/hittable/bvh_node.rs:27-100): split axis = widest
// total AABB extent, objects stable-sorted by aabb.min+aabb.max along that
// axis, median split — emitted as a skip-threaded DFS array with chunked
// leaves (see hyper_ray_tracer_tpu/models/bvh_build.py, whose NumPy
// implementation this mirrors bit-for-bit: stable sorts + identical
// traversal order make the two builders produce identical arrays).
//
// Exposed via ctypes (hyper_ray_tracer_tpu/utils/native.py).  Host-side
// only: scene flattening is the one performance-relevant CPU component of
// the framework (everything else runs on the TPU), and the Python builder
// is O(n log^2 n) with interpreter overhead per node.
//
// Build: make -C native   (g++ -O3 -shared -fPIC)

#include <algorithm>
#include <cstdint>
#include <vector>

namespace {

struct Builder {
  const float* amin;  // [n,3]
  const float* amax;  // [n,3]
  int leaf_size;
  std::vector<float> bmin, bmax;
  std::vector<int32_t> leaf_first, leaf_count, skip;
  std::vector<int64_t> perm;

  void emit(std::vector<int64_t>& idx, size_t lo, size_t hi) {
    const size_t node_id = skip.size();
    float mn[3] = {3e38f, 3e38f, 3e38f};
    float mx[3] = {-3e38f, -3e38f, -3e38f};
    for (size_t i = lo; i < hi; ++i) {
      const int64_t p = idx[i];
      for (int a = 0; a < 3; ++a) {
        mn[a] = std::min(mn[a], amin[3 * p + a]);
        mx[a] = std::max(mx[a], amax[3 * p + a]);
      }
    }
    for (int a = 0; a < 3; ++a) {
      bmin.push_back(mn[a]);
      bmax.push_back(mx[a]);
    }
    leaf_first.push_back(-1);
    leaf_count.push_back(0);
    skip.push_back(-1);

    if (hi - lo <= static_cast<size_t>(leaf_size)) {
      leaf_first[node_id] = static_cast<int32_t>(perm.size());
      leaf_count[node_id] = static_cast<int32_t>(hi - lo);
      for (size_t i = lo; i < hi; ++i) perm.push_back(idx[i]);
    } else {
      int axis = 0;
      float best_ext = -1.0f;
      for (int a = 0; a < 3; ++a) {
        const float ext = mx[a] - mn[a];
        if (ext > best_ext) {
          best_ext = ext;
          axis = a;
        }
      }
      const float* lo_ptr = amin;
      const float* hi_ptr = amax;
      std::stable_sort(
          idx.begin() + lo, idx.begin() + hi,
          [lo_ptr, hi_ptr, axis](int64_t a, int64_t b) {
            const float ka = lo_ptr[3 * a + axis] + hi_ptr[3 * a + axis];
            const float kb = lo_ptr[3 * b + axis] + hi_ptr[3 * b + axis];
            return ka < kb;
          });
      const size_t mid = lo + (hi - lo) / 2;
      emit(idx, lo, mid);
      emit(idx, mid, hi);
    }
    skip[node_id] = static_cast<int32_t>(skip.size());
  }
};

}  // namespace

extern "C" {

// Returns the number of nodes, or -1 on error.  Output buffers must hold at
// least 2*n nodes (bounds: 6 floats/node) and n perm entries.
int hrt_build_bvh(const float* aabb_min, const float* aabb_max, int n,
                  int leaf_size, float* out_bmin, float* out_bmax,
                  int32_t* out_leaf_first, int32_t* out_leaf_count,
                  int32_t* out_skip, int64_t* out_perm) {
  if (n <= 0 || leaf_size <= 0) return -1;
  Builder b;
  b.amin = aabb_min;
  b.amax = aabb_max;
  b.leaf_size = leaf_size;
  b.bmin.reserve(6 * n);
  b.bmax.reserve(6 * n);
  b.perm.reserve(n);
  std::vector<int64_t> idx(n);
  for (int i = 0; i < n; ++i) idx[i] = i;
  b.emit(idx, 0, idx.size());

  const int nn = static_cast<int>(b.skip.size());
  if (nn > 2 * n) return -1;
  std::copy(b.bmin.begin(), b.bmin.end(), out_bmin);
  std::copy(b.bmax.begin(), b.bmax.end(), out_bmax);
  std::copy(b.leaf_first.begin(), b.leaf_first.end(), out_leaf_first);
  std::copy(b.leaf_count.begin(), b.leaf_count.end(), out_leaf_count);
  std::copy(b.skip.begin(), b.skip.end(), out_skip);
  std::copy(b.perm.begin(), b.perm.end(), out_perm);
  return nn;
}

}  // extern "C"
