// Monotonic alignment search — native CPU kernel (OpenMP over batch).
//
// Role parity with the reference's single native component
// (/root/reference/monotonic_align/core.pyx, Cython prange/nogil): a
// batch-parallel Viterbi-style max-path DP used when running on CPU hosts
// (the TPU path uses the Pallas kernel in ops/monotonic_align_pallas.py).
//
// Layout: values (B, T_y, T_x) float32 row-major, modified in place;
// paths (B, T_y, T_x) float32 zero-initialised by the caller.
//
// Build: see native/Makefile (produces libmonotonic_align.so, loaded via
// ctypes in mockingbird_tpu/ops/monotonic_align_native.py).

#include <algorithm>
#include <cstdint>
#include <limits>

namespace {

constexpr float kNegInf = -std::numeric_limits<float>::infinity();

void maximum_path_single(float* value, float* path, int t_y, int t_x,
                         int64_t stride_y) {
  // forward DP (in place on `value`)
  for (int y = 0; y < t_y; ++y) {
    const int x_lo = std::max(0, t_x + y - t_y);
    const int x_hi = std::min(t_x, y + 1);
    float* row = value + static_cast<int64_t>(y) * stride_y;
    const float* prev = row - stride_y;
    for (int x = x_lo; x < x_hi; ++x) {
      const float v_cur = (x == y) ? kNegInf : prev[x];
      const float v_prev =
          (x == 0) ? ((y == 0) ? 0.0f : kNegInf) : prev[x - 1];
      row[x] += std::max(v_cur, v_prev);
    }
  }
  // backtrack
  int index = t_x - 1;
  for (int y = t_y - 1; y >= 0; --y) {
    path[static_cast<int64_t>(y) * stride_y + index] = 1.0f;
    if (index != 0) {
      const float* prev = value + static_cast<int64_t>(y - 1) * stride_y;
      if (index == y || prev[index] < prev[index - 1]) --index;
    }
  }
}

}  // namespace

extern "C" {

// values/paths: (b, t_y_max, t_x_max) row-major float32.
// t_ys/t_xs: per-batch lengths.
void maximum_path_batch(float* values, float* paths, const int32_t* t_ys,
                        const int32_t* t_xs, int32_t b, int32_t t_y_max,
                        int32_t t_x_max) {
  const int64_t plane = static_cast<int64_t>(t_y_max) * t_x_max;
#pragma omp parallel for schedule(dynamic)
  for (int32_t i = 0; i < b; ++i) {
    maximum_path_single(values + i * plane, paths + i * plane, t_ys[i],
                        t_xs[i], t_x_max);
  }
}

}  // extern "C"
