// MATLAB-exact bicubic resize — native host-pipeline core.
//
// Same numerics as ciaosr_tpu/core/resize.py (cubic a=-0.5, antialias
// kernel widening on downscale, symmetric boundary, per-row weight
// normalization; spec: reference utils_image.py:705-911). Separable
// two-pass apply, float64 accumulation, multithreaded over rows.
//
// C ABI (ctypes): see ciaosr_tpu/data/native.py.

#include <algorithm>
#include <functional>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

double cubic(double x) {
  double ax = std::fabs(x);
  if (ax <= 1.0) return 1.5 * ax * ax * ax - 2.5 * ax * ax + 1.0;
  if (ax <= 2.0) return -0.5 * ax * ax * ax + 2.5 * ax * ax - 4.0 * ax + 2.0;
  return 0.0;
}

struct AxisTable {
  int taps;
  std::vector<int> idx;      // (out * taps) source indices, reflected
  std::vector<double> wgt;   // (out * taps) normalized weights
};

AxisTable make_table(int in_len, int out_len, double scale, bool antialias) {
  double kw = 4.0;
  bool shrink = scale < 1.0 && antialias;
  if (shrink) kw /= scale;
  int taps = static_cast<int>(std::ceil(kw)) + 2;

  AxisTable t;
  t.taps = taps;
  t.idx.resize(static_cast<size_t>(out_len) * taps);
  t.wgt.resize(static_cast<size_t>(out_len) * taps);

  for (int i = 0; i < out_len; ++i) {
    double u = (i + 1) / scale + 0.5 * (1.0 - 1.0 / scale);
    double left = std::floor(u - kw / 2.0);
    double sum = 0.0;
    for (int j = 0; j < taps; ++j) {
      double pos = left + j;
      double d = u - pos;
      double w = shrink ? scale * cubic(d * scale) : cubic(d);
      t.wgt[static_cast<size_t>(i) * taps + j] = w;
      sum += w;
      long k = static_cast<long>(pos) - 1;  // 0-based
      if (k < 0) k = -1 - k;                // symmetric reflection
      if (k >= in_len) k = 2L * in_len - 1 - k;
      k = std::max(0L, std::min(static_cast<long>(in_len - 1), k));
      t.idx[static_cast<size_t>(i) * taps + j] = static_cast<int>(k);
    }
    for (int j = 0; j < taps; ++j)
      t.wgt[static_cast<size_t>(i) * taps + j] /= sum;
  }
  return t;
}

void parallel_for(int n, int n_threads, const std::function<void(int, int)>& fn) {
  n_threads = std::max(1, std::min(n_threads, n));
  if (n_threads == 1) {
    fn(0, n);
    return;
  }
  std::vector<std::thread> pool;
  int chunk = (n + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    int lo = t * chunk;
    int hi = std::min(n, lo + chunk);
    if (lo >= hi) break;
    pool.emplace_back(fn, lo, hi);
  }
  for (auto& th : pool) th.join();
}

}  // namespace

extern "C" {

// src: (h, w, c) float32 HWC. dst: (oh, ow, c) float32.
// scale: the MATLAB scale argument (out may differ from ceil(in*scale)
// when callers pass explicit sizes, as im_resize does).
void matlab_bicubic_resize(const float* src, int h, int w, int c,
                           float* dst, int oh, int ow, double scale,
                           int antialias, int n_threads) {
  AxisTable th_ = make_table(h, oh, scale, antialias != 0);
  AxisTable tw_ = make_table(w, ow, scale, antialias != 0);

  // pass 1: rows (h -> oh), width unchanged
  std::vector<double> tmp(static_cast<size_t>(oh) * w * c);
  parallel_for(oh, n_threads, [&](int lo, int hi) {
    for (int i = lo; i < hi; ++i) {
      double* out_row = &tmp[static_cast<size_t>(i) * w * c];
      std::memset(out_row, 0, sizeof(double) * w * c);
      for (int j = 0; j < th_.taps; ++j) {
        double wgt = th_.wgt[static_cast<size_t>(i) * th_.taps + j];
        const float* src_row =
            &src[static_cast<size_t>(th_.idx[static_cast<size_t>(i) * th_.taps + j]) * w * c];
        for (int k = 0; k < w * c; ++k) out_row[k] += wgt * src_row[k];
      }
    }
  });

  // pass 2: cols (w -> ow)
  parallel_for(oh, n_threads, [&](int lo, int hi) {
    for (int i = lo; i < hi; ++i) {
      const double* in_row = &tmp[static_cast<size_t>(i) * w * c];
      float* out_row = &dst[static_cast<size_t>(i) * ow * c];
      for (int x = 0; x < ow; ++x) {
        for (int ch = 0; ch < c; ++ch) {
          double acc = 0.0;
          for (int j = 0; j < tw_.taps; ++j) {
            acc += tw_.wgt[static_cast<size_t>(x) * tw_.taps + j] *
                   in_row[static_cast<size_t>(
                              tw_.idx[static_cast<size_t>(x) * tw_.taps + j]) * c + ch];
          }
          out_row[static_cast<size_t>(x) * c + ch] = static_cast<float>(acc);
        }
      }
    }
  });
}

int ciaosr_native_version() { return 1; }

}  // extern "C"
