// wcmc_native: native runtime for the data pipeline.
//
// The reference framework leans on torch's C++ DataLoader machinery for
// its host-side data path (reference train_kpcn.py:177-188). This
// library is the torch-free equivalent: multithreaded patch extraction
// with the HWSC -> SHWC layout transpose fused into the gather, alias-
// method importance sampling for patch coordinates, and batched patch
// collation. Exposed through a plain C ABI consumed via ctypes
// (wcmc_tpu/data/native_loader.py).

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <functional>
#include <random>
#include <thread>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Parallel helpers
// ---------------------------------------------------------------------------

static void parallel_for(int64_t n, int n_threads,
                         const std::function<void(int64_t, int64_t)>& fn) {
  if (n_threads <= 1 || n < 2) {
    fn(0, n);
    return;
  }
  std::vector<std::thread> threads;
  int64_t chunk = (n + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    int64_t lo = t * chunk;
    int64_t hi = std::min<int64_t>(n, lo + chunk);
    if (lo >= hi) break;
    threads.emplace_back([&fn, lo, hi] { fn(lo, hi); });
  }
  for (auto& th : threads) th.join();
}

// ---------------------------------------------------------------------------
// Patch extraction
//
// src layout: (H, W, S, C) float32 (the on-disk cache layout).
// out layout: (N, S, P, P, C) float32 (the model batch layout) --
// the sample-axis transpose is fused into the copy.
// For pixel-space buffers pass S = 1 and get (N, P, P, C).
// ---------------------------------------------------------------------------

void wn_extract_patches(const float* src, int64_t H, int64_t W, int64_t S,
                        int64_t C, const int32_t* coords /* n*2 (y,x) */,
                        int64_t n, int64_t P, float* out, int n_threads) {
  const int64_t row_stride = W * S * C;
  const int64_t pix_stride = S * C;
  const int64_t patch_elems = S * P * P * C;
  parallel_for(n, n_threads, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      const int64_t y0 = coords[2 * i];
      const int64_t x0 = coords[2 * i + 1];
      float* dst = out + i * patch_elems;
      for (int64_t s = 0; s < S; ++s) {
        for (int64_t y = 0; y < P; ++y) {
          const float* src_row =
              src + (y0 + y) * row_stride + x0 * pix_stride + s * C;
          float* dst_row = dst + ((s * P + y) * P) * C;
          if (S == 1) {
            // contiguous row: single memcpy
            std::memcpy(dst_row, src_row, P * C * sizeof(float));
          } else {
            for (int64_t x = 0; x < P; ++x) {
              std::memcpy(dst_row + x * C, src_row + x * pix_stride,
                          C * sizeof(float));
            }
          }
        }
      }
    }
  });
}

// ---------------------------------------------------------------------------
// Alias-method sampler for the patch importance map.
// Build O(n), sample O(1) -- replaces np.random.choice(p=...) which is
// O(n) per draw.
// ---------------------------------------------------------------------------

struct AliasTable {
  std::vector<float> prob;
  std::vector<int32_t> alias;
  int64_t n;
};

void* wn_alias_build(const float* weights, int64_t n) {
  auto* t = new AliasTable();
  t->n = n;
  t->prob.resize(n);
  t->alias.resize(n);
  double total = 0.0;
  for (int64_t i = 0; i < n; ++i) total += weights[i];
  if (total <= 0.0) {  // degenerate map -> uniform
    for (int64_t i = 0; i < n; ++i) {
      t->prob[i] = 1.0f;
      t->alias[i] = static_cast<int32_t>(i);
    }
    return t;
  }
  std::vector<double> scaled(n);
  for (int64_t i = 0; i < n; ++i) scaled[i] = weights[i] * n / total;
  std::vector<int32_t> small, large;
  small.reserve(n);
  large.reserve(n);
  for (int64_t i = 0; i < n; ++i) {
    (scaled[i] < 1.0 ? small : large).push_back(static_cast<int32_t>(i));
  }
  while (!small.empty() && !large.empty()) {
    int32_t s = small.back();
    small.pop_back();
    int32_t l = large.back();
    large.pop_back();
    t->prob[s] = static_cast<float>(scaled[s]);
    t->alias[s] = l;
    scaled[l] = scaled[l] + scaled[s] - 1.0;
    (scaled[l] < 1.0 ? small : large).push_back(l);
  }
  for (int32_t i : small) {
    t->prob[i] = 1.0f;
    t->alias[i] = i;
  }
  for (int32_t i : large) {
    t->prob[i] = 1.0f;
    t->alias[i] = i;
  }
  return t;
}

void wn_alias_sample(void* handle, int64_t count, uint64_t seed,
                     int32_t* out) {
  auto* t = static_cast<AliasTable*>(handle);
  std::mt19937_64 rng(seed);
  std::uniform_real_distribution<double> uni(0.0, 1.0);
  for (int64_t i = 0; i < count; ++i) {
    const int64_t k = std::min<int64_t>(
        static_cast<int64_t>(uni(rng) * t->n), t->n - 1);
    out[i] = (uni(rng) < t->prob[k]) ? static_cast<int32_t>(k) : t->alias[k];
  }
}

void wn_alias_free(void* handle) { delete static_cast<AliasTable*>(handle); }

// ---------------------------------------------------------------------------
// Batched sanitation: NaN/Inf -> cap (reference datasets.py:622-624),
// parallel over rows.
// ---------------------------------------------------------------------------

void wn_sanitize(float* data, int64_t n, float cap, int n_threads) {
  parallel_for(n, n_threads, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      float v = data[i];
      if (!(v == v) || v - v != 0.0f) {  // NaN or +/-inf: corrupt
        data[i] = 0.0f;  // zero, not a sentinel — see preprocess.sanitize
      } else if (v > cap) {
        data[i] = cap;
      } else if (v < -cap) {
        data[i] = -cap;
      }
    }
  });
}

int wn_version() { return 1; }

}  // extern "C"
