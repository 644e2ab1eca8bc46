// pvt_native: C++ host-side input pipeline for pyroved_tpu.
//
// The reference's input pipeline is torch's Python DataLoader
// (pyroved/utils/data.py:26-38). The TPU-native framework keeps small
// datasets resident in HBM, but for datasets larger than device memory the
// host must shuffle, gather, and normalize batches each step without
// stalling the device. These routines implement that path in C++
// (multithreaded gather + branch-free RNG) and are loaded via ctypes —
// no pybind11 dependency.
//
// Build: g++ -O3 -march=native -shared -fPIC -o libpvt_native.so pvt_native.cpp -lpthread
#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// splitmix64: deterministic, seedable, cheap.
static inline uint64_t splitmix64(uint64_t& state) {
  uint64_t z = (state += 0x9E3779B97F4A7C15ULL);
  z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ULL;
  z = (z ^ (z >> 27)) * 0x94D049BB133111EBULL;
  return z ^ (z >> 31);
}

// Fisher-Yates permutation of [0, n) into out, keyed by (seed, epoch).
void pvt_shuffle_indices(int64_t n, uint64_t seed, uint64_t epoch,
                         int32_t* out) {
  for (int64_t i = 0; i < n; ++i) out[i] = static_cast<int32_t>(i);
  uint64_t state = seed * 0x9E3779B97F4A7C15ULL + epoch + 1;
  for (int64_t i = n - 1; i > 0; --i) {
    uint64_t r = splitmix64(state) % static_cast<uint64_t>(i + 1);
    int32_t tmp = out[i];
    out[i] = out[r];
    out[r] = tmp;
  }
}

static void parallel_for(int64_t n, int num_threads,
                         void (*fn)(int64_t, int64_t, void*), void* ctx) {
  if (num_threads <= 1 || n < (1 << 14)) {
    fn(0, n, ctx);
    return;
  }
  std::vector<std::thread> threads;
  int64_t chunk = (n + num_threads - 1) / num_threads;
  for (int t = 0; t < num_threads; ++t) {
    int64_t lo = t * chunk;
    int64_t hi = lo + chunk < n ? lo + chunk : n;
    if (lo >= hi) break;
    threads.emplace_back(fn, lo, hi, ctx);
  }
  for (auto& th : threads) th.join();
}

struct GatherCtx {
  const float* src;
  const int32_t* idx;
  int64_t row_elems;
  float* dst;
};

static void gather_range(int64_t lo, int64_t hi, void* vctx) {
  auto* c = static_cast<GatherCtx*>(vctx);
  for (int64_t i = lo; i < hi; ++i) {
    std::memcpy(c->dst + i * c->row_elems,
                c->src + static_cast<int64_t>(c->idx[i]) * c->row_elems,
                sizeof(float) * static_cast<size_t>(c->row_elems));
  }
}

// Gather rows src[idx[i], :] -> dst[i, :]; multithreaded over rows.
void pvt_gather_f32(const float* src, const int32_t* idx, int64_t n_idx,
                    int64_t row_elems, float* dst, int num_threads) {
  GatherCtx ctx{src, idx, row_elems, dst};
  parallel_for(n_idx, num_threads, gather_range, &ctx);
}

struct U8Ctx {
  const uint8_t* src;
  float* dst;
  float scale;
};

static void u8_range(int64_t lo, int64_t hi, void* vctx) {
  auto* c = static_cast<U8Ctx*>(vctx);
  for (int64_t i = lo; i < hi; ++i)
    c->dst[i] = static_cast<float>(c->src[i]) * c->scale;
}

// uint8 -> float32 with scaling (e.g. 1/255 image normalization).
void pvt_u8_to_f32(const uint8_t* src, int64_t n, float scale, float* dst,
                   int num_threads) {
  U8Ctx ctx{src, dst, scale};
  parallel_for(n, num_threads, u8_range, &ctx);
}

}  // extern "C"
