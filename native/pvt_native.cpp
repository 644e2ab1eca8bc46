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

// ---------------------------------------------------------------------------
// Epoch batch pipeline: a background producer thread that shuffles the epoch
// and pre-gathers upcoming batches into a ring of host buffers, so batch
// assembly (shuffle + gather) overlaps the device step instead of sitting on
// the critical path. This is the native replacement for a Python-thread
// prefetch loop: the producer never touches the GIL.
// ---------------------------------------------------------------------------
#include <condition_variable>
#include <mutex>

namespace {

struct Pipeline {
  const float* src = nullptr;
  int64_t n_rows = 0;
  int64_t row_elems = 0;
  int64_t batch = 0;
  uint64_t seed = 0;
  int num_threads = 1;

  int depth = 0;                    // ring capacity (in batches)
  std::vector<std::vector<float>> ring;
  std::vector<int64_t> ring_rows;   // valid rows per slot (short final batch)
  int64_t head = 0, tail = 0;       // producer writes head, consumer reads tail

  std::vector<int32_t> perm;
  uint64_t epoch = 0;
  int64_t cursor = 0;               // next row within the current epoch

  std::mutex mu;
  std::condition_variable cv_prod, cv_cons;
  std::atomic<bool> stop{false};
  std::thread worker;

  int64_t batches_per_epoch() const {
    return (n_rows + batch - 1) / batch;
  }

  void reshuffle() {
    pvt_shuffle_indices(n_rows, seed, epoch, perm.data());
    cursor = 0;
  }

  void produce_one(std::vector<float>& buf, int64_t& rows_out) {
    int64_t rows = n_rows - cursor < batch ? n_rows - cursor : batch;
    pvt_gather_f32(src, perm.data() + cursor, rows, row_elems, buf.data(),
                   num_threads);
    rows_out = rows;
    cursor += rows;
    if (cursor >= n_rows) {
      ++epoch;
      reshuffle();
    }
  }

  void run() {
    while (true) {
      std::unique_lock<std::mutex> lk(mu);
      cv_prod.wait(lk, [&] { return stop.load() || head - tail < depth; });
      if (stop.load()) return;
      int slot = static_cast<int>(head % depth);
      lk.unlock();
      produce_one(ring[slot], ring_rows[slot]);   // gather outside the lock
      lk.lock();
      ++head;
      cv_cons.notify_one();
    }
  }
};

}  // namespace

extern "C" {

void* pvt_pipeline_create(const float* src, int64_t n_rows, int64_t row_elems,
                          int64_t batch, uint64_t seed, int depth,
                          int num_threads) {
  auto* p = new Pipeline();
  p->src = src;
  p->n_rows = n_rows;
  p->row_elems = row_elems;
  p->batch = batch;
  p->seed = seed;
  p->num_threads = num_threads > 0 ? num_threads : 1;
  p->depth = depth > 0 ? depth : 2;
  p->ring.resize(p->depth);
  p->ring_rows.assign(p->depth, 0);
  for (auto& b : p->ring)
    b.resize(static_cast<size_t>(batch) * static_cast<size_t>(row_elems));
  p->perm.resize(n_rows);
  p->reshuffle();
  p->worker = std::thread(&Pipeline::run, p);
  return p;
}

// Blocks until the next batch is ready; copies it into dst (capacity
// batch*row_elems floats) and returns the number of valid rows, or -1 if
// the pipeline was shut down while (or before) waiting.
int64_t pvt_pipeline_next(void* handle, float* dst) {
  auto* p = static_cast<Pipeline*>(handle);
  std::unique_lock<std::mutex> lk(p->mu);
  p->cv_cons.wait(lk, [&] { return p->stop.load() || p->head > p->tail; });
  if (p->stop.load()) return -1;
  int slot = static_cast<int>(p->tail % p->depth);
  int64_t rows = p->ring_rows[slot];
  std::memcpy(dst, p->ring[slot].data(),
              sizeof(float) * static_cast<size_t>(rows) *
                  static_cast<size_t>(p->row_elems));
  ++p->tail;
  p->cv_prod.notify_one();
  return rows;
}

// Zero-copy variant: blocks until the next batch is ready and returns a
// POINTER to the ring slot (rows written to *rows_out; nullptr + -1 on
// shutdown). The slot stays owned by the consumer — the producer will not
// overwrite it — until pvt_pipeline_release advances the ring. Contract:
// one acquire, then one release, single consumer.
const float* pvt_pipeline_acquire(void* handle, int64_t* rows_out) {
  auto* p = static_cast<Pipeline*>(handle);
  std::unique_lock<std::mutex> lk(p->mu);
  p->cv_cons.wait(lk, [&] { return p->stop.load() || p->head > p->tail; });
  if (p->stop.load()) {
    *rows_out = -1;
    return nullptr;
  }
  int slot = static_cast<int>(p->tail % p->depth);
  *rows_out = p->ring_rows[slot];
  return p->ring[slot].data();
}

void pvt_pipeline_release(void* handle) {
  auto* p = static_cast<Pipeline*>(handle);
  std::lock_guard<std::mutex> lk(p->mu);
  ++p->tail;
  p->cv_prod.notify_one();
}

void pvt_pipeline_destroy(void* handle) {
  auto* p = static_cast<Pipeline*>(handle);
  {
    std::lock_guard<std::mutex> lk(p->mu);
    p->stop.store(true);
  }
  // wake BOTH sides: the worker (to exit) and any consumer blocked in
  // pvt_pipeline_next (it returns -1 instead of waiting on freed state)
  p->cv_prod.notify_all();
  p->cv_cons.notify_all();
  p->worker.join();
  delete p;
}

}  // extern "C"
