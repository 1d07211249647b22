// Multithreaded host-memory row gather for the offloaded V store.
//
// Native counterpart of the reference's pinned-memory gather-copy CUDA
// kernels (reference kernels/gather_copy.cu:81-419, copy.cuh:303-456):
// on TPU hosts the per-step fetch of selected V chunks from host DRAM
// is a CPU-side gather feeding an H2D transfer, so the hot loop is a
// bank-parallel memcpy over ~2 KB rows. std::thread workers split the
// row range; each row is one memcpy (rows are chunk-major-contiguous
// by layout design).
//
// Build: g++ -O3 -march=native -shared -fPIC -pthread host_gather.cpp
//        -o libhost_gather.so
//
// Exposed C ABI (ctypes):
//   gather_rows(src, idx, dst, n_rows, row_bytes, n_threads)
//     dst[i, :] = src[idx[i], :]            for i in [0, n_rows)
//   gather_rows_masked(src, idx, skip, dst, n, row_bytes, n_threads)
//     dst[i, :] = src[idx[i], :]            where skip[i] == 0
//     (skipped rows are left untouched — the temporal-locality "hit"
//      slots, reference map.cuh:754-796 / cnts semantics)

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

void gather_range(const char* src, const int64_t* idx, const int8_t* skip,
                  char* dst, int64_t lo, int64_t hi, int64_t row_bytes) {
  for (int64_t i = lo; i < hi; ++i) {
    if (skip && skip[i]) continue;
    std::memcpy(dst + i * row_bytes, src + idx[i] * row_bytes, row_bytes);
  }
}

void run_threads(const char* src, const int64_t* idx, const int8_t* skip,
                 char* dst, int64_t n_rows, int64_t row_bytes,
                 int n_threads) {
  if (n_threads <= 1 || n_rows < 2 * n_threads) {
    gather_range(src, idx, skip, dst, 0, n_rows, row_bytes);
    return;
  }
  std::vector<std::thread> workers;
  workers.reserve(n_threads);
  int64_t per = (n_rows + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    int64_t lo = t * per;
    int64_t hi = lo + per < n_rows ? lo + per : n_rows;
    if (lo >= hi) break;
    workers.emplace_back(gather_range, src, idx, skip, dst, lo, hi,
                         row_bytes);
  }
  for (auto& w : workers) w.join();
}

}  // namespace

extern "C" {

void gather_rows(const void* src, const int64_t* idx, void* dst,
                 int64_t n_rows, int64_t row_bytes, int n_threads) {
  run_threads(static_cast<const char*>(src), idx, nullptr,
              static_cast<char*>(dst), n_rows, row_bytes, n_threads);
}

void gather_rows_masked(const void* src, const int64_t* idx,
                        const int8_t* skip, void* dst, int64_t n_rows,
                        int64_t row_bytes, int n_threads) {
  run_threads(static_cast<const char*>(src), idx, skip,
              static_cast<char*>(dst), n_rows, row_bytes, n_threads);
}

}  // extern "C"
