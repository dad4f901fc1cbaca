// Native (C++) sliding-window PMI graph builder.
//
// Host-side comparison point / fast path for the on-device JAX counting in
// pytextgcn_tpu/build/windows.py. Functionally equivalent to the reference's
// single-threaded Cython kernel (/root/reference/textgcn/lib/clib/
// graphbuilder.pyx:23-211) but written independently and multithreaded:
// counting parallelizes over documents with relaxed atomic increments into
// the packed upper-triangular count array, and the O(V^2) PMI scan
// parallelizes over rows with a deterministic two-pass (count, prefix-sum,
// fill) COO extraction that reproduces the reference's emission order
// (ascending (i, j), both directions interleaved; graphbuilder.pyx:181-191).
//
// Reference semantics kept exactly (see tests/test_windows.py goldens):
//   - window starts j in [0, seq_len - window_size]; a window whose last
//     slot is padding ends the document unless j == 0 (pyx:96-100)
//   - pairs (k, l), k <= l, counted while both tokens are non-padding
//     (pyx:103-113)
//   - p_i = c_ii / n_windows in float; pmi = log(p_ij / (p_i * p_j)) with
//     float operands and double log, kept iff pmi > 1e-10f (pyx:146-166)
//   - no self-loops (the GCN normalization adds them; pyx:198-205)
// Defined deviation: seq_len < window_size (unsigned underflow / OOB reads
// in the reference) is treated as a single j == 0 window per document.

#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

namespace {

inline int64_t tri_diag_index(int64_t row, int64_t col, int64_t n) {
  const int64_t r = row < col ? row : col;
  const int64_t c = row < col ? col : row;
  return r * n + c - ((r + 1) * r) / 2;
}

constexpr float kEpsilon = 1e-10f;

}  // namespace

extern "C" {

// Counts word pairs into the packed upper-triangular array `cij`
// (caller-allocated, size n_vocab*(n_vocab+1)/2, zero-initialized).
// Returns the number of sliding windows.
//
// Parallelization over documents. For small vocabularies each thread counts
// into a private triangular array merged afterwards (plain adds, no cache
// contention); above a memory threshold threads share `cij` with relaxed
// atomic increments (hub words then contend, but private arrays would cost
// threads * V^2/2 * 4 bytes).
uint64_t tg_sliding_window(const int32_t* X, int64_t n_docs, int64_t seq_len,
                           int32_t n_vocab, int32_t window, int32_t n_threads,
                           uint32_t* cij) {
  if (n_threads <= 0) n_threads = (int32_t)std::thread::hardware_concurrency();
  if (n_threads < 1) n_threads = 1;
  const int64_t w = window;
  const int64_t n_pos = seq_len >= w ? seq_len - w + 1 : 1;
  const int64_t tri = (int64_t)n_vocab * (n_vocab + 1) / 2;
  std::atomic<uint64_t> total_windows{0};

  auto worker = [&](int64_t d_begin, int64_t d_end, uint32_t* buf,
                    bool atomic_add) {
    uint64_t windows = 0;
    for (int64_t d = d_begin; d < d_end; ++d) {
      const int32_t* doc = X + d * seq_len;
      for (int64_t j = 0; j < n_pos; ++j) {
        const int64_t last = j + w - 1;
        if (j != 0 && (last >= seq_len || doc[last] == -1)) break;
        ++windows;
        for (int64_t k = j; k < j + w; ++k) {
          if (k >= seq_len || doc[k] == -1) break;
          for (int64_t l = k; l < j + w; ++l) {
            if (l >= seq_len || doc[l] == -1) break;
            const int64_t idx = tri_diag_index(doc[k], doc[l], n_vocab);
            if (atomic_add) {
              __atomic_fetch_add(&buf[idx], 1u, __ATOMIC_RELAXED);
            } else {
              ++buf[idx];
            }
          }
        }
      }
    }
    total_windows.fetch_add(windows, std::memory_order_relaxed);
  };

  const bool small = n_docs < 2 * n_threads;
  constexpr int64_t kPrivateBudget = int64_t(512) << 20;  // bytes
  const bool privatize =
      !small && (int64_t)(n_threads - 1) * tri * 4 <= kPrivateBudget;

  if (n_threads == 1 || small) {
    worker(0, n_docs, cij, /*atomic_add=*/false);
  } else if (privatize) {
    std::vector<std::vector<uint32_t>> privs(n_threads - 1);
    std::vector<std::thread> threads;
    const int64_t per = (n_docs + n_threads - 1) / n_threads;
    for (int32_t t = 1; t < n_threads; ++t) {
      const int64_t b = t * per;
      const int64_t e = std::min<int64_t>(b + per, n_docs);
      if (b >= e) break;
      // allocate + zero inside the worker: parallel first-touch page
      // placement instead of a serial up-to-512MB memset on this thread
      auto* priv = &privs[t - 1];
      threads.emplace_back([&, b, e, priv]() {
        priv->assign((size_t)tri, 0);
        worker(b, e, priv->data(), false);
      });
    }
    worker(0, std::min<int64_t>(per, n_docs), cij, false);  // main thread
    for (auto& th : threads) th.join();
    // merge (parallel over ranges of the triangular array)
    std::vector<std::thread> mergers;
    const int64_t chunk = (tri + n_threads - 1) / n_threads;
    for (int32_t t = 0; t < n_threads; ++t) {
      const int64_t b = t * chunk, e = std::min<int64_t>(b + chunk, tri);
      if (b >= e) break;
      mergers.emplace_back([&, b, e]() {
        for (auto& p : privs) {
          if (p.empty()) continue;
          const uint32_t* src_p = p.data();
          for (int64_t i = b; i < e; ++i) cij[i] += src_p[i];
        }
      });
    }
    for (auto& th : mergers) th.join();
  } else {
    std::vector<std::thread> threads;
    const int64_t per = (n_docs + n_threads - 1) / n_threads;
    for (int32_t t = 0; t < n_threads; ++t) {
      const int64_t b = t * per;
      const int64_t e = std::min<int64_t>(b + per, n_docs);
      if (b >= e) break;
      threads.emplace_back(worker, b, e, cij, /*atomic_add=*/true);
    }
    for (auto& th : threads) th.join();
  }
  return total_windows.load();
}

// PMI scan over the packed count array; emits symmetric COO edges.
// Outputs are malloc'd; release with tg_free. Returns 0 on success.
int32_t tg_pmi_edges(const uint32_t* cij, int32_t n_vocab, uint64_t n_windows,
                     int32_t n_threads, int32_t** coo_out, float** w_out,
                     int64_t* n_edges_out) {
  if (n_threads <= 0) n_threads = (int32_t)std::thread::hardware_concurrency();
  if (n_threads < 1) n_threads = 1;
  const int64_t v = n_vocab;
  const float nw = (float)n_windows;

  std::vector<float> p(v);
  for (int64_t i = 0; i < v; ++i)
    p[i] = (float)cij[tri_diag_index(i, i, v)] / nw;

  // pass 1: count surviving pairs per row i (over columns j > i)
  std::vector<int64_t> row_counts(v, 0);
  auto count_worker = [&](int64_t begin, int64_t end) {
    for (int64_t i = begin; i < end; ++i) {
      int64_t cnt = 0;
      const float pi = p[i];
      for (int64_t j = i + 1; j < v; ++j) {
        const uint32_t c = cij[tri_diag_index(i, j, v)];
        if (c == 0 || pi == 0.0f || p[j] == 0.0f) continue;
        const float p_ij = (float)c / nw;
        const float pmi = (float)std::log((double)(p_ij / (pi * p[j])));
        if (pmi > kEpsilon) ++cnt;
      }
      row_counts[i] = cnt;
    }
  };
  {
    std::vector<std::thread> threads;
    const int64_t per = (v + n_threads - 1) / n_threads;
    for (int32_t t = 0; t < n_threads; ++t) {
      const int64_t b = t * per, e = std::min<int64_t>(b + per, v);
      if (b >= e) break;
      threads.emplace_back(count_worker, b, e);
    }
    for (auto& th : threads) th.join();
  }

  std::vector<int64_t> row_offsets(v + 1, 0);
  for (int64_t i = 0; i < v; ++i) row_offsets[i + 1] = row_offsets[i] + row_counts[i];
  const int64_t n_pairs = row_offsets[v];
  const int64_t n_edges = 2 * n_pairs;  // both directions

  int32_t* coo = (int32_t*)std::malloc(sizeof(int32_t) * 2 * (size_t)n_edges);
  float* weights = (float*)std::malloc(sizeof(float) * (size_t)n_edges);
  if ((!coo || !weights) && n_edges > 0) {
    std::free(coo);
    std::free(weights);
    return -1;
  }

  // pass 2: fill, interleaving (i, j) and (j, i) like the reference
  auto fill_worker = [&](int64_t begin, int64_t end) {
    for (int64_t i = begin; i < end; ++i) {
      int64_t k = 2 * row_offsets[i];  // edge slot (pairs are interleaved)
      const float pi = p[i];
      for (int64_t j = i + 1; j < v; ++j) {
        const uint32_t c = cij[tri_diag_index(i, j, v)];
        if (c == 0 || pi == 0.0f || p[j] == 0.0f) continue;
        const float p_ij = (float)c / nw;
        const float pmi = (float)std::log((double)(p_ij / (pi * p[j])));
        if (pmi > kEpsilon) {
          coo[2 * k] = (int32_t)i;
          coo[2 * k + 1] = (int32_t)j;
          weights[k] = pmi;
          ++k;
          coo[2 * k] = (int32_t)j;
          coo[2 * k + 1] = (int32_t)i;
          weights[k] = pmi;
          ++k;
        }
      }
    }
  };
  {
    std::vector<std::thread> threads;
    const int64_t per = (v + n_threads - 1) / n_threads;
    for (int32_t t = 0; t < n_threads; ++t) {
      const int64_t b = t * per, e = std::min<int64_t>(b + per, v);
      if (b >= e) break;
      threads.emplace_back(fill_worker, b, e);
    }
    for (auto& th : threads) th.join();
  }

  *coo_out = coo;
  *w_out = weights;
  *n_edges_out = n_edges;
  return 0;
}

// Convenience one-shot: allocates the packed count array internally.
int32_t tg_word_word_edges(const int32_t* X, int64_t n_docs, int64_t seq_len,
                           int32_t n_vocab, int32_t window, int32_t n_threads,
                           int32_t** coo_out, float** w_out,
                           int64_t* n_edges_out, uint64_t* n_windows_out) {
  const int64_t v = n_vocab;
  const size_t tri = (size_t)(v * (v + 1) / 2);
  uint32_t* cij = (uint32_t*)std::calloc(tri, sizeof(uint32_t));
  if (!cij) return -1;
  const uint64_t n_windows =
      tg_sliding_window(X, n_docs, seq_len, n_vocab, window, n_threads, cij);
  const int32_t rc =
      tg_pmi_edges(cij, n_vocab, n_windows, n_threads, coo_out, w_out, n_edges_out);
  std::free(cij);
  if (n_windows_out) *n_windows_out = n_windows;
  return rc;
}

void tg_free(void* p) { std::free(p); }

}  // extern "C"
