// Native host-side kernels for g4s_tpu.
//
// The TPU compute path is JAX/XLA/Pallas; these C++ kernels cover the
// host-side runtime work the reference also keeps native:
//   - Matrix-Market body parsing (the data-loader role of the reference's
//     istream reader, mm/inc/CSR.h:480-669 — this parser is ~20x faster
//     than istream/numpy text parsing),
//   - the SpGEMM symbolic phase (the graph-builder role: expansion map +
//     key sort + duplicate collapse that sizes C exactly, the host analog
//     of hash_mult.h's symbolic pass, done once per sparsity pattern),
//   - BWELL window packing for the Pallas SpMV kernel.
//
// Exposed with a plain C ABI for ctypes (no pybind11 dependency).
// Build: g++ -O3 -march=native -std=c++17 -shared -fPIC host_kernels.cc
//        -o libg4s_host.so

#include <algorithm>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <numeric>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Fast text triplet parser. buf: whitespace-separated numbers; fills out
// row-major [n_entries x ncomp]. Returns entries parsed (<= max_entries).
// ---------------------------------------------------------------------------
long g4s_parse_numbers(const char* buf, long len, long ncomp, double* out,
                       long max_entries) {
  const char* p = buf;
  const char* end = buf + len;
  long count = 0;
  long comp = 0;
  while (p < end && count < max_entries) {
    while (p < end && (*p == ' ' || *p == '\t' || *p == '\n' || *p == '\r'))
      ++p;
    if (p >= end) break;
    char* next = nullptr;
    double v = strtod(p, &next);
    if (next == p) break;  // unparseable garbage
    p = next;
    out[count * ncomp + comp] = v;
    if (++comp == ncomp) {
      comp = 0;
      ++count;
    }
  }
  return count;
}

// ---------------------------------------------------------------------------
// SpGEMM symbolic phase (graph builder). Inputs: CSR of A (m x k) and B
// (k x n). Phase 1 (g4s_spgemm_flops) returns the expansion size F so the
// caller can allocate. Phase 2 fills:
//   src_a[F], src_b[F]  : sorted product -> (A nnz, B nnz) sources
//   slot[F]             : output slot of each product in C.data
//   c_rows/c_cols[<=F]  : structure of C (first *nnz_out entries valid)
// Returns nnz of C.
// ---------------------------------------------------------------------------
long g4s_spgemm_flops(const int64_t* a_indptr, const int64_t* a_indices,
                      long a_rows, const int64_t* b_indptr) {
  long f = 0;
  const long annz = a_indptr[a_rows];
  for (long t = 0; t < annz; ++t) {
    const int64_t k = a_indices[t];
    f += b_indptr[k + 1] - b_indptr[k];
  }
  return f;
}

long g4s_spgemm_symbolic(const int64_t* a_indptr, const int64_t* a_indices,
                         long a_rows, const int64_t* b_indptr,
                         const int64_t* b_indices, long b_cols, long F,
                         int64_t* src_a, int64_t* src_b, int32_t* slot,
                         int64_t* c_rows, int64_t* c_cols) {
  // expand products
  std::vector<int64_t> key(F);
  {
    long f = 0;
    for (long r = 0; r < a_rows; ++r) {
      for (int64_t t = a_indptr[r]; t < a_indptr[r + 1]; ++t) {
        const int64_t k = a_indices[t];
        for (int64_t u = b_indptr[k]; u < b_indptr[k + 1]; ++u) {
          src_a[f] = t;
          src_b[f] = u;
          key[f] = r * b_cols + b_indices[u];
          ++f;
        }
      }
    }
  }
  // sort products by output key (stable to keep deterministic source order)
  std::vector<int64_t> order(F);
  std::iota(order.begin(), order.end(), 0);
  std::stable_sort(order.begin(), order.end(),
                   [&](int64_t x, int64_t y) { return key[x] < key[y]; });
  std::vector<int64_t> sa(F), sb(F);
  for (long i = 0; i < F; ++i) {
    sa[i] = src_a[order[i]];
    sb[i] = src_b[order[i]];
  }
  std::memcpy(src_a, sa.data(), F * sizeof(int64_t));
  std::memcpy(src_b, sb.data(), F * sizeof(int64_t));
  // collapse duplicates -> slots + structure
  long nnz = -1;
  int64_t prev = -1;
  for (long i = 0; i < F; ++i) {
    const int64_t kk = key[order[i]];
    if (kk != prev) {
      ++nnz;
      prev = kk;
      c_rows[nnz] = kk / b_cols;
      c_cols[nnz] = kk % b_cols;
    }
    slot[i] = static_cast<int32_t>(nnz);
  }
  return nnz + 1;
}

// ---------------------------------------------------------------------------
// BWELL packing helper: per-pack window block index + lane offsets.
// cols/vals: [n_packs x rpp x width]; lanes out: same shape (int32).
// Returns number of infeasible packs (span >= 256).
// ---------------------------------------------------------------------------
long g4s_bwell_windows(const int64_t* cols, const double* vals, long n_packs,
                       long slots_per_pack, int32_t* b0_out,
                       int32_t* lanes_out) {
  long bad = 0;
  for (long p = 0; p < n_packs; ++p) {
    const int64_t* c = cols + p * slots_per_pack;
    const double* v = vals + p * slots_per_pack;
    int64_t mn = INT64_MAX;
    for (long s = 0; s < slots_per_pack; ++s)
      if (v[s] != 0.0 && c[s] < mn) mn = c[s];
    if (mn == INT64_MAX) mn = 0;
    const int64_t b0 = mn / 128;
    b0_out[p] = static_cast<int32_t>(b0);
    bool ok = true;
    for (long s = 0; s < slots_per_pack; ++s) {
      int64_t lane = (v[s] != 0.0) ? c[s] - b0 * 128 : 0;
      if (lane < 0 || lane >= 256) {
        ok = false;
        lane = 0;
      }
      lanes_out[p * slots_per_pack + s] = static_cast<int32_t>(lane);
    }
    if (!ok) ++bad;
  }
  return bad;
}

}  // extern "C"
