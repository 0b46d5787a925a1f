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
#include <thread>
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
  // Thread-parallel over FLOP-balanced row blocks (the role of the
  // reference's BIN prefix-sum work split, mm/inc/BIN.h:100-122).
  // Keys are row-major (r * b_cols + col), and blocks are row-aligned, so
  // per-block sorted runs concatenate into a globally sorted expansion
  // with NO merge step, and duplicate keys never straddle blocks.
  int T = 1;
  if (const char* e = getenv("G4S_NUM_THREADS")) T = atoi(e);
  else T = (int)std::thread::hardware_concurrency();
  if (T < 1) T = 1;
  if (T > 16) T = 16;
  if (a_rows < 4 * T) T = 1;

  // expansion offset of each row (prefix sum of per-row flops)
  std::vector<int64_t> rowoff(a_rows + 1, 0);
  for (long r = 0; r < a_rows; ++r) {
    int64_t f = 0;
    for (int64_t t = a_indptr[r]; t < a_indptr[r + 1]; ++t) {
      const int64_t k = a_indices[t];
      f += b_indptr[k + 1] - b_indptr[k];
    }
    rowoff[r + 1] = rowoff[r] + f;
  }

  // row-aligned block boundaries balanced by flops
  std::vector<long> rb(T + 1, a_rows);
  rb[0] = 0;
  for (int t = 1; t < T; ++t) {
    const int64_t target = rowoff[a_rows] * t / T;
    rb[t] = std::lower_bound(rowoff.begin(), rowoff.end(), target)
            - rowoff.begin();
    if (rb[t] > a_rows) rb[t] = a_rows;
    if (rb[t] < rb[t - 1]) rb[t] = rb[t - 1];
  }

  std::vector<int64_t> key(F);
  std::vector<long> block_nnz(T, 0);

  auto expand_block = [&](int t) {
    std::vector<int64_t> order;
    long nnz_local = 0;
    int64_t prev = -1;
    for (long r = rb[t]; r < rb[t + 1]; ++r) {
      const int64_t f0 = rowoff[r];
      long f = f0;
      for (int64_t u = a_indptr[r]; u < a_indptr[r + 1]; ++u) {
        const int64_t k = a_indices[u];
        for (int64_t w = b_indptr[k]; w < b_indptr[k + 1]; ++w) {
          src_a[f] = u;
          src_b[f] = w;
          key[f] = r * b_cols + b_indices[w];
          ++f;
        }
      }
      const long fn = f;
      // sort this row's products by key (stable: deterministic sources)
      order.resize(fn - f0);
      std::iota(order.begin(), order.end(), f0);
      std::stable_sort(order.begin(), order.end(),
                       [&](int64_t x, int64_t y) { return key[x] < key[y]; });
      // apply the permutation in place via temporaries (rows are short)
      std::vector<int64_t> ta(fn - f0), tb(fn - f0), tk(fn - f0);
      for (long i = 0; i < fn - f0; ++i) {
        ta[i] = src_a[order[i]];
        tb[i] = src_b[order[i]];
        tk[i] = key[order[i]];
      }
      for (long i = 0; i < fn - f0; ++i) {
        src_a[f0 + i] = ta[i];
        src_b[f0 + i] = tb[i];
        key[f0 + i] = tk[i];
        if (tk[i] != prev) {
          ++nnz_local;
          prev = tk[i];
        }
      }
    }
    block_nnz[t] = nnz_local;
  };

  if (T == 1) {
    expand_block(0);
  } else {
    std::vector<std::thread> ths;
    for (int t = 0; t < T; ++t) ths.emplace_back(expand_block, t);
    for (auto& th : ths) th.join();
  }

  // global slot bases per block
  std::vector<long> base(T + 1, 0);
  for (int t = 0; t < T; ++t) base[t + 1] = base[t] + block_nnz[t];

  auto fill_block = [&](int t) {
    long nnz = base[t] - 1;
    int64_t prev = -1;
    for (long i = rowoff[rb[t]]; i < rowoff[rb[t + 1]]; ++i) {
      const int64_t kk = key[i];
      if (kk != prev) {
        ++nnz;
        prev = kk;
        c_rows[nnz] = kk / b_cols;
        c_cols[nnz] = kk % b_cols;
      }
      slot[i] = static_cast<int32_t>(nnz);
    }
  };
  if (T == 1) {
    fill_block(0);
  } else {
    std::vector<std::thread> ths;
    for (int t = 0; t < T; ++t) ths.emplace_back(fill_block, t);
    for (auto& th : ths) th.join();
  }
  return base[T];
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

// ---------------------------------------------------------------------------
// Euler split for the Clos/Benes routing planner (ops/route.py).
// Edges e have endpoints (a[e], b[e]) in a bipartite multigraph with all
// degrees even. 2-colors the edges so every vertex sees each color on
// exactly half of its edges: pair consecutive edges at each vertex
// (counting-sort buckets), then walk the alternating cycles. O(m + ka + kb)
// and sequential — replaces the numpy argsort + pointer-doubling path
// (~50x at m = 1M). Returns 0, or -1 if an odd degree is found.
// ---------------------------------------------------------------------------
struct SplitWS {
  std::vector<int32_t> pa, pb, bucket;
  std::vector<int64_t> pos;
  void reserve(long m, long kmax) {
    if ((long)pa.size() < m) { pa.resize(m); pb.resize(m); bucket.resize(m); }
    if ((long)pos.size() < kmax + 1) pos.resize(kmax + 1);
  }
};

static long euler_split_ws(const int64_t* a, const int64_t* b, long m,
                           long ka, long kb, uint8_t* color, SplitWS& ws) {
  ws.reserve(m, ka > kb ? ka : kb);
  auto pair_side = [&](const int64_t* v, long k, int32_t* out) -> long {
    std::fill(ws.pos.begin(), ws.pos.begin() + k + 1, 0);
    for (long e = 0; e < m; ++e) ++ws.pos[v[e] + 1];
    for (long u = 0; u < k; ++u) {
      if (ws.pos[u + 1] & 1) return -1;
      ws.pos[u + 1] += ws.pos[u];
    }
    for (long e = 0; e < m; ++e) ws.bucket[ws.pos[v[e]]++] = (int32_t)e;
    for (long i = 0; i < m; i += 2) {
      out[ws.bucket[i]] = ws.bucket[i + 1];
      out[ws.bucket[i + 1]] = ws.bucket[i];
    }
    return 0;
  };
  if (pair_side(a, ka, ws.pa.data()) != 0) return -1;
  if (pair_side(b, kb, ws.pb.data()) != 0) return -1;
  std::memset(color, 0xff, (size_t)m);
  for (long e0 = 0; e0 < m; ++e0) {
    if (color[e0] != 0xff) continue;
    long cur = e0;
    while (color[cur] == 0xff) {
      color[cur] = 0;
      const long nb = ws.pb[cur];
      color[nb] = 1;
      cur = ws.pa[nb];
    }
  }
  return 0;
}

static long euler_split_core(const int64_t* a, const int64_t* b, long m,
                             long ka, long kb, uint8_t* color) {
  SplitWS ws;
  return euler_split_ws(a, b, m, ka, kb, color, ws);
}

long g4s_euler_split(const int64_t* a, const int64_t* b, long m,
                     long ka, long kb, uint8_t* color) {
  return euler_split_core(a, b, m, ka, kb, color);
}

// ---------------------------------------------------------------------------
// Full log2(deg)-level bipartite edge coloring (route.py
// edge_color_bipartite): the whole Euler-split recursion in one native
// call, with pairing buffers reused across levels — replaces the numpy
// loop that rebuilt composite int64 keys per level (the dominant cost of
// Clos/Benes plan builds at ~1M edges). Colors the edges (a[e], b[e]) of
// a deg-regular bipartite multigraph with deg colors so every vertex
// sees each color exactly once. deg must be a power of two.
// color: m int64, output. Returns 0, or -1 on odd degree / bad deg.
// ---------------------------------------------------------------------------
long g4s_edge_color(const int64_t* a, const int64_t* b, long m,
                    long na, long nb, long deg, int64_t* color) {
  if (deg < 1 || (deg & (deg - 1))) return -1;
  for (long e = 0; e < m; ++e) color[e] = 0;
  if (deg == 1 || m == 0) return 0;
  std::vector<int32_t> pa(m), pb(m), bucket(m);
  const long maxk = (deg / 2) * (na > nb ? na : nb);
  std::vector<int64_t> pos(maxk + 1);
  std::vector<uint8_t> half(m);

  auto pair_side = [&](const int64_t* v, long k, long kmax,
                       int32_t* out) -> long {
    std::fill(pos.begin(), pos.begin() + kmax + 1, 0);
    for (long e = 0; e < m; ++e) ++pos[color[e] * k + v[e] + 1];
    for (long u = 0; u < kmax; ++u) {
      if (pos[u + 1] & 1) return -1;
      pos[u + 1] += pos[u];
    }
    for (long e = 0; e < m; ++e) bucket[pos[color[e] * k + v[e]]++] =
        (int32_t)e;
    for (long i = 0; i < m; i += 2) {
      out[bucket[i]] = bucket[i + 1];
      out[bucket[i + 1]] = bucket[i];
    }
    return 0;
  };

  long classes = 1;
  while (classes < deg) {
    if (pair_side(a, na, classes * na, pa.data()) != 0) return -1;
    if (pair_side(b, nb, classes * nb, pb.data()) != 0) return -1;
    std::memset(half.data(), 0xff, (size_t)m);
    for (long e0 = 0; e0 < m; ++e0) {
      if (half[e0] != 0xff) continue;
      long cur = e0;
      while (half[cur] == 0xff) {
        half[cur] = 0;
        const long nv = pb[cur];
        half[nv] = 1;
        cur = pa[nv];
      }
    }
    for (long e = 0; e < m; ++e) color[e] = color[e] * 2 + half[e];
    classes *= 2;
  }
  return 0;
}

// ---------------------------------------------------------------------------
// Full Benes routing for B independent row permutations of length n
// (n a power of two): the whole level recursion of ops/route.py
// benes_route, sequential C. sigma: (B, n) row-major, each row a
// bijection on [0, n). bits: (B, n) int32, bit s of lane l = swap bit of
// butterfly stage s (distances n/2, ..., 2, 1, 2, ..., n/2).
// Returns 0, or -1 on a routing failure (non-bijective row).
// ---------------------------------------------------------------------------
long g4s_benes_route(const int64_t* sigma, long B, long n, int32_t* bits) {
  if (n < 2 || (n & (n - 1))) return -1;
  const long m = B * n;
  long S = -1;
  for (long t = n; t > 1; t >>= 1) S += 2;
  std::memset(bits, 0, sizeof(int32_t) * m);
  std::vector<int32_t> blk(m), dst(m), src(m);
  for (long r = 0; r < B; ++r)
    for (long l = 0; l < n; ++l) {
      const long e = r * n + l;
      blk[e] = (int32_t)r;
      dst[e] = (int32_t)l;
      const int64_t s = sigma[e];
      if (s < 0 || s >= n) return -1;
      src[e] = (int32_t)s;
    }
  std::vector<int64_t> ka_(m), kb_(m);
  std::vector<uint8_t> color(m);
  SplitWS ws;
  long size = n, level = 0;
  while (size > 2) {
    const long h = size >> 1;
    for (long e = 0; e < m; ++e) {
      ka_[e] = (int64_t)blk[e] * h + (src[e] & (h - 1));
      kb_[e] = (int64_t)blk[e] * h + (dst[e] & (h - 1));
    }
    const long nb = (long)B << level;
    if (euler_split_ws(ka_.data(), kb_.data(), m, nb * h, nb * h,
                       color.data(), ws) != 0)
      return -1;
    const long bpr = 1L << level;  // blocks per original row
    for (long e = 0; e < m; ++e) {
      const long c = color[e];
      const long row = blk[e] / bpr;
      const long base = (blk[e] % bpr) * size;
      const long s_lo = src[e] & (h - 1);
      const long d_lo = dst[e] & (h - 1);
      if (c != src[e] / h)
        bits[row * n + base + s_lo + c * h] |= (int32_t)(1 << level);
      if (c != dst[e] / h)
        bits[row * n + base + dst[e]] |= (int32_t)(1 << (S - 1 - level));
      blk[e] = (int32_t)(blk[e] * 2 + c);
      dst[e] = (int32_t)d_lo;
      src[e] = (int32_t)s_lo;
    }
    size = h;
    ++level;
  }
  const long bpr = 1L << level;
  for (long e = 0; e < m; ++e) {
    if (src[e] != dst[e]) {
      const long row = blk[e] / bpr;
      const long base = (blk[e] % bpr) * 2;
      bits[row * n + base + dst[e]] |= (int32_t)(1 << level);
    }
  }
  return 0;
}

}  // extern "C"
