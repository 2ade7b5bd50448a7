// Native graph IO for gunrockinst_tpu.
//
// Role parity with the reference's C++ host-side graph build
// (gunrock/graphio/market.cuh ReadMarketStream + gunrock/csr.cuh
// FromCoo): a fast MatrixMarket coordinate parser (mmap + hand-rolled
// number scanning, ~20x faster than numpy.loadtxt) and a COO->CSR
// builder (counting sort by row, optional dedupe and self-loop
// removal). Exposed through a C ABI consumed via ctypes
// (gunrockinst_tpu/graph/_native_io.py).
//
// Build: native/build.sh  (g++ -O3 -shared -fPIC)

#include <algorithm>
#include <cctype>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <numeric>
#include <string>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

extern "C" {

// ---------------------------------------------------------------------------
// MatrixMarket parser
// ---------------------------------------------------------------------------

struct MtxResult {
  int64_t n = 0;
  int64_t m = 0;        // number of entries parsed
  int symmetric = 0;
  int has_values = 0;
  int64_t* first = nullptr;   // 1-based first-column token per line
  int64_t* second = nullptr;  // 1-based second-column token per line
  float* values = nullptr;    // nullptr when pattern
  char error[256] = {0};
};

static inline const char* skip_ws(const char* p, const char* end) {
  while (p < end && (*p == ' ' || *p == '\t' || *p == '\r')) ++p;
  return p;
}

static inline const char* parse_i64(const char* p, const char* end,
                                    int64_t* out) {
  p = skip_ws(p, end);
  bool neg = false;
  if (p < end && (*p == '-' || *p == '+')) neg = (*p++ == '-');
  int64_t v = 0;
  const char* start = p;
  while (p < end && *p >= '0' && *p <= '9') v = v * 10 + (*p++ - '0');
  if (p == start) return nullptr;
  *out = neg ? -v : v;
  return p;
}

int gr_parse_mtx(const char* path, MtxResult* res) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) {
    snprintf(res->error, sizeof(res->error), "cannot open %s", path);
    return 1;
  }
  struct stat st;
  if (fstat(fd, &st) != 0 || st.st_size == 0) {
    close(fd);
    snprintf(res->error, sizeof(res->error), "empty or unstatable file");
    return 1;
  }
  const char* data = static_cast<const char*>(
      mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0));
  close(fd);
  if (data == MAP_FAILED) {
    snprintf(res->error, sizeof(res->error), "mmap failed");
    return 1;
  }
  const char* p = data;
  const char* end = data + st.st_size;

  int pattern = 1;
  int header_seen = 0;
  if (end - p > 14 && strncmp(p, "%%MatrixMarket", 14) == 0) {
    header_seen = 1;
    const char* nl = static_cast<const char*>(memchr(p, '\n', end - p));
    if (!nl) nl = end;
    std::string line(p, nl - p);
    for (auto& c : line) c = std::tolower(c);
    res->symmetric = line.find("symmetric") != std::string::npos;
    pattern = line.find("pattern") != std::string::npos;
    p = nl + 1;
  }
  // comments
  while (p < end && *p == '%') {
    const char* nl = static_cast<const char*>(memchr(p, '\n', end - p));
    if (!nl) { p = end; break; }
    p = nl + 1;
  }
  // size line: rows cols nnz
  int64_t nrows = 0, ncols = 0, nnz = 0;
  const char* q = parse_i64(p, end, &nrows);
  if (q) q = parse_i64(q, end, &ncols);
  if (q) q = parse_i64(q, end, &nnz);
  if (!q) {
    munmap(const_cast<char*>(data), st.st_size);
    snprintf(res->error, sizeof(res->error), "bad size line");
    return 1;
  }
  p = static_cast<const char*>(memchr(q, '\n', end - q));
  p = p ? p + 1 : end;

  res->n = std::max(nrows, ncols);
  res->first = static_cast<int64_t*>(malloc(sizeof(int64_t) * nnz));
  res->second = static_cast<int64_t*>(malloc(sizeof(int64_t) * nnz));
  float* vals = nullptr;
  int64_t count = 0;
  int saw_third = 0;
  while (p < end && count < nnz) {
    if (*p == '%' || *p == '\n') {
      const char* nl = static_cast<const char*>(memchr(p, '\n', end - p));
      if (!nl) break;
      p = nl + 1;
      continue;
    }
    int64_t a, b;
    const char* r = parse_i64(p, end, &a);
    if (r) r = parse_i64(r, end, &b);
    if (!r) {
      munmap(const_cast<char*>(data), st.st_size);
      free(res->first); free(res->second); free(vals);
      res->first = res->second = nullptr;
      snprintf(res->error, sizeof(res->error),
               "badly formed edge at entry %lld", (long long)count);
      return 1;
    }
    res->first[count] = a;
    res->second[count] = b;
    // optional third column (value)
    const char* v = skip_ws(r, end);
    if (v < end && *v != '\n' && *v != '\r') {
      if (!vals) {
        vals = static_cast<float*>(malloc(sizeof(float) * nnz));
        for (int64_t i = 0; i < count; ++i) vals[i] = 1.0f;
      }
      char* endptr = nullptr;
      vals[count] = strtof(v, &endptr);
      saw_third = 1;
      r = endptr ? endptr : v;
    } else if (vals) {
      vals[count] = 1.0f;
    }
    ++count;
    const char* nl = static_cast<const char*>(memchr(r, '\n', end - r));
    if (!nl) break;
    p = nl + 1;
  }
  munmap(const_cast<char*>(data), st.st_size);
  if (count != nnz) {
    free(res->first); free(res->second); free(vals);
    res->first = res->second = nullptr;
    snprintf(res->error, sizeof(res->error),
             "only %lld/%lld entries read", (long long)count, (long long)nnz);
    return 1;
  }
  // pattern header wins over a stray third column only when declared
  if (header_seen && pattern) {
    free(vals);
    vals = nullptr;
    saw_third = 0;
  }
  res->m = count;
  res->values = vals;
  res->has_values = saw_third;
  return 0;
}

void gr_free(void* ptr) { free(ptr); }

// ---------------------------------------------------------------------------
// COO -> CSR (FromCoo analog: sort, dedupe, drop self loops, offsets)
// ---------------------------------------------------------------------------

struct CsrResult {
  int64_t n = 0;
  int64_t m = 0;
  int64_t* row_offsets = nullptr;  // (n+1,)
  int32_t* col_indices = nullptr;  // (m,)
  float* edge_values = nullptr;    // (m,) or nullptr
};

int gr_coo_to_csr(int64_t n, int64_t m, const int64_t* rows,
                  const int64_t* cols, const float* vals,
                  int remove_self_loops, int dedupe, CsrResult* out) {
  // counting sort by row, then per-row sort by col
  std::vector<int64_t> cnt(n + 1, 0);
  for (int64_t i = 0; i < m; ++i) cnt[rows[i] + 1]++;
  std::partial_sum(cnt.begin(), cnt.end(), cnt.begin());
  std::vector<int64_t> perm(m);
  {
    std::vector<int64_t> cursor(cnt.begin(), cnt.end() - 1);
    for (int64_t i = 0; i < m; ++i) perm[cursor[rows[i]]++] = i;
  }
  // sort each row segment by column (stable w.r.t. input for ties)
  std::vector<int64_t> scratch;
  for (int64_t r = 0; r < n; ++r) {
    int64_t lo = cnt[r], hi = cnt[r + 1];
    if (hi - lo > 1) {
      std::stable_sort(perm.begin() + lo, perm.begin() + hi,
                       [&](int64_t a, int64_t b) {
                         return cols[a] < cols[b];
                       });
    }
  }
  // emit with dedupe/self-loop removal
  out->row_offsets = static_cast<int64_t*>(malloc(sizeof(int64_t) * (n + 1)));
  out->col_indices = static_cast<int32_t*>(malloc(sizeof(int32_t) * m));
  out->edge_values = vals ? static_cast<float*>(malloc(sizeof(float) * m))
                          : nullptr;
  int64_t w = 0;
  for (int64_t r = 0; r < n; ++r) {
    out->row_offsets[r] = w;
    int64_t prev_col = -1;
    for (int64_t k = cnt[r]; k < cnt[r + 1]; ++k) {
      int64_t e = perm[k];
      int64_t c = cols[e];
      if (remove_self_loops && c == r) continue;
      if (dedupe && c == prev_col) continue;
      out->col_indices[w] = static_cast<int32_t>(c);
      if (out->edge_values) out->edge_values[w] = vals[e];
      prev_col = c;
      ++w;
    }
  }
  out->row_offsets[n] = w;
  out->n = n;
  out->m = w;
  return 0;
}

}  // extern "C"
