// Levenshtein edit distance over token-id sequences.
//
// First-party replacement for the `editdistance` PyPI C extension used by the
// reference for corpus WER (joeynmt/metrics.py:129). Exposed via a plain C ABI
// and loaded with ctypes (no pybind11 in this environment).
//
// Build: g++ -O3 -shared -fPIC editdistance.cpp -o libeditdistance.so
#include <algorithm>
#include <cstdint>
#include <vector>

extern "C" {

// Classic two-row DP; O(n*m) time, O(min(n,m)) space.
int64_t edit_distance(const int64_t* a, int64_t n, const int64_t* b, int64_t m) {
  if (n == 0) return m;
  if (m == 0) return n;
  if (n < m) {
    std::swap(a, b);
    std::swap(n, m);
  }
  std::vector<int64_t> prev(m + 1), curr(m + 1);
  for (int64_t j = 0; j <= m; ++j) prev[j] = j;
  for (int64_t i = 1; i <= n; ++i) {
    curr[0] = i;
    const int64_t ai = a[i - 1];
    for (int64_t j = 1; j <= m; ++j) {
      const int64_t sub = prev[j - 1] + (ai != b[j - 1]);
      const int64_t del = prev[j] + 1;
      const int64_t ins = curr[j - 1] + 1;
      curr[j] = std::min(sub, std::min(del, ins));
    }
    std::swap(prev, curr);
  }
  return prev[m];
}

// Batched variant: computes distances for `count` pairs laid out back-to-back
// in flat arrays with per-pair lengths. Amortizes the ctypes call overhead in
// corpus-level WER over thousands of utterances.
void edit_distance_batch(const int64_t* a_flat, const int64_t* a_lens,
                         const int64_t* b_flat, const int64_t* b_lens,
                         int64_t count, int64_t* out) {
  int64_t a_off = 0, b_off = 0;
  for (int64_t i = 0; i < count; ++i) {
    out[i] = edit_distance(a_flat + a_off, a_lens[i], b_flat + b_off, b_lens[i]);
    a_off += a_lens[i];
    b_off += b_lens[i];
  }
}

}  // extern "C"
