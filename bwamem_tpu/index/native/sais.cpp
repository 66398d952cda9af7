// SA-IS linear-time suffix array construction (Nong/Zhang/Chan algorithm).
//
// Native equivalent of the reference engine's suffix-array builders
// ([EXT] is.c / QSufSort.c, linked per src/main/c/Makefile:27); written from
// the published algorithm, not ported from bwa.
//
// Exposed C ABI (consumed via ctypes from ../native_sais.py):
//   int bwamem_sais(const uint8_t* codes, int64_t n, int64_t* sa_out);
// Computes the suffix array of codes+sentinel (sentinel strictly smallest);
// sa_out must hold n+1 entries; sa_out[0] == n on return.  Returns 0 on
// success, nonzero on allocation failure.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <new>
#include <vector>

namespace {

template <typename Char>
struct SaisProblem {
  const Char* s;
  int64_t n;  // length including sentinel at s[n-1]
  int64_t K;  // alphabet size (values in [0, K))
};

template <typename Char>
void sais_core(const Char* s, int64_t* SA, int64_t n, int64_t K) {
  // --- classify suffix types; true = S-type ---
  std::vector<bool> t(n);
  t[n - 1] = true;
  for (int64_t i = n - 2; i >= 0; --i)
    t[i] = (s[i] < s[i + 1]) || (s[i] == s[i + 1] && t[i + 1]);
  auto is_lms = [&](int64_t i) { return i > 0 && t[i] && !t[i - 1]; };

  std::vector<int64_t> bkt(K);
  auto get_buckets = [&](bool end) {
    std::fill(bkt.begin(), bkt.end(), 0);
    for (int64_t i = 0; i < n; ++i) ++bkt[s[i]];
    int64_t sum = 0;
    for (int64_t i = 0; i < K; ++i) {
      sum += bkt[i];
      bkt[i] = end ? sum : sum - bkt[i];
    }
  };

  auto induce = [&]() {
    get_buckets(false);  // induce L-type from sorted LMS/S
    for (int64_t i = 0; i < n; ++i) {
      int64_t j = SA[i] - 1;
      if (j >= 0 && !t[j]) SA[bkt[s[j]]++] = j;
    }
    get_buckets(true);  // induce S-type right-to-left
    for (int64_t i = n - 1; i >= 0; --i) {
      int64_t j = SA[i] - 1;
      if (j >= 0 && t[j]) SA[--bkt[s[j]]] = j;
    }
  };

  // --- stage 1: sort LMS substrings by induced sorting ---
  std::fill(SA, SA + n, int64_t(-1));
  get_buckets(true);
  for (int64_t i = n - 1; i >= 1; --i)
    if (is_lms(i)) SA[--bkt[s[i]]] = i;
  induce();

  // compact sorted LMS positions into SA[0..n1)
  int64_t n1 = 0;
  for (int64_t i = 0; i < n; ++i)
    if (SA[i] > 0 && is_lms(SA[i])) SA[n1++] = SA[i];

  // name LMS substrings; names stored at SA[n1 + pos/2]
  std::fill(SA + n1, SA + n, int64_t(-1));
  int64_t name = 0, prev = -1;
  for (int64_t i = 0; i < n1; ++i) {
    int64_t pos = SA[i];
    bool diff = false;
    if (prev < 0) {
      diff = true;
    } else {
      for (int64_t d = 0; d < n; ++d) {
        if (s[pos + d] != s[prev + d] || t[pos + d] != t[prev + d]) {
          diff = true;
          break;
        }
        if (d > 0 && (is_lms(pos + d) || is_lms(prev + d))) break;
      }
    }
    if (diff) {
      ++name;
      prev = pos;
    }
    SA[n1 + pos / 2] = name - 1;
  }
  std::vector<int64_t> s1(n1);
  for (int64_t i = n1, j = 0; i < n; ++i)
    if (SA[i] >= 0) s1[j++] = SA[i];

  // --- stage 2: solve the reduced problem ---
  if (name < n1) {
    sais_core<int64_t>(s1.data(), SA, n1, name);
  } else {
    for (int64_t i = 0; i < n1; ++i) SA[s1[i]] = i;
  }

  // --- stage 3: induce the full SA from sorted LMS suffixes ---
  std::vector<int64_t> lms(n1);
  for (int64_t i = 1, j = 0; i < n; ++i)
    if (is_lms(i)) lms[j++] = i;
  for (int64_t i = 0; i < n1; ++i) SA[i] = lms[SA[i]];
  std::fill(SA + n1, SA + n, int64_t(-1));
  get_buckets(true);
  for (int64_t i = n1 - 1; i >= 0; --i) {
    int64_t j = SA[i];
    SA[i] = -1;
    SA[--bkt[s[j]]] = j;
  }
  induce();
}

}  // namespace

extern "C" {

int bwamem_sais(const uint8_t* codes, int64_t n, int64_t* sa_out) {
  try {
    std::vector<uint8_t> s(n + 1);
    for (int64_t i = 0; i < n; ++i) s[i] = codes[i] + 1;
    s[n] = 0;  // sentinel, strictly smallest
    sais_core<uint8_t>(s.data(), sa_out, n + 1, 7);
    return 0;
  } catch (const std::bad_alloc&) {
    return 1;
  }
}

}  // extern "C"
