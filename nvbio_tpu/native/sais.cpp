// Suffix-array construction by induced sorting (SA-IS).
//
// Native host path for large-reference index construction (nvBWT
// equivalent).  The reference GPU library builds multi-gigabase BWTs
// with a blockwise difference-cover sort (ref: nvbio/sufsort/sufsort.h
// cuda::blockwise_suffix_sort, dcs.h, compression_sort.h); that design
// leans on comparator-based segmented sorts which have no XLA
// counterpart, so the TPU build uses linear-time induced sorting on the
// host for beyond-HBM references (this file) and an on-device
// prefix-doubling sort for in-HBM references (sufsort/device.py).
//
// Algorithm: Nong, Zhang & Chan, "Two Efficient Algorithms for Linear
// Time Suffix Array Construction" (2009) — implemented from the paper's
// description.  Convention matches sufsort/sa.py: the suffix array of T
// is computed as SA(T + '$') with the sentinel smaller than every
// symbol, and the leading sentinel row dropped.
//
// Index type is templated: int32 for n < 2^31 (half the memory
// traffic), int64 beyond (hg38 fwd+rev concatenation needs it).

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

template <typename I>
struct TypeBits {
  // S/L type flags, one bit per position.
  std::vector<uint64_t> w;
  explicit TypeBits(I n) : w((size_t(n) + 63) / 64, 0) {}
  inline bool get(I i) const { return (w[size_t(i) >> 6] >> (i & 63)) & 1; }
  inline void set(I i, bool v) {
    uint64_t m = uint64_t(1) << (i & 63);
    if (v) w[size_t(i) >> 6] |= m; else w[size_t(i) >> 6] &= ~m;
  }
};

template <typename I, typename T>
inline bool is_lms(const TypeBits<I>& t, const T*, I i) {
  return i > 0 && t.get(i) && !t.get(i - 1);
}

template <typename I, typename T>
void get_counts(const T* s, I n, I K, std::vector<I>& C) {
  C.assign(size_t(K), 0);
  for (I i = 0; i < n; ++i) ++C[size_t(s[i])];
}

template <typename I>
void get_buckets(const std::vector<I>& C, std::vector<I>& B, bool end) {
  I sum = 0;
  B.resize(C.size());
  for (size_t i = 0; i < C.size(); ++i) {
    sum += C[i];
    B[i] = end ? sum : sum - C[i];
  }
}

// Induce L-type then S-type suffixes from the placed LMS/sorted seeds.
template <typename I, typename T>
void induce(const T* s, I* SA, I n, I K, const TypeBits<I>& t,
            const std::vector<I>& C, std::vector<I>& B) {
  // left-to-right pass: L-type
  get_buckets(C, B, false);
  for (I i = 0; i < n; ++i) {
    I j = SA[i];
    if (j > 0 && !t.get(j - 1)) SA[B[size_t(s[j - 1])]++] = j - 1;
  }
  // right-to-left pass: S-type
  get_buckets(C, B, true);
  for (I i = n; i-- > 0;) {
    I j = SA[i];
    if (j > 0 && t.get(j - 1)) SA[--B[size_t(s[j - 1])]] = j - 1;
  }
}

// Core recursion.  s[n-1] must be a unique smallest sentinel (value 0).
template <typename I, typename T>
void sais_rec(const T* s, I* SA, I n, I K) {
  if (n == 1) { SA[0] = 0; return; }
  TypeBits<I> t(n);
  t.set(n - 1, true);
  for (I i = n - 1; i-- > 0;)
    t.set(i, s[i] < s[i + 1] || (s[i] == s[i + 1] && t.get(i + 1)));

  std::vector<I> C, B;
  get_counts(s, n, K, C);

  // ---- stage 1: sort LMS substrings by induction -------------------
  for (I i = 0; i < n; ++i) SA[i] = -1;
  get_buckets(C, B, true);
  for (I i = 1; i < n; ++i)
    if (is_lms(t, s, i)) SA[--B[size_t(s[i])]] = i;
  induce(s, SA, n, K, t, C, B);

  // compact sorted LMS positions to the front
  I n1 = 0;
  for (I i = 0; i < n; ++i)
    if (is_lms(t, s, SA[i])) SA[n1++] = SA[i];

  // name LMS substrings in SA[n1..n)
  for (I i = n1; i < n; ++i) SA[i] = -1;
  I name = 0;
  I prev = -1;
  for (I i = 0; i < n1; ++i) {
    I pos = SA[i];
    bool diff = false;
    if (prev < 0) {
      diff = true;
    } else {
      for (I d = 0;; ++d) {
        if (s[pos + d] != s[prev + d] || t.get(pos + d) != t.get(prev + d)) {
          diff = true;
          break;
        }
        if (d > 0) {
          bool lp = is_lms(t, s, pos + d), lq = is_lms(t, s, prev + d);
          if (lp != lq) { diff = true; break; }
          if (lp) break;  // both substrings ended, equal
        }
      }
    }
    if (diff) { ++name; prev = pos; }
    SA[n1 + pos / 2] = name - 1;
  }
  // gather names into the reduced string (text order)
  I k = n - 1;
  for (I i = n; i-- > I(n1);)
    if (SA[i] >= 0) SA[k--] = SA[i];
  I* s1 = SA + n - n1;

  // ---- recurse if names are not unique -----------------------------
  if (name < n1) {
    sais_rec<I, I>(s1, SA, n1, name);
  } else {
    for (I i = 0; i < n1; ++i) SA[size_t(s1[i])] = i;
  }

  // map reduced-problem order back to LMS text positions
  {
    I j = 0;
    std::vector<I> P;
    P.resize(size_t(n1));
    for (I i = 1; i < n; ++i)
      if (is_lms(t, s, i)) P[size_t(j++)] = i;
    for (I i = 0; i < n1; ++i) SA[i] = P[size_t(SA[i])];
  }

  // ---- stage 2: place LMS in final order, induce the rest ----------
  for (I i = n1; i < n; ++i) SA[i] = -1;
  get_buckets(C, B, true);
  for (I i = n1; i-- > 0;) {
    I j = SA[i];
    SA[i] = -1;
    SA[--B[size_t(s[j])]] = j;
  }
  induce(s, SA, n, K, t, C, B);
}

template <typename I>
long run_sais(const uint8_t* text, long n, long long* sa_out) {
  // append sentinel; shift symbols +1 so 0 is the unique sentinel
  uint8_t maxsym = 0;
  for (long i = 0; i < n; ++i)
    if (text[i] > maxsym) maxsym = text[i];
  I m = I(n) + 1;
  std::vector<I> SA; SA.resize(size_t(m));
  if (maxsym < 255) {
    std::vector<uint8_t> s; s.resize(size_t(m));
    for (long i = 0; i < n; ++i) s[size_t(i)] = text[i] + 1;
    s[size_t(n)] = 0;
    sais_rec<I, uint8_t>(s.data(), SA.data(), m, I(maxsym) + 2);
  } else {
    std::vector<I> s; s.resize(size_t(m));
    for (long i = 0; i < n; ++i) s[size_t(i)] = I(text[i]) + 1;
    s[size_t(n)] = 0;
    sais_rec<I, I>(s.data(), SA.data(), m, I(maxsym) + 2);
  }
  if (SA[0] != I(n)) return -1;  // sentinel row must sort first
  for (long i = 0; i < n; ++i) sa_out[i] = (long long)SA[size_t(i) + 1];
  return 0;
}

}  // namespace

extern "C" {

// Suffix array (sentinel-smallest convention) of `text` (uint8
// symbols), written to sa_out[0..n).  Returns 0 on success.
long sais_u8(const uint8_t* text, long n, long long* sa_out) {
  if (n <= 0) return 0;
  if (n + 1 < 0x7fffffffL) return run_sais<int32_t>(text, n, sa_out);
  return run_sais<int64_t>(text, n, sa_out);
}

// BWT emit: bwt_out[i] = text[sa[i]-1] for sa[i]>0; the sentinel row
// (sa row with sa==0 → conceptual row holds '$') is reported via
// *primary and its slot written as 0.  sa has n entries (sentinel row
// excluded); bwt_out has n+1 (row 0 = suffix '$' → text[n-1]).
long sais_bwt(const uint8_t* text, long n, const long long* sa,
              uint8_t* bwt_out, long long* primary) {
  if (n <= 0) return -1;
  bwt_out[0] = text[n - 1];
  *primary = -1;
  for (long i = 0; i < n; ++i) {
    long long p = sa[i];
    if (p == 0) { bwt_out[i + 1] = 0; *primary = i + 1; }
    else bwt_out[i + 1] = text[p - 1];
  }
  return *primary < 0 ? -1 : 0;
}

}  // extern "C"
