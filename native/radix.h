// LSD radix sort for (uint64 key, int64 payload) pairs — single-core friendly
// (the deployment VM exposes one core; std::sort of 8M pairs costs ~2 s,
// radix with 11-bit digits ~0.5 s).
#pragma once

#include <cstdint>
#include <cstring>
#include <vector>

namespace surfd {

struct KV {
  uint64_t key;
  int64_t val;
};

// Sorts kv by key ascending. max_key bounds the number of digit passes.
// Digit width is chosen per call: minimize pass count with buckets capped
// at 2^17 (a 512 KB count array stays cache-resident), then take the
// SMALLEST width achieving that count — measured on 3.8M pairs: 40-bit
// keys 14-bit/3-pass 0.150 s vs the old fixed 11-bit/4-pass 0.219 s;
// 33-bit keys 17-bit/2-pass 0.142 s vs 0.170 s; 32-bit keys 16-bit/2-pass
// 0.126 s vs 0.185 s. Wider (2^20 buckets / 2 passes on 40-bit) loses:
// the count array stops fitting in cache.
//
// The scratch overload reuses caller-owned tmp/count buffers across calls —
// per-call allocation of the ~60 MB tmp buffer re-pays first-touch page
// faults every extraction on this VM (see marching.cpp surfd_malloc_tune).
inline void radix_sort_kv(std::vector<KV>& kv, uint64_t max_key,
                          std::vector<KV>& tmp, std::vector<uint32_t>& count) {
  const size_t n = kv.size();
  if (n < 2) return;
  int nbits = 1;
  while (max_key >> nbits) ++nbits;
  const int max_digit = 17;
  const int passes = (nbits + max_digit - 1) / max_digit;
  const int bits = (nbits + passes - 1) / passes;  // smallest width, same passes
  const size_t buckets = (size_t)1 << bits;
  if (tmp.size() < n) tmp.resize(n);
  if (count.size() < buckets) count.resize(buckets);
  KV* src = kv.data();
  KV* dst = tmp.data();
  for (int p = 0; p < passes; ++p) {
    const int shift = p * bits;
    std::memset(count.data(), 0, buckets * sizeof(uint32_t));
    for (size_t i = 0; i < n; ++i) ++count[(src[i].key >> shift) & (buckets - 1)];
    uint32_t sum = 0;
    for (size_t b = 0; b < buckets; ++b) {
      uint32_t c = count[b];
      count[b] = sum;
      sum += c;
    }
    for (size_t i = 0; i < n; ++i)
      dst[count[(src[i].key >> shift) & (buckets - 1)]++] = src[i];
    std::swap(src, dst);
  }
  if (src != kv.data()) std::memcpy(kv.data(), src, n * sizeof(KV));
}

inline void radix_sort_kv(std::vector<KV>& kv, uint64_t max_key) {
  std::vector<KV> tmp;
  std::vector<uint32_t> count;
  radix_sort_kv(kv, max_key, tmp, count);
}

}  // namespace surfd
