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
inline void radix_sort_kv(std::vector<KV>& kv, uint64_t max_key) {
  constexpr int BITS = 11;
  constexpr size_t BUCKETS = 1u << BITS;
  const size_t n = kv.size();
  if (n < 2) return;
  std::vector<KV> tmp(n);
  std::vector<uint32_t> count(BUCKETS);
  int passes = 0;
  while (max_key >> (uint64_t)(passes * BITS)) ++passes;
  if (passes == 0) passes = 1;
  KV* src = kv.data();
  KV* dst = tmp.data();
  for (int p = 0; p < passes; ++p) {
    const int shift = p * BITS;
    std::memset(count.data(), 0, BUCKETS * sizeof(uint32_t));
    for (size_t i = 0; i < n; ++i) ++count[(src[i].key >> shift) & (BUCKETS - 1)];
    uint32_t sum = 0;
    for (size_t b = 0; b < BUCKETS; ++b) {
      uint32_t c = count[b];
      count[b] = sum;
      sum += c;
    }
    for (size_t i = 0; i < n; ++i)
      dst[count[(src[i].key >> shift) & (BUCKETS - 1)]++] = src[i];
    std::swap(src, dst);
  }
  if (src != kv.data()) std::memcpy(kv.data(), src, n * sizeof(KV));
}

}  // namespace surfd
