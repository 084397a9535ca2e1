// Native marching-tetrahedra core for UDF fields.
//
// C++ twin of surfd_tpu/geometry/marching.py:marching_tetrahedra_udf — the
// same Kuhn-decomposition / pseudo-sign algorithm (see that file's docstring
// for the math and the reference citations), implemented as two passes so the
// gradient evaluation between them stays on the TPU:
//
//   pass 1  surfd_mt_active_cubes(udf, R, ...)      → flat cube ids
//   (python evaluates int8 unit gradients at the 8 corners of each cube)
//   pass 2  surfd_mt_emit(udf, cube_ids, g8, ...)   → deduped verts + faces
//
// Multithreaded with std::thread over slabs; vertex dedup via a sorted
// (edge-key, slot) pass, matching the numpy implementation's semantics
// exactly (gauge-invariant t = u_a/(u_a+u_b) interpolation).

#include <algorithm>
#include <atomic>
#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <malloc.h>
#include <mutex>
#include <thread>
#include <vector>

#if defined(_OPENMP)
#include <parallel/algorithm>
#define SURFD_SORT __gnu_parallel::sort
#else
#define SURFD_SORT std::sort
#endif

#include "radix.h"

namespace {

// Kuhn tetrahedra and tables — identical to marching.py.
static const int TETS[6][4] = {
    {0, 1, 3, 7}, {0, 1, 5, 7}, {0, 2, 3, 7},
    {0, 2, 6, 7}, {0, 4, 5, 7}, {0, 4, 6, 7},
};
static const int TET_EDGES[6][2] = {{0, 1}, {0, 2}, {0, 3}, {1, 2}, {1, 3}, {2, 3}};
// TRI_TABLE[case][tri][corner] = tet-edge id, -1 = unused
static const int TRI_TABLE[16][2][3] = {
    {{-1, -1, -1}, {-1, -1, -1}}, {{0, 1, 2}, {-1, -1, -1}},
    {{0, 3, 4}, {-1, -1, -1}},    {{1, 3, 4}, {1, 4, 2}},
    {{1, 3, 5}, {-1, -1, -1}},    {{0, 3, 5}, {0, 5, 2}},
    {{0, 1, 5}, {0, 5, 4}},       {{2, 4, 5}, {-1, -1, -1}},
    {{2, 4, 5}, {-1, -1, -1}},    {{0, 5, 1}, {0, 4, 5}},
    {{0, 5, 3}, {0, 2, 5}},       {{1, 5, 3}, {-1, -1, -1}},
    {{1, 4, 3}, {1, 2, 4}},       {{0, 4, 3}, {-1, -1, -1}},
    {{0, 2, 1}, {-1, -1, -1}},    {{-1, -1, -1}, {-1, -1, -1}},
};
// corner id bits: 0→dx, 1→dy, 2→dz (matches _CORNER_OFFSETS)
static const int CORNER_OFF[8][3] = {
    {0, 0, 0}, {1, 0, 0}, {0, 1, 0}, {1, 1, 0},
    {0, 0, 1}, {1, 0, 1}, {0, 1, 1}, {1, 1, 1},
};

struct TriRec {
    int64_t key[3];   // compact undirected edge keys, winding already oriented
};

inline int64_t gid_of(int x, int y, int z, int R) {
    return ((int64_t)x * R + y) * R + z;
}

// glibc mmaps any allocation above its (dynamically capped) 32 MB threshold
// and munmaps it on free, so every extraction re-pays first-touch page
// faults for its ~60 MB sort buffers — pathologically slow on this VM
// (kernel page zeroing measured at ~10 MB/s under memory pressure). Keep
// big blocks on the sbrk heap and never trim it back: pages are faulted
// once per process and reused by every later call (this also stabilizes
// numpy's large temporaries in the same process). RSS retains the peak —
// acceptable by design for the extraction service.
__attribute__((constructor)) static void surfd_malloc_tune() {
  mallopt(M_MMAP_THRESHOLD, 1 << 30);
  mallopt(M_TRIM_THRESHOLD, 1 << 30);
}

// Process-lifetime scratch arena (VERDICT r3 weak #2): the emit/sort
// buffers are ~150-250 MB per extraction; malloc-per-call interleaved with
// the pipeline's numpy buffers (pooled 512 MB grid, adopted mesh outputs)
// fragments the never-trimmed heap, so every run faults a fresh span of
// pages — measured as mt_pass2 growing 0.6 → 4.5 → 10.3 → 14.2 s across
// runs of ONE process (BENCH_r03). Keeping the buffers alive makes every
// extraction after the first touch only already-faulted memory. Capacity
// is retained forever by design (extraction-service memory model; ~250 MB
// steady-state for 512³ garment-scale meshes).
struct EmitArena {
  std::vector<std::vector<TriRec>> tbuf;  // per-thread triangle records
  std::vector<surfd::KV> keyslot;         // (3T) edge-key/slot pairs
  std::vector<surfd::KV> radix_tmp;       // radix ping-pong buffer
  std::vector<uint32_t> radix_count;      // radix histogram
  std::vector<int64_t> face_flat;         // (3T) vertex ids per face corner
  std::vector<int64_t> uniq_a, uniq_b;    // unique edge endpoints
  std::vector<uint64_t> corner_bits;      // pass-1 corner bitmask (NV/64)
  std::vector<int64_t> ids_v;             // pass-1 active-cube ids
  std::vector<int64_t> base;              // corner-rank cube base gids
};
static EmitArena& arena() {
  static EmitArena a;
  return a;
}
static std::mutex g_arena_mu;  // serialize arena users (pipelined extraction)

// SURFD_MT_PROFILE=1 prints per-phase timings of surfd_mt_emit to stderr.
struct PhaseTimer {
  bool on;
  std::chrono::steady_clock::time_point t;
  PhaseTimer() : on(std::getenv("SURFD_MT_PROFILE") != nullptr) { t = now(); }
  static std::chrono::steady_clock::time_point now() {
    return std::chrono::steady_clock::now();
  }
  void mark(const char* name) {
    if (!on) return;
    auto t2 = now();
    std::fprintf(stderr, "[mt_emit] %-12s %.3f s\n", name,
                 std::chrono::duration<double>(t2 - t).count());
    t = t2;
  }
};

// Flat-gid -> (x, y, z) decode, shift/mask when R is a power of two (the
// production resolutions 128/256/512 all are; int64 div is ~20-40 cycles).
struct GidDecode {
  int64_t RR;
  int R;
  bool pow2;
  int s1;
  uint64_t mask;
  void init(int R_) {
    R = R_;
    RR = (int64_t)R_ * R_;
    pow2 = (R_ & (R_ - 1)) == 0;
    s1 = pow2 ? __builtin_ctz(R_) : 0;
    mask = pow2 ? (uint64_t)(R_ - 1) : 0;
  }
  inline void xyz(int64_t g, int& x, int& y, int& z) const {
    if (pow2) {
      x = (int)(g >> (2 * s1));
      y = (int)((g >> s1) & mask);
      z = (int)(g & mask);
    } else {
      x = (int)(g / RR);
      y = (int)((g / R) % R);
      z = (int)(g % R);
    }
  }
};

// The 19 distinct |gid delta|s of tet edges (corner pairs within one cube).
// Edge key = min_gid * 32 + delta_type: 33 bits at R=512 instead of the 54 of
// min*NV+max, so the dedup radix sort runs 3 passes instead of 5.
struct EdgeDeltas {
  int64_t deltas[19];
  int n;
  void init(int R) {
    const int64_t RR = (int64_t)R * R;
    n = 0;
    int64_t tmp[32];
    for (int t = 0; t < 6; ++t)
      for (int e = 0; e < 6; ++e) {
        int ca = TETS[t][TET_EDGES[e][0]], cb = TETS[t][TET_EDGES[e][1]];
        int64_t ga = CORNER_OFF[ca][0] * RR + CORNER_OFF[ca][1] * R + CORNER_OFF[ca][2];
        int64_t gb = CORNER_OFF[cb][0] * RR + CORNER_OFF[cb][1] * R + CORNER_OFF[cb][2];
        int64_t d = ga < gb ? gb - ga : ga - gb;
        bool dup = false;
        for (int i = 0; i < n; ++i) dup |= tmp[i] == d;
        if (!dup) tmp[n++] = d;
      }
    std::sort(tmp, tmp + n);
    for (int i = 0; i < n; ++i) deltas[i] = tmp[i];
  }
  inline int type_of(int64_t d) const {
    int lo = 0, hi = n;
    while (lo + 1 < hi) {
      int mid = (lo + hi) >> 1;
      if (deltas[mid] <= d) lo = mid;
      else hi = mid;
    }
    return lo;
  }
};

void worker_active(
    const float* udf, int R, float near_thr, float avg_thr,
    int z0, int z1, std::vector<int64_t>* out,
    std::atomic<uint64_t>* corner_bits) {
  const int64_t RR = (int64_t)R * R;
  for (int x = z0; x < z1; ++x) {
    if (x >= R - 1) continue;
    for (int y = 0; y < R - 1; ++y) {
      const float* row = udf + x * RR + (int64_t)y * R;
      for (int z = 0; z < R - 1; ++z) {
        if (row[z] > near_thr) continue;
        float s = 0.f;
        bool ok = true;
        for (int c = 0; c < 8 && ok; ++c) {
          float v = udf[(int64_t)(x + CORNER_OFF[c][0]) * RR +
                        (int64_t)(y + CORNER_OFF[c][1]) * R +
                        (z + CORNER_OFF[c][2])];
          if (v > near_thr) ok = false;
          s += v;
        }
        if (!ok || s * 0.125f >= avg_thr) continue;
        out->push_back(((int64_t)x * (R - 1) + y) * (R - 1) + z);
        // mark the 8 corners: the python side evaluates gradients at exactly
        // these nodes (a strict subset of the near band — fewer device evals
        // and less d2h than collecting every near vertex)
        for (int c = 0; c < 8; ++c) {
          int64_t g = (int64_t)(x + CORNER_OFF[c][0]) * RR +
                      (int64_t)(y + CORNER_OFF[c][1]) * R +
                      (z + CORNER_OFF[c][2]);
          corner_bits[g >> 6].fetch_or(1ull << (g & 63), std::memory_order_relaxed);
        }
      }
    }
  }
}

}  // namespace

extern "C" {

void surfd_free(void* p) { std::free(p); }

// Pass 1: flat active-cube ids (x*(R-1)+y)*(R-1)+z AND the sorted gid list of
// every distinct active-cube CORNER (the exact nodes pass 2 needs gradients
// at). Caller frees both with surfd_free. Returns the active-cube count;
// *out_n_near receives the corner count.
int64_t surfd_mt_active_cubes(
    const float* udf, int32_t R, float near_thr, float avg_thr,
    int64_t** out_ids, int64_t** out_near, int64_t* out_n_near) {
  int nt = std::max(1u, std::thread::hardware_concurrency());
  nt = std::min(nt, 16);
  const int64_t NV = (int64_t)R * R * R;
  const int64_t nwords = (NV + 63) >> 6;
  std::atomic<uint64_t>* corner_bits = new std::atomic<uint64_t>[nwords];
  std::memset((void*)corner_bits, 0, nwords * sizeof(uint64_t));
  std::vector<std::vector<int64_t>> buf(nt);
  std::vector<std::thread> threads;
  int per = (R + nt - 1) / nt;
  for (int t = 0; t < nt; ++t) {
    int a = t * per, b = std::min((t + 1) * per, (int)R);
    if (a >= b) break;
    threads.emplace_back(worker_active, udf, R, near_thr, avg_thr, a, b, &buf[t], corner_bits);
  }
  for (auto& th : threads) th.join();

  int64_t n_active = 0;
  for (auto& v : buf) n_active += (int64_t)v.size();
  int64_t* ids = (int64_t*)std::malloc(sizeof(int64_t) * std::max<int64_t>(n_active, 1));
  int64_t off = 0;
  for (auto& v : buf) {
    std::memcpy(ids + off, v.data(), v.size() * sizeof(int64_t));
    off += (int64_t)v.size();
  }
  *out_ids = ids;

  // scan the bitmask: sorted ascending corner gid list, popcount-sized
  int64_t n_corner = 0;
  for (int64_t w = 0; w < nwords; ++w)
    n_corner += __builtin_popcountll(corner_bits[w].load(std::memory_order_relaxed));
  int64_t* corners = (int64_t*)std::malloc(sizeof(int64_t) * std::max<int64_t>(n_corner, 1));
  int64_t k = 0;
  for (int64_t w = 0; w < nwords; ++w) {
    uint64_t bits = corner_bits[w].load(std::memory_order_relaxed);
    while (bits) {
      int b = __builtin_ctzll(bits);
      corners[k++] = (w << 6) | b;
      bits &= bits - 1;
    }
  }
  delete[] corner_bits;
  *out_near = corners;
  *out_n_near = n_corner;
  return n_active;
}

// Block-gated pass 1: identical output to surfd_mt_active_cubes, but only
// cube anchors inside the given scan blocks are visited — the caller derives
// the scan set from the grid filler's active-block list (dilated by one block
// in the negative direction), so the sweep touches ~the near-band volume
// instead of the full R³ grid (537 MB at 512³ on a ~1.5 GB/s host).
// sb: (S, 3) int32 scan-block coords at block size BS. Emitted cube ids are
// sorted ascending (same order as the full scan).
int64_t surfd_mt_active_cubes_blocks(
    const float* udf, int32_t R, float near_thr, float avg_thr,
    const int32_t* sb, int64_t S, int32_t BS,
    int64_t** out_ids, int64_t** out_near, int64_t* out_n_near) {
  std::lock_guard<std::mutex> lk(g_arena_mu);
  const int64_t RR = (int64_t)R * R;
  const int64_t NV = (int64_t)R * R * R;
  const int64_t nwords = (NV + 63) >> 6;
  // arena-backed bitmask + id list: faulted once per process, then reused
  EmitArena& A = arena();
  A.corner_bits.resize(nwords);
  std::memset(A.corner_bits.data(), 0, nwords * sizeof(uint64_t));
  uint64_t* corner_bits = A.corner_bits.data();
  auto& ids_v = A.ids_v;
  ids_v.clear();
  for (int64_t s = 0; s < S; ++s) {
    const int x0 = sb[s * 3] * BS, y0 = sb[s * 3 + 1] * BS, z0 = sb[s * 3 + 2] * BS;
    const int x1 = std::min(x0 + BS, R - 1);
    const int y1 = std::min(y0 + BS, R - 1);
    const int z1 = std::min(z0 + BS, R - 1);
    for (int x = x0; x < x1; ++x)
      for (int y = y0; y < y1; ++y) {
        const float* row = udf + x * RR + (int64_t)y * R;
        for (int z = z0; z < z1; ++z) {
          if (row[z] > near_thr) continue;
          float sum = 0.f;
          bool ok = true;
          for (int c = 0; c < 8 && ok; ++c) {
            float v = udf[(int64_t)(x + CORNER_OFF[c][0]) * RR +
                          (int64_t)(y + CORNER_OFF[c][1]) * R +
                          (z + CORNER_OFF[c][2])];
            if (v > near_thr) ok = false;
            sum += v;
          }
          if (!ok || sum * 0.125f >= avg_thr) continue;
          ids_v.push_back(((int64_t)x * (R - 1) + y) * (R - 1) + z);
          for (int c = 0; c < 8; ++c) {
            int64_t g = (int64_t)(x + CORNER_OFF[c][0]) * RR +
                        (int64_t)(y + CORNER_OFF[c][1]) * R +
                        (z + CORNER_OFF[c][2]);
            corner_bits[g >> 6] |= 1ull << (g & 63);
          }
        }
      }
  }
  std::sort(ids_v.begin(), ids_v.end());
  const int64_t n_active = (int64_t)ids_v.size();
  int64_t* ids = (int64_t*)std::malloc(sizeof(int64_t) * std::max<int64_t>(n_active, 1));
  std::memcpy(ids, ids_v.data(), n_active * sizeof(int64_t));
  *out_ids = ids;

  int64_t n_corner = 0;
  for (int64_t w = 0; w < nwords; ++w) n_corner += __builtin_popcountll(corner_bits[w]);
  int64_t* corners = (int64_t*)std::malloc(sizeof(int64_t) * std::max<int64_t>(n_corner, 1));
  int64_t k = 0;
  for (int64_t w = 0; w < nwords; ++w) {
    uint64_t bits = corner_bits[w];
    while (bits) {
      int b = __builtin_ctzll(bits);
      corners[k++] = (w << 6) | b;
      bits &= bits - 1;
    }
  }
  *out_near = corners;
  *out_n_near = n_corner;
  return n_active;
}

// Ranks of every active-cube corner gid within the sorted near-gid list
// (the np.searchsorted of the marching step, done as 8 linear merges: for a
// fixed corner offset, corner gid = cube base gid + const, and cube_ids are
// ascending — so each of the 8 columns is ascending and a single monotone
// scan per column resolves all ranks in O(M + NN) instead of M·8·log NN).
// Every corner is guaranteed present in `near` (pass 1 emitted exactly
// these nodes). out: (M, 8) int32.
void surfd_mt_corner_ranks(
    const int64_t* near, int64_t NN, const int64_t* cube_ids, int64_t M,
    int32_t R, int32_t* out) {
  std::lock_guard<std::mutex> lk(g_arena_mu);
  const int Rm1 = R - 1;
  const int64_t RR = (int64_t)R * R;
  // cube base gid (corner 0) per cube, ascending with cube_ids (arena-backed)
  auto& base = arena().base;
  base.resize((size_t)M);
  for (int64_t m = 0; m < M; ++m) {
    int64_t cid = cube_ids[m];
    int z = (int)(cid % Rm1);
    int y = (int)((cid / Rm1) % Rm1);
    int x = (int)(cid / ((int64_t)Rm1 * Rm1));
    base[m] = (int64_t)x * RR + (int64_t)y * R + z;
  }
  for (int c = 0; c < 8; ++c) {
    const int64_t off = (int64_t)CORNER_OFF[c][0] * RR +
                        (int64_t)CORNER_OFF[c][1] * R + CORNER_OFF[c][2];
    int64_t j = 0;
    for (int64_t m = 0; m < M; ++m) {
      const int64_t g = base[m] + off;
      while (j < NN && near[j] < g) ++j;
      out[m * 8 + c] = (int32_t)j;
    }
  }
}

// ABI version of this library. surfd_tpu/native.py asserts it at load so a
// stale prebuilt .so (older signatures) can never be called through newer
// ctypes prototypes — silently-wrong arguments instead become a hard error.
// Bump on ANY extern "C" signature change.
int64_t surfd_abi_version() { return 5; }

// Scatter B³ uint16-quantized value blocks into the dense f32 grid, fusing
// the u16→f32 dequantization (numpy: .astype + fancy index ≈ 0.5 s at 3.5M
// points on this host; here one streaming pass). `bias` (per active block —
// the surface-bias calibration field, or nullptr for none) is subtracted
// during the dequantize, and the result is clamped at `clamp_min` ≥ 0:
// a BCE-trained UDF decoder cannot output exactly 0 at the surface, so its
// zero level set sits `bias` outside the true surface; the clamp keeps the
// corrected field inside marching's `udf ≥ 0` contract (a negative value
// with a near-zero edge sum extrapolates spike vertices).
void surfd_scatter_u16_blocks(
    float* grid, int32_t R, const int32_t* ab, int64_t M, int32_t B,
    const uint16_t* vals, float scale, const float* bias, float clamp_min) {
  const int64_t RR = (int64_t)R * R;
  const int64_t BB = (int64_t)B * B;
  for (int64_t m = 0; m < M; ++m) {
    const int x0 = ab[m * 3] * B, y0 = ab[m * 3 + 1] * B, z0 = ab[m * 3 + 2] * B;
    const uint16_t* v = vals + m * BB * B;
    const float bm = bias ? bias[m] : 0.f;
    for (int i = 0; i < B; ++i)
      for (int j = 0; j < B; ++j) {
        float* dst = grid + (int64_t)(x0 + i) * RR + (int64_t)(y0 + j) * R + z0;
        const uint16_t* src = v + i * BB + (int64_t)j * B;
        for (int k2 = 0; k2 < B; ++k2) {
          float val = src[k2] * scale - bm;
          dst[k2] = val < clamp_min ? clamp_min : val;
        }
      }
  }
}

// Reset previously-written blocks to `value` — buffer reuse between fills
// (first-touch page allocation of a fresh 512³ grid is pathologically slow
// on this VM; reusing the buffer makes the fill cost proportional to the
// active volume).
void surfd_reset_blocks(
    float* grid, int32_t R, const int32_t* ab, int64_t M, int32_t B, float value) {
  const int64_t RR = (int64_t)R * R;
  for (int64_t m = 0; m < M; ++m) {
    const int x0 = ab[m * 3] * B, y0 = ab[m * 3 + 1] * B, z0 = ab[m * 3 + 2] * B;
    for (int i = 0; i < B; ++i)
      for (int j = 0; j < B; ++j) {
        float* dst = grid + (int64_t)(x0 + i) * RR + (int64_t)(y0 + j) * R + z0;
        for (int k2 = 0; k2 < B; ++k2) dst[k2] = value;
      }
  }
}

// Pass 2: emit the deduped mesh.
//   udf        (R³,) f32
//   cube_ids   (M,) flat ids from pass 1
//   g8         (M, 8, 3) int8 unit gradients at cube corners
// Outputs malloc'd arrays (caller frees): verts (V,3) f32, faces (F,3) i64.
// Faces are oriented so normals align with the corner gradients.
int64_t surfd_mt_emit(
    const float* udf, int32_t R, float lo, float spacing,
    const int64_t* cube_ids, int64_t M, const int8_t* g8,
    float** out_verts, int64_t* out_nverts,
    int64_t** out_faces, int64_t* out_nfaces) {
  std::lock_guard<std::mutex> lk(g_arena_mu);
  PhaseTimer PT;
  const int64_t NV = (int64_t)R * R * R;
  const int Rm1 = R - 1;
  EdgeDeltas ED;
  ED.init(R);
  GidDecode GD;
  GD.init(R);

  int nt = std::max(1u, std::thread::hardware_concurrency());
  nt = std::min(nt, 16);
  EmitArena& A = arena();
  if ((int)A.tbuf.size() < nt) A.tbuf.resize(nt);
  for (int t = 0; t < nt; ++t) A.tbuf[t].clear();  // capacity retained
  auto& tbuf = A.tbuf;

  auto worker = [&](int t0idx, int t1idx, int ti) {
    auto& out = tbuf[ti];
    for (int64_t m = t0idx; m < t1idx; ++m) {
      int64_t cid = cube_ids[m];
      int z = (int)(cid % Rm1);
      int y = (int)((cid / Rm1) % Rm1);
      int x = (int)(cid / ((int64_t)Rm1 * Rm1));
      const int8_t* g = g8 + m * 24;

      auto dot = [&](int a, int b) {
        int s = (int)g[a * 3] * g[b * 3] + (int)g[a * 3 + 1] * g[b * 3 + 1] +
                (int)g[a * 3 + 2] * g[b * 3 + 2];
        return s < 0;
      };
      // crossing parity along the canonical path (see marching.py)
      bool cx = dot(0, 1);
      bool cy[2] = {dot(0, 2), dot(1, 3)};
      bool cz[2][2] = {{dot(0, 4), dot(2, 6)}, {dot(1, 5), dot(3, 7)}};
      // No crossing on any path edge → every corner keeps parity 0 → all
      // pseudo-signs positive → case 0 in all six tets. Skip before the 8
      // scattered udf loads; on learned fields most near-band cubes have
      // consistently-oriented gradients and die here.
      if (!(cx | cy[0] | cy[1] | cz[0][0] | cz[0][1] | cz[1][0] | cz[1][1]))
        continue;
      float vals[8];
      float uraw[8];
      int64_t gids[8];
      for (int c = 0; c < 8; ++c) {
        int dx = CORNER_OFF[c][0], dy = CORNER_OFF[c][1], dz = CORNER_OFF[c][2];
        bool parity = false;
        if (dx) parity ^= cx;
        if (dy) parity ^= cy[dx];
        if (dz) parity ^= cz[dx][dy];
        gids[c] = gid_of(x + dx, y + dy, z + dz, R);
        float u = udf[gids[c]];
        uraw[c] = u;
        vals[c] = parity ? -u : u;
      }
      // per-cube outward direction: mean of s_c · g_c over corners (the UDF
      // gradient points away from the surface on the pseudo-positive side)
      float ox = 0.f, oy = 0.f, oz = 0.f;
      for (int c = 0; c < 8; ++c) {
        float s = vals[c] < 0.f ? -1.f : 1.f;
        ox += s * g[c * 3];
        oy += s * g[c * 3 + 1];
        oz += s * g[c * 3 + 2];
      }

      for (int tet = 0; tet < 6; ++tet) {
        int cse = 0;
        for (int k = 0; k < 4; ++k)
          if (vals[TETS[tet][k]] < 0.f) cse |= 1 << k;
        for (int s = 0; s < 2; ++s) {
          if (TRI_TABLE[cse][s][0] < 0) continue;
          TriRec rec;
          float px[3], py[3], pz[3];
          for (int k = 0; k < 3; ++k) {
            int e = TRI_TABLE[cse][s][k];
            int la = TETS[tet][TET_EDGES[e][0]];
            int lb = TETS[tet][TET_EDGES[e][1]];
            int64_t a = gids[la], b = gids[lb];
            if (a > b) std::swap(a, b);
            rec.key[k] = a * 32 + ED.type_of(b - a);
            // interpolated position straight from cube-local corner offsets
            // (grid-index space; affine → same winding). t = u_a/(u_a+u_b)
            // is symmetric in the endpoints, so no swap bookkeeping.
            float ua = uraw[la], ub = uraw[lb];
            float su = ua + ub;
            // clamp: a bias-calibrated grid can dip slightly below 0 near
            // the surface; an unclamped t would extrapolate the vertex far
            // off its edge (spike vertices — r4 sheet_122 blowup)
            float t = su > 1e-12f ? ua / su : 0.5f;
            t = t < 0.f ? 0.f : (t > 1.f ? 1.f : t);
            px[k] = (float)(x + CORNER_OFF[la][0]) +
                    t * (float)(CORNER_OFF[lb][0] - CORNER_OFF[la][0]);
            py[k] = (float)(y + CORNER_OFF[la][1]) +
                    t * (float)(CORNER_OFF[lb][1] - CORNER_OFF[la][1]);
            pz[k] = (float)(z + CORNER_OFF[la][2]) +
                    t * (float)(CORNER_OFF[lb][2] - CORNER_OFF[la][2]);
          }
          // orient: flip if normal opposes the cube outward direction
          float e1x = px[1] - px[0], e1y = py[1] - py[0], e1z = pz[1] - pz[0];
          float e2x = px[2] - px[0], e2y = py[2] - py[0], e2z = pz[2] - pz[0];
          float nx = e1y * e2z - e1z * e2y;
          float ny = e1z * e2x - e1x * e2z;
          float nz = e1x * e2y - e1y * e2x;
          if (nx * ox + ny * oy + nz * oz < 0.f) std::swap(rec.key[1], rec.key[2]);
          out.push_back(rec);
        }
      }
    }
  };

  {
    std::vector<std::thread> threads;
    int64_t per = (M + nt - 1) / nt;
    for (int t = 0; t < nt; ++t) {
      int64_t a = t * per, b = std::min<int64_t>((t + 1) * per, M);
      if (a >= b) break;
      threads.emplace_back(worker, a, b, t);
    }
    for (auto& th : threads) th.join();
  }
  PT.mark("emit_loop");

  int64_t T = 0;
  for (int t = 0; t < nt; ++t) T += (int64_t)tbuf[t].size();
  if (T == 0) {
    // stub sizes match the (1, 3) shapes the ctypes wrappers declare for
    // empty results (the rows are sliced away, but the view must not
    // extend past the allocation)
    *out_verts = (float*)std::malloc(3 * sizeof(float));
    *out_nverts = 0;
    *out_faces = (int64_t*)std::malloc(3 * sizeof(int64_t));
    *out_nfaces = 0;
    return 0;
  }

  // Flatten all edge keys with their slot index, radix-sort, assign ids.
  // All big scratch comes from the arena — zero fresh pages after call 1.
  auto& keyslot = A.keyslot;
  keyslot.resize(T * 3);
  {
    int64_t off = 0;
    for (int t = 0; t < nt; ++t) {
      for (auto& rec : tbuf[t]) {
        for (int k = 0; k < 3; ++k)
          keyslot[off * 3 + k] = {(uint64_t)rec.key[k], off * 3 + k};
        ++off;
      }
    }
  }
  PT.mark("flatten");
  surfd::radix_sort_kv(keyslot, (uint64_t)NV * 32, A.radix_tmp, A.radix_count);
  PT.mark("radix_sort");

  auto& face_flat = A.face_flat;
  face_flat.resize(T * 3);
  auto& uniq_a = A.uniq_a;
  auto& uniq_b = A.uniq_b;
  uniq_a.clear();
  uniq_b.clear();
  uniq_a.reserve(T);
  uniq_b.reserve(T);
  int64_t vid = -1;
  uint64_t prev_key = UINT64_MAX;
  for (auto& ks : keyslot) {
    if (ks.key != prev_key) {
      prev_key = ks.key;
      ++vid;
      int64_t a = (int64_t)(ks.key >> 5);
      uniq_a.push_back(a);
      uniq_b.push_back(a + ED.deltas[ks.key & 31]);
    }
    face_flat[ks.val] = vid;
  }
  int64_t V = vid + 1;
  PT.mark("assign_ids");

  // Interpolate vertex positions: t = u_a / (u_a + u_b), gauge-invariant.
  float* verts = (float*)std::malloc(sizeof(float) * 3 * V);
  for (int64_t i = 0; i < V; ++i) {
    int64_t a = uniq_a[i], b = uniq_b[i];
    float ua = udf[a], ub = udf[b];
    float su = ua + ub;
    // clamped: a true crossing has t in [0,1]; anything outside comes from a
    // (slightly) negative endpoint after surface-bias subtraction and would
    // extrapolate a spike vertex outside the edge
    float t = su > 1e-12f ? ua / su : 0.5f;
    t = t < 0.f ? 0.f : (t > 1.f ? 1.f : t);
    int ax, ay, az, bx, by, bz;
    GD.xyz(a, ax, ay, az);
    GD.xyz(b, bx, by, bz);
    verts[3 * i] = lo + spacing * (ax + t * (bx - ax));
    verts[3 * i + 1] = lo + spacing * (ay + t * (by - ay));
    verts[3 * i + 2] = lo + spacing * (az + t * (bz - az));
  }

  // Faces (drop degenerates after dedup-clamping).
  int64_t* faces = (int64_t*)std::malloc(sizeof(int64_t) * 3 * T);
  int64_t F = 0;
  for (int64_t f = 0; f < T; ++f) {
    int64_t i0 = face_flat[3 * f], i1 = face_flat[3 * f + 1], i2 = face_flat[3 * f + 2];
    if (i0 == i1 || i1 == i2 || i0 == i2) continue;
    faces[3 * F] = i0;
    faces[3 * F + 1] = i1;
    faces[3 * F + 2] = i2;
    ++F;
  }

  PT.mark("verts_faces");

  *out_verts = verts;
  *out_nverts = V;
  *out_faces = faces;
  *out_nfaces = F;
  return F;
}

// Sorted-unique with inverse mapping (parallel sort). Returns #unique;
// caller frees *out_unique with surfd_free. inverse must hold n entries.
int64_t surfd_unique_inverse_i64(
    const int64_t* keys, int64_t n, int64_t** out_unique, int64_t* inverse) {
  std::vector<surfd::KV> ks((size_t)n);
  uint64_t max_key = 0;
  for (int64_t i = 0; i < n; ++i) {
    ks[i] = {(uint64_t)keys[i], i};
    max_key = std::max(max_key, (uint64_t)keys[i]);
  }
  surfd::radix_sort_kv(ks, max_key);
  int64_t* uniq = (int64_t*)std::malloc(sizeof(int64_t) * std::max<int64_t>(n, 1));
  int64_t vid = -1;
  uint64_t prev = UINT64_MAX;
  for (auto& p : ks) {
    if (p.key != prev || vid < 0) {
      prev = p.key;
      uniq[++vid] = (int64_t)p.key;
    }
    inverse[p.val] = vid;
  }
  *out_unique = uniq;
  return vid + 1;
}

}  // extern "C"
