// Native mesh post-processing: face-filter prep + fused finalize.
//
// C++ twin of the host side of surfd_tpu/pipelines/generate.py
// (filter_faces_by_udf) and surfd_tpu/geometry/mesh_ops.py (stabilize /
// smooth_borders / merge_duplicate_vertices) — the reference's false-face
// filter + trimesh/scipy cleanup chain (/root/reference/meshudf/meshudf.py:
// 356-434). The numpy implementations are the semantic oracle; this module
// fuses them into two calls so the single-core host walks the mesh O(1)
// times instead of once per op:
//
//   prep      surfd_face_filter_prep(verts, faces)
//             → [verts; unique-edge midpoints] query points + per-face edge ids
//   (python evaluates the below-threshold mask on the TPU)
//   finalize  surfd_finalize_mesh(verts, faces, ok, einv, ...)
//             → keep-filter → vertex remap → 3-edge hole fill →
//               border smoothing (Jacobi, λ, n iters) → 1e-6 vertex merge
//
// Hole-fill equivalence argument (vs mesh_ops.stabilize's repeat-until-stable
// loop): adding a hole triangle only CONSUMES border edges (its three edges
// existed and move from count 1 to 2) and never creates new edges, so the set
// of candidate 3-cycles can only shrink between rounds — every candidate of
// round k+1 was already a candidate of round 1. One pass therefore finds
// everything, except the numpy loop's lone-triangle oscillation (a detached
// triangle re-adds itself as its own "hole" and remove_duplicate_faces drops
// it again): detected here directly by skipping candidates whose three border
// edges belong to one face.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <mutex>
#include <vector>

#include "radix.h"

namespace {

// Process-lifetime scratch arena (same rationale as marching.cpp's
// EmitArena): the prep/finalize passes allocate ~250 MB of vectors per
// extraction; per-call malloc interleaved with the pipeline's numpy
// buffers fragments the never-trimmed heap and re-pays first-touch page
// faults every run. Buffers are cleared (capacity retained) per call.
// g_mu serializes entry points against the (default-off) depth-2 pipelined
// extraction overlapping two calls.
struct PostArena {
  std::vector<surfd::KV> kv, radix_tmp;
  std::vector<uint32_t> radix_count;
  std::vector<int64_t> ea, eb, owner, kept, remap, f2, einv2;
  std::vector<int32_t> counts;
  std::vector<float> v2, v3;
  std::vector<int64_t> vmap, rep;
};
PostArena& parena() {
  static PostArena a;
  return a;
}
std::mutex g_mu;

// Unique undirected edges of a face soup via one radix sort.
// keys[slot] = lo*(V+1)+hi for slot = f*3+k. Fills:
//   einv[slot]  -> unique edge id
//   edges       -> (a, b) per unique edge (a < b), ascending key order
//   counts      -> faces per edge
//   owner       -> face id of ONE face using the edge (the last in sort order)
// ea/eb/counts/owner are CLEARED here (arena-friendly).
void unique_edges(const int64_t* faces, int64_t F, int64_t V,
                  int64_t* einv, std::vector<int64_t>& ea,
                  std::vector<int64_t>& eb, std::vector<int32_t>& counts,
                  std::vector<int64_t>& owner) {
  ea.clear();
  eb.clear();
  counts.clear();
  owner.clear();
  const uint64_t NV = (uint64_t)V + 1;
  PostArena& P = parena();
  auto& kv = P.kv;
  kv.resize((size_t)F * 3);
  for (int64_t f = 0; f < F; ++f) {
    const int64_t* tri = faces + f * 3;
    for (int k = 0; k < 3; ++k) {
      int64_t a = tri[k], b = tri[(k + 1) % 3];
      if (a > b) std::swap(a, b);
      kv[f * 3 + k] = {(uint64_t)a * NV + (uint64_t)b, f * 3 + k};
    }
  }
  surfd::radix_sort_kv(kv, NV * NV, P.radix_tmp, P.radix_count);
  int64_t eid = -1;
  uint64_t prev = UINT64_MAX;
  for (auto& p : kv) {
    if (p.key != prev || eid < 0) {
      prev = p.key;
      ++eid;
      ea.push_back((int64_t)(p.key / NV));
      eb.push_back((int64_t)(p.key % NV));
      counts.push_back(0);
      owner.push_back(p.val / 3);
    }
    ++counts[eid];
    owner[eid] = p.val / 3;
    einv[p.val] = eid;
  }
}

// Shared cleanup core operating on the FILTERED mesh (v2/f2) plus its edge
// structure: ea/eb (endpoint ids in v2 numbering, border subset ascending by
// (a,b)), counts (faces per edge; 0 = edge absent from the filtered mesh,
// skipped everywhere), owner (a face of f2 using the edge — unambiguous for
// border edges, the only place it is read). Steps 4-6 of the header comment.
void cleanup_core(std::vector<float>& v2, std::vector<int64_t>& f2,
                  int64_t V2, int64_t& F2,
                  const std::vector<int64_t>& ea, const std::vector<int64_t>& eb,
                  std::vector<int32_t>& counts, const std::vector<int64_t>& owner,
                  int32_t fill_holes, int32_t smooth_iters, float lam,
                  int32_t merge_decimals,
                  float** out_verts, int64_t* out_nv,
                  int64_t** out_faces, int64_t* out_nf) {
  const int64_t E2 = (int64_t)ea.size();

  // --- 4. fill 3-edge holes (single pass; see header equivalence note) ---
  if (fill_holes && F2) {
    // group border edges by their smaller endpoint for path continuation
    std::vector<int64_t> border;  // edge ids, ascending (a,b) key order
    for (int64_t e = 0; e < E2; ++e)
      if (counts[e] == 1) border.push_back(e);
    // start index per vertex into `border` (border is sorted by (a, b))
    std::vector<int64_t> bstart((size_t)V2 + 1, 0);
    for (int64_t i = 0; i < (int64_t)border.size(); ++i) ++bstart[ea[border[i]] + 1];
    for (int64_t v = 0; v < V2; ++v) bstart[v + 1] += bstart[v];
    auto find_border = [&](int64_t a, int64_t c) -> int64_t {
      // binary search border edges with lo == a for hi == c
      int64_t loi = bstart[a], hii = bstart[a + 1];
      while (loi < hii) {
        int64_t mid = (loi + hii) / 2;
        int64_t e = border[mid];
        if (eb[e] < c) loi = mid + 1;
        else if (eb[e] > c) hii = mid;
        else return e;
      }
      return -1;
    };
    std::vector<int64_t> newf;
    for (int64_t bi = 0; bi < (int64_t)border.size(); ++bi) {
      int64_t e_ab = border[bi];
      int64_t a = ea[e_ab], b = eb[e_ab];
      for (int64_t bj = bstart[b]; bj < bstart[b + 1]; ++bj) {
        int64_t e_bc = border[bj];
        int64_t c = eb[e_bc];  // c > b > a
        int64_t e_ac = find_border(a, c);
        if (e_ac < 0) continue;
        // lone detached triangle re-adding itself is not a hole
        if (owner[e_ab] == owner[e_bc] && owner[e_bc] == owner[e_ac]) continue;
        newf.push_back(a);
        newf.push_back(b);
        newf.push_back(c);
        // consume the three edges so the final border excludes them
        ++counts[e_ab];
        ++counts[e_bc];
        ++counts[e_ac];
      }
    }
    f2.insert(f2.end(), newf.begin(), newf.end());
    F2 += (int64_t)newf.size() / 3;
  }

  // --- 5. border smoothing (Jacobi over border-to-border edges) ---
  if (smooth_iters > 0 && E2) {
    std::vector<int64_t> bmap((size_t)V2, -1);
    int64_t NB = 0;
    for (int64_t e = 0; e < E2; ++e)
      if (counts[e] == 1) {
        if (bmap[ea[e]] < 0) bmap[ea[e]] = NB++;
        if (bmap[eb[e]] < 0) bmap[eb[e]] = NB++;
      }
    if (NB) {
      std::vector<int64_t> binv((size_t)NB);
      for (int64_t v = 0; v < V2; ++v)
        if (bmap[v] >= 0) binv[bmap[v]] = v;
      std::vector<std::pair<int32_t, int32_t>> bedges;
      for (int64_t e = 0; e < E2; ++e)
        if (counts[e] == 1)
          bedges.push_back({(int32_t)bmap[ea[e]], (int32_t)bmap[eb[e]]});
      std::vector<double> bv((size_t)NB * 3), acc((size_t)NB * 3);
      std::vector<int32_t> deg((size_t)NB, 0);
      for (int64_t i = 0; i < NB; ++i)
        for (int k = 0; k < 3; ++k) bv[i * 3 + k] = v2[binv[i] * 3 + k];
      for (auto& e : bedges) {
        ++deg[e.first];
        ++deg[e.second];
      }
      for (int it = 0; it < smooth_iters; ++it) {
        std::fill(acc.begin(), acc.end(), 0.0);
        for (auto& e : bedges) {
          for (int k = 0; k < 3; ++k) {
            acc[e.first * 3 + k] += bv[e.second * 3 + k];
            acc[e.second * 3 + k] += bv[e.first * 3 + k];
          }
        }
        for (int64_t i = 0; i < NB; ++i) {
          if (!deg[i]) continue;
          double inv_d = 1.0 / deg[i];
          for (int k = 0; k < 3; ++k)
            bv[i * 3 + k] += lam * (acc[i * 3 + k] * inv_d - bv[i * 3 + k]);
        }
      }
      for (int64_t i = 0; i < NB; ++i)
        for (int k = 0; k < 3; ++k) v2[binv[i] * 3 + k] = (float)bv[i * 3 + k];
    }
  }

  // --- 6. merge duplicate vertices (quantized key; first occurrence wins) ---
  int64_t V2m = V2;
  if (merge_decimals > 0 && V2) {
    const double scale = std::pow(10.0, merge_decimals);
    PostArena& P = parena();
    auto& kv = P.kv;  // unique_edges' use of P.kv is dead by this point
    kv.resize((size_t)V2);
    for (int64_t v = 0; v < V2; ++v) {
      uint64_t key = 0;
      for (int k = 0; k < 3; ++k) {
        int64_t q = (int64_t)std::llround((double)v2[v * 3 + k] * scale) + (1 << 20);
        key = (key << 21) | (uint64_t)(q & ((1 << 21) - 1));
      }
      kv[v] = {key, v};
    }
    surfd::radix_sort_kv(kv, UINT64_MAX >> 1, P.radix_tmp, P.radix_count);
    auto& vmap = P.vmap;
    vmap.resize((size_t)V2);
    auto& rep = P.rep;  // representative old id per merged vertex
    rep.clear();
    uint64_t prev = UINT64_MAX;
    int64_t gid = -1;
    for (auto& p : kv) {
      if (p.key != prev || gid < 0) {
        prev = p.key;
        ++gid;
        rep.push_back(p.val);
      } else if (p.val < rep[gid]) {
        rep[gid] = p.val;  // lowest original index is the representative
      }
      vmap[p.val] = gid;
    }
    int64_t V3 = gid + 1;
    auto& v3 = P.v3;
    v3.resize((size_t)V3 * 3);
    for (int64_t i = 0; i < V3; ++i) std::memcpy(&v3[i * 3], &v2[rep[i] * 3], 12);
    int64_t w = 0;
    for (int64_t f = 0; f < F2; ++f) {
      int64_t i0 = vmap[f2[f * 3]], i1 = vmap[f2[f * 3 + 1]], i2 = vmap[f2[f * 3 + 2]];
      if (i0 == i1 || i1 == i2 || i0 == i2) continue;
      f2[w * 3] = i0;
      f2[w * 3 + 1] = i1;
      f2[w * 3 + 2] = i2;
      ++w;
    }
    F2 = w;
    v2.swap(v3);
    V2m = V3;
  }

  float* overts = (float*)std::malloc(sizeof(float) * std::max<int64_t>(3 * V2m, 3));
  std::memcpy(overts, v2.data(), sizeof(float) * 3 * V2m);
  int64_t* ofaces = (int64_t*)std::malloc(sizeof(int64_t) * std::max<int64_t>(3 * F2, 3));
  std::memcpy(ofaces, f2.data(), sizeof(int64_t) * 3 * F2);
  *out_verts = overts;
  *out_nv = V2m;
  *out_faces = ofaces;
  *out_nf = F2;
}

// Steps 1-2 shared by both finalize entry points: keep faces whose 3
// vertices and 3 edge midpoints are all below-threshold, then remap to a
// compact vertex set (new ids ascend with old — monotone, which preserves
// the ascending edge order cleanup_core relies on).
void keep_and_remap(const float* verts, int64_t V, const int64_t* faces,
                    int64_t F, const uint8_t* ok, const int64_t* einv,
                    std::vector<int64_t>& kept, std::vector<int64_t>& remap,
                    std::vector<float>& v2, std::vector<int64_t>& f2,
                    int64_t& V2, int64_t& F2) {
  kept.reserve(F);
  for (int64_t f = 0; f < F; ++f) {
    const int64_t* tri = faces + f * 3;
    if (ok[tri[0]] && ok[tri[1]] && ok[tri[2]] &&
        ok[V + einv[f * 3]] && ok[V + einv[f * 3 + 1]] && ok[V + einv[f * 3 + 2]])
      kept.push_back(f);
  }
  remap.assign((size_t)V, -1);
  for (int64_t f : kept)
    for (int k = 0; k < 3; ++k) remap[faces[f * 3 + k]] = 0;
  V2 = 0;
  for (int64_t v = 0; v < V; ++v)
    if (remap[v] == 0) remap[v] = V2++;
    else remap[v] = -1;
  v2.resize((size_t)V2 * 3);
  for (int64_t v = 0; v < V; ++v)
    if (remap[v] >= 0) std::memcpy(&v2[remap[v] * 3], verts + v * 3, 12);
  f2.reserve(kept.size() * 3);
  for (int64_t f : kept)
    for (int k = 0; k < 3; ++k) f2.push_back(remap[faces[f * 3 + k]]);
  F2 = (int64_t)kept.size();
}

}  // namespace

extern "C" {

// Query points + per-face edge ids for the false-face filter.
// verts (V,3) f32, faces (F,3) i64.
// *out_pts   (V+E, 3) f32 — vertices then unique-edge midpoints (malloc'd)
// *out_einv  (F, 3) i64   — unique edge id per face edge (malloc'd)
// Returns E.
int64_t surfd_face_filter_prep(
    const float* verts, int64_t V, const int64_t* faces, int64_t F,
    float** out_pts, int64_t** out_einv) {
  std::lock_guard<std::mutex> lk(g_mu);
  int64_t* einv = (int64_t*)std::malloc(sizeof(int64_t) * std::max<int64_t>(F * 3, 3));
  PostArena& P = parena();
  auto& ea = P.ea;
  auto& eb = P.eb;
  auto& owner = P.owner;
  auto& counts = P.counts;
  unique_edges(faces, F, V, einv, ea, eb, counts, owner);
  const int64_t E = (int64_t)ea.size();
  float* pts = (float*)std::malloc(sizeof(float) * 3 * std::max<int64_t>(V + E, 1));
  std::memcpy(pts, verts, sizeof(float) * 3 * V);
  for (int64_t e = 0; e < E; ++e) {
    const float* pa = verts + ea[e] * 3;
    const float* pb = verts + eb[e] * 3;
    pts[(V + e) * 3 + 0] = 0.5f * (pa[0] + pb[0]);
    pts[(V + e) * 3 + 1] = 0.5f * (pa[1] + pb[1]);
    pts[(V + e) * 3 + 2] = 0.5f * (pa[2] + pb[2]);
  }
  *out_pts = pts;
  *out_einv = einv;
  return E;
}

// Quantized midpoint variant: emits ONLY the unique-edge midpoints, already
// u16-quantized to the 2^16 coords grid (q = rint((p - qlo) * qinv); numpy
// np.rint parity — both round half-to-even). The caller uploads the vertex
// queries to the device BEFORE this runs, so the edge radix-sort overlaps the
// tunnel's h2d + the decoder eval of the vertex mask. The edge endpoint
// lists come back too (ascending (a,b) — the order surfd_finalize_mesh_pre
// relies on), so the cleanup needs no second sort over the face soup.
// *out_qpts (E,3) u16, *out_einv (F,3) i64, *out_ea/*out_eb (E,) i64
// (all malloc'd). Returns E.
int64_t surfd_face_filter_prep_q16(
    const float* verts, int64_t V, const int64_t* faces, int64_t F,
    float qlo, float qinv,
    uint16_t** out_qpts, int64_t** out_einv,
    int64_t** out_ea, int64_t** out_eb) {
  std::lock_guard<std::mutex> lk(g_mu);
  int64_t* einv = (int64_t*)std::malloc(sizeof(int64_t) * std::max<int64_t>(F * 3, 3));
  PostArena& P = parena();
  auto& ea = P.ea;
  auto& eb = P.eb;
  auto& owner = P.owner;
  auto& counts = P.counts;
  unique_edges(faces, F, V, einv, ea, eb, counts, owner);
  const int64_t E = (int64_t)ea.size();
  uint16_t* qpts = (uint16_t*)std::malloc(sizeof(uint16_t) * 3 * std::max<int64_t>(E, 1));
  for (int64_t e = 0; e < E; ++e) {
    const float* pa = verts + ea[e] * 3;
    const float* pb = verts + eb[e] * 3;
    for (int k = 0; k < 3; ++k) {
      float q = std::nearbyintf((0.5f * (pa[k] + pb[k]) - qlo) * qinv);
      qpts[e * 3 + k] = (uint16_t)(q < 0.f ? 0.f : (q > 65535.f ? 65535.f : q));
    }
  }
  int64_t* ea_out = (int64_t*)std::malloc(sizeof(int64_t) * std::max<int64_t>(E, 1));
  int64_t* eb_out = (int64_t*)std::malloc(sizeof(int64_t) * std::max<int64_t>(E, 1));
  std::memcpy(ea_out, ea.data(), E * sizeof(int64_t));
  std::memcpy(eb_out, eb.data(), E * sizeof(int64_t));
  *out_qpts = qpts;
  *out_einv = einv;
  *out_ea = ea_out;
  *out_eb = eb_out;
  return E;
}

// Fused keep-filter + cleanup. ok is the (V+E,) uint8 below-threshold mask
// over the prep points; einv the (F,3) edge ids from prep. fill_holes,
// smooth_iters/lam and merge_decimals (0 disables) correspond to
// mesh_ops.stabilize / smooth_borders / merge_duplicate_vertices.
void surfd_finalize_mesh(
    const float* verts, int64_t V, const int64_t* faces, int64_t F,
    const uint8_t* ok, const int64_t* einv,
    int32_t fill_holes, int32_t smooth_iters, float lam, int32_t merge_decimals,
    float** out_verts, int64_t* out_nv, int64_t** out_faces, int64_t* out_nf) {
  std::lock_guard<std::mutex> lk(g_mu);
  PostArena& P = parena();
  auto& kept = P.kept;
  auto& remap = P.remap;
  auto& f2 = P.f2;
  auto& v2 = P.v2;
  kept.clear();
  f2.clear();
  int64_t V2, F2;
  keep_and_remap(verts, V, faces, F, ok, einv, kept, remap, v2, f2, V2, F2);

  // --- 3. edge structure of the filtered mesh ---
  auto& einv2 = P.einv2;
  einv2.resize((size_t)F2 * 3);
  auto& ea = P.ea;
  auto& eb = P.eb;
  auto& owner = P.owner;
  auto& counts = P.counts;
  if (F2) unique_edges(f2.data(), F2, V2, einv2.data(), ea, eb, counts, owner);
  else { ea.clear(); eb.clear(); counts.clear(); owner.clear(); }

  cleanup_core(v2, f2, V2, F2, ea, eb, counts, owner,
               fill_holes, smooth_iters, lam, merge_decimals,
               out_verts, out_nv, out_faces, out_nf);
}

// Fused keep-filter + cleanup REUSING the edge structure emitted by
// surfd_mt_emit_edges: einv (F,3) unique-edge ids of the UNFILTERED mesh,
// ea/eb (E,) its edge endpoints in ascending (a,b) order. The filtered
// mesh's edge structure is derived by a linear bincount over the kept
// faces' einv — no second radix sort over the face soup. The vertex remap
// is monotone, so the ascending edge order cleanup_core relies on survives.
void surfd_finalize_mesh_pre(
    const float* verts, int64_t V, const int64_t* faces, int64_t F,
    const uint8_t* ok, const int64_t* einv,
    const int64_t* ea_in, const int64_t* eb_in, int64_t E,
    int32_t fill_holes, int32_t smooth_iters, float lam, int32_t merge_decimals,
    float** out_verts, int64_t* out_nv, int64_t** out_faces, int64_t* out_nf) {
  std::lock_guard<std::mutex> lk(g_mu);
  PostArena& P = parena();
  auto& kept = P.kept;
  auto& remap = P.remap;
  auto& f2 = P.f2;
  auto& v2 = P.v2;
  kept.clear();
  f2.clear();
  int64_t V2, F2;
  keep_and_remap(verts, V, faces, F, ok, einv, kept, remap, v2, f2, V2, F2);

  // --- 3'. filtered-mesh edge structure by bincount (linear, no sort) ---
  auto& counts = P.counts;
  counts.assign((size_t)E, 0);
  auto& owner = P.owner;
  owner.assign((size_t)E, -1);
  for (int64_t i = 0; i < F2; ++i) {
    const int64_t* ei = einv + kept[i] * 3;
    for (int k = 0; k < 3; ++k) {
      ++counts[ei[k]];
      owner[ei[k]] = i;
    }
  }
  auto& ea = P.ea;
  ea.resize((size_t)E);
  auto& eb = P.eb;
  eb.resize((size_t)E);
  for (int64_t e = 0; e < E; ++e) {
    // edges absent from the filtered mesh (counts 0) are never read by the
    // core; their endpoints may be dropped vertices (remap -1)
    ea[e] = counts[e] ? remap[ea_in[e]] : -1;
    eb[e] = counts[e] ? remap[eb_in[e]] : -1;
  }

  cleanup_core(v2, f2, V2, F2, ea, eb, counts, owner,
               fill_holes, smooth_iters, lam, merge_decimals,
               out_verts, out_nv, out_faces, out_nf);
}

}  // extern "C"
