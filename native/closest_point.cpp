// Native closest-point-on-mesh queries for UDF preprocessing.
//
// Replaces open3d's C++ RaycastingScene.compute_closest_points
// (/root/reference/AutoEncoder/utils.py:223-240, SURVEY.md §2.11 item 3):
// a median-split AABB BVH over triangles + Ericson closest-point-on-triangle,
// exposed through a C ABI consumed via ctypes (surfd_tpu/data/native.py).
//
// Build: see native/build.sh (g++ -O3 -shared -fPIC).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Vec3 {
  float x, y, z;
};

static inline Vec3 sub(const Vec3& a, const Vec3& b) { return {a.x - b.x, a.y - b.y, a.z - b.z}; }
static inline Vec3 add(const Vec3& a, const Vec3& b) { return {a.x + b.x, a.y + b.y, a.z + b.z}; }
static inline Vec3 mul(const Vec3& a, float s) { return {a.x * s, a.y * s, a.z * s}; }
static inline float dot(const Vec3& a, const Vec3& b) { return a.x * b.x + a.y * b.y + a.z * b.z; }
static inline float dist2(const Vec3& a, const Vec3& b) { Vec3 d = sub(a, b); return dot(d, d); }

// Closest point on triangle abc to point p (Ericson, Real-Time Collision
// Detection §5.1.5 — standard public-domain construction).
static Vec3 closest_on_triangle(const Vec3& p, const Vec3& a, const Vec3& b, const Vec3& c) {
  Vec3 ab = sub(b, a), ac = sub(c, a), ap = sub(p, a);
  float d1 = dot(ab, ap), d2 = dot(ac, ap);
  if (d1 <= 0.f && d2 <= 0.f) return a;

  Vec3 bp = sub(p, b);
  float d3 = dot(ab, bp), d4 = dot(ac, bp);
  if (d3 >= 0.f && d4 <= d3) return b;

  float vc = d1 * d4 - d3 * d2;
  if (vc <= 0.f && d1 >= 0.f && d3 <= 0.f) {
    float v = d1 / (d1 - d3);
    return add(a, mul(ab, v));
  }

  Vec3 cp = sub(p, c);
  float d5 = dot(ab, cp), d6 = dot(ac, cp);
  if (d6 >= 0.f && d5 <= d6) return c;

  float vb = d5 * d2 - d1 * d6;
  if (vb <= 0.f && d2 >= 0.f && d6 <= 0.f) {
    float w = d2 / (d2 - d6);
    return add(a, mul(ac, w));
  }

  float va = d3 * d6 - d5 * d4;
  if (va <= 0.f && (d4 - d3) >= 0.f && (d5 - d6) >= 0.f) {
    float w = (d4 - d3) / ((d4 - d3) + (d5 - d6));
    return add(b, mul(sub(c, b), w));
  }

  float denom = 1.f / (va + vb + vc);
  float v = vb * denom, w = vc * denom;
  return add(a, add(mul(ab, v), mul(ac, w)));
}

struct AABB {
  Vec3 lo{1e30f, 1e30f, 1e30f};
  Vec3 hi{-1e30f, -1e30f, -1e30f};
  void grow(const Vec3& p) {
    lo.x = std::min(lo.x, p.x); lo.y = std::min(lo.y, p.y); lo.z = std::min(lo.z, p.z);
    hi.x = std::max(hi.x, p.x); hi.y = std::max(hi.y, p.y); hi.z = std::max(hi.z, p.z);
  }
  void grow(const AABB& b) { grow(b.lo); grow(b.hi); }
  float dist2_to(const Vec3& p) const {
    float dx = std::max({lo.x - p.x, 0.f, p.x - hi.x});
    float dy = std::max({lo.y - p.y, 0.f, p.y - hi.y});
    float dz = std::max({lo.z - p.z, 0.f, p.z - hi.z});
    return dx * dx + dy * dy + dz * dz;
  }
};

struct Node {
  AABB box;
  int32_t left = -1;    // internal: child index; leaf: first tri index
  int32_t count = 0;    // 0 for internal nodes, else #tris in leaf
};

struct BVH {
  std::vector<Node> nodes;
  std::vector<int32_t> tri_order;
  const float* verts;
  const int32_t* tris;

  Vec3 tri_vert(int32_t t, int k) const {
    int32_t vi = tris[3 * t + k];
    return {verts[3 * vi], verts[3 * vi + 1], verts[3 * vi + 2]};
  }

  int32_t build(std::vector<int32_t>& idx, std::vector<Vec3>& centroids, int lo, int hi) {
    Node node;
    for (int i = lo; i < hi; ++i) {
      node.box.grow(tri_vert(idx[i], 0));
      node.box.grow(tri_vert(idx[i], 1));
      node.box.grow(tri_vert(idx[i], 2));
    }
    int32_t my = (int32_t)nodes.size();
    nodes.push_back(node);
    int n = hi - lo;
    if (n <= 4) {
      nodes[my].left = lo;
      nodes[my].count = n;
      return my;
    }
    // split along the widest centroid axis at the median
    AABB cb;
    for (int i = lo; i < hi; ++i) cb.grow(centroids[idx[i]]);
    float ex = cb.hi.x - cb.lo.x, ey = cb.hi.y - cb.lo.y, ez = cb.hi.z - cb.lo.z;
    int axis = (ex >= ey && ex >= ez) ? 0 : (ey >= ez ? 1 : 2);
    int mid = (lo + hi) / 2;
    std::nth_element(
        idx.begin() + lo, idx.begin() + mid, idx.begin() + hi,
        [&](int32_t a, int32_t b) {
          const Vec3 &ca = centroids[a], &cb2 = centroids[b];
          return (axis == 0 ? ca.x < cb2.x : axis == 1 ? ca.y < cb2.y : ca.z < cb2.z);
        });
    int32_t l = build(idx, centroids, lo, mid);
    int32_t r = build(idx, centroids, mid, hi);
    nodes[my].left = l;
    nodes[my].count = 0;
    // store right child implicitly: r == l subtree end? keep explicit:
    nodes[my].box = node.box;
    right_child.resize(nodes.size(), -1);
    right_child[my] = r;
    return my;
  }

  std::vector<int32_t> right_child;

  void query(const Vec3& p, float* best_d2, Vec3* best_pt, int32_t* best_tri) const {
    // iterative traversal with a small stack, nearest-child-first
    int32_t stack[128];
    int sp = 0;
    stack[sp++] = 0;
    while (sp > 0) {
      int32_t ni = stack[--sp];
      const Node& node = nodes[ni];
      if (node.box.dist2_to(p) >= *best_d2) continue;
      if (node.count > 0) {
        for (int i = 0; i < node.count; ++i) {
          int32_t t = tri_order[node.left + i];
          Vec3 cp = closest_on_triangle(p, tri_vert(t, 0), tri_vert(t, 1), tri_vert(t, 2));
          float d2 = dist2(p, cp);
          if (d2 < *best_d2) {
            *best_d2 = d2;
            *best_pt = cp;
            *best_tri = t;
          }
        }
      } else {
        int32_t l = node.left, r = right_child[ni];
        float dl = nodes[l].box.dist2_to(p);
        float dr = nodes[r].box.dist2_to(p);
        // push farther child first so nearer is processed next
        if (dl <= dr) {
          if (dr < *best_d2 && sp < 127) stack[sp++] = r;
          if (dl < *best_d2 && sp < 127) stack[sp++] = l;
        } else {
          if (dl < *best_d2 && sp < 127) stack[sp++] = l;
          if (dr < *best_d2 && sp < 127) stack[sp++] = r;
        }
      }
    }
  }
};

}  // namespace

extern "C" {

// queries: (Q,3) f32 → out_dist (Q,), out_closest (Q,3), out_tri (Q,)
// Returns 0 on success.
int surfd_closest_points(
    const float* verts, int64_t num_verts,
    const int32_t* tris, int64_t num_tris,
    const float* queries, int64_t num_queries,
    float* out_dist, float* out_closest, int32_t* out_tri) {
  if (num_tris <= 0 || num_verts <= 0) return 1;
  BVH bvh;
  bvh.verts = verts;
  bvh.tris = tris;
  std::vector<Vec3> centroids((size_t)num_tris);
  std::vector<int32_t> idx((size_t)num_tris);
  for (int64_t t = 0; t < num_tris; ++t) {
    idx[t] = (int32_t)t;
    Vec3 a = bvh.tri_vert((int32_t)t, 0), b = bvh.tri_vert((int32_t)t, 1), c = bvh.tri_vert((int32_t)t, 2);
    centroids[t] = mul(add(add(a, b), c), 1.f / 3.f);
  }
  bvh.nodes.reserve((size_t)num_tris * 2);
  bvh.right_child.reserve((size_t)num_tris * 2);
  bvh.build(idx, centroids, 0, (int)num_tris);
  bvh.tri_order = idx;

  for (int64_t q = 0; q < num_queries; ++q) {
    Vec3 p{queries[3 * q], queries[3 * q + 1], queries[3 * q + 2]};
    float best_d2 = 1e30f;
    Vec3 best_pt{0, 0, 0};
    int32_t best_tri = -1;
    bvh.query(p, &best_d2, &best_pt, &best_tri);
    out_dist[q] = std::sqrt(best_d2);
    out_closest[3 * q] = best_pt.x;
    out_closest[3 * q + 1] = best_pt.y;
    out_closest[3 * q + 2] = best_pt.z;
    out_tri[q] = best_tri;
  }
  return 0;
}

}  // extern "C"
