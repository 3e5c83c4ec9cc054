// Native host-side geometry kernels for actionmesh_tpu.
//
// The reference leans on C++ libraries for these (SURVEY.md §2.3):
// fast_simplification (quadric decimation) and fpsample (kd-bucket FPS).
// This library provides TPU-framework-native equivalents, exposed via a
// plain C ABI for ctypes binding (no pybind11 in this toolchain).
//
// Build: see native/build.sh (g++ -O3 -shared -fPIC).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <queue>
#include <random>
#include <unordered_map>
#include <unordered_set>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// Quadric error metric decimation (Garland-Heckbert)
// ---------------------------------------------------------------------------

struct Quadric {
  // symmetric 4x4 stored as 10 coefficients
  double a2, ab, ac, ad, b2, bc, bd, c2, cd, d2;
  Quadric() { std::memset(this, 0, sizeof(*this)); }
  void add_plane(double a, double b, double c, double d) {
    a2 += a * a; ab += a * b; ac += a * c; ad += a * d;
    b2 += b * b; bc += b * c; bd += b * d;
    c2 += c * c; cd += c * d; d2 += d * d;
  }
  void add(const Quadric& o) {
    a2 += o.a2; ab += o.ab; ac += o.ac; ad += o.ad;
    b2 += o.b2; bc += o.bc; bd += o.bd;
    c2 += o.c2; cd += o.cd; d2 += o.d2;
  }
  double eval(double x, double y, double z) const {
    return a2 * x * x + 2 * ab * x * y + 2 * ac * x * z + 2 * ad * x +
           b2 * y * y + 2 * bc * y * z + 2 * bd * y + c2 * z * z +
           2 * cd * z + d2;
  }
  // solve for the optimal point; returns false if singular
  bool optimal(double* out) const {
    double m[9] = {a2, ab, ac, ab, b2, bc, ac, bc, c2};
    double rhs[3] = {-ad, -bd, -cd};
    // Cramer with determinant check
    double det = m[0] * (m[4] * m[8] - m[5] * m[7]) -
                 m[1] * (m[3] * m[8] - m[5] * m[6]) +
                 m[2] * (m[3] * m[7] - m[4] * m[6]);
    if (std::fabs(det) < 1e-12) return false;
    double inv = 1.0 / det;
    out[0] = inv * (rhs[0] * (m[4] * m[8] - m[5] * m[7]) -
                    m[1] * (rhs[1] * m[8] - m[5] * rhs[2]) +
                    m[2] * (rhs[1] * m[7] - m[4] * rhs[2]));
    out[1] = inv * (m[0] * (rhs[1] * m[8] - m[5] * rhs[2]) -
                    rhs[0] * (m[3] * m[8] - m[5] * m[6]) +
                    m[2] * (m[3] * rhs[2] - rhs[1] * m[6]));
    out[2] = inv * (m[0] * (m[4] * rhs[2] - rhs[1] * m[7]) -
                    m[1] * (m[3] * rhs[2] - rhs[1] * m[6]) +
                    rhs[0] * (m[3] * m[7] - m[4] * m[6]));
    return true;
  }
};

struct Collapse {
  double cost;
  int64_t u, v;        // collapse u -> v
  uint64_t stamp_u, stamp_v;  // version stamps for lazy invalidation
  double pos[3];
  bool operator<(const Collapse& o) const { return cost > o.cost; }  // min-heap
};

int64_t find_root(std::vector<int64_t>& parent, int64_t i) {
  while (parent[i] != i) {
    parent[i] = parent[parent[i]];
    i = parent[i];
  }
  return i;
}

}  // namespace

extern "C" {

// Decimate to <= target_faces. Returns new face count; outputs written to
// out_verts (n_verts*3 capacity) / out_faces (n_faces*3 capacity);
// *out_n_verts receives the new vertex count.
int64_t quadric_decimate(const double* verts, int64_t n_verts,
                         const int64_t* faces, int64_t n_faces,
                         int64_t target_faces, double* out_verts,
                         int64_t* out_faces, int64_t* out_n_verts) {
  std::vector<double> pos(verts, verts + n_verts * 3);
  std::vector<Quadric> quadrics(n_verts);
  std::vector<uint64_t> version(n_verts, 0);
  std::vector<int64_t> parent(n_verts);
  for (int64_t i = 0; i < n_verts; ++i) parent[i] = i;

  // vertex quadrics from face planes
  for (int64_t f = 0; f < n_faces; ++f) {
    const int64_t* tri = faces + f * 3;
    const double* p0 = &pos[tri[0] * 3];
    const double* p1 = &pos[tri[1] * 3];
    const double* p2 = &pos[tri[2] * 3];
    double e1[3] = {p1[0] - p0[0], p1[1] - p0[1], p1[2] - p0[2]};
    double e2[3] = {p2[0] - p0[0], p2[1] - p0[1], p2[2] - p0[2]};
    double n[3] = {e1[1] * e2[2] - e1[2] * e2[1],
                   e1[2] * e2[0] - e1[0] * e2[2],
                   e1[0] * e2[1] - e1[1] * e2[0]};
    double len = std::sqrt(n[0] * n[0] + n[1] * n[1] + n[2] * n[2]);
    if (len < 1e-20) continue;
    double area = 0.5 * len;
    n[0] /= len; n[1] /= len; n[2] /= len;
    double d = -(n[0] * p0[0] + n[1] * p0[1] + n[2] * p0[2]);
    for (int k = 0; k < 3; ++k) {
      Quadric q;
      q.add_plane(n[0], n[1], n[2], d);
      // area-weight the quadric
      q.a2 *= area; q.ab *= area; q.ac *= area; q.ad *= area;
      q.b2 *= area; q.bc *= area; q.bd *= area;
      q.c2 *= area; q.cd *= area; q.d2 *= area;
      quadrics[tri[k]].add(q);
    }
  }

  // unique edges
  std::unordered_set<uint64_t> edge_set;
  edge_set.reserve(n_faces * 3);
  std::priority_queue<Collapse> heap;

  auto push_edge = [&](int64_t u, int64_t v) {
    if (u == v) return;
    if (u > v) std::swap(u, v);
    Quadric q = quadrics[u];
    q.add(quadrics[v]);
    Collapse c;
    c.u = u; c.v = v;
    c.stamp_u = version[u]; c.stamp_v = version[v];
    if (!q.optimal(c.pos)) {
      // fall back to best of endpoints / midpoint
      double mid[3] = {(pos[u * 3] + pos[v * 3]) / 2,
                       (pos[u * 3 + 1] + pos[v * 3 + 1]) / 2,
                       (pos[u * 3 + 2] + pos[v * 3 + 2]) / 2};
      double cu = q.eval(pos[u * 3], pos[u * 3 + 1], pos[u * 3 + 2]);
      double cv = q.eval(pos[v * 3], pos[v * 3 + 1], pos[v * 3 + 2]);
      double cm = q.eval(mid[0], mid[1], mid[2]);
      if (cu <= cv && cu <= cm) std::memcpy(c.pos, &pos[u * 3], 24);
      else if (cv <= cm) std::memcpy(c.pos, &pos[v * 3], 24);
      else std::memcpy(c.pos, mid, 24);
    }
    c.cost = q.eval(c.pos[0], c.pos[1], c.pos[2]);
    heap.push(c);
  };

  std::vector<std::vector<int64_t>> adj(n_verts);
  for (int64_t f = 0; f < n_faces; ++f) {
    const int64_t* tri = faces + f * 3;
    for (int k = 0; k < 3; ++k) {
      int64_t u = tri[k], v = tri[(k + 1) % 3];
      uint64_t key = (uint64_t)std::min(u, v) << 32 | (uint64_t)std::max(u, v);
      if (edge_set.insert(key).second) {
        push_edge(u, v);
        adj[u].push_back(v);
        adj[v].push_back(u);
      }
    }
  }

  int64_t live_faces = n_faces;
  int64_t collapses_needed = (n_faces - target_faces) / 2 + 1;
  int64_t done = 0;

  while (!heap.empty() && live_faces > target_faces) {
    Collapse c = heap.top();
    heap.pop();
    int64_t u = find_root(parent, c.u);
    int64_t v = find_root(parent, c.v);
    if (u == v) continue;
    if (version[c.u] != c.stamp_u || version[c.v] != c.stamp_v) continue;
    if (u != c.u || v != c.v) continue;

    // collapse u into v at optimal position
    parent[u] = v;
    pos[v * 3] = c.pos[0];
    pos[v * 3 + 1] = c.pos[1];
    pos[v * 3 + 2] = c.pos[2];
    quadrics[v].add(quadrics[u]);
    version[u]++;
    version[v]++;

    // merge adjacency and re-queue v's (now stale) edges at new versions
    for (int64_t w : adj[u]) {
      int64_t rw = find_root(parent, w);
      if (rw != v) adj[v].push_back(rw);
    }
    adj[u].clear();
    // compact adjacency of v to live roots and re-push its edges
    std::unordered_set<int64_t> nbrs;
    for (int64_t w : adj[v]) {
      int64_t rw = find_root(parent, w);
      if (rw != v) nbrs.insert(rw);
    }
    adj[v].assign(nbrs.begin(), nbrs.end());
    for (int64_t w : adj[v]) push_edge(v, w);
    // estimate faces removed (2 per manifold edge collapse)
    live_faces -= 2;
    if (++done > collapses_needed * 4 + 16) break;  // safety bound
  }

  // rebuild: remap vertices through union-find, drop degenerate faces
  std::vector<int64_t> root_of(n_verts);
  std::vector<int64_t> new_id(n_verts, -1);
  int64_t nv = 0;
  for (int64_t i = 0; i < n_verts; ++i) root_of[i] = find_root(parent, i);

  int64_t nf = 0;
  std::unordered_set<uint64_t> seen_faces;
  for (int64_t f = 0; f < n_faces; ++f) {
    int64_t a = root_of[faces[f * 3]];
    int64_t b = root_of[faces[f * 3 + 1]];
    int64_t c2 = root_of[faces[f * 3 + 2]];
    if (a == b || b == c2 || a == c2) continue;
    for (int64_t* vp : {&a, &b, &c2}) {
      if (new_id[*vp] < 0) {
        new_id[*vp] = nv;
        out_verts[nv * 3] = pos[*vp * 3];
        out_verts[nv * 3 + 1] = pos[*vp * 3 + 1];
        out_verts[nv * 3 + 2] = pos[*vp * 3 + 2];
        nv++;
      }
    }
    int64_t ia = new_id[a], ib = new_id[b], ic = new_id[c2];
    // dedupe faces by sorted ids
    int64_t s0 = std::min({ia, ib, ic});
    int64_t s2 = std::max({ia, ib, ic});
    int64_t s1 = ia + ib + ic - s0 - s2;
    uint64_t key = ((uint64_t)s0 * 73856093u) ^ ((uint64_t)s1 * 19349663u) ^
                   ((uint64_t)s2 * 83492791u);
    if (!seen_faces.insert(key).second) continue;
    out_faces[nf * 3] = ia;
    out_faces[nf * 3 + 1] = ib;
    out_faces[nf * 3 + 2] = ic;
    nf++;
  }
  *out_n_verts = nv;
  return nf;
}

// ---------------------------------------------------------------------------
// Bucket FPS (kd-subdivision farthest point sampling, CPU path)
// ---------------------------------------------------------------------------

// Standard O(K*N) FPS with SIMD-friendly inner loop; the bucket variant in
// fpsample prunes via kd-cells — for the N<=64k sizes used here the direct
// loop is already fast in native code.
void farthest_point_sampling_cpu(const float* points, int64_t n, int64_t k,
                                 int64_t start, int64_t* out_indices) {
  std::vector<float> min_d(n, 1e30f);
  int64_t cur = start;
  out_indices[0] = cur;
  for (int64_t i = 1; i < k; ++i) {
    const float* p = points + cur * 3;
    float best = -1.0f;
    int64_t best_j = 0;
    for (int64_t j = 0; j < n; ++j) {
      const float* q = points + j * 3;
      float dx = q[0] - p[0], dy = q[1] - p[1], dz = q[2] - p[2];
      float d = dx * dx + dy * dy + dz * dz;
      if (d < min_d[j]) min_d[j] = d;
      if (min_d[j] > best) { best = min_d[j]; best_j = j; }
    }
    cur = best_j;
    out_indices[i] = cur;
  }
}

}  // extern "C"
