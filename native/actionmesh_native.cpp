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
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <limits>
#include <ctime>

#ifdef _OPENMP
#include <omp.h>
#endif
#include <queue>
#include <random>
#include <unordered_map>
#include <unordered_set>
#include <vector>

#include "mc_table.h"

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
  // compact: 40 bytes/entry — multi-million-entry heaps are page-fault
  // bound on this deployment, so size matters more than field precision
  float cost;
  int32_t u, v;        // collapse u -> v
  uint32_t stamp_u, stamp_v;  // version stamps for lazy invalidation
  float pos[3];
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

// ---------------------------------------------------------------------------
// Marching tetrahedra over pre-filtered cells (host triangulation hot path)
// ---------------------------------------------------------------------------
//
// Same semantics as the vectorized numpy implementation in
// ops/isosurface.py (the tested reference for this code): each cube cell
// splits into 6 tetrahedra around the 0-7 diagonal; crossing edges
// interpolate at t=(level-va)/(vb-va) clipped to [0,1]; vertices weld
// exactly by the sorted global-corner-id pair of their grid edge;
// degenerate faces drop.

constexpr int kTets[6][4] = {
    {0, 1, 3, 7}, {0, 3, 2, 7}, {0, 2, 6, 7},
    {0, 6, 4, 7}, {0, 4, 5, 7}, {0, 5, 1, 7},
};

struct TetTriangle {
  int a[3];  // local tet vertex index, edge start
  int b[3];  // edge end
};

struct TetCaseTable {
  std::vector<TetTriangle> tris[16];
  TetCaseTable() {
    auto others = [](int i, int* o) {
      int n = 0;
      for (int j = 0; j < 4; ++j)
        if (j != i) o[n++] = j;
    };
    for (int i = 0; i < 4; ++i) {
      int o[3];
      others(i, o);
      // one inside
      tris[1 << i].push_back({{i, i, i}, {o[0], o[1], o[2]}});
      // three inside (reversed winding)
      tris[15 ^ (1 << i)].push_back({{i, i, i}, {o[0], o[2], o[1]}});
    }
    for (int a = 0; a < 4; ++a)
      for (int b = a + 1; b < 4; ++b) {
        int cd[2], n = 0;
        for (int j = 0; j < 4; ++j)
          if (j != a && j != b) cd[n++] = j;
        int c = cd[0], d = cd[1];
        int cs = (1 << a) | (1 << b);
        tris[cs].push_back({{a, a, b}, {c, d, d}});
        tris[cs].push_back({{a, b, b}, {c, d, c}});
      }
  }
};

const TetCaseTable& tet_table() {
  static TetCaseTable t;
  return t;
}

extern "C" {

// Triangulate pre-filtered (surface-crossing) cube cells by marching
// tetrahedra with exact welded vertices. Inputs: corner_pts (C, 8, 3)
// float64, corner_vals (C, 8) float32, corner_ids (C, 8) int64 (globally
// unique per grid corner, < 2^31). Outputs: out_verts (capacity
// verts_cap*3 doubles), out_faces (capacity faces_cap*3 int64).
// Returns the face count, or -1 if a capacity would be exceeded.
int64_t marching_tetrahedra_cells(
    const double* corner_pts, const float* corner_vals,
    const int64_t* corner_ids, int64_t n_cells, double level,
    double* out_verts, int64_t verts_cap, int64_t* out_faces,
    int64_t faces_cap, int64_t* out_n_verts) {
  const TetCaseTable& table = tet_table();
  std::unordered_map<uint64_t, int64_t> edge_vertex;
  edge_vertex.reserve(static_cast<size_t>(n_cells) * 4 + 16);
  int64_t nv = 0, nf = 0;

  for (int64_t cell = 0; cell < n_cells; ++cell) {
    const double* cp = corner_pts + cell * 24;
    const float* cv = corner_vals + cell * 8;
    const int64_t* cid = corner_ids + cell * 8;
    for (const auto& tet : kTets) {
      int cs = (cv[tet[0]] < level) | ((cv[tet[1]] < level) << 1) |
               ((cv[tet[2]] < level) << 2) | ((cv[tet[3]] < level) << 3);
      for (const TetTriangle& tri : table.tris[cs]) {
        int64_t ids[3];
        bool degenerate = false;
        for (int e = 0; e < 3; ++e) {
          int la = tet[tri.a[e]], lb = tet[tri.b[e]];
          int64_t ga = cid[la], gb = cid[lb];
          uint64_t key = ga < gb
                             ? (static_cast<uint64_t>(ga) << 32) |
                                   static_cast<uint64_t>(gb)
                             : (static_cast<uint64_t>(gb) << 32) |
                                   static_cast<uint64_t>(ga);
          auto it = edge_vertex.find(key);
          if (it != edge_vertex.end()) {
            ids[e] = it->second;
          } else {
            if (nv >= verts_cap) return -1;
            double va = cv[la], vb = cv[lb];
            double denom = vb - va;
            if (std::fabs(denom) < 1e-12) denom = 1e-12;
            double t = (level - va) / denom;
            t = t < 0.0 ? 0.0 : (t > 1.0 ? 1.0 : t);
            const double* pa = cp + la * 3;
            const double* pb = cp + lb * 3;
            out_verts[nv * 3] = pa[0] + t * (pb[0] - pa[0]);
            out_verts[nv * 3 + 1] = pa[1] + t * (pb[1] - pa[1]);
            out_verts[nv * 3 + 2] = pa[2] + t * (pb[2] - pa[2]);
            ids[e] = nv;
            edge_vertex.emplace(key, nv);
            ++nv;
          }
        }
        if (ids[0] == ids[1] || ids[1] == ids[2] || ids[0] == ids[2])
          degenerate = true;
        if (!degenerate) {
          if (nf >= faces_cap) return -1;
          out_faces[nf * 3] = ids[0];
          out_faces[nf * 3 + 1] = ids[1];
          out_faces[nf * 3 + 2] = ids[2];
          ++nf;
        }
      }
    }
  }
  *out_n_verts = nv;
  return nf;
}

// Marching tetrahedra directly over the hierarchical fine lattices: for
// each surface-crossing coarse cell, its (s+1)^3 fine corner values plus
// the coarse integer coordinates; fine corner positions and global weld
// ids are derived internally (lo + global_fine_ijk * fine_size). Outputs
// are allocated internally at exact size (a cheap counting pass first) —
// on this deployment's sandboxed kernel, first-touch page faults cost
// ~100x steady-state memory access, so oversized caller-allocated
// capacity buffers dominated wall time. Welding uses a flat
// open-addressed hash (power-of-two, linear probing) for the same reason.
// Caller frees the outputs with am_free().

namespace {
struct FlatEdgeMap {
  std::vector<uint64_t> keys;   // 0 = empty (key 0 cannot occur: ga < gb)
  std::vector<int32_t> vals;
  uint64_t mask;
  size_t count = 0;
  explicit FlatEdgeMap(size_t expected) {
    size_t cap = 64;
    while (cap < expected * 2) cap <<= 1;
    keys.assign(cap, 0);
    vals.resize(cap);
    mask = cap - 1;
  }
  // returns existing value or -1 after positioning *slot for insert
  int32_t find(uint64_t key, size_t* slot) const {
    size_t h = (key * 0x9E3779B97F4A7C15ull) & mask;
    while (keys[h] != 0) {
      if (keys[h] == key) { *slot = h; return vals[h]; }
      h = (h + 1) & mask;
    }
    *slot = h;
    return -1;
  }
  void insert_at(size_t slot, uint64_t key, int32_t val) {
    keys[slot] = key;
    vals[slot] = val;
    // keep load factor < 0.5 — the estimate feeding `expected` is a
    // heuristic (welded verts ~ tris/2); adversarial tessellations could
    // otherwise overfill the fixed table and spin the probe loop
    if (++count * 2 > keys.size()) grow();
  }
  void grow() {
    std::vector<uint64_t> old_keys = std::move(keys);
    std::vector<int32_t> old_vals = std::move(vals);
    keys.assign(old_keys.size() * 2, 0);
    vals.assign(old_keys.size() * 2, 0);
    mask = keys.size() - 1;
    for (size_t i = 0; i < old_keys.size(); ++i) {
      if (old_keys[i] == 0) continue;
      size_t h = (old_keys[i] * 0x9E3779B97F4A7C15ull) & mask;
      while (keys[h] != 0) h = (h + 1) & mask;
      keys[h] = old_keys[i];
      vals[h] = old_vals[i];
    }
  }
};
}  // namespace

void am_free(void* p) { std::free(p); }

// Returns face count; *out_verts -> malloc'd float32 (nv, 3),
// *out_faces -> malloc'd int32 (nf, 3), *out_n_verts -> nv.
int64_t marching_tetrahedra_grid(
    const float* fine_vals,   // (C, s+1, s+1, s+1)
    const int64_t* cell_ijk,  // (C, 3) coarse cell coords
    int64_t n_cells, int64_t s, const double* lo, const double* cell_size,
    double level, int64_t fine_R, float** out_verts, int32_t** out_faces,
    int64_t* out_n_verts) {
  const TetCaseTable& table = tet_table();
  const int64_t sp1 = s + 1;
  const double fx = cell_size[0] / s, fy = cell_size[1] / s,
               fz = cell_size[2] / s;

  // Pass 1: exact (pre-weld) triangle count.
  int64_t tri_count = 0;
  for (int64_t cell = 0; cell < n_cells; ++cell) {
    const float* vals = fine_vals + cell * sp1 * sp1 * sp1;
    for (int64_t ci = 0; ci < s; ++ci)
      for (int64_t cj = 0; cj < s; ++cj)
        for (int64_t ck = 0; ck < s; ++ck) {
          bool in8[8];
          int n_in = 0;
          for (int c = 0; c < 8; ++c) {
            int dx = c & 1, dy = (c >> 1) & 1, dz = (c >> 2) & 1;
            in8[c] =
                vals[((ci + dx) * sp1 + cj + dy) * sp1 + ck + dz] < level;
            n_in += in8[c];
          }
          if (n_in == 0 || n_in == 8) continue;
          for (const auto& tet : kTets) {
            int cs = in8[tet[0]] | (in8[tet[1]] << 1) | (in8[tet[2]] << 2) |
                     (in8[tet[3]] << 3);
            tri_count += static_cast<int64_t>(table.tris[cs].size());
          }
        }
  }
  if (tri_count == 0) {
    *out_verts = nullptr;
    *out_faces = nullptr;
    *out_n_verts = 0;
    return 0;
  }

  // Pass 2: triangulate. Unique welded vertices are bounded by ~tri_count
  // in practice (~F/2); the vertex array grows geometrically from a tight
  // initial guess to avoid faulting a worst-case 3*F buffer.
  FlatEdgeMap weld(static_cast<size_t>(tri_count));
  int64_t v_cap = tri_count / 2 + 1024;
  float* verts = static_cast<float*>(std::malloc(v_cap * 3 * sizeof(float)));
  int32_t* faces =
      static_cast<int32_t*>(std::malloc(tri_count * 3 * sizeof(int32_t)));
  int64_t nv = 0, nf = 0;

  for (int64_t cell = 0; cell < n_cells; ++cell) {
    const float* vals = fine_vals + cell * sp1 * sp1 * sp1;
    const int64_t gi0 = cell_ijk[cell * 3] * s;
    const int64_t gj0 = cell_ijk[cell * 3 + 1] * s;
    const int64_t gk0 = cell_ijk[cell * 3 + 2] * s;
    for (int64_t ci = 0; ci < s; ++ci)
      for (int64_t cj = 0; cj < s; ++cj)
        for (int64_t ck = 0; ck < s; ++ck) {
          float cv[8];
          int64_t cid[8];
          double cpx[8], cpy[8], cpz[8];
          int n_in = 0;
          for (int c = 0; c < 8; ++c) {
            int dx = c & 1, dy = (c >> 1) & 1, dz = (c >> 2) & 1;
            int64_t li = ci + dx, lj = cj + dy, lk = ck + dz;
            cv[c] = vals[(li * sp1 + lj) * sp1 + lk];
            n_in += cv[c] < level;
            int64_t gi = gi0 + li, gj = gj0 + lj, gk = gk0 + lk;
            cid[c] = (gi * fine_R + gj) * fine_R + gk;
            cpx[c] = lo[0] + gi * fx;
            cpy[c] = lo[1] + gj * fy;
            cpz[c] = lo[2] + gk * fz;
          }
          if (n_in == 0 || n_in == 8) continue;
          for (const auto& tet : kTets) {
            int cs = (cv[tet[0]] < level) | ((cv[tet[1]] < level) << 1) |
                     ((cv[tet[2]] < level) << 2) |
                     ((cv[tet[3]] < level) << 3);
            for (const TetTriangle& tri : table.tris[cs]) {
              int32_t ids[3];
              for (int e = 0; e < 3; ++e) {
                int la = tet[tri.a[e]], lb = tet[tri.b[e]];
                int64_t ga = cid[la], gb = cid[lb];
                uint64_t key = ga < gb
                                   ? (static_cast<uint64_t>(ga) << 32) |
                                         static_cast<uint64_t>(gb)
                                   : (static_cast<uint64_t>(gb) << 32) |
                                         static_cast<uint64_t>(ga);
                size_t slot;
                int32_t found = weld.find(key, &slot);
                if (found >= 0) {
                  ids[e] = found;
                } else {
                  if (nv >= v_cap) {
                    v_cap = v_cap + v_cap / 2;
                    verts = static_cast<float*>(
                        std::realloc(verts, v_cap * 3 * sizeof(float)));
                  }
                  double va = cv[la], vb = cv[lb];
                  double denom = vb - va;
                  if (std::fabs(denom) < 1e-12) denom = 1e-12;
                  double t = (level - va) / denom;
                  t = t < 0.0 ? 0.0 : (t > 1.0 ? 1.0 : t);
                  verts[nv * 3] =
                      static_cast<float>(cpx[la] + t * (cpx[lb] - cpx[la]));
                  verts[nv * 3 + 1] =
                      static_cast<float>(cpy[la] + t * (cpy[lb] - cpy[la]));
                  verts[nv * 3 + 2] =
                      static_cast<float>(cpz[la] + t * (cpz[lb] - cpz[la]));
                  ids[e] = static_cast<int32_t>(nv);
                  weld.insert_at(slot, key, ids[e]);
                  ++nv;
                }
              }
              if (ids[0] == ids[1] || ids[1] == ids[2] || ids[0] == ids[2])
                continue;
              faces[nf * 3] = ids[0];
              faces[nf * 3 + 1] = ids[1];
              faces[nf * 3 + 2] = ids[2];
              ++nf;
            }
          }
        }
  }
  *out_verts = verts;
  *out_faces = faces;
  *out_n_verts = nv;
  return nf;
}

// Uniform-grid vertex clustering: quantize vertices to a res^3 lattice
// over their bounding box, merge each cell to its centroid, drop
// degenerate/duplicate faces. One sort-based pass — used to pre-simplify
// multi-million-face marching-tets output before the (serial, greedy) QEM
// stage. Returns new face count; *out_n_verts receives the vertex count.
int64_t grid_cluster_simplify(const double* verts, int64_t n_verts,
                              const int64_t* faces, int64_t n_faces,
                              int64_t res, double* out_verts,
                              int64_t* out_faces, int64_t* out_n_verts) {
  double lo[3] = {1e30, 1e30, 1e30}, hi[3] = {-1e30, -1e30, -1e30};
  for (int64_t i = 0; i < n_verts; ++i)
    for (int d = 0; d < 3; ++d) {
      double x = verts[i * 3 + d];
      lo[d] = std::min(lo[d], x);
      hi[d] = std::max(hi[d], x);
    }
  double inv[3];
  for (int d = 0; d < 3; ++d) {
    double ext = hi[d] - lo[d];
    inv[d] = ext > 1e-30 ? (res - 1e-9) / ext : 0.0;
  }

  // cell id per vertex
  std::vector<int64_t> cell(n_verts);
  for (int64_t i = 0; i < n_verts; ++i) {
    int64_t cx = static_cast<int64_t>((verts[i * 3] - lo[0]) * inv[0]);
    int64_t cy = static_cast<int64_t>((verts[i * 3 + 1] - lo[1]) * inv[1]);
    int64_t cz = static_cast<int64_t>((verts[i * 3 + 2] - lo[2]) * inv[2]);
    cell[i] = (cx * res + cy) * res + cz;
  }
  // unique cells by sort -> dense new ids
  std::vector<int64_t> order(n_verts);
  for (int64_t i = 0; i < n_verts; ++i) order[i] = i;
  std::sort(order.begin(), order.end(),
            [&](int64_t a, int64_t b) { return cell[a] < cell[b]; });
  std::vector<int64_t> new_id(n_verts);
  int64_t nv = -1;
  int64_t prev = -1;
  std::vector<double> sum;
  std::vector<int64_t> cnt;
  sum.reserve(n_verts / 4 * 3);
  cnt.reserve(n_verts / 4);
  for (int64_t k = 0; k < n_verts; ++k) {
    int64_t i = order[k];
    if (cell[i] != prev) {
      prev = cell[i];
      ++nv;
      sum.push_back(0);
      sum.push_back(0);
      sum.push_back(0);
      cnt.push_back(0);
    }
    new_id[i] = nv;
    sum[nv * 3] += verts[i * 3];
    sum[nv * 3 + 1] += verts[i * 3 + 1];
    sum[nv * 3 + 2] += verts[i * 3 + 2];
    cnt[nv] += 1;
  }
  ++nv;
  for (int64_t c = 0; c < nv; ++c) {
    out_verts[c * 3] = sum[c * 3] / cnt[c];
    out_verts[c * 3 + 1] = sum[c * 3 + 1] / cnt[c];
    out_verts[c * 3 + 2] = sum[c * 3 + 2] / cnt[c];
  }

  // remap faces, drop degenerate, dedupe by sorted key
  std::vector<uint64_t> fkeys;
  fkeys.reserve(n_faces);
  int64_t nf = 0;
  for (int64_t f = 0; f < n_faces; ++f) {
    int64_t a = new_id[faces[f * 3]];
    int64_t b = new_id[faces[f * 3 + 1]];
    int64_t c = new_id[faces[f * 3 + 2]];
    if (a == b || b == c || a == c) continue;
    int64_t s0 = std::min({a, b, c});
    int64_t s2 = std::max({a, b, c});
    int64_t s1 = a + b + c - s0 - s2;
    fkeys.push_back((static_cast<uint64_t>(s0) * 2654435761u) ^
                    (static_cast<uint64_t>(s1) * 40503u) ^
                    (static_cast<uint64_t>(s2) * 2246822519u));
    out_faces[nf * 3] = a;
    out_faces[nf * 3 + 1] = b;
    out_faces[nf * 3 + 2] = c;
    ++nf;
  }
  // dedupe: mark duplicates via sort of (key, index)
  std::vector<int64_t> forder(nf);
  for (int64_t i = 0; i < nf; ++i) forder[i] = i;
  std::sort(forder.begin(), forder.end(),
            [&](int64_t x, int64_t y) { return fkeys[x] < fkeys[y]; });
  std::vector<char> drop(nf, 0);
  for (int64_t k = 1; k < nf; ++k)
    if (fkeys[forder[k]] == fkeys[forder[k - 1]]) drop[forder[k]] = 1;
  int64_t w = 0;
  for (int64_t f = 0; f < nf; ++f) {
    if (drop[f]) continue;
    if (w != f) {
      out_faces[w * 3] = out_faces[f * 3];
      out_faces[w * 3 + 1] = out_faces[f * 3 + 1];
      out_faces[w * 3 + 2] = out_faces[f * 3 + 2];
    }
    ++w;
  }
  *out_n_verts = nv;
  return w;
}

// Decimate to <= target_faces. Returns new face count; outputs written to
// out_verts (n_verts*3 capacity) / out_faces (n_faces*3 capacity);
// *out_n_verts receives the new vertex count.
int64_t quadric_decimate(const double* verts, int64_t n_verts,
                         const int64_t* faces, int64_t n_faces,
                         int64_t target_faces, double* out_verts,
                         int64_t* out_faces, int64_t* out_n_verts) {
  std::vector<double> pos(verts, verts + n_verts * 3);
  std::vector<Quadric> quadrics(n_verts);
  std::vector<uint32_t> version(n_verts, 0);
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

  auto make_collapse = [&](int64_t u, int64_t v, Collapse* c) -> bool {
    if (u == v) return false;
    if (u > v) std::swap(u, v);
    Quadric q = quadrics[u];
    q.add(quadrics[v]);
    c->u = static_cast<int32_t>(u); c->v = static_cast<int32_t>(v);
    c->stamp_u = version[u]; c->stamp_v = version[v];
    double opt[3];
    if (!q.optimal(opt)) {
      // fall back to best of endpoints / midpoint
      double mid[3] = {(pos[u * 3] + pos[v * 3]) / 2,
                       (pos[u * 3 + 1] + pos[v * 3 + 1]) / 2,
                       (pos[u * 3 + 2] + pos[v * 3 + 2]) / 2};
      double cu = q.eval(pos[u * 3], pos[u * 3 + 1], pos[u * 3 + 2]);
      double cv = q.eval(pos[v * 3], pos[v * 3 + 1], pos[v * 3 + 2]);
      double cm = q.eval(mid[0], mid[1], mid[2]);
      if (cu <= cv && cu <= cm) std::memcpy(opt, &pos[u * 3], 24);
      else if (cv <= cm) std::memcpy(opt, &pos[v * 3], 24);
      else std::memcpy(opt, mid, 24);
    }
    c->pos[0] = static_cast<float>(opt[0]);
    c->pos[1] = static_cast<float>(opt[1]);
    c->pos[2] = static_cast<float>(opt[2]);
    c->cost = static_cast<float>(q.eval(opt[0], opt[1], opt[2]));
    return true;
  };

  // Unique edges by sort (a node-based hash set of millions of entries is
  // page-fault bound here), then one O(E) heapify.
  std::vector<uint64_t> edge_keys;
  edge_keys.reserve(n_faces * 3);
  for (int64_t f = 0; f < n_faces; ++f) {
    const int64_t* tri = faces + f * 3;
    for (int k = 0; k < 3; ++k) {
      int64_t u = tri[k], v = tri[(k + 1) % 3];
      if (u == v) continue;
      edge_keys.push_back((uint64_t)std::min(u, v) << 32 |
                          (uint64_t)std::max(u, v));
    }
  }
  std::sort(edge_keys.begin(), edge_keys.end());
  edge_keys.erase(std::unique(edge_keys.begin(), edge_keys.end()),
                  edge_keys.end());

  // Initial edge costs in parallel (each entry independent).
  const int64_t n_edges = static_cast<int64_t>(edge_keys.size());
  std::vector<Collapse> initial(n_edges);
#pragma omp parallel for schedule(static)
  for (int64_t e = 0; e < n_edges; ++e) {
    uint64_t key = edge_keys[e];
    make_collapse(static_cast<int64_t>(key >> 32),
                  static_cast<int64_t>(key & 0xFFFFFFFFull), &initial[e]);
  }
  edge_keys.clear();
  edge_keys.shrink_to_fit();
  std::priority_queue<Collapse> heap(std::less<Collapse>(),
                                     std::move(initial));

  int64_t live_faces = n_faces;
  int64_t collapses_needed = (n_faces - target_faces) / 2 + 1;
  int64_t done = 0;
  int64_t stale_budget = n_faces * 24 + (1 << 20);  // termination backstop

  // Lazy-reinsert scheme: no adjacency lists and no neighbor re-pushes per
  // collapse. A popped entry whose version stamps are stale is recomputed
  // at the current roots/quadrics and pushed back once; connectivity rides
  // in the heap itself. This cuts heap traffic ~(degree)x on large meshes.
  while (!heap.empty() && live_faces > target_faces) {
    Collapse c = heap.top();
    heap.pop();
    int64_t u = find_root(parent, c.u);
    int64_t v = find_root(parent, c.v);
    if (u == v) continue;
    if (version[c.u] != c.stamp_u || version[c.v] != c.stamp_v ||
        u != c.u || v != c.v) {
      if (--stale_budget > 0) {
        Collapse fresh;
        if (make_collapse(u, v, &fresh)) heap.push(fresh);
      }
      continue;
    }

    // collapse u into v at optimal position
    parent[u] = v;
    pos[v * 3] = c.pos[0];
    pos[v * 3 + 1] = c.pos[1];
    pos[v * 3 + 2] = c.pos[2];
    quadrics[v].add(quadrics[u]);
    version[u]++;
    version[v]++;
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

// ---------------------------------------------------------------------------
// Marching cubes (table generated by scripts/gen_mc_table.py — derived by
// face-consistent marching-squares tracing, watertight incl. ambiguous
// cases; see actionmesh_tpu/ops/mc_table.py). Same contracts as the
// marching_tetrahedra_* functions; ~2-3x fewer triangles for the same grid
// (vertices only on cube edges, matching the reference's MC tessellation).
// ---------------------------------------------------------------------------

// Pre-filtered crossing cells variant; same ABI as marching_tetrahedra_cells.
int64_t marching_cubes_cells(
    const double* corner_pts, const float* corner_vals,
    const int64_t* corner_ids, int64_t n_cells, double level,
    double* out_verts, int64_t verts_cap, int64_t* out_faces,
    int64_t faces_cap, int64_t* out_n_verts) {
  std::unordered_map<uint64_t, int64_t> edge_vertex;
  edge_vertex.reserve(static_cast<size_t>(n_cells) * 2 + 16);
  int64_t nv = 0, nf = 0;

  for (int64_t cell = 0; cell < n_cells; ++cell) {
    const double* cp = corner_pts + cell * 24;
    const float* cv = corner_vals + cell * 8;
    const int64_t* cid = corner_ids + cell * 8;
    int cfg = 0;
    for (int c = 0; c < 8; ++c) cfg |= (cv[c] < level) << c;
    const int8_t* tri = mc::kTriTable[cfg];
    for (int t = 0; tri[t] >= 0; t += 3) {
      int64_t ids[3];
      for (int e = 0; e < 3; ++e) {
        int la = mc::kCubeEdges[tri[t + e]][0];
        int lb = mc::kCubeEdges[tri[t + e]][1];
        int64_t ga = cid[la], gb = cid[lb];
        uint64_t key = ga < gb
                           ? (static_cast<uint64_t>(ga) << 32) |
                                 static_cast<uint64_t>(gb)
                           : (static_cast<uint64_t>(gb) << 32) |
                                 static_cast<uint64_t>(ga);
        auto it = edge_vertex.find(key);
        if (it != edge_vertex.end()) {
          ids[e] = it->second;
        } else {
          if (nv >= verts_cap) return -1;
          double va = cv[la], vb = cv[lb];
          double denom = vb - va;
          if (std::fabs(denom) < 1e-12) denom = 1e-12;
          double s = (level - va) / denom;
          s = s < 0.0 ? 0.0 : (s > 1.0 ? 1.0 : s);
          const double* pa = cp + la * 3;
          const double* pb = cp + lb * 3;
          out_verts[nv * 3] = pa[0] + s * (pb[0] - pa[0]);
          out_verts[nv * 3 + 1] = pa[1] + s * (pb[1] - pa[1]);
          out_verts[nv * 3 + 2] = pa[2] + s * (pb[2] - pa[2]);
          ids[e] = nv;
          edge_vertex.emplace(key, nv);
          ++nv;
        }
      }
      if (ids[0] == ids[1] || ids[1] == ids[2] || ids[0] == ids[2]) continue;
      if (nf >= faces_cap) return -1;
      out_faces[nf * 3] = ids[0];
      out_faces[nf * 3 + 1] = ids[1];
      out_faces[nf * 3 + 2] = ids[2];
      ++nf;
    }
  }
  *out_n_verts = nv;
  return nf;
}

// Hierarchical fine-lattice variant; same ABI as marching_tetrahedra_grid
// (exact-size malloc'd outputs, flat open-addressed weld hash — see that
// function's notes on this deployment's page-fault behavior).
int64_t marching_cubes_grid(
    const float* fine_vals,   // (C, s+1, s+1, s+1)
    const int64_t* cell_ijk,  // (C, 3) coarse cell coords
    int64_t n_cells, int64_t s, const double* lo, const double* cell_size,
    double level, int64_t fine_R, float** out_verts, int32_t** out_faces,
    int64_t* out_n_verts) {
  const int64_t sp1 = s + 1;
  const double fx = cell_size[0] / s, fy = cell_size[1] / s,
               fz = cell_size[2] / s;

  // Per-config triangle counts for the counting pass.
  int8_t tris_of_cfg[256];
  for (int cfg = 0; cfg < 256; ++cfg) {
    int t = 0;
    while (mc::kTriTable[cfg][t] >= 0) t += 3;
    tris_of_cfg[cfg] = static_cast<int8_t>(t / 3);
  }

  // Pass 1: exact (pre-weld) triangle count.
  int64_t tri_count = 0;
  for (int64_t cell = 0; cell < n_cells; ++cell) {
    const float* vals = fine_vals + cell * sp1 * sp1 * sp1;
    for (int64_t ci = 0; ci < s; ++ci)
      for (int64_t cj = 0; cj < s; ++cj)
        for (int64_t ck = 0; ck < s; ++ck) {
          int cfg = 0;
          for (int c = 0; c < 8; ++c) {
            int dx = c & 1, dy = (c >> 1) & 1, dz = (c >> 2) & 1;
            cfg |=
                (vals[((ci + dx) * sp1 + cj + dy) * sp1 + ck + dz] < level)
                << c;
          }
          tri_count += tris_of_cfg[cfg];
        }
  }
  if (tri_count == 0) {
    *out_verts = nullptr;
    *out_faces = nullptr;
    *out_n_verts = 0;
    return 0;
  }

  FlatEdgeMap weld(static_cast<size_t>(tri_count));
  int64_t v_cap = tri_count / 2 + 1024;
  float* verts = static_cast<float*>(std::malloc(v_cap * 3 * sizeof(float)));
  int32_t* faces =
      static_cast<int32_t*>(std::malloc(tri_count * 3 * sizeof(int32_t)));
  int64_t nv = 0, nf = 0;

  for (int64_t cell = 0; cell < n_cells; ++cell) {
    const float* vals = fine_vals + cell * sp1 * sp1 * sp1;
    const int64_t gi0 = cell_ijk[cell * 3] * s;
    const int64_t gj0 = cell_ijk[cell * 3 + 1] * s;
    const int64_t gk0 = cell_ijk[cell * 3 + 2] * s;
    for (int64_t ci = 0; ci < s; ++ci)
      for (int64_t cj = 0; cj < s; ++cj)
        for (int64_t ck = 0; ck < s; ++ck) {
          float cv[8];
          int64_t cid[8];
          double cpx[8], cpy[8], cpz[8];
          int cfg = 0;
          for (int c = 0; c < 8; ++c) {
            int dx = c & 1, dy = (c >> 1) & 1, dz = (c >> 2) & 1;
            int64_t li = ci + dx, lj = cj + dy, lk = ck + dz;
            cv[c] = vals[(li * sp1 + lj) * sp1 + lk];
            cfg |= (cv[c] < level) << c;
            int64_t gi = gi0 + li, gj = gj0 + lj, gk = gk0 + lk;
            cid[c] = (gi * fine_R + gj) * fine_R + gk;
            cpx[c] = lo[0] + gi * fx;
            cpy[c] = lo[1] + gj * fy;
            cpz[c] = lo[2] + gk * fz;
          }
          const int8_t* tri = mc::kTriTable[cfg];
          for (int t = 0; tri[t] >= 0; t += 3) {
            int32_t ids[3];
            for (int e = 0; e < 3; ++e) {
              int la = mc::kCubeEdges[tri[t + e]][0];
              int lb = mc::kCubeEdges[tri[t + e]][1];
              int64_t ga = cid[la], gb = cid[lb];
              uint64_t key = ga < gb
                                 ? (static_cast<uint64_t>(ga) << 32) |
                                       static_cast<uint64_t>(gb)
                                 : (static_cast<uint64_t>(gb) << 32) |
                                       static_cast<uint64_t>(ga);
              size_t slot;
              int32_t found = weld.find(key, &slot);
              if (found >= 0) {
                ids[e] = found;
              } else {
                if (nv >= v_cap) {
                  v_cap = v_cap + v_cap / 2;
                  verts = static_cast<float*>(
                      std::realloc(verts, v_cap * 3 * sizeof(float)));
                }
                double va = cv[la], vb = cv[lb];
                double denom = vb - va;
                if (std::fabs(denom) < 1e-12) denom = 1e-12;
                double tt = (level - va) / denom;
                tt = tt < 0.0 ? 0.0 : (tt > 1.0 ? 1.0 : tt);
                verts[nv * 3] =
                    static_cast<float>(cpx[la] + tt * (cpx[lb] - cpx[la]));
                verts[nv * 3 + 1] =
                    static_cast<float>(cpy[la] + tt * (cpy[lb] - cpy[la]));
                verts[nv * 3 + 2] =
                    static_cast<float>(cpz[la] + tt * (cpz[lb] - cpz[la]));
                ids[e] = static_cast<int32_t>(nv);
                weld.insert_at(slot, key, ids[e]);
                ++nv;
              }
            }
            if (ids[0] == ids[1] || ids[1] == ids[2] || ids[0] == ids[2])
              continue;
            faces[nf * 3] = ids[0];
            faces[nf * 3 + 1] = ids[1];
            faces[nf * 3 + 2] = ids[2];
            ++nf;
          }
        }
  }
  *out_verts = verts;
  *out_faces = faces;
  *out_n_verts = nv;
  return nf;
}

// ---------------------------------------------------------------------------
// Z-buffer triangle rasterizer (visibility pass for the preview renderer).
//
// Replaces the numpy bucket rasterizer's candidate-sample generation +
// sort-based depth test (actionmesh_tpu/render/renderer.py) with a direct
// per-face bbox scan; shading stays in Python on the winning samples. The
// reference's equivalent is the pytorch3d CUDA rasterizer
// (reference: actionmesh/render/renderer.py:58-125).
//
// Inputs: screen-space xy (V,) float32, camera-space depth z (V,) float32
// (> 0 in front of the camera), faces (F, 3) int32, image size.
// Outputs per pixel (size*size, row-major y*size+x):
//   win_fid  int32   winning face id, -1 where background
//   win_bary float32 (3) perspective-correct barycentrics of the winner
// Semantics match the numpy path: pixel centers at +0.5, inside test
// w >= -1e-6 on screen-space barycentrics, perspective-correct depth
// 1 / sum(w_i / z_i), faces with any vertex at z <= near culled.
void rasterize_zbuffer(
    const float* px, const float* py, const float* z, int64_t n_verts,
    const int32_t* faces, int64_t n_faces, int32_t size, float near_z,
    int32_t* win_fid, float* win_bary) {
  (void)n_verts;
  const int64_t n_pix = static_cast<int64_t>(size) * size;
  std::vector<float> zbuf(n_pix, std::numeric_limits<float>::infinity());
  for (int64_t i = 0; i < n_pix; ++i) win_fid[i] = -1;

  for (int64_t f = 0; f < n_faces; ++f) {
    const int32_t ia = faces[f * 3], ib = faces[f * 3 + 1],
                  ic = faces[f * 3 + 2];
    const float ax = px[ia], ay = py[ia], az = z[ia];
    const float bx = px[ib], by = py[ib], bz = z[ib];
    const float cx = px[ic], cy = py[ic], cz = z[ic];
    if (az <= near_z || bz <= near_z || cz <= near_z) continue;

    const float den = (by - cy) * (ax - cx) + (cx - bx) * (ay - cy);
    if (std::fabs(den) <= 1e-12f) continue;
    const float inv_den = 1.0f / den;

    const float minx = std::min(ax, std::min(bx, cx));
    const float maxx = std::max(ax, std::max(bx, cx));
    const float miny = std::min(ay, std::min(by, cy));
    const float maxy = std::max(ay, std::max(by, cy));
    if (maxx < 0 || minx >= size || maxy < 0 || miny >= size) continue;
    // clamp in float BEFORE the int cast: near-plane-grazing vertices give
    // screen coords far beyond int32 range (the numpy path clips pre-cast)
    const float fsize = static_cast<float>(size - 1);
    const int32_t x0 =
        static_cast<int32_t>(std::floor(std::min(std::max(minx, 0.0f), fsize)));
    const int32_t x1 =
        static_cast<int32_t>(std::ceil(std::min(std::max(maxx, 0.0f), fsize)));
    const int32_t y0 =
        static_cast<int32_t>(std::floor(std::min(std::max(miny, 0.0f), fsize)));
    const int32_t y1 =
        static_cast<int32_t>(std::ceil(std::min(std::max(maxy, 0.0f), fsize)));

    const float iza = 1.0f / az, izb = 1.0f / bz, izc = 1.0f / cz;
    const float eps = -1e-6f;
    for (int32_t yy = y0; yy <= y1; ++yy) {
      const float cyp = yy + 0.5f;
      // row-constant pieces of the edge functions
      const float w0_row = (cx - bx) * (cyp - cy);
      const float w1_row = (ax - cx) * (cyp - cy);
      float* zrow = zbuf.data() + static_cast<int64_t>(yy) * size;
      int32_t* frow = win_fid + static_cast<int64_t>(yy) * size;
      float* brow = win_bary + (static_cast<int64_t>(yy) * size) * 3;
      for (int32_t xx = x0; xx <= x1; ++xx) {
        const float cxp = xx + 0.5f;
        const float w0 = ((by - cy) * (cxp - cx) + w0_row) * inv_den;
        const float w1 = ((cy - ay) * (cxp - cx) + w1_row) * inv_den;
        const float w2 = 1.0f - w0 - w1;
        if (w0 < eps || w1 < eps || w2 < eps) continue;
        const float pw0 = w0 * iza, pw1 = w1 * izb, pw2 = w2 * izc;
        const float wsum = pw0 + pw1 + pw2;
        const float depth = 1.0f / std::max(wsum, 1e-12f);
        if (depth < zrow[xx]) {
          zrow[xx] = depth;
          frow[xx] = static_cast<int32_t>(f);
          const float inv_wsum = 1.0f / wsum;
          brow[xx * 3] = pw0 * inv_wsum;
          brow[xx * 3 + 1] = pw1 * inv_wsum;
          brow[xx * 3 + 2] = pw2 * inv_wsum;
        }
      }
    }
  }
}

}  // extern "C"
