// Native core of the Kuhn-lattice stuffing tet mesher (shm3d/tet/mesher.py).
//
// The reference uses TetGen (C++) for its tet meshing
// (/root/reference/src/signed_heat_tet_solver.cpp:885-1241).  This module is
// the native equivalent for the TPU-era mesher: it runs the sequential part
// of the algorithm — greedy node snapping plus split insertion of source
// vertices into the lattice — which dominates host precompute time in the
// Python implementation.  Vectorizable finalization (faces, adjacency,
// reordering) stays in NumPy.
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in this image).
// Algorithm and data layout mirror shm3d/tet/mesher.py exactly; the Python
// implementation remains as the correctness oracle (tests compare both).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <algorithm>
#include <array>
#include <unordered_map>
#include <unordered_set>
#include <vector>

namespace {

using std::int64_t;

constexpr int KUHN[6][4] = {
    {0, 1, 3, 7}, {0, 3, 2, 7}, {0, 2, 6, 7},
    {0, 6, 4, 7}, {0, 4, 5, 7}, {0, 5, 1, 7},
};
constexpr double SNAP_ALPHA = 0.35;

struct V3 {
  double x, y, z;
  V3 operator-(const V3& o) const { return {x - o.x, y - o.y, z - o.z}; }
  V3 operator+(const V3& o) const { return {x + o.x, y + o.y, z + o.z}; }
  V3 operator*(double s) const { return {x * s, y * s, z * s}; }
};
inline double dot(const V3& a, const V3& b) { return a.x * b.x + a.y * b.y + a.z * b.z; }
inline V3 cross(const V3& a, const V3& b) {
  return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z, a.x * b.y - a.y * b.x};
}
inline double norm(const V3& a) { return std::sqrt(dot(a, a)); }

struct Builder {
  int nl, npts;
  V3 bmin;
  double h;
  std::vector<V3> positions;             // lattice nodes (mutated by snaps)
  std::vector<V3> extra_verts;
  std::vector<std::array<int64_t, 4>> base_tets;
  std::vector<char> base_dead;
  std::vector<std::array<int64_t, 4>> extra_tets;
  std::vector<char> extra_dead;
  std::unordered_map<int64_t, std::vector<int64_t>> cell_extra;

  int64_t n_nodes() const { return (int64_t)positions.size(); }

  V3 vert(int64_t vid) const {
    return vid < n_nodes() ? positions[vid] : extra_verts[vid - n_nodes()];
  }
  int64_t add_vert(const V3& p) {
    extra_verts.push_back(p);
    return n_nodes() + (int64_t)extra_verts.size() - 1;
  }
  void cell_of(const V3& p, int64_t& ci, int64_t& cj, int64_t& ck) const {
    ci = std::min<int64_t>(std::max<int64_t>((int64_t)std::floor((p.x - bmin.x) / h), 0), nl - 1);
    cj = std::min<int64_t>(std::max<int64_t>((int64_t)std::floor((p.y - bmin.y) / h), 0), nl - 1);
    ck = std::min<int64_t>(std::max<int64_t>((int64_t)std::floor((p.z - bmin.z) / h), 0), nl - 1);
  }
  int64_t cell_lex(int64_t i, int64_t j, int64_t k) const {
    return i + j * nl + (int64_t)k * nl * nl;
  }
  std::array<int64_t, 4> tet_verts(int64_t tid) const {
    return tid < (int64_t)base_tets.size() ? base_tets[tid]
                                           : extra_tets[tid - base_tets.size()];
  }
  bool is_dead(int64_t tid) const {
    return tid < (int64_t)base_tets.size() ? base_dead[tid]
                                           : extra_dead[tid - base_tets.size()];
  }

  void nearby_tets(const V3& p, int rings, std::vector<int64_t>& out) const {
    out.clear();
    int64_t ci, cj, ck;
    cell_of(p, ci, cj, ck);
    for (int64_t di = -rings; di <= rings; ++di)
      for (int64_t dj = -rings; dj <= rings; ++dj)
        for (int64_t dk = -rings; dk <= rings; ++dk) {
          int64_t i = ci + di, j = cj + dj, k = ck + dk;
          if (i < 0 || j < 0 || k < 0 || i >= nl || j >= nl || k >= nl) continue;
          int64_t lex = cell_lex(i, j, k);
          // cells laid out row-major in (k, j, i) order: row index
          int64_t row = i + j * nl + (int64_t)k * nl * nl;  // same as lex
          (void)row;
          for (int64_t t = 6 * lex; t < 6 * lex + 6; ++t)
            if (!base_dead[t]) out.push_back(t);
          auto it = cell_extra.find(lex);
          if (it != cell_extra.end())
            for (int64_t e : it->second)
              if (!extra_dead[e]) out.push_back((int64_t)base_tets.size() + e);
        }
  }

  // barycentric coordinates of p in tet tid; returns min coordinate
  bool bary(int64_t tid, const V3& p, double out[4]) const {
    auto t = tet_verts(tid);
    V3 a = vert(t[0]);
    V3 u = vert(t[1]) - a, v = vert(t[2]) - a, w = vert(t[3]) - a, r = p - a;
    double det = dot(u, cross(v, w));
    if (std::fabs(det) < 1e-300) return false;
    double b1 = dot(r, cross(v, w)) / det;
    double b2 = dot(u, cross(r, w)) / det;
    double b3 = dot(u, cross(v, r)) / det;
    out[0] = 1.0 - b1 - b2 - b3;
    out[1] = b1; out[2] = b2; out[3] = b3;
    return true;
  }

  void replace(int64_t tid, const std::vector<std::array<int64_t, 4>>& news) {
    if (tid < (int64_t)base_tets.size()) base_dead[tid] = 1;
    else extra_dead[tid - base_tets.size()] = 1;
    for (const auto& nt : news) {
      int64_t eid = (int64_t)extra_tets.size();
      extra_tets.push_back(nt);
      extra_dead.push_back(0);
      V3 b = (vert(nt[0]) + vert(nt[1]) + vert(nt[2]) + vert(nt[3])) * 0.25;
      int64_t ci, cj, ck;
      cell_of(b, ci, cj, ck);
      cell_extra[cell_lex(ci, cj, ck)].push_back(eid);
    }
  }

  // returns vertex id; how: 0=dedup 1=split
  int64_t insert_point(const V3& p, double eps, int& how) {
    std::vector<int64_t> cand;
    nearby_tets(p, 0, cand);
    if (cand.empty()) nearby_tets(p, 1, cand);
    int64_t best_tid = -1;
    double best_bary[4], best_min = -1e300;
    for (int64_t tid : cand) {
      double bc[4];
      if (!bary(tid, p, bc)) continue;
      double mn = *std::min_element(bc, bc + 4);
      if (mn > best_min) {
        best_min = mn;
        best_tid = tid;
        std::memcpy(best_bary, bc, sizeof bc);
      }
      if (mn > eps) break;
    }
    if (best_tid < 0) { how = -1; return -1; }
    auto tet = tet_verts(best_tid);

    // distance-based dedup (barycentrics unreliable in slivers)
    int jmin = 0;
    double dmin = 1e300;
    for (int j = 0; j < 4; ++j) {
      double d = norm(vert(tet[j]) - p);
      if (d < dmin) { dmin = d; jmin = j; }
    }
    if (dmin <= 1e-12 * h + 1e-12) { how = 0; return tet[jmin]; }

    int nzero = 0;
    int zero[4];
    for (int j = 0; j < 4; ++j)
      if (best_bary[j] <= eps) zero[nzero++] = j;
    if (nzero == 3) nzero = 0;  // vertex hit but not coincident: interior

    int64_t pid = add_vert(p);
    how = 1;

    if (nzero == 0) {
      auto [a, b, c, d] = tet;
      replace(best_tid, {{pid, b, c, d}, {a, pid, c, d}, {a, b, pid, d}, {a, b, c, pid}});
      return pid;
    }
    if (nzero == 1) {
      int jz = zero[0];
      std::unordered_set<int64_t> fset;
      for (int j = 0; j < 4; ++j)
        if (j != jz) fset.insert(tet[j]);
      std::vector<int64_t> split_tids = {best_tid};
      std::vector<int64_t> near;
      nearby_tets(p, 1, near);
      for (int64_t other : near) {
        if (other == best_tid) continue;
        auto ot = tet_verts(other);
        int cnt = 0;
        for (int j = 0; j < 4; ++j) cnt += fset.count(ot[j]);
        if (cnt == 3) { split_tids.push_back(other); break; }
      }
      for (int64_t st : split_tids) {
        auto t = tet_verts(st);
        std::vector<std::array<int64_t, 4>> news;
        for (int j = 0; j < 4; ++j)
          if (fset.count(t[j])) {
            auto nt = t;
            nt[j] = pid;
            news.push_back(nt);
          }
        replace(st, news);
      }
      return pid;
    }
    // nzero == 2: on the edge between the two non-zero corners
    int64_t u = -1, v = -1;
    for (int j = 0; j < 4; ++j)
      if (best_bary[j] > eps) (u < 0 ? u : v) = tet[j];
    std::vector<int64_t> near;
    nearby_tets(p, 1, near);
    std::vector<int64_t> ring;
    for (int64_t tid2 : near) {
      auto t = tet_verts(tid2);
      bool hu = false, hv = false;
      for (int j = 0; j < 4; ++j) { hu |= t[j] == u; hv |= t[j] == v; }
      if (hu && hv) ring.push_back(tid2);
    }
    for (int64_t st : ring) {
      auto t = tet_verts(st);
      auto t1 = t, t2 = t;
      for (int j = 0; j < 4; ++j) {
        if (t1[j] == v) t1[j] = pid;
        if (t2[j] == u) t2[j] = pid;
      }
      replace(st, {t1, t2});
    }
    return pid;
  }
};

struct Result {
  std::vector<double> vertices;   // (NV, 3)
  std::vector<int64_t> tets;      // (NT, 4)
  std::vector<int64_t> vertex_of; // (V,)
  int64_t n_snapped = 0, n_split = 0;
};

double tet_vol(const V3& a, const V3& b, const V3& c, const V3& d) {
  return dot(cross(b - a, c - a), d - a) / 6.0;
}

}  // namespace

extern "C" {

// Builds the mesh; returns an opaque handle (heap Result*), or null.
void* shm3d_lattice_build(const double* src_xyz, int64_t V, double cx, double cy,
                          double cz, double half_side, int resolution) {
  Builder mb;
  mb.nl = resolution;
  mb.npts = resolution + 1;
  mb.h = 2.0 * half_side / resolution;
  mb.bmin = {cx - half_side, cy - half_side, cz - half_side};

  const int64_t npts = mb.npts;
  mb.positions.resize((int64_t)npts * npts * npts);
  for (int64_t k = 0; k < npts; ++k)
    for (int64_t j = 0; j < npts; ++j)
      for (int64_t i = 0; i < npts; ++i)
        mb.positions[i + j * npts + k * npts * npts] =
            {mb.bmin.x + i * mb.h, mb.bmin.y + j * mb.h, mb.bmin.z + k * mb.h};

  const int64_t nl = mb.nl;
  const int64_t ncells = (int64_t)nl * nl * nl;
  mb.base_tets.resize(ncells * 6);
  mb.base_dead.assign(ncells * 6, 0);
  const int64_t dx = 1, dy = npts, dz = (int64_t)npts * npts;
  const int64_t off[8] = {0, dx, dy, dx + dy, dz, dx + dz, dy + dz, dx + dy + dz};
  for (int64_t k = 0; k < nl; ++k)
    for (int64_t j = 0; j < nl; ++j)
      for (int64_t i = 0; i < nl; ++i) {
        int64_t lex = i + j * nl + k * nl * nl;
        int64_t c000 = i + j * npts + k * npts * npts;
        for (int t = 0; t < 6; ++t) {
          auto& T = mb.base_tets[6 * lex + t];
          for (int m = 0; m < 4; ++m) T[m] = c000 + off[KUHN[t][m]];
        }
      }

  auto res = new Result();
  res->vertex_of.assign(V, -1);

  // pass 1: snap (closest-first greedy claims)
  std::vector<int64_t> nearest(V);
  std::vector<double> dist(V);
  std::vector<int64_t> order(V);
  for (int64_t v = 0; v < V; ++v) {
    V3 p = {src_xyz[3 * v], src_xyz[3 * v + 1], src_xyz[3 * v + 2]};
    int64_t bi = std::min<int64_t>(std::max<int64_t>((int64_t)std::llround((p.x - mb.bmin.x) / mb.h), 0), npts - 1);
    int64_t bj = std::min<int64_t>(std::max<int64_t>((int64_t)std::llround((p.y - mb.bmin.y) / mb.h), 0), npts - 1);
    int64_t bk = std::min<int64_t>(std::max<int64_t>((int64_t)std::llround((p.z - mb.bmin.z) / mb.h), 0), npts - 1);
    nearest[v] = bi + bj * npts + bk * npts * npts;
    dist[v] = norm(p - mb.positions[nearest[v]]);
    order[v] = v;
  }
  std::stable_sort(order.begin(), order.end(),
                   [&](int64_t a, int64_t b) { return dist[a] < dist[b]; });
  std::unordered_map<int64_t, int64_t> claimed;
  std::vector<int64_t> snapped_nodes, snapped_srcs;
  for (int64_t v : order) {
    if (dist[v] > SNAP_ALPHA * mb.h) continue;
    int64_t nid = nearest[v];
    if (claimed.count(nid)) continue;
    claimed[nid] = v;
    snapped_nodes.push_back(nid);
    snapped_srcs.push_back(v);
  }
  std::vector<V3> saved(snapped_nodes.size());
  for (size_t s = 0; s < snapped_nodes.size(); ++s) {
    saved[s] = mb.positions[snapped_nodes[s]];
    int64_t v = snapped_srcs[s];
    mb.positions[snapped_nodes[s]] = {src_xyz[3 * v], src_xyz[3 * v + 1], src_xyz[3 * v + 2]};
  }
  // revert snaps that invert incident tets (rounds)
  std::unordered_set<int64_t> snapset(snapped_nodes.begin(), snapped_nodes.end());
  for (int round = 0; round < 6 && !snapset.empty(); ++round) {
    std::unordered_set<int64_t> revert;
    for (int64_t t = 0; t < (int64_t)mb.base_tets.size(); ++t) {
      const auto& T = mb.base_tets[t];
      bool touched = snapset.count(T[0]) || snapset.count(T[1]) ||
                     snapset.count(T[2]) || snapset.count(T[3]);
      if (!touched) continue;
      if (tet_vol(mb.vert(T[0]), mb.vert(T[1]), mb.vert(T[2]), mb.vert(T[3])) <= 0.0)
        for (int m = 0; m < 4; ++m)
          if (snapset.count(T[m])) revert.insert(T[m]);
    }
    if (revert.empty()) break;
    for (int64_t nid : revert) {
      for (size_t s = 0; s < snapped_nodes.size(); ++s)
        if (snapped_nodes[s] == nid) { mb.positions[nid] = saved[s]; break; }
      snapset.erase(nid);
      claimed.erase(nid);
    }
  }
  for (size_t s = 0; s < snapped_nodes.size(); ++s)
    if (snapset.count(snapped_nodes[s])) {
      res->vertex_of[snapped_srcs[s]] = snapped_nodes[s];
      res->n_snapped++;
    }

  // pass 2: split-insert the rest
  for (int64_t v = 0; v < V; ++v) {
    if (res->vertex_of[v] >= 0) continue;
    V3 p = {src_xyz[3 * v], src_xyz[3 * v + 1], src_xyz[3 * v + 2]};
    int how = 0;
    int64_t pid = mb.insert_point(p, 1e-9, how);
    if (how < 0) { delete res; return nullptr; }
    res->vertex_of[v] = pid;
    if (how == 1) res->n_split++;
  }

  // pack results
  int64_t NV = mb.n_nodes() + (int64_t)mb.extra_verts.size();
  res->vertices.resize(NV * 3);
  for (int64_t i = 0; i < mb.n_nodes(); ++i) {
    res->vertices[3 * i] = mb.positions[i].x;
    res->vertices[3 * i + 1] = mb.positions[i].y;
    res->vertices[3 * i + 2] = mb.positions[i].z;
  }
  for (size_t i = 0; i < mb.extra_verts.size(); ++i) {
    int64_t o = mb.n_nodes() + (int64_t)i;
    res->vertices[3 * o] = mb.extra_verts[i].x;
    res->vertices[3 * o + 1] = mb.extra_verts[i].y;
    res->vertices[3 * o + 2] = mb.extra_verts[i].z;
  }
  for (int64_t t = 0; t < (int64_t)mb.base_tets.size(); ++t)
    if (!mb.base_dead[t])
      for (int m = 0; m < 4; ++m) res->tets.push_back(mb.base_tets[t][m]);
  for (size_t t = 0; t < mb.extra_tets.size(); ++t)
    if (!mb.extra_dead[t])
      for (int m = 0; m < 4; ++m) res->tets.push_back(mb.extra_tets[t][m]);
  return res;
}

int64_t shm3d_lattice_nv(void* handle) { return (int64_t)((Result*)handle)->vertices.size() / 3; }
int64_t shm3d_lattice_nt(void* handle) { return (int64_t)((Result*)handle)->tets.size() / 4; }
int64_t shm3d_lattice_nsnapped(void* handle) { return ((Result*)handle)->n_snapped; }
int64_t shm3d_lattice_nsplit(void* handle) { return ((Result*)handle)->n_split; }

void shm3d_lattice_copy(void* handle, double* vertices, int64_t* tets, int64_t* vertex_of) {
  auto* r = (Result*)handle;
  std::memcpy(vertices, r->vertices.data(), r->vertices.size() * sizeof(double));
  std::memcpy(tets, r->tets.data(), r->tets.size() * sizeof(int64_t));
  std::memcpy(vertex_of, r->vertex_of.data(), r->vertex_of.size() * sizeof(int64_t));
}

void shm3d_lattice_free(void* handle) { delete (Result*)handle; }

}  // extern "C"
