"""Tetrahedral background-domain construction (TPU-era mesher).

The reference tet-meshes its bounding cube with TetGen's incremental
constrained Delaunay + quality refinement
(/root/reference/src/signed_heat_tet_solver.cpp:885-1241, flags
"pq1.414zfenna<maxvol>" at include/signed_heat_tet_solver.h:96-97), falling
back to a point-cloud-style mesh (cube-constrained only, input vertices as
mesh vertices) for polygon meshes or TetGen failures (:24-33,1018-1094).

This module is a from-scratch re-design rather than a Delaunay port: a
**Kuhn-lattice stuffing mesher**:

1. the bounding cube (centroid +- radius*scale, reference
   buildCubeAroundSurface :1220-1239) is covered by a uniform lattice of
   cubes, each split into 6 Kuhn tetrahedra sharing the main diagonal;
2. each source vertex is inserted *exactly*:
   - **snap**: if its nearest free lattice node is within ``SNAP_ALPHA * h``
     and moving that node inverts no incident tet, the node is moved to the
     source position (quality-preserving, no new tets);
   - **split**: otherwise the containing tet is split 1->4 around the point
     (on-face points split both adjacent tets 1->3 each, on-edge points
     split the full edge ring 1->2 each, coincident points are deduplicated).

No exact geometric predicates, no incremental Delaunay; deterministic and
array-based with a small Python driver loop (native C++ version of the same
algorithm in native/lattice_tet.cpp).  The resulting mesh preserves the
reference's *vertex-index contract*: source vertices occupy indices 0..V-1
(ZeroSet Dirichlet pinning and greedy BFS seeding depend on this,
reference :169-180,417-425,451-458).  Surface *faces* are not preserved
(the reference's fully-conforming path); ``conforming=False`` always, which
routes Step 3 through the vertex (dual-Laplacian) path exactly like the
reference's polygon/TetGen-failure fallback.  The Crouzeix-Raviart face path
remains available for conforming meshes supplied externally.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Set, Tuple

import numpy as np

# Kuhn decomposition of the unit cube: 6 tets around the diagonal c0-c7,
# corner id c = i + 2j + 4k; rows ordered for positive volume.
_KUHN_TETS = np.array(
    [
        [0, 1, 3, 7],
        [0, 3, 2, 7],
        [0, 2, 6, 7],
        [0, 6, 4, 7],
        [0, 4, 5, 7],
        [0, 5, 1, 7],
    ],
    dtype=np.int64,
)
# face opposite corner j of a positively-oriented tet, outward orientation
_OPP = ((1, 2, 3), (0, 3, 2), (0, 1, 3), (0, 2, 1))

SNAP_ALPHA = 0.35  # max snap displacement as a fraction of the lattice cell


@dataclasses.dataclass
class TetMesh:
    """Array-based tet mesh with the adjacency the solver needs.

    vertices (NV, 3); tets (NT, 4) positively oriented; faces (NF, 3) global
    unique faces (orientation = first-seen outward); tet_face (NT, 4) global
    face id of the face opposite corner j; tet_face_sign (NT, 4) +1 when the
    stored global orientation is outward for this tet (the reference packs
    this sign into the index, signed_heat_tet_solver.cpp:1278-1301);
    vt_indptr/vt_data: CSR vertex -> incident tets (reference ``vertexTet``
    :1302-1308); n_src: source vertices occupy ids 0..n_src-1; src_vertex
    (V,) maps each input vertex to its mesh vertex (duplicates possible only
    for coincident inputs); n_snapped/n_split: insertion statistics.
    """

    vertices: np.ndarray
    tets: np.ndarray
    faces: np.ndarray
    tet_face: np.ndarray
    tet_face_sign: np.ndarray
    vt_indptr: np.ndarray
    vt_data: np.ndarray
    n_src: int
    src_vertex: np.ndarray
    n_snapped: int = 0
    n_split: int = 0
    conforming: bool = False

    @property
    def n_vertices(self) -> int:
        return int(self.vertices.shape[0])

    @property
    def n_tets(self) -> int:
        return int(self.tets.shape[0])

    @property
    def n_faces(self) -> int:
        return int(self.faces.shape[0])

    def tet_volumes(self) -> np.ndarray:
        v, t = self.vertices, self.tets
        a, b, c, d = v[t[:, 0]], v[t[:, 1]], v[t[:, 2]], v[t[:, 3]]
        return np.einsum("ij,ij->i", np.cross(b - a, c - a), d - a) / 6.0

    def barycenters(self) -> np.ndarray:
        return self.vertices[self.tets].mean(axis=1)

    def face_barycenters(self) -> np.ndarray:
        return self.vertices[self.faces].mean(axis=1)

    def mean_node_spacing(self) -> float:
        """Mean pairwise distance of the 4 face barycenters per tet
        (reference computeMeanNodeSpacing, signed_heat_tet_solver.cpp:1312-1328)."""
        fb = self.face_barycenters()[self.tet_face]  # (NT, 4, 3)
        acc = 0.0
        for j in range(4):
            for k in range(j + 1, 4):
                acc += np.linalg.norm(fb[:, j] - fb[:, k], axis=1).sum()
        return float(acc / (6 * self.n_tets))


def _lattice_resolution(
    half_side: float, mean_area: float, h_coef: float, cap: int = 64
) -> int:
    """Cells per axis.  The reference drives refinement with TetGen's
    max-tet-volume = 2^-hCoef * meanFaceArea (signed_heat_tet_solver.cpp:16-23);
    a Kuhn tet has volume cell^3/6, so cell ~ (6 * maxvol)^(1/3).

    ``cap`` bounds the uniform lattice (resolution beyond it produces
    multi-million-tet meshes); a warning is emitted when the cap truncates
    the requested refinement so hCoef saturation is visible (the reference
    honors TetGen maxvol unboundedly)."""
    maxvol = (2.0 ** -h_coef) * mean_area
    cell = (6.0 * maxvol) ** (1.0 / 3.0)
    n = int(np.ceil(2.0 * half_side / cell))
    if n > cap:
        import warnings

        warnings.warn(
            f"tet lattice resolution {n} exceeds the cap {cap}; hCoef-driven "
            f"refinement saturates (pass resolution=/lattice_cap= to raise it)",
            stacklevel=2,
        )
    return int(np.clip(n, 8, cap))


class _MeshBuilder:
    """Base Kuhn lattice as one NumPy array + copy-on-write cells for splits.

    The base lattice (ncells * 6 tets) is a single int64 array; snapping only
    moves vertex positions.  Split insertion materializes per-cell buckets
    lazily: replaced base tets are flagged dead, children live in
    ``extra_tets`` and are indexed through ``cell_extra``."""

    def __init__(self, nodes: np.ndarray, nl: int, npts: int, bmin, h: float):
        self.nl, self.npts, self.bmin, self.h = nl, npts, np.asarray(bmin), h
        self.positions = nodes.copy()          # (n_nodes, 3), mutated by snaps
        self.extra_verts: List[np.ndarray] = []

        dx, dy, dz = 1, npts, npts * npts
        corner_off = np.array([0, dx, dy, dx + dy, dz, dx + dz, dy + dz, dx + dy + dz])
        ci = np.arange(nl)
        CK, CJ, CI = np.meshgrid(ci, ci, ci, indexing="ij")
        c000 = (CI + CJ * npts + CK * npts * npts).reshape(-1)
        corners = c000[:, None] + corner_off[None, :]          # (ncells, 8)
        self.base_tets = corners[:, _KUHN_TETS].reshape(-1, 4)  # cell c -> tets 6c..6c+5
        self.base_dead = np.zeros(self.base_tets.shape[0], dtype=bool)
        self.extra_tets: List[Tuple[int, int, int, int]] = []
        self.extra_dead: List[bool] = []
        self.cell_extra: Dict[int, List[int]] = {}
        # lex cell index (i, j, k) -> i + j*nl + k*nl^2
        KK, JJ, II = np.meshgrid(ci, ci, ci, indexing="ij")
        self._cell_lex = (II + JJ * nl + KK * nl * nl).reshape(-1)
        self._lex_to_row = np.empty(nl ** 3, dtype=np.int64)
        self._lex_to_row[self._cell_lex] = np.arange(nl ** 3)

    def vert(self, vid: int) -> np.ndarray:
        n0 = self.positions.shape[0]
        return self.positions[vid] if vid < n0 else self.extra_verts[vid - n0]

    def add_vert(self, p: np.ndarray) -> int:
        self.extra_verts.append(np.asarray(p, dtype=np.float64))
        return self.positions.shape[0] + len(self.extra_verts) - 1

    def cell_of(self, p: np.ndarray) -> Tuple[int, int, int]:
        ijk = np.floor((p - self.bmin) / self.h).astype(np.int64)
        return tuple(int(x) for x in np.clip(ijk, 0, self.nl - 1))

    def cell_lex(self, i, j, k) -> int:
        return i + j * self.nl + k * self.nl * self.nl

    def nearby_tets(self, p: np.ndarray, rings: int = 1) -> List[int]:
        """Live tet ids (base ids < 6*ncells, extras offset) near p."""
        ci, cj, ck = self.cell_of(p)
        out: List[int] = []
        nbase = self.base_tets.shape[0]
        for di in range(-rings, rings + 1):
            for dj in range(-rings, rings + 1):
                for dk in range(-rings, rings + 1):
                    i, j, k = ci + di, cj + dj, ck + dk
                    if not (0 <= i < self.nl and 0 <= j < self.nl and 0 <= k < self.nl):
                        continue
                    lex = self.cell_lex(i, j, k)
                    row = self._lex_to_row[lex]
                    for t in range(6 * row, 6 * row + 6):
                        if not self.base_dead[t]:
                            out.append(t)
                    for t in self.cell_extra.get(lex, ()):  # extra ids offset
                        if not self.extra_dead[t]:
                            out.append(nbase + t)
        return out

    def tet_verts(self, tid: int):
        nbase = self.base_tets.shape[0]
        if tid < nbase:
            return tuple(int(v) for v in self.base_tets[tid])
        return self.extra_tets[tid - nbase]

    def _bary(self, tid: int, p: np.ndarray) -> np.ndarray:
        a, b, c, d = (self.vert(v) for v in self.tet_verts(tid))
        M = np.column_stack([b - a, c - a, d - a])
        try:
            w = np.linalg.solve(M, p - a)
        except np.linalg.LinAlgError:
            return np.array([-1.0, -1, -1, -1])
        return np.array([1.0 - w.sum(), w[0], w[1], w[2]])

    def _replace(self, tid: int, new_tets) -> None:
        nbase = self.base_tets.shape[0]
        if tid < nbase:
            self.base_dead[tid] = True
        else:
            self.extra_dead[tid - nbase] = True
        for nt in new_tets:
            eid = len(self.extra_tets)
            self.extra_tets.append(tuple(int(v) for v in nt))
            self.extra_dead.append(False)
            bary = np.mean([self.vert(v) for v in nt], axis=0)
            ci, cj, ck = self.cell_of(bary)
            self.cell_extra.setdefault(self.cell_lex(ci, cj, ck), []).append(eid)

    def insert_point(self, p: np.ndarray, eps: float) -> Tuple[int, str]:
        """Insert p as an exact mesh vertex; returns (vertex id, how)."""
        cand = self.nearby_tets(p, rings=0) or self.nearby_tets(p, rings=1)
        best_tid, best_bary, best_min = -1, None, -np.inf
        for tid in cand:
            bary = self._bary(tid, p)
            mn = bary.min()
            if mn > best_min:
                best_tid, best_bary, best_min = tid, bary, mn
            if mn > eps:
                break
        if best_tid < 0:
            raise RuntimeError("point location failed")
        tid, bary = best_tid, best_bary
        tet = self.tet_verts(tid)

        # dedup by actual distance (barycentrics are unreliable in slivers)
        vdist = [float(np.linalg.norm(self.vert(v) - p)) for v in tet]
        jmin = int(np.argmin(vdist))
        if vdist[jmin] <= 1e-12 * self.h + 1e-12:
            return tet[jmin], "dedup"

        zero = [j for j in range(4) if bary[j] <= eps]
        if len(zero) == 3:  # barycentric vertex hit but not coincident: treat
            zero = []       # as interior (sliver child, kept exact)

        pid = self.add_vert(p)

        if len(zero) == 0:  # interior: 1 -> 4
            a, b, c, d = tet
            self._replace(tid, [(pid, b, c, d), (a, pid, c, d), (a, b, pid, d), (a, b, c, pid)])
            return pid, "split4"

        if len(zero) == 1:  # on the face opposite corner zero[0]
            jz = zero[0]
            face = [tet[j] for j in range(4) if j != jz]
            fset = set(face)
            split_tids = [tid]
            for other in self.nearby_tets(p, rings=1):
                if other != tid and fset.issubset(self.tet_verts(other)):
                    split_tids.append(other)
                    break
            for st in split_tids:
                t = self.tet_verts(st)
                news = []
                for j in range(4):
                    if t[j] in fset:
                        nt = list(t)
                        nt[j] = pid
                        news.append(nt)
                self._replace(st, news)
            return pid, "splitface"

        # len(zero) == 2: on the edge between the two non-zero corners
        live = [tet[j] for j in range(4) if bary[j] > eps]
        u, v = live
        ring = [t for t in self.nearby_tets(p, rings=1)
                if u in self.tet_verts(t) and v in self.tet_verts(t)]
        for st in ring:
            t = list(self.tet_verts(st))
            t1 = [pid if x == v else x for x in t]
            t2 = [pid if x == u else x for x in t]
            self._replace(st, [t1, t2])
        return pid, "splitedge"


def build_tet_domain(
    src_points: np.ndarray,
    scale: float = 2.0,
    h_coef: float = 0.0,
    mean_area: Optional[float] = None,
    resolution: Optional[int] = None,
    lattice_cap: int = 64,
) -> TetMesh:
    """Kuhn-lattice stuffing mesh of the bounding cube containing
    ``src_points`` (V, 3) exactly as mesh vertices 0..V-1."""
    src_points = np.asarray(src_points, dtype=np.float64)
    V = src_points.shape[0]
    c = src_points.mean(axis=0)
    radius = np.linalg.norm(src_points - c, axis=1).max()
    if radius <= 0.0:
        radius = 1.0  # degenerate input (single point / coincident points)
    s = radius * scale
    if resolution is None:
        if mean_area is None:
            mean_area = (2.0 * s / 16.0) ** 2
        resolution = _lattice_resolution(s, mean_area, h_coef, cap=lattice_cap)
    nl = int(resolution)
    h = 2.0 * s / nl
    bmin = c - s
    npts = nl + 1

    from . import native as native_mod

    if native_mod.available():
        out = native_mod.lattice_build(src_points, c, s, nl)
        if out is not None:
            verts, tets, vertex_of, n_snapped, n_split = out
            return _finalize_arrays(verts, tets, vertex_of, n_snapped, n_split)

    r = np.arange(npts) * h
    K, J, I = np.meshgrid(r, r, r, indexing="ij")
    nodes = np.stack([I, J, K], axis=-1).reshape(-1, 3) + bmin

    mb = _MeshBuilder(nodes, nl, npts, bmin, h)
    eps = 1e-9

    # --- pass 1 (vectorized): snap source vertices to near free lattice nodes
    base = np.clip(np.rint((src_points - bmin) / h).astype(np.int64), 0, npts - 1)
    nearest = base[:, 0] + base[:, 1] * npts + base[:, 2] * npts * npts
    dist = np.linalg.norm(src_points - nodes[nearest], axis=1)
    claimed: Dict[int, int] = {}
    vertex_of = np.full(V, -1, dtype=np.int64)
    snap_order = np.argsort(dist, kind="stable")  # closest claims first
    snapped_nodes = []
    snapped_srcs = []
    for vi in snap_order:
        nid = int(nearest[vi])
        if dist[vi] > SNAP_ALPHA * h or nid in claimed:
            continue
        claimed[nid] = int(vi)
        snapped_nodes.append(nid)
        snapped_srcs.append(int(vi))
    snapped_nodes = np.asarray(snapped_nodes, dtype=np.int64)
    snapped_srcs = np.asarray(snapped_srcs, dtype=np.int64)
    mb.positions[snapped_nodes] = src_points[snapped_srcs]

    # revert snaps that invert any incident tet (vectorized rounds)
    is_snapped = np.zeros(npts ** 3, dtype=bool)
    is_snapped[snapped_nodes] = True
    for _ in range(6):
        if snapped_nodes.size == 0:
            break
        pos = mb.positions
        T = mb.base_tets
        touched = is_snapped[T].any(axis=1)
        Tt = T[touched]
        a, b2, c2, d2 = pos[Tt[:, 0]], pos[Tt[:, 1]], pos[Tt[:, 2]], pos[Tt[:, 3]]
        vol = np.einsum("ij,ij->i", np.cross(b2 - a, c2 - a), d2 - a) / 6.0
        bad = vol <= 0.0
        if not bad.any():
            break
        bad_nodes = np.unique(Tt[bad])
        revert = bad_nodes[is_snapped[bad_nodes]]
        mb.positions[revert] = nodes[revert]
        is_snapped[revert] = False
    kept = is_snapped[snapped_nodes]
    for nid, vi in zip(snapped_nodes[~kept], snapped_srcs[~kept]):
        del claimed[int(nid)]
    vertex_of[snapped_srcs[kept]] = snapped_nodes[kept]
    n_snapped = int(kept.sum())

    # --- pass 2: split-insert the rest (exact positions)
    n_split = 0
    for vi in range(V):
        if vertex_of[vi] >= 0:
            continue
        pid, how = mb.insert_point(src_points[vi], eps)
        vertex_of[vi] = pid
        if how != "dedup":
            n_split += 1

    return _finalize(mb, vertex_of, n_snapped, n_split)


def _finalize(mb: _MeshBuilder, vertex_of: np.ndarray, n_snapped: int, n_split: int) -> TetMesh:
    if mb.extra_verts:
        verts = np.concatenate([mb.positions, np.asarray(mb.extra_verts)], axis=0)
    else:
        verts = mb.positions
    parts = [mb.base_tets[~mb.base_dead]]
    if mb.extra_tets:
        extra = np.asarray(mb.extra_tets, dtype=np.int64)
        alive = ~np.asarray(mb.extra_dead)
        parts.append(extra[alive])
    tets = np.concatenate(parts, axis=0)
    return _finalize_arrays(verts, tets, vertex_of, n_snapped, n_split)


def _finalize_arrays(verts: np.ndarray, tets: np.ndarray, vertex_of: np.ndarray,
                     n_snapped: int, n_split: int) -> TetMesh:
    # reorder: source vertices first, in input order (dedup -> first owner)
    NVold = verts.shape[0]
    order_src, seen = [], set()
    for nid in vertex_of:
        if int(nid) not in seen:
            seen.add(int(nid))
            order_src.append(int(nid))
    order_src = np.asarray(order_src, dtype=np.int64)
    is_src = np.zeros(NVold, dtype=bool)
    is_src[order_src] = True
    new_order = np.concatenate([order_src, np.nonzero(~is_src)[0]])
    remap = np.empty(NVold, dtype=np.int64)
    remap[new_order] = np.arange(NVold)
    verts = verts[new_order]
    tets = remap[tets]
    src_vertex = remap[vertex_of]

    # enforce positive orientation
    a, b, c, d = verts[tets[:, 0]], verts[tets[:, 1]], verts[tets[:, 2]], verts[tets[:, 3]]
    vol = np.einsum("ij,ij->i", np.cross(b - a, c - a), d - a) / 6.0
    neg = vol < 0
    tets[neg, 2], tets[neg, 3] = tets[neg, 3], tets[neg, 2].copy()

    # faces + signed adjacency (packed-int64 keys: NV < 2^21 always holds
    # for <= 96^3 lattices + splits, so three 21-bit ids fit one int64)
    opp = np.stack([tets[:, list(o)] for o in _OPP], axis=1)  # (NT, 4, 3) outward
    flat = opp.reshape(-1, 3)
    f0, f1, f2 = flat[:, 0], flat[:, 1], flat[:, 2]
    lo = np.minimum(np.minimum(f0, f1), f2)
    hi = np.maximum(np.maximum(f0, f1), f2)
    mid = f0 + f1 + f2 - lo - hi
    assert verts.shape[0] < (1 << 21), "face key packing requires NV < 2^21"
    key = (lo << 42) | (mid << 21) | hi
    order_k = np.argsort(key, kind="stable")
    sk = key[order_k]
    newgrp = np.ones(sk.shape[0], dtype=bool)
    newgrp[1:] = sk[1:] != sk[:-1]
    gid_sorted = np.cumsum(newgrp) - 1
    inv = np.empty_like(gid_sorted)
    inv[order_k] = gid_sorted
    first_idx = order_k[newgrp]
    faces = flat[first_idx]
    tet_face = inv.reshape(-1, 4)
    gface = faces[tet_face.reshape(-1)]
    same = _same_orientation(flat, gface)
    tet_face_sign = np.where(same, 1, -1).reshape(-1, 4).astype(np.int8)

    # vertex -> incident tets CSR
    NV = verts.shape[0]
    vt_rows = tets.reshape(-1)
    vt_tets = np.repeat(np.arange(tets.shape[0]), 4)
    order = np.argsort(vt_rows, kind="stable")
    vt_data = vt_tets[order]
    vt_indptr = np.searchsorted(vt_rows[order], np.arange(NV + 1))

    return TetMesh(
        vertices=verts,
        tets=tets,
        faces=faces,
        tet_face=tet_face,
        tet_face_sign=tet_face_sign,
        vt_indptr=vt_indptr,
        vt_data=vt_data,
        n_src=int(order_src.shape[0]),
        src_vertex=src_vertex,
        n_snapped=n_snapped,
        n_split=n_split,
        conforming=False,
    )


def _same_orientation(f1: np.ndarray, f2: np.ndarray) -> np.ndarray:
    """True where triangle f1 is an even permutation of f2 (row-wise)."""
    same = np.zeros(f1.shape[0], dtype=bool)
    for r in ((0, 1, 2), (1, 2, 0), (2, 0, 1)):
        same |= np.all(f1 == f2[:, r], axis=1)
    return same
