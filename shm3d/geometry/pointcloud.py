"""Oriented-point-cloud geometry: local triangulation and dual-area weights.

The reference gets per-point quadrature weights from geometry-central's tufted
triangulation of the point cloud (``requireTuftedTriangulation`` +
``vertexDualAreas``, /root/reference/src/signed_heat_grid_solver.cpp:149-151,
/root/reference/src/signed_heat_tet_solver.cpp:96-97).  That construction
(Sharp & Crane, "A Laplacian for Nonmanifold Triangle Meshes", 2020) builds a
per-point local triangulation fan from k nearest neighbors projected to a
tangent plane, takes the union as a triangle soup, and measures barycentric
dual areas on it.

We implement the same slice here as a host NumPy/SciPy module (it is a
preprocessing weight, not a hot path — SURVEY.md §2d).  Deviation from
geometry-central is documented: we skip the tufted-cover gluing and intrinsic
mollification, which only affect the *global scale* of areas (cancelled by the
per-query normalization in Step 2 and by the weighted averages) and the edge
multiplicity in the mean-edge-length timestep heuristic.
"""

from __future__ import annotations

import dataclasses

import numpy as np
from scipy.spatial import cKDTree

_K_NEIGHBORS = 30  # geometry-central's default point-cloud neighborhood size.


@dataclasses.dataclass
class LocalTriangulation:
    """Triangle soup from per-point neighborhood fans.

    triangles: (T, 3) int64 indices into the point set.
    areas:     (T,) float64 triangle areas.
    dual_areas:(P,) float64 barycentric dual areas (1/3 of incident areas).
    mean_edge_length: float, mean over all fan edges (timestep heuristic
        analog of meanEdgeLength(tuftedGeom),
        /root/reference/src/signed_heat_grid_solver.cpp:151).
    """

    triangles: np.ndarray
    areas: np.ndarray
    dual_areas: np.ndarray
    mean_edge_length: float


def local_triangulation(positions: np.ndarray, k: int = _K_NEIGHBORS) -> LocalTriangulation:
    P = positions.shape[0]
    k = min(k, P - 1)
    if k < 2:
        raise ValueError("point cloud too small for local triangulation")
    tree = cKDTree(positions)
    # neighbor index 0 is the point itself.
    _, nbrs = tree.query(positions, k=k + 1, workers=-1)
    nbrs = nbrs[:, 1:]

    # Batched over all P points at once (a per-point Python loop costs ~11 s
    # at 52k points; this path runs inside every cold solve's precompute).
    rel = positions[nbrs] - positions[:, None, :]            # (P, k, 3)
    cov = np.einsum("pki,pkj->pij", rel, rel)                # (P, 3, 3)
    # Tangent plane via PCA: normal = least-significant principal axis.
    _, vecs = np.linalg.eigh(cov)                            # batched eigh
    n = vecs[:, :, 0]
    e1 = vecs[:, :, 2]
    e2 = np.cross(n, e1)
    # Angular sort of neighbors in the tangent plane.
    ang = np.arctan2(
        np.einsum("pki,pi->pk", rel, e2), np.einsum("pki,pi->pk", rel, e1)
    )
    order = np.argsort(ang, axis=1)
    ring = np.take_along_axis(nbrs, order, axis=1)           # (P, k)
    # Fan triangles between angularly consecutive neighbors (closed loop).
    a = np.repeat(np.arange(P, dtype=np.int64), ring.shape[1])
    b = ring.reshape(-1)
    c = np.concatenate([ring[:, 1:], ring[:, :1]], axis=1).reshape(-1)
    triangles = np.stack([a, b, c], axis=1)
    # Drop degenerate triangles with repeated vertices.
    good = (triangles[:, 0] != triangles[:, 1]) & (triangles[:, 1] != triangles[:, 2]) & (
        triangles[:, 0] != triangles[:, 2]
    )
    triangles = triangles[good]

    pa = positions[triangles[:, 0]]
    pb = positions[triangles[:, 1]]
    pc = positions[triangles[:, 2]]
    areas = 0.5 * np.linalg.norm(np.cross(pb - pa, pc - pa), axis=1)

    dual = np.zeros(P, dtype=np.float64)
    for kcorner in range(3):
        np.add.at(dual, triangles[:, kcorner], areas / 3.0)

    edge_len = (
        np.linalg.norm(pb - pa, axis=1).sum()
        + np.linalg.norm(pc - pb, axis=1).sum()
        + np.linalg.norm(pa - pc, axis=1).sum()
    ) / (3 * len(triangles))
    return LocalTriangulation(triangles, areas, dual, float(edge_len))


def point_dual_areas(positions: np.ndarray, k: int = _K_NEIGHBORS) -> np.ndarray:
    return local_triangulation(positions, k).dual_areas


def connected_components(positions: np.ndarray, k: int = _K_NEIGHBORS) -> np.ndarray:
    """Per-point component labels over the local-triangulation neighbor graph
    (the reference walks the tufted triangulation's vertex adjacency for its
    Multiple-constraint rows, signed_heat_tet_solver.cpp:353-381).  Labels
    are numbered in order of first appearance."""
    import scipy.sparse as sp
    import scipy.sparse.csgraph as csgraph

    tri = local_triangulation(positions, k).triangles
    P = positions.shape[0]
    rows = np.concatenate([tri[:, 0], tri[:, 1], tri[:, 2]])
    cols = np.concatenate([tri[:, 1], tri[:, 2], tri[:, 0]])
    g = sp.coo_matrix((np.ones(rows.shape[0]), (rows, cols)), shape=(P, P))
    _, labels = csgraph.connected_components(g, directed=False)
    # renumber by first appearance
    first = {}
    out = np.empty(P, dtype=np.int64)
    for i, l in enumerate(labels):
        if l not in first:
            first[l] = len(first)
        out[i] = first[l]
    return out
