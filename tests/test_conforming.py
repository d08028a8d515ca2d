"""Conforming surface recovery (shm3d.tet.conforming + native core).

The reference obtains surface-conforming tet meshes from TetGen's
constrained Delaunay (TETFLAGS_PRESERVE,
/root/reference/src/signed_heat_tet_solver.cpp:885-1016); here the Kuhn
lattice is made conforming by Steiner insertion on the constraints.  These
tests check the geometric contract the CR solver relies on."""

import numpy as np
import pytest

from shm3d.geometry.procedural import make_icosphere
from shm3d.tet import native
from shm3d.tet.mesher import build_tet_domain


@pytest.fixture(scope="module")
def conforming_mesh():
    mesh = make_icosphere(1)
    tm = build_tet_domain(mesh.vertices, scale=2.0, h_coef=0.0, mean_area=0.05,
                          src_faces=mesh.triangles())
    return mesh, tm


def test_recovery_succeeds_and_is_valid(conforming_mesh):
    mesh, tm = conforming_mesh
    assert tm.conforming
    tm.validate()  # positive volumes, 2-tet faces with opposite orientations
    assert tm.surface_faces is not None and len(tm.surface_faces) >= len(mesh.triangles())


def test_vertex_index_contract(conforming_mesh):
    """Source vertices occupy mesh ids 0..V-1 (reference contract,
    signed_heat_tet_solver.cpp:169-180).  Conforming builds may displace a
    source onto a lattice feature by <= ~1e-5 cell (the recovery tolerance
    ladder; TetGen merges nearby points with a tolerance the same way) —
    far below the O(h^2) FEM discretization error."""
    mesh, tm = conforming_mesh
    dev = np.abs(tm.vertices[tm.src_vertex] - mesh.vertices).max()
    assert dev < 1e-4, dev
    assert tm.src_vertex.max() < tm.n_src


def test_area_certificate(conforming_mesh):
    """Per input face, sub-face areas sum to the face area: the surface is
    exactly tiled (faces subdivided, never displaced)."""
    mesh, tm = conforming_mesh
    tris = mesh.triangles()
    sub = tm.face_areas()[tm.surface_faces]
    per = np.zeros(tris.shape[0])
    np.add.at(per, tm.surface_parent, sub)
    t = mesh.vertices[tris]
    ref = 0.5 * np.linalg.norm(np.cross(t[:, 1] - t[:, 0], t[:, 2] - t[:, 0]), axis=1)
    assert (np.abs(per - ref) / ref).max() < 1e-9


def test_subfaces_on_parent_planes(conforming_mesh):
    """Every sub-face vertex lies on its parent input face's plane."""
    mesh, tm = conforming_mesh
    tris = mesh.triangles()
    t = mesh.vertices[tris]
    n = np.cross(t[:, 1] - t[:, 0], t[:, 2] - t[:, 0])
    n /= np.linalg.norm(n, axis=1, keepdims=True)
    sub = tm.vertices[tm.faces[tm.surface_faces]]  # (S, 3, 3)
    a = t[tm.surface_parent, 0]
    d = np.abs(np.einsum("sij,sj->si", sub - a[:, None, :], n[tm.surface_parent]))
    assert d.max() < 1e-9


def test_surface_orientation_signs(conforming_mesh):
    """surface_orient flips stored face normals onto the input face normals
    (reference orientation matching :983-1011)."""
    mesh, tm = conforming_mesh
    tris = mesh.triangles()
    t = mesh.vertices[tris]
    n_par = np.cross(t[:, 1] - t[:, 0], t[:, 2] - t[:, 0])
    sub = tm.vertices[tm.faces[tm.surface_faces]]
    n_sub = np.cross(sub[:, 1] - sub[:, 0], sub[:, 2] - sub[:, 0])
    dots = np.einsum("ij,ij->i", n_sub * tm.surface_orient[:, None],
                     n_par[tm.surface_parent])
    assert (dots > 0).all()


def test_recovery_failure_falls_back():
    """Degenerate input (all faces zero-area) degrades to the non-conforming
    vertex-path mesh with a warning, mirroring the reference's TetGen-failure
    fallback (signed_heat_tet_solver.cpp:24-33,966-977)."""
    pts = np.array([[0.0, 0, 0], [1, 0, 0], [2, 0, 0], [0.5, 1, 0]])
    faces = np.array([[0, 1, 1]])  # degenerate triangle
    with pytest.warns(UserWarning, match="conforming"):
        tm = build_tet_domain(pts, scale=2.0, h_coef=0.0, resolution=8,
                              src_faces=faces)
    assert not tm.conforming
    assert tm.surface_faces is None


def test_native_conforming_matches_python(conforming_mesh, monkeypatch):
    """The C++ tolerance-ladder recovery and the NumPy implementation are
    the same algorithm (bit-identical arithmetic order) and must produce
    identical meshes.  The exact-predicate builder (the default) is a
    DIFFERENT algorithm — pin the ladder entry for this parity check."""
    if not native.available() or not native.conforming_available():
        pytest.skip("native library not built (make -C native)")
    mesh, _ = conforming_mesh
    monkeypatch.setenv("SHM3D_EXACT_RECOVERY", "0")
    tm_native = build_tet_domain(mesh.vertices, scale=2.0, h_coef=0.0,
                                 mean_area=0.05, src_faces=mesh.triangles())
    saved = (native._LIB, native._TRIED)
    try:
        native._LIB, native._TRIED = None, True
        tm_py = build_tet_domain(mesh.vertices, scale=2.0, h_coef=0.0,
                                 mean_area=0.05, src_faces=mesh.triangles())
    finally:
        native._LIB, native._TRIED = saved
    for f in ("vertices", "tets", "src_vertex", "faces", "tet_face",
              "tet_face_sign", "surface_faces", "surface_parent", "surface_orient"):
        np.testing.assert_array_equal(getattr(tm_native, f), getattr(tm_py, f),
                                      err_msg=f)
