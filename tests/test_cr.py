"""Crouzeix-Raviart conforming-mesh path (the reference's default tet path).

Fixture: a lattice-aligned cube surface whose triangles coincide exactly
with tet faces of the stuffing lattice, giving a genuinely conforming mesh.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from shm3d.config import LevelSetConstraint, SignedHeatOptions
from shm3d.oracle import reference as grid_oracle
from shm3d.oracle import tet_reference as tet_oracle
from shm3d.geometry import sources as src_mod
from shm3d.io.mesh_io import Mesh
from shm3d.tet.cr_solver import CRPath, find_surface_faces
from shm3d.tet.mesher import build_tet_domain


def _conforming_fixture():
    """Inner-cube surface on an 8^3 Kuhn lattice over [-1, 1]^3."""
    # boundary nodes of the central 4^3 block (coords multiples of 0.25 in
    # [-0.5, 0.5], on the block surface)
    r = np.arange(-2, 3) * 0.25
    K, J, I = np.meshgrid(r, r, r, indexing="ij")
    pts = np.stack([I, J, K], axis=-1).reshape(-1, 3)
    on_surf = np.abs(pts).max(axis=1) >= 0.5 - 1e-12
    pts = pts[on_surf]
    scale = 1.0 / (np.linalg.norm(pts, axis=1).max())  # cube half-side -> 1.0
    tm = build_tet_domain(pts, scale=scale, h_coef=0.0, resolution=8)
    assert tm.n_split == 0, "fixture must snap cleanly"
    assert np.abs(tm.vertices[tm.src_vertex] - pts).max() == 0.0

    # surface triangles: tet faces whose 3 vertices lie on one cube facet
    v = tm.vertices
    faces = tm.faces
    tri = v[faces]  # (NF, 3, 3)
    is_surf = np.zeros(faces.shape[0], dtype=bool)
    for axis in range(3):
        for sgn in (-0.5, 0.5):
            onplane = np.abs(tri[:, :, axis] - sgn) < 1e-12
            inside = np.abs(tri).max(axis=2).max(axis=1) <= 0.5 + 1e-12
            is_surf |= onplane.all(axis=1) & inside
    surf_ids = np.nonzero(is_surf)[0]
    src_faces = faces[surf_ids].copy()
    # orient each source triangle OUTWARD from the inner cube (the global
    # tet-face orientation is arbitrary first-seen)
    tri_s = v[src_faces]
    n = np.cross(tri_s[:, 1] - tri_s[:, 0], tri_s[:, 2] - tri_s[:, 0])
    centers = tri_s.mean(axis=1)
    flip = np.einsum("ij,ij->i", n, centers) < 0  # outward = away from origin
    src_faces[flip] = src_faces[flip][:, [0, 2, 1]]
    # build the source Mesh object over the compacted vertex set
    used = np.unique(src_faces)
    remap = -np.ones(tm.n_vertices, dtype=np.int64)
    remap[used] = np.arange(used.shape[0])
    src_mesh = Mesh.from_face_lists(v[used], [list(remap[f]) for f in src_faces])
    return tm, src_mesh, surf_ids, src_faces


@pytest.fixture(scope="module")
def conforming():
    return _conforming_fixture()


def test_conforming_fixture_is_conforming(conforming):
    tm, src_mesh, surf_ids, src_faces = conforming
    found = find_surface_faces(tm, src_faces)
    assert found is not None
    np.testing.assert_array_equal(np.sort(found), np.sort(surf_ids))


def test_cr_zeroset_matches_oracle(conforming):
    tm, src_mesh, surf_ids, src_faces = conforming
    src = src_mod.from_mesh(src_mesh)
    lam = 4.0
    Y = grid_oracle.diffuse_vector_field(tm.barycenters(), src, lam)
    expected = tet_oracle.solve_cr_zeroset(tm, surf_ids, Y)

    path = CRPath(tm, surf_ids, dtype=jnp.float64)
    opts = SignedHeatOptions(dtype="float64", solver_tol=1e-13, solver_maxiter=30000)
    got = np.asarray(path.integrate(jnp.asarray(Y), opts))
    rel = np.linalg.norm(got - expected) / np.linalg.norm(expected)
    assert rel < 1e-6, f"rel {rel}"


def test_cr_zero_on_surface(conforming):
    tm, src_mesh, surf_ids, src_faces = conforming
    src = src_mod.from_mesh(src_mesh)
    Y = grid_oracle.diffuse_vector_field(tm.barycenters(), src, 4.0)
    path = CRPath(tm, surf_ids, dtype=jnp.float64)
    opts = SignedHeatOptions(dtype="float64", solver_tol=1e-12, solver_maxiter=30000)
    phi_v = np.asarray(path.integrate(jnp.asarray(Y), opts))
    # phi interpolated at surface-face barycenters ~ 0 (face dofs pinned;
    # vertex projection smooths, so tolerance is loose)
    fb = tm.face_barycenters()[surf_ids]
    vals = phi_v[src_faces].mean(axis=1)
    assert np.abs(vals).max() < 0.05 * np.abs(phi_v).max()


def test_cr_invariant_to_source_face_winding(conforming):
    """find_surface_faces drops the source-face orientation where the
    reference matches it (signed_heat_tet_solver.cpp:983-1011); this pins
    the claim that the drop is harmless.  Re-wind a random subset of the
    source triangles (reversed and rotated windings) with the geometry
    unchanged: the matched tet-face ids and the resulting phi must be
    bit-identical — a silent global/local sign flip would show here."""
    tm, src_mesh, surf_ids, src_faces = conforming
    rng = np.random.default_rng(11)
    scrambled = src_faces.copy()
    flip = rng.random(len(scrambled)) < 0.5
    scrambled[flip] = scrambled[flip][:, [0, 2, 1]]  # reversed orientation
    rot = rng.random(len(scrambled)) < 0.5
    scrambled[rot] = scrambled[rot][:, [1, 2, 0]]    # same orientation, rotated
    found = find_surface_faces(tm, scrambled)
    assert found is not None
    np.testing.assert_array_equal(np.sort(found), np.sort(surf_ids))

    src = src_mod.from_mesh(src_mesh)
    Y = grid_oracle.diffuse_vector_field(tm.barycenters(), src, 4.0)
    opts = SignedHeatOptions(dtype="float64", solver_tol=1e-12,
                             solver_maxiter=30000)
    phi_ref = np.asarray(
        CRPath(tm, np.sort(surf_ids), dtype=jnp.float64).integrate(
            jnp.asarray(Y), opts))
    phi_scr = np.asarray(
        CRPath(tm, np.sort(found), dtype=jnp.float64).integrate(
            jnp.asarray(Y), opts))
    np.testing.assert_array_equal(phi_scr, phi_ref)


def test_solver_autodetects_conforming_mesh(conforming):
    """End-to-end: feeding the lattice-aligned surface through the normal
    solver API takes the CR path automatically (reference default)."""
    from shm3d.tet.solver import SignedHeatTetSolver

    tm, src_mesh, surf_ids, src_faces = conforming
    opts = SignedHeatOptions(dtype="float64", solver_tol=1e-12, solver_maxiter=30000,
                             scale=1.0 / 0.8660254037844386)
    solver = SignedHeatTetSolver()
    res = solver.compute_distance(src_mesh, opts)
    cached = next(iter(solver._cache.values()))
    assert cached["cr_path"] is not None, "CR path should be active"
    assert np.isfinite(res.phi).all()
    # sign structure: inside the inner cube negative, outside positive
    r = np.abs(res.mesh.vertices).max(axis=1)
    assert np.median(res.phi[r < 0.3]) < 0
    assert np.median(res.phi[r > 0.8]) > 0
