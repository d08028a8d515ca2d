"""Tet-domain pipeline: mesher invariants, FEM operators, device vs oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from shm3d.config import LevelSetConstraint, SignedHeatOptions
from shm3d.oracle import tet_reference as tet_oracle
from shm3d.tet import fem
from shm3d.tet.mesher import build_tet_domain
from shm3d.tet.solver import SignedHeatTetSolver

from conftest import make_icosphere


@pytest.fixture(scope="module")
def ico_mesh():
    return make_icosphere(2)


@pytest.fixture(scope="module")
def tet_domain(ico_mesh):
    return build_tet_domain(ico_mesh.vertices, scale=2.0, h_coef=0.0, mean_area=0.05)


# ---------------------------------------------------------------------------
# mesher invariants


def test_mesher_vertex_contract(tet_domain, ico_mesh):
    tm = tet_domain
    # exact source positions, source ids in the prefix
    np.testing.assert_allclose(tm.vertices[tm.src_vertex], ico_mesh.vertices, atol=0)
    assert (tm.src_vertex < tm.n_src).all()
    assert tm.n_src <= ico_mesh.vertices.shape[0]


def test_mesher_positive_volumes(tet_domain):
    vols = tet_domain.tet_volumes()
    assert (vols >= 0).all()
    # at most a measure-zero handful of degenerate (exactly coplanar) tets
    assert (vols <= 0).sum() <= 0.001 * tet_domain.n_tets + 2


def test_mesher_face_structure(tet_domain):
    tm = tet_domain
    cnt = np.bincount(tm.tet_face.reshape(-1), minlength=tm.n_faces)
    assert set(np.unique(cnt)) <= {1, 2}  # interior faces twice, boundary once
    # interior faces: the two incident tets see opposite orientations
    order = np.argsort(tm.tet_face.reshape(-1), kind="stable")
    signs = tm.tet_face_sign.reshape(-1)[order]
    fids = tm.tet_face.reshape(-1)[order]
    pair_starts = np.searchsorted(fids, np.nonzero(cnt == 2)[0])
    assert (signs[pair_starts] + signs[pair_starts + 1] == 0).all()


def test_mesher_outward_orientation(tet_domain):
    tm = tet_domain
    v, t = tm.vertices, tm.tets
    vols = tm.tet_volumes()
    ok_t = vols > 1e-12 * vols.max()
    fb = tm.face_barycenters()
    for j in range(4):
        f = tm.faces[tm.tet_face[:, j]]
        a, b, c = v[f[:, 0]], v[f[:, 1]], v[f[:, 2]]
        n = 0.5 * np.cross(a - c, b - c) * tm.tet_face_sign[:, j][:, None]
        d = fb[tm.tet_face[:, j]] - v[t[:, j]]
        side = np.einsum("ij,ij->i", n, d)
        assert (side[ok_t] > 0).all()


# ---------------------------------------------------------------------------
# FEM operators


def test_dual_laplacian_structure(tet_domain):
    dual = fem.build_dual_laplacian(tet_domain)
    L = dual.to_scipy()
    # symmetry and zero row sums
    assert abs(L - L.T).max() < 1e-10
    assert np.abs(L @ np.ones(L.shape[0])).max() < 1e-9
    # negative semi-definite on the regular part: x^T L x <= 0 for smooth x
    rng = np.random.default_rng(0)
    x = rng.normal(size=L.shape[0])
    # (the stuffing mesh can have a few negative off-diagonal weights from
    # slivers; the quadratic form on random vectors is still the solver-facing
    # property that matters)
    assert x @ (L @ x) < 0


def test_dual_laplacian_regular_lattice_matches_fd():
    """On an unsnapped Kuhn lattice the dual Laplacian of a linear function
    vanishes (linear precision)."""
    pts = np.array([[0.5, 0.5, 0.5], [-0.5, -0.25, -0.125]])
    tm = build_tet_domain(pts, scale=1.0, h_coef=0.0, resolution=8)
    dual = fem.build_dual_laplacian(tm)
    for coef in ((1.0, 0, 0), (0.3, -0.7, 1.1)):
        f = tm.vertices @ np.asarray(coef)
        Lf = dual.matvec_np(f)
        # interior vertices only (boundary rows see the domain cut)
        interior = np.zeros(tm.n_vertices, dtype=bool)
        interior[tm.tets.reshape(-1)] = True
        bnd = np.unique(tm.faces[np.bincount(tm.tet_face.reshape(-1),
                                             minlength=tm.n_faces) == 1])
        interior[bnd] = False
        assert np.abs(Lf[interior]).max() < 1e-9


def test_divergence_is_adjoint_of_gradient(tet_domain):
    """div entries satisfy: div(Y) . phi == sum_t Y_t . (sum_ij w_ij e_ij phi
    terms) — check via the identity div = G^T with G the weighted gradient
    implied by the same arrays."""
    dual = fem.build_dual_laplacian(tet_domain)
    rng = np.random.default_rng(1)
    Y = rng.normal(size=(tet_domain.n_tets, 3))
    phi = rng.normal(size=tet_domain.n_vertices)
    lhs = float(phi @ dual.divergence_np(Y))
    # G phi per tet: sum over entries with row r, tet t: gvec * phi[r]
    G = np.zeros((tet_domain.n_tets, 3))
    np.add.at(G, dual.div_tets, dual.div_gvec * phi[dual.div_rows][:, None])
    rhs = float(np.sum(G * Y))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-12)


def test_cr_operators_structure(tet_domain):
    cr = fem.build_cr_operators(tet_domain)
    L = cr.L_scipy()
    M = cr.M_scipy()
    assert abs(L - L.T).max() < 1e-10
    assert np.abs(L @ np.ones(L.shape[0])).max() < 1e-8
    # CR mass row sums integrate 1 over the volume: total = sum vols
    vols = np.abs(tet_domain.tet_volumes())
    np.testing.assert_allclose(M.sum(), ((0.4 - 0.05 * 3) * 4 * vols).sum(), rtol=1e-10)


# ---------------------------------------------------------------------------
# device solver vs oracle


@pytest.mark.parametrize("use_cr", [True, False],
                         ids=["cr-conforming", "vertex-path"])
@pytest.mark.parametrize("mode", [
    LevelSetConstraint.ZERO_SET,
    LevelSetConstraint.NONE,
    LevelSetConstraint.MULTIPLE,
])
def test_tet_device_matches_oracle(mode, use_cr, ico_mesh):
    """use_cr=True exercises the reference's default conforming CR Step 3
    (signed_heat_tet_solver.cpp:234-317); use_cr=False the vertex path
    (:161-232) on the same conforming mesh."""
    opts = SignedHeatOptions(
        dtype="float64", level_set_constraint=mode,
        use_crouzeix_raviart=use_cr,
        solver_tol=1e-12, solver_maxiter=60000, refine_steps=0,
    )
    expected = tet_oracle.solve_tet(ico_mesh, opts)
    got = SignedHeatTetSolver().compute_distance(ico_mesh, opts)
    rel = np.linalg.norm(got.phi - expected.phi) / np.linalg.norm(expected.phi)
    assert rel < 1e-6, f"mode={mode}: rel L2 {rel}"


def test_tet_greedy_matches_oracle(ico_mesh):
    opts = SignedHeatOptions(dtype="float64", fast_integration=True)
    expected = tet_oracle.solve_tet(ico_mesh, opts)
    got = SignedHeatTetSolver().compute_distance(ico_mesh, opts)
    rel = np.linalg.norm(got.phi - expected.phi) / np.linalg.norm(expected.phi)
    assert rel < 1e-10, f"rel L2 {rel}"


def test_tet_greedy_multiple_singleton_component(ico_mesh):
    """ADVICE round 1 (medium): a singleton component (isolated source vertex,
    no constraint row) must be integrated as its own level set, not
    overwritten with component 0's locked value."""
    from shm3d.io.mesh_io import Mesh
    from shm3d.geometry import surface as surf

    verts = np.concatenate([ico_mesh.vertices, [[2.5, 0.0, 0.0]]], axis=0)
    faces = [list(f) for f in ico_mesh.triangles()]
    mesh = Mesh.from_face_lists(verts, faces)
    labels = surf.connected_components_vertices(mesh)
    assert labels.max() == 1  # sphere component + the isolated vertex

    opts = SignedHeatOptions(
        dtype="float64", fast_integration=True,
        level_set_constraint=LevelSetConstraint.MULTIPLE,
    )
    res = SignedHeatTetSolver().compute_distance(mesh, opts)
    tm = res.mesh
    phi_src = res.phi[tm.src_vertex]
    sphere_vals = phi_src[labels == 0]
    iso_val = phi_src[labels == 1][0]
    # each component locks ONE value; members copy it exactly
    assert np.ptp(sphere_vals) == 0.0
    # the isolated vertex sits ~1.5 away from the sphere: its line-integrated
    # value must differ clearly from the sphere's locked value
    assert abs(iso_val - sphere_vals[0]) > 0.2


def test_component_rows_dedup_coincident_vertices(ico_mesh):
    """ADVICE round 1 (low): two coincident non-root input vertices merged to
    the same mesh vertex must emit ONE (root, member) row, keeping the
    MULTIPLE KKT matrix nonsingular."""
    from shm3d.tet.solver import _component_rows

    labels = np.array([0, 0, 0, 0])
    src_vertex = np.array([7, 9, 9, 11])  # vertices 1 and 2 merged to 9
    roots, members = _component_rows(labels, src_vertex)
    assert list(roots) == [7, 7]
    assert list(members) == [9, 11]


def test_tet_point_cloud_path(ico_mesh):
    from shm3d.io.mesh_io import PointCloud

    v = ico_mesh.vertices
    pc = PointCloud(v, v / np.linalg.norm(v, axis=1, keepdims=True))
    opts = SignedHeatOptions(dtype="float64", solver_tol=1e-12, solver_maxiter=20000)
    expected = tet_oracle.solve_tet(pc, opts)
    got = SignedHeatTetSolver().compute_distance(pc, opts)
    rel = np.linalg.norm(got.phi - expected.phi) / np.linalg.norm(expected.phi)
    assert rel < 1e-6, f"rel L2 {rel}"


def test_tet_sdf_sign_structure(ico_mesh):
    """Signed distance to the unit icosphere on the vertex path: negative at
    center region, positive outside, zero exactly at source vertices
    (Dirichlet elimination pins them; the CR default is covered below)."""
    opts = SignedHeatOptions(dtype="float64", solver_tol=1e-10, solver_maxiter=20000,
                             use_crouzeix_raviart=False)
    res = SignedHeatTetSolver().compute_distance(ico_mesh, opts)
    tm = res.mesh
    r = np.linalg.norm(tm.vertices, axis=1)
    phi = res.phi
    inside = phi[r < 0.5]
    outside = phi[r > 1.5]
    assert np.median(inside) < 0
    assert np.median(outside) > 0
    # zero on the source (Dirichlet pinned exactly)
    assert np.abs(res.phi_at_sources()).max() < 1e-12


def test_tet_sdf_sign_structure_cr_default(ico_mesh):
    """Default options route triangle meshes through the conforming CR path
    (reference default, signed_heat_tet_solver.cpp:234-317): source values
    are only near zero (L2 projection of pinned face DOFs), signs correct."""
    opts = SignedHeatOptions(dtype="float64", solver_tol=1e-10, solver_maxiter=20000)
    solver = SignedHeatTetSolver()
    res = solver.compute_distance(ico_mesh, opts)
    cached = next(iter(solver._cache.values()))
    assert res.mesh.conforming, "conforming recovery should succeed on the icosphere"
    assert cached["cr_path"] is not None, "CR path should be the active default"
    tm = res.mesh
    r = np.linalg.norm(tm.vertices, axis=1)
    assert np.median(res.phi[r < 0.5]) < 0
    assert np.median(res.phi[r > 1.5]) > 0
    assert np.abs(res.phi_at_sources()).max() < 0.1 * np.abs(res.phi).max()


def test_native_mesher_matches_python(ico_mesh):
    """The C++ core and the NumPy implementation are the same algorithm and
    must produce identical meshes."""
    from shm3d.tet import native

    if not native.available():
        pytest.skip("native library not built (make -C native)")
    tm_native = build_tet_domain(ico_mesh.vertices, 2.0, 0.0, mean_area=0.05)
    saved = (native._LIB, native._TRIED)
    try:
        native._LIB, native._TRIED = None, True
        tm_py = build_tet_domain(ico_mesh.vertices, 2.0, 0.0, mean_area=0.05)
    finally:
        native._LIB, native._TRIED = saved
    np.testing.assert_array_equal(tm_native.vertices, tm_py.vertices)
    np.testing.assert_array_equal(tm_native.tets, tm_py.tets)
    np.testing.assert_array_equal(tm_native.src_vertex, tm_py.src_vertex)


def test_tet_polygon_mesh_fallback():
    """Polygon meshes route through the reference's vertex fallback path
    (vertices as point cloud, signed_heat_tet_solver.cpp:24-33)."""
    from shm3d.io.mesh_io import Mesh

    # a cube with quad faces
    v = np.array([[i, j, k] for k in (0., 1) for j in (0., 1) for i in (0., 1)])
    quads = [[0, 2, 3, 1], [4, 5, 7, 6], [0, 1, 5, 4], [2, 6, 7, 3],
             [0, 4, 6, 2], [1, 3, 7, 5]]  # outward orientation
    mesh = Mesh.from_face_lists(v, quads)
    assert not mesh.is_triangular
    opts = SignedHeatOptions(dtype="float64", solver_tol=1e-10)
    res = SignedHeatTetSolver().compute_distance(mesh, opts)
    assert np.isfinite(res.phi).all()
    assert np.abs(res.phi_at_sources()).max() < 1e-12  # Dirichlet pinned
    center = np.linalg.norm(res.mesh.vertices - 0.5, axis=1)
    assert np.median(res.phi[center < 0.25]) < 0
    assert np.median(res.phi[center > 1.2]) > 0


def test_tet_disk_cache_roundtrip(ico_mesh, tmp_path, monkeypatch):
    """A second tet solver instance reloads mesh/FEM/CR artifacts from disk
    and produces identical phi (SURVEY.md §5.4 across processes)."""
    from shm3d.tet.solver import SignedHeatTetSolver

    monkeypatch.setenv("SHM3D_CACHE_DIR", str(tmp_path))
    opts = SignedHeatOptions(dtype="float64")
    r1 = SignedHeatTetSolver().compute_distance(ico_mesh, opts)
    assert len(list(tmp_path.glob("tree_*/manifest.json"))) == 1
    r2 = SignedHeatTetSolver().compute_distance(ico_mesh, opts)  # disk hit
    np.testing.assert_allclose(r2.phi, r1.phi, rtol=0, atol=1e-12)
    assert r2.mesh.conforming == r1.mesh.conforming
    r3 = SignedHeatTetSolver().compute_distance(ico_mesh, opts.with_(disk_cache=False))
    np.testing.assert_allclose(r3.phi, r1.phi, rtol=0, atol=1e-12)


def test_native_loader_search_order(tmp_path, monkeypatch):
    """The ctypes loader honors SHM3D_NATIVE_LIB (warning when it points
    nowhere), then the source-tree build, then the in-package wheel
    location (shm3d/tet/native.py)."""
    from shm3d.tet import native

    import os
    import shutil
    import warnings

    saved = (native._LIB, native._TRIED)
    src_build = os.path.abspath(os.path.join(
        os.path.dirname(native.__file__), "..", "..", "native",
        "libshm3d_native.so"))
    if not os.path.exists(src_build):
        pytest.skip("native library not built (make -C native)")
    try:
        # a nonexistent env override warns and falls through to the
        # source-tree build
        native._LIB, native._TRIED = None, False
        monkeypatch.setenv("SHM3D_NATIVE_LIB", str(tmp_path / "missing.so"))
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            assert native.available()
        assert any("SHM3D_NATIVE_LIB" in str(w.message) for w in caught)
        assert native._LIB._name == src_build
        # an explicit env override pointing at a real library wins
        alt = tmp_path / "alt.so"
        shutil.copy(src_build, alt)
        native._LIB, native._TRIED = None, False
        monkeypatch.setenv("SHM3D_NATIVE_LIB", str(alt))
        assert native.available()
        assert native._LIB._name == str(alt)
        # source-tree build shadows the in-package wheel snapshot: simulate
        # a package dir whose _native/ holds a copy, with the real source
        # tree intact — the source build must win
        monkeypatch.delenv("SHM3D_NATIVE_LIB", raising=False)
        native._LIB, native._TRIED = None, False
        assert native.available()
        assert native._LIB._name == src_build
    finally:
        native._LIB, native._TRIED = saved
