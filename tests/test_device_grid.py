"""Device (JAX) grid path vs the float64 oracle.

Runs on the CPU backend with x64 enabled (conftest), so the device pipeline's
algorithmic parity is separated from TPU float32 precision effects (which are
exercised separately in float32 tests with looser tolerances).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from shm3d.config import SignedHeatOptions
from shm3d.domains import grid as griddom
from shm3d.ops import stencil
from shm3d.ops.yukawa import yukawa_field_xla, yukawa_field_pallas
from shm3d.oracle import reference as oracle
from shm3d.solve import krylov
from shm3d.solvers.grid import GridSolver

from conftest import make_icosphere


# ---------------------------------------------------------------------------
# stencil ops vs scipy operator construction


def _rand_grid(n=6, cell=0.37, seed=0):
    g = griddom.GridSpec((0.1, -0.2, 0.3), cell, n)
    rng = np.random.default_rng(seed)
    return g, rng


def test_laplacian_apply_matches_scipy():
    g, rng = _rand_grid()
    u = rng.normal(size=g.total_nodes)
    expected = griddom.laplacian_matrix(g) @ u
    got = stencil.laplacian_apply(jnp.asarray(u.reshape(g.shape)), g.cell_size)
    np.testing.assert_allclose(np.asarray(got).reshape(-1), expected, atol=1e-10)


def test_laplacian_diagonal_matches_scipy():
    g, _ = _rand_grid()
    L = griddom.laplacian_matrix(g)
    got = stencil.laplacian_diagonal(g.shape, g.cell_size, dtype=jnp.float64)
    np.testing.assert_allclose(np.asarray(got).reshape(-1), L.diagonal(), atol=1e-12)


def test_gradient_apply_matches_scipy():
    g, rng = _rand_grid(n=5, cell=0.21)
    u = rng.normal(size=g.total_nodes)
    expected = (griddom.gradient_matrix(g) @ u).reshape(-1, 3)
    got = stencil.gradient_apply(jnp.asarray(u.reshape(g.shape)), g.cell_size)
    np.testing.assert_allclose(np.asarray(got).reshape(-1, 3), expected, atol=1e-12)


def test_divergence_apply_matches_scipy():
    g, rng = _rand_grid(n=5)
    Y = rng.normal(size=(g.total_nodes, 3))
    expected = griddom.gradient_matrix(g).T @ Y.reshape(-1)
    got = stencil.divergence_apply(jnp.asarray(Y.reshape(*g.shape, 3)), g.cell_size)
    np.testing.assert_allclose(np.asarray(got).reshape(-1), expected, atol=1e-12)


# ---------------------------------------------------------------------------
# Yukawa field


def test_yukawa_xla_matches_oracle(small_icosphere):
    from shm3d.geometry import sources as src_mod

    src = src_mod.from_mesh(small_icosphere)
    rng = np.random.default_rng(3)
    q = rng.uniform(-2, 2, size=(257, 3))
    lam = 3.1
    expected = oracle.diffuse_vector_field(q, src, lam)
    got = yukawa_field_xla(
        jnp.asarray(q), jnp.asarray(src.points), jnp.asarray(src.vectors()), lam, q_tile=64
    )
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-10, atol=1e-12)


def test_yukawa_pallas_interpret_matches_xla(small_icosphere):
    """Matched-precision (f64) comparison: validates the Pallas kernel's
    block/padding/normalization structure without f32 accumulation noise
    (f32 reordering error near vector cancellation is exercised separately)."""
    from shm3d.geometry import sources as src_mod

    src = src_mod.from_mesh(small_icosphere)
    rng = np.random.default_rng(4)
    q = rng.uniform(-2, 2, size=(130, 3))
    lam = 2.0
    expected = yukawa_field_xla(
        jnp.asarray(q, jnp.float64),
        jnp.asarray(src.points, jnp.float64),
        jnp.asarray(src.vectors(), jnp.float64),
        lam,
    )
    got = yukawa_field_pallas(
        jnp.asarray(q, jnp.float64),
        jnp.asarray(src.points, jnp.float64),
        jnp.asarray(src.vectors(), jnp.float64),
        lam,
        q_tile=64,
        s_block=32,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), rtol=1e-12, atol=1e-12)


def test_yukawa_pallas_interpret_f32_sane(small_icosphere):
    """f32 interpret run stays within f32-cancellation error of the f64
    oracle (normalization amplifies noise where |X| is small)."""
    from shm3d.geometry import sources as src_mod

    src = src_mod.from_mesh(small_icosphere)
    rng = np.random.default_rng(4)
    q = rng.uniform(-2, 2, size=(130, 3))
    lam = 2.0
    f64 = oracle.diffuse_vector_field(q, src, lam)
    got = yukawa_field_pallas(
        jnp.asarray(q, jnp.float32),
        jnp.asarray(src.points, jnp.float32),
        jnp.asarray(src.vectors(), jnp.float32),
        lam,
        q_tile=64,
        s_block=32,
        interpret=True,
    )
    assert np.abs(np.asarray(got, np.float64) - f64).max() < 2e-2


# ---------------------------------------------------------------------------
# Krylov solvers


def test_cg_solves_spd():
    rng = np.random.default_rng(5)
    A = rng.normal(size=(40, 40))
    A = A @ A.T + 40 * np.eye(40)
    b = rng.normal(size=40)
    Aj = jnp.asarray(A)
    res = krylov.cg(lambda x: Aj @ x, jnp.asarray(b), tol=1e-12, maxiter=200)
    np.testing.assert_allclose(np.asarray(res.x), np.linalg.solve(A, b), rtol=1e-8)


def test_minres_solves_symmetric_indefinite():
    rng = np.random.default_rng(6)
    B = rng.normal(size=(30, 30))
    A = (B + B.T) / 2 + np.diag(np.linspace(-5, 5, 30))
    b = rng.normal(size=30)
    Aj = jnp.asarray(A)
    res = krylov.minres(lambda x: Aj @ x, jnp.asarray(b), tol=1e-12, maxiter=500)
    np.testing.assert_allclose(np.asarray(res.x), np.linalg.solve(A, b), rtol=1e-6, atol=1e-8)


def test_minres_with_spd_preconditioner():
    rng = np.random.default_rng(7)
    B = rng.normal(size=(25, 25))
    A = (B + B.T) / 2 + np.diag(np.linspace(1, 50, 25))
    d = np.abs(np.diag(A)) + 1.0
    b = rng.normal(size=25)
    Aj, dj = jnp.asarray(A), jnp.asarray(d)
    res = krylov.minres(lambda x: Aj @ x, jnp.asarray(b), precond=lambda r: r / dj, tol=1e-12, maxiter=500)
    np.testing.assert_allclose(np.asarray(res.x), np.linalg.solve(A, b), rtol=1e-6, atol=1e-8)


# ---------------------------------------------------------------------------
# end-to-end vs oracle


@pytest.mark.parametrize("geom_kind", ["mesh", "points"])
def test_grid_pipeline_matches_oracle_f64(geom_kind, icosphere):
    if geom_kind == "mesh":
        geom = icosphere
    else:
        from shm3d.io.mesh_io import PointCloud

        # oriented points from the icosphere vertices (outward normals)
        v = icosphere.vertices
        geom = PointCloud(v, v / np.linalg.norm(v, axis=1, keepdims=True))
    opts = SignedHeatOptions(dtype="float64", solver_tol=1e-12, solver_maxiter=20000, refine_steps=0)
    expected = oracle.solve_grid(geom, opts)
    got = GridSolver().compute_distance(geom, opts)
    rel = np.linalg.norm(got.phi - expected.phi) / np.linalg.norm(expected.phi)
    assert rel < 1e-6, f"rel L2 {rel}"


def test_grid_pipeline_f32_with_refinement(icosphere):
    opts64 = SignedHeatOptions(dtype="float64", solver_tol=1e-12, solver_maxiter=20000, refine_steps=0)
    expected = oracle.solve_grid(icosphere, opts64)
    opts32 = SignedHeatOptions(dtype="float32", solver_tol=1e-7, solver_maxiter=20000, refine_steps=2)
    got = GridSolver().compute_distance(icosphere, opts32)
    rel = np.linalg.norm(got.phi - expected.phi) / np.linalg.norm(expected.phi)
    # f32 Yukawa + f32 MINRES with f64 defect correction
    assert rel < 2e-5, f"rel L2 {rel}"


def test_fractional_h_coef_refines():
    """ADVICE round 1 (low): hCoef is a float in the reference
    (nx = 2*pow(2, hCoef+3), signed_heat_grid_solver.cpp:24); fractional
    values must refine instead of truncating to the coarser grid."""
    pts = np.array([[0.0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]])
    assert griddom.build_grid(pts, 2.0, 0.0).n == 16
    assert griddom.build_grid(pts, 2.0, 1.5).n == int(2 * 2 ** 4.5)  # 45
    assert griddom.build_grid(pts, 2.0, 3.0).n == 128


def test_grid_pipeline_fast_integration_matches_oracle(icosphere):
    opts = SignedHeatOptions(dtype="float64", fast_integration=True)
    expected = oracle.solve_grid(icosphere, opts)
    got = GridSolver().compute_distance(icosphere, opts)
    rel = np.linalg.norm(got.phi - expected.phi) / np.linalg.norm(expected.phi)
    assert rel < 1e-10, f"rel L2 {rel}"


def test_operator_cache_reuse(icosphere):
    solver = GridSolver()
    opts = SignedHeatOptions(dtype="float64", refine_steps=0, solver_tol=1e-10)
    r1 = solver.compute_distance(icosphere, opts)
    assert len(solver._cache) == 1
    r2 = solver.compute_distance(icosphere, opts)
    assert len(solver._cache) == 1  # cache hit; no rebuild
    np.testing.assert_allclose(r1.phi, r2.phi, rtol=1e-12)
    # hCoef change invalidates (new key), mirroring main.cpp:146-147
    solver.compute_distance(icosphere, opts.with_(h_coef=1.0))
    assert len(solver._cache) == 2


# ---------------------------------------------------------------------------
# multigrid


def test_vcycle_reduces_poisson_residual():
    from shm3d.solve import multigrid

    g = griddom.GridSpec((0.0, 0.0, 0.0), 0.1, 16)
    rng = np.random.default_rng(8)
    b3 = jnp.asarray(rng.normal(size=g.shape))
    b3 = b3 - jnp.mean(b3)  # range of the singular operator
    u = multigrid.v_cycle(b3, g.cell_size)
    r = b3 - (-stencil.laplacian_apply(u, g.cell_size))
    r = r - jnp.mean(r)
    # nu=1 (the TPU-tuned default: smoothing sweeps dominate the per-
    # iteration cost while CG iteration counts match nu=2) reduces ~0.41x
    assert float(jnp.linalg.norm(r)) < 0.5 * float(jnp.linalg.norm(b3))
    u2 = multigrid.v_cycle(b3, g.cell_size, nu=2)
    r2 = b3 - (-stencil.laplacian_apply(u2, g.cell_size))
    r2 = r2 - jnp.mean(r2)
    assert float(jnp.linalg.norm(r2)) < 0.35 * float(jnp.linalg.norm(b3))


def test_vcycle_preconditioner_is_symmetric():
    """SPD-ness requirement for MINRES: <x, M y> == <M x, y>."""
    from shm3d.solve import multigrid

    g = griddom.GridSpec((0.0, 0.0, 0.0), 0.2, 8)
    mg = multigrid.make_node_preconditioner(g.shape, g.cell_size, dtype=jnp.float64)
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.normal(size=g.total_nodes))
    y = jnp.asarray(rng.normal(size=g.total_nodes))
    lhs = float(jnp.vdot(x, mg(y)))
    rhs = float(jnp.vdot(mg(x), y))
    assert abs(lhs - rhs) < 1e-10 * max(abs(lhs), 1.0)


def _step3_iterations(geom, h_coef: float, method: str, tol=1e-10):
    """Solve end-to-end, then re-run the jitted Step-3 stage to read the
    iteration count for the given method."""
    from shm3d.solvers import grid as gridsolver

    opts = SignedHeatOptions(dtype="float64", solver_tol=tol, refine_steps=0,
                             h_coef=h_coef, solver_method=method)
    solver = gridsolver.GridSolver()
    res = solver.compute_distance(geom, opts)
    cached = next(iter(solver._cache.values()))
    u, iters, resid = gridsolver._integrate_exact(
        jnp.asarray(res.Y), cached["nodes8"], cached["coeffs8"],
        jnp.asarray(res.grid.cell_size, jnp.float64), res.grid.shape,
        True, tol, 10000, method=method,
    )
    return int(iters), float(resid), res


def test_projected_cg_converges_fast(icosphere):
    """The null-space method (projected MG-PCG) replaces round 1's
    MINRES-with-diagonal-Schur, which needed ~850-3955 iterations at 16^3 and
    did not converge at 128^3 (VERDICT.md).  The projected system P H P is
    SPD with a full MG preconditioner, so tens of iterations suffice."""
    iters, _, _ = _step3_iterations(icosphere, 0.0, "projected_cg")
    assert iters < 150, f"projected CG took {iters} iterations"


def test_projected_cg_iterations_mesh_independent(icosphere):
    """Iteration growth from 16^3 to 32^3 must be mild (the MG-preconditioned
    projected solve is near mesh-independent, unlike the diagonal-Schur
    MINRES whose counts grew superlinearly with n)."""
    it16, _, _ = _step3_iterations(icosphere, 0.0, "projected_cg")
    it32, _, _ = _step3_iterations(icosphere, 1.0, "projected_cg")
    assert it32 < 2.5 * max(it16, 10), f"16^3: {it16} iters, 32^3: {it32} iters"


def test_projected_cg_matches_kkt_minres(icosphere):
    """Both Step-3 methods solve the same constrained Poisson problem."""
    _, _, res_pcg = _step3_iterations(icosphere, 0.0, "projected_cg")
    _, _, res_kkt = _step3_iterations(icosphere, 0.0, "minres_kkt")
    rel = np.linalg.norm(res_pcg.phi - res_kkt.phi) / np.linalg.norm(res_kkt.phi)
    assert rel < 1e-7, f"rel L2 between methods {rel}"


def test_host_projection_tier_matches_oracle(icosphere, monkeypatch):
    """m > ORTHO_GRAM_CAP runs the Python-level PCG with exact f64 host
    projection (solvers/grid.py:_solve_pinned_hostproj).  Force the tier by
    shrinking the cap and check the full pipeline still matches the exact
    KKT oracle."""
    from shm3d.solve import projection

    monkeypatch.setattr(projection, "ORTHO_GRAM_CAP", 0)
    opts = SignedHeatOptions(dtype="float64", solver_tol=1e-12,
                             solver_maxiter=20000, refine_steps=0,
                             max_device_pins=None)
    expected = oracle.solve_grid(icosphere, opts)
    got = GridSolver().compute_distance(icosphere, opts)
    rel = np.linalg.norm(got.phi - expected.phi) / np.linalg.norm(expected.phi)
    assert rel < 1e-6, f"rel L2 {rel}"


def test_subsampled_pin_tier_matches_oracle(icosphere, monkeypatch):
    """The at-scale tier (m > ORTHO_GRAM_CAP with max_device_pins set): the
    f32-style device solve pins a spatially subsampled row subset through the
    compact T-form whitening (projection.build_tform_arrays), and the f64
    defect correction — which projects with the FULL row set — restores
    exact constraint parity vs the KKT oracle."""
    from shm3d.solve import projection

    monkeypatch.setattr(projection, "ORTHO_GRAM_CAP", 0)
    # r5: the full-row tform tier now owns ORTHO_GRAM_CAP < m <=
    # TFORM_FULL_CAP — shrink that cap too so this test still exercises
    # the SUBSAMPLED tier (which remains the path past the full-tier cap)
    monkeypatch.setattr(projection, "TFORM_FULL_CAP", 0)
    opts = SignedHeatOptions(dtype="float32", refine_steps=0,
                             max_device_pins=24)
    solver = GridSolver()
    got = solver.compute_distance(icosphere, opts)
    cached = next(iter(solver._cache.values()))
    m_full = cached["nodes8"].shape[0]
    m_pin = cached["pin_nodes8"].shape[0]
    assert cached["gram"].tmat is not None
    assert 0 < m_pin <= 24 < m_full
    # subsampled pins are satisfied by the device solve (to the f32 floor);
    # the mean shift breaks A u = 0 by a constant, so measure the pre-shift
    # primal solution
    u = np.asarray(got.u_device, np.float64)
    pin_res = np.abs(
        (u[np.asarray(cached["pin_nodes8"])]
         * np.asarray(cached["pin_coeffs8"], np.float64)).sum(axis=1)
    ).max()
    assert pin_res < 1e-3 * np.abs(u).max(), pin_res
    # ... while the unpinned rows carry real slack (the subset semantics)
    full_res = np.abs(
        (u[np.asarray(cached["nodes8"])] * cached["coeffs8_f64"]).sum(axis=1)
    ).max()
    assert full_res > 10 * pin_res, (full_res, pin_res)

    # with f32 compute + f64 refinement the FULL constraint set is restored
    opts32 = SignedHeatOptions(dtype="float32", refine_steps=5,
                               refine_target=1e-10, max_device_pins=24)
    got32 = GridSolver().compute_distance(icosphere, opts32)
    expected = oracle.solve_grid(icosphere, opts32.with_(dtype="float64"))
    rel = np.linalg.norm(got32.phi - expected.phi) / np.linalg.norm(expected.phi)
    assert rel < 1e-5, f"rel L2 {rel}"


def test_tform_full_tier_matches_oracle(icosphere, monkeypatch):
    """The r5 full-row whitening tier (ORTHO_GRAM_CAP < m <= TFORM_FULL_CAP):
    ALL constraint rows are enforced on device through the shifted-Cholesky
    factor built by XLA (projection._device_tform) — no subsampling, no
    host-projected loop, no defect correction needed to hold the full row
    set.  Pins the accuracy that closed the 256^3 fast-tier gap (9.5e-4
    with 4096/12620 rows pinned -> full-row parity)."""
    from shm3d.solve import projection

    monkeypatch.setattr(projection, "ORTHO_GRAM_CAP", 0)
    # disk_cache off: the cache key does not see the patched cap, so an
    # artifact another test built (bmat tier) would shadow this tier
    opts = SignedHeatOptions(dtype="float32", refine_steps=0,
                             solver_tol=1e-6, solver_maxiter=20000,
                             disk_cache=False)
    solver = GridSolver()
    got = solver.compute_distance(icosphere, opts)
    cached = next(iter(solver._cache.values()))
    assert cached["pin_keep"] is None          # full rows pinned on device
    assert cached["gram"].tmat is not None
    m_full = cached["nodes8"].shape[0]
    assert cached["pin_nodes8"].shape[0] == m_full
    # the FULL row set is satisfied by the pure-device solve (constraint
    # slack ~ the shifted factor's damping + f32 floor, NOT the subsample
    # tier's O(1e-1) unpinned slack)
    u = np.asarray(got.u_device, np.float64)
    full_res = np.abs(
        (u[np.asarray(cached["nodes8"])] * cached["coeffs8_f64"]).sum(axis=1)
    ).max()
    assert full_res < 1e-4 * np.abs(u).max(), full_res
    # phi accuracy vs the exact f64 KKT oracle, with NO refinement passes
    expected = oracle.solve_grid(
        icosphere, opts.with_(dtype="float64", solver_tol=1e-12))
    rel = np.linalg.norm(got.phi - expected.phi) / np.linalg.norm(expected.phi)
    assert rel < 1e-4, f"rel L2 {rel}"


def test_pin_aware_mg_cuts_iterations(icosphere):
    """The pin-aware V-cycle (multigrid.build_pin_masks; r5) preconditions
    the PROJECTED operator: constraint-surface modes that plain MG cannot
    see dominated the constrained solve's iteration count (measured 256^3:
    108 -> 17 CG iterations).  Guard both the mechanism (pins reduce
    iterations on a CI-sized problem) and correctness (same phi)."""
    from shm3d.solvers.grid import GridSolver

    opts = SignedHeatOptions(dtype="float64", h_coef=1.0, solver_tol=1e-8,
                             solver_maxiter=20000, refine_steps=0,
                             disk_cache=False)
    import os

    s1 = GridSolver()
    r1 = s1.compute_distance(icosphere, opts)
    it_pinned = s1.last_stats["iters"]
    os.environ["SHM3D_PIN_MG"] = "0"
    try:
        s2 = GridSolver()
        r2 = s2.compute_distance(icosphere, opts)
        it_plain = s2.last_stats["iters"]
    finally:
        del os.environ["SHM3D_PIN_MG"]
    rel = np.linalg.norm(r1.phi - r2.phi) / np.linalg.norm(r2.phi)
    assert rel < 1e-6, rel                      # preconditioner-only change
    assert it_pinned < it_plain, (it_pinned, it_plain)


def test_chebyshev_solves_spd_window():
    """krylov.chebyshev: fixed-degree inverse on a known spectral window."""
    from shm3d.solve import krylov

    rng = np.random.default_rng(3)
    Q, _ = np.linalg.qr(rng.normal(size=(60, 60)))
    lam = np.linspace(0.05, 2.0, 60)
    A = (Q * lam) @ Q.T
    b = rng.normal(size=60)
    deg = krylov.chebyshev_degree(2.0 / 0.05, 1e-10)
    x = krylov.chebyshev(lambda v: jnp.asarray(A) @ v, jnp.asarray(b), 0.05, 2.0, deg)
    assert np.linalg.norm(A @ np.asarray(x) - b) / np.linalg.norm(b) < 1e-9


def test_disk_cache_roundtrip(icosphere, tmp_path, monkeypatch):
    """A second solver instance (fresh in-memory cache) reloads the operator
    artifacts from disk and produces the identical phi (SURVEY.md §5.4)."""
    monkeypatch.setenv("SHM3D_CACHE_DIR", str(tmp_path))
    opts = SignedHeatOptions(dtype="float64", refine_steps=0)
    r1 = GridSolver().compute_distance(icosphere, opts)
    assert len(list(tmp_path.glob("*.npz"))) == 1
    r2 = GridSolver().compute_distance(icosphere, opts)  # disk hit path
    np.testing.assert_allclose(r2.phi, r1.phi, rtol=0, atol=1e-12)
    # disabling the cache still solves identically
    r3 = GridSolver().compute_distance(icosphere, opts.with_(disk_cache=False))
    np.testing.assert_allclose(r3.phi, r1.phi, rtol=0, atol=1e-12)


def test_wavefront_exact_on_constant_field(icosphere):
    """On a constant unit field every integration path gives the exact
    linear phi, so the wavefront must match the host BFS bitwise-ish."""
    from shm3d.domains.grid import build_grid
    from shm3d.ops.wavefront import greedy_integrate_wavefront
    from shm3d.oracle.reference import integrate_greedily_grid

    grid = build_grid(icosphere.vertices, 2.0, 1.0)  # 32^3
    d = np.array([1.0, 2.0, -0.5])
    d /= np.linalg.norm(d)
    Y = np.tile(d, (grid.total_nodes, 1))
    ref = integrate_greedily_grid(grid, Y)
    got = np.asarray(greedy_integrate_wavefront(jnp.asarray(Y), grid.cell_size, grid.shape))
    np.testing.assert_allclose(got, ref, rtol=0, atol=1e-12)


def test_wavefront_close_to_bfs_on_smooth_field(icosphere):
    """Greedy integration is path-dependent; on a smooth (sphere SDF-like)
    field the wavefront and BFS spanning trees must agree to the method's
    own path-integration error, not diverge."""
    from shm3d.domains.grid import build_grid
    from shm3d.ops.wavefront import greedy_integrate_wavefront
    from shm3d.oracle.reference import integrate_greedily_grid

    grid = build_grid(icosphere.vertices, 2.0, 1.0)
    pos = grid.node_positions()
    r = np.linalg.norm(pos, axis=1)
    Y = pos / np.maximum(r, 1e-9)[:, None]  # unit radial field (grad of |x|)
    ref = integrate_greedily_grid(grid, Y)
    got = np.asarray(greedy_integrate_wavefront(jnp.asarray(Y), grid.cell_size, grid.shape))
    scale = np.abs(ref).max()
    assert np.abs(got - ref).max() < 0.15 * scale
    # both approximate |x| - |x_corner| up to integration error
    exact = r - r.reshape(grid.shape)[0, 0, 0]
    # generous band: greedy integration error accumulates along paths
    assert np.abs(got - exact).max() < 0.2 * scale


def test_yukawa_query_coincident_with_source_f32():
    """A query exactly ON a source point (degenerate snapped tets put tet
    barycenters on source vertices — polygon-bear) must yield a finite
    unit direction, not 0*inf = NaN (f32 r2 underflows to exactly 0 where
    f64 survives on subnormals; ops/yukawa.py clamps r2)."""
    import jax.numpy as jnp

    from shm3d.ops.yukawa import yukawa_field, yukawa_field_xla

    pts = np.array([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]],
                   np.float32)
    vecs = np.array([[0.0, 0.0, 1.0]] * 3, np.float32)
    q = np.array([[0.0, 0.0, 0.0],      # exactly on source 0
                  [0.5, 0.5, 0.5]], np.float32)
    for fn in (yukawa_field, yukawa_field_xla):
        Y = np.asarray(fn(jnp.asarray(q), jnp.asarray(pts), jnp.asarray(vecs),
                          10.0))
        assert np.isfinite(Y).all(), fn.__name__
        n = np.linalg.norm(Y, axis=1)
        np.testing.assert_allclose(n, 1.0, atol=1e-5)


def test_ring_query_coincident_with_source_f32():
    """Same coincident-query guard for the multi-chip ring path."""
    import jax.numpy as jnp

    from shm3d.parallel import device_mesh, yukawa_field_ring

    mesh = device_mesh(min(2, len(jax.devices())))
    pts = np.array([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0],
                    [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]], np.float32)
    vecs = np.array([[0.0, 0.0, 1.0]] * 4, np.float32)
    q = np.zeros((8, 3), np.float32)     # all exactly on source 0
    Y = np.asarray(yukawa_field_ring(jnp.asarray(q), jnp.asarray(pts),
                                     jnp.asarray(vecs), 10.0, mesh))
    assert np.isfinite(Y).all()
