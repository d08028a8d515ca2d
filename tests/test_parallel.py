"""Multi-device tests on the 8-virtual-device CPU mesh (SURVEY.md §4.4).

Property under test: sharded result == single-device result to tolerance,
for (a) the ring-scheduled Yukawa summation and (b) the z-sharded stencil
solve path where XLA inserts halo collectives automatically.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from shm3d.ops import stencil
from shm3d.ops.yukawa import yukawa_field_xla
from shm3d.parallel import (
    device_mesh,
    field3_sharding,
    field3v_sharding,
    node_sharding,
    source_sharding,
    yukawa_field_ring,
)
from shm3d.solve import krylov

from conftest import make_icosphere


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8, "conftest must force 8 virtual CPU devices"
    return device_mesh(8)


def test_ring_yukawa_matches_single_device(mesh8):
    from shm3d.geometry import sources as src_mod

    src = src_mod.from_mesh(make_icosphere(1))  # 80 faces -> pad to 80? 80/8=10 ok
    rng = np.random.default_rng(11)
    q = rng.uniform(-2, 2, size=(256, 3))
    lam = 2.7
    qj = jnp.asarray(q)
    sp = jnp.asarray(src.points)
    sv = jnp.asarray(src.vectors())

    expected = yukawa_field_xla(qj, sp, sv, lam)

    qs = jax.device_put(qj, node_sharding(mesh8))
    sps = jax.device_put(sp, source_sharding(mesh8))
    svs = jax.device_put(sv, source_sharding(mesh8))
    got = yukawa_field_ring(qs, sps, svs, lam, mesh8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), rtol=1e-12, atol=1e-13)


def test_ring_yukawa_unnormalized(mesh8):
    from shm3d.geometry import sources as src_mod

    src = src_mod.from_mesh(make_icosphere(1))
    rng = np.random.default_rng(12)
    q = rng.uniform(-2, 2, size=(64, 3))
    lam = 1.3
    expected = yukawa_field_xla(
        jnp.asarray(q), jnp.asarray(src.points), jnp.asarray(src.vectors()), lam,
        normalize=False,
    )
    qs = jax.device_put(jnp.asarray(q), node_sharding(mesh8))
    sps = jax.device_put(jnp.asarray(src.points), source_sharding(mesh8))
    svs = jax.device_put(jnp.asarray(src.vectors()), source_sharding(mesh8))
    got = yukawa_field_ring(qs, sps, svs, lam, mesh8, normalize=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), rtol=1e-10, atol=1e-12)


def test_sharded_stencil_matvec_matches_single(mesh8):
    """Laplacian/divergence on z-sharded fields == unsharded (XLA halos)."""
    n = 16
    rng = np.random.default_rng(13)
    u = rng.normal(size=(n, n, n))
    Y = rng.normal(size=(n, n, n, 3))
    cell = 0.3

    expected_L = stencil.laplacian_apply(jnp.asarray(u), cell)
    expected_D = stencil.divergence_apply(jnp.asarray(Y), cell)

    us = jax.device_put(jnp.asarray(u), field3_sharding(mesh8))
    Ys = jax.device_put(jnp.asarray(Y), field3v_sharding(mesh8))
    got_L = jax.jit(lambda x: stencil.laplacian_apply(x, cell))(us)
    got_D = jax.jit(lambda x: stencil.divergence_apply(x, cell))(Ys)
    np.testing.assert_allclose(np.asarray(got_L), np.asarray(expected_L), atol=1e-12)
    np.testing.assert_allclose(np.asarray(got_D), np.asarray(expected_D), atol=1e-12)


def test_grid_solver_mesh_matches_single_device(mesh8):
    """Product API multi-chip: GridSolver(mesh=...) == GridSolver() — one
    code path serves 1 and N devices (VERDICT round 1, item 6)."""
    from shm3d.config import SignedHeatOptions
    from shm3d.solvers.grid import GridSolver

    geom = make_icosphere(2)
    opts = SignedHeatOptions(dtype="float64", solver_tol=1e-11,
                             solver_maxiter=5000, refine_steps=0)
    single = GridSolver().compute_distance(geom, opts)
    sharded = GridSolver(mesh=mesh8).compute_distance(geom, opts)
    rel = np.linalg.norm(sharded.phi - single.phi) / np.linalg.norm(single.phi)
    assert rel < 1e-9, f"sharded vs single rel L2 {rel}"


def test_grid_solver_mesh_indivisible_falls_back(mesh8):
    """n=16 doesn't split over 5 devices: the solver must still produce the
    single-device answer (with a fallback note), not crash."""
    from shm3d.config import SignedHeatOptions
    from shm3d.parallel import device_mesh
    from shm3d.solvers.grid import GridSolver

    geom = make_icosphere(1)
    opts = SignedHeatOptions(dtype="float64", refine_steps=0)
    single = GridSolver().compute_distance(geom, opts)
    sharded = GridSolver(mesh=device_mesh(5)).compute_distance(geom, opts)
    np.testing.assert_allclose(sharded.phi, single.phi, rtol=1e-10)


def test_ring_yukawa_self_padding(mesh8):
    """Ring kernel pads ragged query/source counts internally."""
    from shm3d.geometry import sources as src_mod

    src = src_mod.from_mesh(make_icosphere(1))
    rng = np.random.default_rng(15)
    q = rng.uniform(-2, 2, size=(101, 3))  # 101 % 8 != 0
    lam = 2.0
    expected = yukawa_field_xla(
        jnp.asarray(q), jnp.asarray(src.points[:77]), jnp.asarray(src.vectors()[:77]), lam)
    got = yukawa_field_ring(
        jnp.asarray(q), jnp.asarray(src.points[:77]), jnp.asarray(src.vectors()[:77]),
        lam, mesh8, q_tile=16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), rtol=1e-10, atol=1e-12)


def test_sharded_cg_poisson_matches_single(mesh8):
    """z-sharded CG on an SPD shifted Laplacian == single-device result."""
    n = 16
    rng = np.random.default_rng(14)
    b = rng.normal(size=n * n * n)
    cell = 0.25
    shape = (n, n, n)

    def matvec(x):
        u = x.reshape(shape)
        return (-stencil.laplacian_apply(u, cell) + 5.0 * u).reshape(-1)

    expected = krylov.cg(matvec, jnp.asarray(b), tol=1e-12, maxiter=500)
    bs = jax.device_put(jnp.asarray(b), node_sharding(mesh8))
    got = jax.jit(lambda bb: krylov.cg(matvec, bb, tol=1e-12, maxiter=500).x)(bs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected.x), rtol=1e-9, atol=1e-10)


def test_tet_solver_ring_matches_single_device(small_icosphere):
    """SignedHeatTetSolver(mesh=...) runs Step 1 via the ring schedule;
    result must match the single-device solve (one code path, N devices)."""
    from shm3d.config import SignedHeatOptions
    from shm3d.parallel import device_mesh
    from shm3d.tet.solver import SignedHeatTetSolver

    opts = SignedHeatOptions(dtype="float64")
    single = SignedHeatTetSolver().compute_distance(small_icosphere, opts)
    ringed = SignedHeatTetSolver(mesh=device_mesh(8)).compute_distance(small_icosphere, opts)
    rel = np.linalg.norm(ringed.phi - single.phi) / np.linalg.norm(single.phi)
    assert rel < 1e-12, f"rel {rel}"


def test_tet_cr_sharded_step3_matches_single_device():
    """Sharded tet Step 3 (VERDICT r1 item 7): with a device mesh the CR
    face solve's operators are row-sharded (ell.device_put_tree) and GSPMD
    runs the AMG-PCG iteration as distributed SpMV.  Must equal the
    single-device solve on real scan geometry routed through CRPath."""
    import os

    from shm3d.config import SignedHeatOptions
    from shm3d.io.mesh_io import read_geometry
    from shm3d.parallel import device_mesh
    from shm3d.tet import native
    from shm3d.tet.solver import SignedHeatTetSolver

    if not native.conforming_available():
        import pytest

        pytest.skip("native lib absent")
    geom = read_geometry(os.path.join(os.path.dirname(__file__), "data",
                                      "bunny_dec.obj"))
    opts = SignedHeatOptions(dtype="float64", disk_cache=False)
    single = SignedHeatTetSolver().compute_distance(geom, opts)
    assert single.mesh.conforming
    sharded_solver = SignedHeatTetSolver(mesh=device_mesh(8))
    sharded = sharded_solver.compute_distance(geom, opts)
    assert sharded_solver.last_stats["step3_path"] == "crouzeix-raviart"
    rel = np.linalg.norm(sharded.phi - single.phi) / np.linalg.norm(single.phi)
    # not bitwise: the ring Step 1 sums sources in a different order, and
    # both solves only converge to solver_tol; 1e-6 still catches any
    # placement/collective bug (those produce O(1) errors)
    assert rel < 1e-6, f"rel {rel}"


def test_hierarchical_ring_multislice_matches_single_device():
    """2-D multi-slice mesh (axes ("s","d"): DCN x ICI): the hierarchical
    ring — inner ICI rotations, one DCN forward per pass — must produce the
    same field as the dense single-device kernel."""
    from shm3d.geometry import sources as src_mod

    src = src_mod.from_mesh(make_icosphere(1))
    rng = np.random.default_rng(21)
    q = rng.uniform(-2, 2, size=(256, 3))
    lam = 2.7
    qj = jnp.asarray(q)
    sp = jnp.asarray(src.points)
    sv = jnp.asarray(src.vectors())
    expected = yukawa_field_xla(qj, sp, sv, lam)

    for n_slices in (2, 4):
        mesh2d = device_mesh(8, n_slices=n_slices)
        assert mesh2d.axis_names == ("s", "d")
        qs = jax.device_put(qj, node_sharding(mesh2d))
        sps = jax.device_put(sp, source_sharding(mesh2d))
        svs = jax.device_put(sv, source_sharding(mesh2d))
        got = yukawa_field_ring(qs, sps, svs, lam, mesh2d)
        np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                                   rtol=1e-12, atol=1e-13)


def test_grid_solver_multislice_matches_single_device(small_icosphere):
    """GridSolver(mesh=2x4 multi-slice mesh) end-to-end == single device:
    Step 1 hierarchical ring + Step 3 z-slabs sharded over both axes (halo
    exchange crosses DCN only at slice-boundary planes)."""
    from shm3d.config import SignedHeatOptions
    from shm3d.solvers.grid import GridSolver

    opts = SignedHeatOptions(dtype="float64", h_coef=0.0, disk_cache=False)
    single = GridSolver().compute_distance(small_icosphere, opts)
    multi = GridSolver(mesh=device_mesh(8, n_slices=2)).compute_distance(
        small_icosphere, opts)
    rel = np.linalg.norm(multi.phi - single.phi) / np.linalg.norm(single.phi)
    assert rel < 1e-8, f"rel {rel}"


def test_tet_solver_multislice_matches_single_device(small_icosphere):
    """SignedHeatTetSolver over a 2-slice mesh: hierarchical ring Step 1 +
    ELL operators row-sharded over both mesh axes."""
    from shm3d.config import SignedHeatOptions
    from shm3d.tet.solver import SignedHeatTetSolver

    opts = SignedHeatOptions(dtype="float64", disk_cache=False)
    single = SignedHeatTetSolver().compute_distance(small_icosphere, opts)
    multi = SignedHeatTetSolver(mesh=device_mesh(8, n_slices=2)).compute_distance(
        small_icosphere, opts)
    rel = np.linalg.norm(multi.phi - single.phi) / np.linalg.norm(single.phi)
    assert rel < 1e-10, f"rel {rel}"


def test_shell_step1_sharded_matches_single(mesh8):
    """Multi-chip shell Step 1 (VERDICT r2 #6): the row-sharded shell +
    coarse kernels and the sharded assembly reproduce the single-device
    shell field exactly (same arithmetic, placement only)."""
    from shm3d.domains.grid import build_grid
    from shm3d.geometry import sources as src_mod
    from shm3d.ops import farfield

    sph = make_icosphere(2)
    src = src_mod.from_mesh(sph)
    grid = build_grid(np.asarray(sph.vertices), scale=2.0, h_coef=1.0)  # 32^3
    lam = float(1.0 / grid.cell_size)
    plan = farfield.build_shell_plan(grid, np.asarray(src.points), lam,
                                     shell_t=4.0, factor=4)
    pts = jnp.asarray(np.asarray(src.points), jnp.float32)
    vecs = jnp.asarray(np.asarray(src.vectors()), jnp.float32)
    Y1 = np.asarray(farfield.yukawa_field_shell(plan, pts, vecs, lam, grid.n))
    Y8 = np.asarray(farfield.yukawa_field_shell(plan, pts, vecs, lam, grid.n,
                                                mesh=mesh8))
    np.testing.assert_allclose(Y8, Y1, rtol=0, atol=5e-6)


def test_grid_solver_mesh_shell_matches_single(mesh8):
    """End-to-end grid solve with the shell Step 1 forced on the mesh path."""
    from shm3d.config import SignedHeatOptions
    from shm3d.solvers.grid import GridSolver

    sph = make_icosphere(2)
    opts = SignedHeatOptions(dtype="float64", h_coef=1.0, solver_tol=1e-11,
                             solver_maxiter=5000, refine_steps=0,
                             disk_cache=False, step1_method="shell",
                             shell_t=4.0)
    r1 = GridSolver().compute_distance(sph, opts)
    r8 = GridSolver(mesh=mesh8).compute_distance(sph, opts)
    rel = np.linalg.norm(r8.phi - r1.phi) / np.linalg.norm(r1.phi)
    assert rel < 1e-9, f"sharded shell vs single rel L2 {rel}"


def test_grid_solver_mesh_tform_full_tier_matches_single(mesh8, monkeypatch):
    """The r5 full-row whitening tier under GSPMD: the device-built dense
    factor (projection._device_tform) replicates across the mesh while the
    node fields stay z-slab sharded; the sharded solve must match the
    single-device one.  Forced via the cap so a CI-sized fixture exercises
    the tier that owns 8.2k < m <= 24.6k rows in production."""
    from shm3d.config import SignedHeatOptions
    from shm3d.solve import projection
    from shm3d.solvers.grid import GridSolver

    monkeypatch.setattr(projection, "ORTHO_GRAM_CAP", 0)
    sph = make_icosphere(2)
    opts = SignedHeatOptions(dtype="float32", h_coef=1.0, refine_steps=0,
                             solver_tol=1e-6, solver_maxiter=20000,
                             disk_cache=False)
    r1 = GridSolver().compute_distance(sph, opts)
    s8 = GridSolver(mesh=mesh8)
    r8 = s8.compute_distance(sph, opts)
    cached = next(iter(s8._cache.values()))
    assert cached["gram"].tmat is not None and cached["pin_keep"] is None
    rel = np.linalg.norm(r8.phi - r1.phi) / np.linalg.norm(r1.phi)
    assert rel < 1e-5, f"sharded tform_full vs single rel L2 {rel}"
