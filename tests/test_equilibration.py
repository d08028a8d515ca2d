"""Vertex-path symmetric equilibration (tet/solver, round 4).

The device-side dual-Laplacian solves run in equilibrated variables
(S H S with S = diag(1/sqrt(diag H))): pure-f32 CG on the raw operator
floors near 1e-2 relative residual at knot scale from value rounding
alone (weights span ~0.76..9e8), while the scaled operator has unit
diagonal.  These tests pin the three correctness hazards of the change:

1. the scaled operator really is unit-diagonal (so the f32 claim holds);
2. NONE/MULTIPLE modes deflate the SCALED null direction sqrt(diag H) —
   not constants — and still reproduce the f64 oracle after the original-
   variable mean shift (the dev-note caveat that blocked landing this);
3. artifacts written before VERTEX_V rebuild their vertex family from the
   cached mesh instead of mixing raw-operator panels with scaled solves.
"""

import numpy as np
import pytest

from shm3d import LevelSetConstraint, SignedHeatOptions
from shm3d.geometry.procedural import make_icosphere
from shm3d.oracle import tet_reference as tet_oracle
from shm3d.tet.fem import build_dual_laplacian
from shm3d.tet.solver import (SignedHeatTetSolver, _equilibrated,
                              _vertex_scale, build_tet_domain)


@pytest.fixture(scope="module")
def ico_mesh():
    return make_icosphere(2)


def test_equilibrated_operator_unit_diagonal(ico_mesh):
    m = build_tet_domain(np.asarray(ico_mesh.vertices), 2.0, 0.0,
                         mean_area=0.05)
    H = (-build_dual_laplacian(m).to_scipy()).tocsr()
    s = _vertex_scale(H)
    Hs = _equilibrated(H, s)
    d = Hs.diagonal()
    np.testing.assert_allclose(d[np.asarray(H.diagonal()) > 0], 1.0,
                               rtol=1e-12)
    # congruence preserves symmetry
    assert abs(Hs - Hs.T).max() < 1e-12 * abs(Hs).max()


@pytest.mark.parametrize("mode", [LevelSetConstraint.NONE,
                                  LevelSetConstraint.MULTIPLE])
def test_scaled_nullspace_modes_match_oracle_f32(mode, ico_mesh):
    """The scaled operator's null space is sqrt(diag H), not constants; a
    wrong deflation direction poisons the Krylov space and the error shows
    up directly in phi (the mean shift only fixes the constant mode)."""
    opts = SignedHeatOptions(
        dtype="float32", level_set_constraint=mode,
        use_crouzeix_raviart=False, refine_steps=0,
        solver_tol=1e-6, solver_maxiter=20000, disk_cache=False,
    )
    expected = tet_oracle.solve_tet(
        ico_mesh, opts.with_(dtype="float64", solver_tol=1e-12))
    got = SignedHeatTetSolver().compute_distance(ico_mesh, opts)
    rel = np.linalg.norm(got.phi - expected.phi) / np.linalg.norm(expected.phi)
    assert rel < 2e-4, f"mode={mode}: rel L2 {rel}"


def test_stale_vertex_artifact_rebuilds_and_upgrades(tmp_path, monkeypatch,
                                                     ico_mesh):
    monkeypatch.setenv("SHM3D_CACHE_DIR", str(tmp_path))
    opts = SignedHeatOptions(dtype="float32", use_crouzeix_raviart=False)

    s1 = SignedHeatTetSolver()
    r1 = s1.compute_distance(ico_mesh, opts)
    assert s1.last_stats["step3_path"] == "vertex"

    # simulate a pre-upgrade artifact: a future encoding bump must treat
    # today's artifact exactly as today's code treats a v1 artifact
    monkeypatch.setattr(SignedHeatTetSolver, "VERTEX_V",
                        SignedHeatTetSolver.VERTEX_V + 1)
    s2 = SignedHeatTetSolver()
    r2 = s2.compute_distance(ico_mesh, opts)
    rel = np.linalg.norm(r2.phi - r1.phi) / np.linalg.norm(r1.phi)
    assert rel < 1e-5, f"stale-artifact rebuild diverged: {rel}"

    # the rebuild must have merged the re-encoded family back to disk:
    # a third process under the same version loads it without rebuilding
    s3 = SignedHeatTetSolver()
    r3 = s3.compute_distance(ico_mesh, opts)
    rel = np.linalg.norm(r3.phi - r2.phi) / np.linalg.norm(r2.phi)
    assert rel < 1e-6
