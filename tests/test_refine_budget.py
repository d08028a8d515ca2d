"""Derived defect-correction pass budget (config.refine_pass_budget, r5).

Advisor r4 (medium): refine_solver_tol=1e-2 caps each correction pass at
~1e-2 contraction, so the old fixed refine_steps=1 left the DEFAULT tier
~100x short of refine_target=1e-9 on systems whose f32 primary solve lands
near 1e-5.  The budget is now derived from the measured starting residual
(contraction^passes <= target), with refine_steps as the user floor and a
stagnation guard.  These tests pin (1) the derivation itself, (2) the
option validation that used to fail silently, and (3) the end-to-end
DEFAULT-tier accuracy contract on the tet vertex path — the knot
1,232-iteration pathology's regression test (VERDICT r4 #6), asserting the
refinement actually reaches refine_target at default settings.
"""

import numpy as np
import pytest

from shm3d.config import SignedHeatOptions


def test_refine_pass_budget_derivation():
    o = SignedHeatOptions()  # refine_steps=1, tol=1e-2, target=1e-9
    # from 1e-5: need ceil(log(1e-9/1e-5)/log(1e-2)) = 2 passes
    assert o.refine_pass_budget(1e-5) == 2
    # from 1e-3: ceil(6/2) = 3
    assert o.refine_pass_budget(1e-3) == 3
    # already converged: user floor
    assert o.refine_pass_budget(1e-12) == 1
    # refine_steps=0 disables regardless
    assert o.with_(refine_steps=0).refine_pass_budget(1.0) == 0
    # user floor wins when larger than the derivation
    assert o.with_(refine_steps=5).refine_pass_budget(1e-7) == 5
    # hard cap at 8 (a stalled solve must not loop unboundedly)
    assert o.with_(refine_solver_tol=0.9).refine_pass_budget(1.0) == 8
    # non-finite start falls back to the user floor
    assert o.refine_pass_budget(float("nan")) == 1
    assert o.refine_pass_budget(float("inf")) == 1


def test_option_validation_fails_loudly():
    with pytest.raises(ValueError, match="refine_mode"):
        SignedHeatOptions(refine_mode="pairr")
    with pytest.raises(ValueError, match="refine_mode"):
        SignedHeatOptions().with_(refine_mode="host64")
    with pytest.raises(ValueError, match="step1_method"):
        SignedHeatOptions(step1_method="shells")
    with pytest.raises(ValueError, match="solver_method"):
        SignedHeatOptions(solver_method="cg")


def test_tet_default_tier_reaches_refine_target():
    """DEFAULT options (refine_steps=1, refine_solver_tol=1e-2) on an f32
    tet vertex solve must reach refine_target via the derived budget — the
    contract the reference gets for free from all-f64 CHOLMOD
    (/root/reference/src/signed_heat_tet_solver.cpp:296-304)."""
    from shm3d.geometry.procedural import make_icosphere
    from shm3d.tet.solver import SignedHeatTetSolver

    mesh = make_icosphere(2)
    opts = SignedHeatOptions(dtype="float32", use_crouzeix_raviart=False,
                             disk_cache=False)
    s = SignedHeatTetSolver()
    s.compute_distance(mesh, opts)
    rels = s.last_stats.get("refine_pass_rels")
    assert rels, "refinement ran and recorded per-pass residuals"
    # final f64 true residual of the solve meets the default target (small
    # slack for the stagnation floor)
    assert s.last_stats["rel_res"] <= 10 * opts.refine_target, rels
    # and each completed pass contracted (no wasted passes)
    for a, b in zip(rels, rels[1:]):
        assert b < a, rels


def test_grid_default_tier_budget_extends_passes():
    """Grid pair-mode refinement with the DEFAULT refine_steps=1 now runs
    as many passes as the contraction requires (pre-r5: exactly one pass,
    landing ~100x short of refine_target when starting near 1e-5)."""
    from shm3d.geometry.procedural import make_icosphere
    from shm3d.solvers.grid import GridSolver

    mesh = make_icosphere(1)
    opts = SignedHeatOptions(dtype="float32", h_coef=1.0, disk_cache=False)
    s = GridSolver()
    s.compute_distance(mesh, opts)
    rel = s.last_stats["refine_rel_res"]
    assert rel <= 10 * opts.refine_target, s.last_stats.get("refine_pass_rels")
