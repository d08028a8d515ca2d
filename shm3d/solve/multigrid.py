"""Geometric multigrid for the 7-point grid Laplacian (preconditioner).

The reference factors its assembled FD Laplacian with a direct sparse solver
(/root/reference/src/signed_heat_grid_solver.cpp:28-30,107).  On TPU the
replacement is a symmetric V-cycle used as the u-block preconditioner inside
MINRES on the KKT saddle system (SURVEY.md §7 "hard parts" #1): the grid is a
power-of-two cube (n = 2·2^(hCoef+3)), so 2x geometric coarsening is exact.

Components (all shape-static, jittable, sharding-friendly — restriction and
prolongation are reshapes/broadcasts along the sharded z axis, smoothing is
the same halo-friendly stencil as shm3d.ops.stencil):

- Smoother: weighted Jacobi (omega = 2/3) on H = -L (positive semi-definite;
  L is the mirrored-boundary negative Laplacian, signed_heat_grid_solver.cpp:277).
- Restriction: 2x2x2 block mean.  Prolongation: piecewise-constant injection
  (= 8 R^T), so the V-cycle operator is symmetric positive definite on the
  complement of the constant nullspace — a valid MINRES preconditioner.
- Coarse operator: rediscretized H at doubled spacing (not Galerkin; for the
  7-point stencil with these transfers they agree to the accuracy that
  matters for preconditioning).
- Coarsest level (n = 4): fixed Jacobi sweeps.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops import stencil

_OMEGA = 2.0 / 3.0


def _H_apply(u, cell):
    return -stencil.laplacian_apply(u, cell)


def _H_diag(shape, cell, dtype):
    """Constant interior diagonal 6/cell^2.  Using the exact (boundary-
    corrected) diagonal would make the weighted-Jacobi smoother slightly
    non-self-adjoint and the V-cycle an invalid MINRES preconditioner;
    the constant keeps every V-cycle term a symmetric polynomial in H."""
    del shape
    return jnp.asarray(6.0 / (cell * cell), dtype)


def _jacobi(u, b, cell, diag, sweeps: int):
    for _ in range(sweeps):
        u = u + _OMEGA * (b - _H_apply(u, cell)) / diag
    return u


def restrict(r):
    """(n, n, n) -> (n/2, n/2, n/2) 2x2x2 block mean."""
    n = r.shape[0]
    return r.reshape(n // 2, 2, n // 2, 2, n // 2, 2).mean(axis=(1, 3, 5))


def prolong(e):
    """(m, m, m) -> (2m, 2m, 2m) piecewise-constant injection."""
    m = e.shape[0]
    e = jnp.broadcast_to(e[:, None, :, None, :, None], (m, 2, m, 2, m, 2))
    return e.reshape(2 * m, 2 * m, 2 * m)


def v_cycle(b, cell, nu: int = 2, coarsest: int = 4, coarse_sweeps: int = 40):
    """One symmetric V-cycle approximating H^{-1} b, H = -L at spacing
    ``cell``.  ``b`` is (n, n, n); returns (n, n, n)."""
    n = b.shape[0]
    dtype = b.dtype
    diag = _H_diag(b.shape, cell, dtype)
    if n <= coarsest:
        return _jacobi(jnp.zeros_like(b), b, cell, diag, coarse_sweeps)
    u = _jacobi(jnp.zeros_like(b), b, cell, diag, nu)
    r = b - _H_apply(u, cell)
    e = v_cycle(restrict(r), 2.0 * cell, nu, coarsest, coarse_sweeps)
    u = u + prolong(e)
    return _jacobi(u, b, cell, diag, nu)


def make_node_preconditioner(shape, cell, dtype=jnp.float32, cycles: int = 1):
    """Preconditioner closure for flat (N,) node vectors."""

    def precond(r_flat):
        b = r_flat.reshape(shape)
        u = v_cycle(b, jnp.asarray(cell, dtype))
        for _ in range(cycles - 1):
            u = u + v_cycle(b - _H_apply(u, jnp.asarray(cell, dtype)), jnp.asarray(cell, dtype))
        return u.reshape(-1)

    return precond
