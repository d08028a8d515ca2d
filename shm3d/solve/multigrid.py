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
- Coarsest level (n = 8): one dense matvec with the host-precomputed
  pseudo-inverse of the unit-cell coarse operator (H scales as 1/cell^2, so
  the cached pinv is dimensionless and multiplied by cell^2 at runtime).
  The TPU runtime charges ~0.1 ms of overhead per op regardless of size, so
  the previous 40 unrolled Jacobi sweeps (~140 tiny ops) dominated the whole
  V-cycle cost; the dense solve is one op and exact.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import stencil

_OMEGA = 2.0 / 3.0


@functools.lru_cache(maxsize=8)
def _coarse_pinv_unit(n: int) -> np.ndarray:
    """Dense pseudo-inverse of the unit-cell-size coarse operator H = -L on
    an (n, n, n) grid (mirrored boundaries), as a host float64 array.  The
    null constant mode is truncated, keeping the result symmetric PSD (a
    valid MINRES/CG preconditioner block)."""
    from ..domains import grid as griddom

    spec = griddom.GridSpec((0.0, 0.0, 0.0), 1.0, n)
    H = -griddom.laplacian_matrix(spec).toarray()
    lam, Q = np.linalg.eigh(H)
    inv = np.where(lam > 1e-8 * lam[-1], 1.0 / np.maximum(lam, 1e-300), 0.0)
    return (Q * inv) @ Q.T


def _H_apply(u, cell):
    return -stencil.laplacian_apply(u, cell)


def _Hp_apply(u, cell, w):
    """H + diag(w): the PENALIZED operator the pin-aware V-cycle targets.
    ``w`` is a per-node penalty field (None -> plain H)."""
    r = -stencil.laplacian_apply(u, cell)
    return r if w is None else r + w * u


def _H_diag(shape, cell, dtype):
    """Constant interior diagonal 6/cell^2.  Using the exact (boundary-
    corrected) diagonal would make the weighted-Jacobi smoother slightly
    non-self-adjoint and the V-cycle an invalid MINRES preconditioner;
    the constant keeps every V-cycle term a symmetric polynomial in H."""
    del shape
    return jnp.asarray(6.0 / (cell * cell), dtype)


def _jacobi(u, b, cell, diag, sweeps: int, w=None):
    d = diag if w is None else diag + w
    for _ in range(sweeps):
        u = u + _OMEGA * (b - _Hp_apply(u, cell, w)) / d
    return u


def restrict(r):
    """(n, n, n) -> (n/2, n/2, n/2): adjoint of ``prolong`` scaled by 1/8
    (separable full weighting; constants restrict to constants).

    Even/odd planes are taken with STRIDED SLICES, not a pair reshape
    ``(n,) -> (n/2, 2)``: under GSPMD with the leading axis sharded, the
    pair reshape produced numerically WRONG values on the 8-device CPU mesh
    at 32^3 (measured rel error 1.05 vs single device — the silent cause of
    a sharded Step-3 stall at 251 iterations); the strided form is
    bit-identical sharded and unsharded."""
    for ax in range(3):
        r = jnp.moveaxis(r, ax, 0)
        even, odd = r[0::2], r[1::2]
        c = 0.75 * (even + odd)
        c = c.at[1:].add(0.25 * odd[:-1]).at[:-1].add(0.25 * even[1:])
        # clamped-boundary contributions (mirror of the prolongation clamp)
        c = c.at[0].add(0.25 * even[0]).at[-1].add(0.25 * odd[-1])
        r = jnp.moveaxis(0.5 * c, 0, ax)
    return r


def prolong(e):
    """(m, m, m) -> (2m, 2m, 2m) separable cell-centered *linear*
    interpolation (weights 3/4, 1/4; clamped at the mirrored boundaries).

    Transfer order matters: with piecewise-constant injection the transfer
    orders sum to the operator order (1+1 = 2) and V-cycle quality degrades
    with resolution (measured: 29 -> 35 PCG iterations from 64^3 to 128^3);
    linear transfers (2+2 > 2) give mesh-independent convergence (14 -> 14
    iterations on the same problems, f64)."""
    for ax in range(3):
        e = jnp.moveaxis(e, ax, 0)
        m = e.shape[0]
        left = jnp.concatenate([e[:1], e[:-1]], axis=0)
        right = jnp.concatenate([e[1:], e[-1:]], axis=0)
        even = 0.75 * e + 0.25 * left
        odd = 0.75 * e + 0.25 * right
        # strided interleave, not stack+reshape — see restrict's GSPMD note
        out = jnp.zeros((2 * m,) + e.shape[1:], e.dtype)
        e = out.at[0::2].set(even).at[1::2].set(odd)
        e = jnp.moveaxis(e, 0, ax)
    return e


def v_cycle(b, cell, nu: int = 1, coarsest: int = 8, pins=None):
    """One symmetric V-cycle approximating H^{-1} b, H = -L at spacing
    ``cell``.  ``b`` is (n, n, n); returns (n, n, n).  The coarsest level is
    solved exactly with the cached dense pseudo-inverse (one matvec; the
    1/cell^2 operator scaling becomes a cell^2 factor on the result).

    ``pins``: optional tuple of per-level penalty MASKS in [0, 1] (level 0
    first; built by build_pin_masks).  When set, every level smooths and
    forms residuals on H + diag(mask * 6/cell^2) instead of H — a Dirichlet
    penalty at the constraint surface, which makes the V-cycle spectrally
    close to the PROJECTED operator the outer CG actually solves (plain MG
    cannot see the pinned surface, and its near-surface modes dominate the
    iteration count of the constrained solve)."""
    n = b.shape[0]
    dtype = b.dtype
    w = None
    if pins is not None and len(pins) > 0:
        w = pins[0] * jnp.asarray(6.0 / (cell * cell), dtype)
        pins_c = pins[1:]
    else:
        pins_c = None if pins is None else ()
    if n <= coarsest:
        if n <= 16 and w is None:  # dense pinv: 16^3 -> a 4096^2 matvec
            pinv = jnp.asarray(_coarse_pinv_unit(n), dtype)
            return (cell * cell) * (pinv @ b.reshape(-1)).reshape(b.shape)
        diag_c = _H_diag(b.shape, cell, dtype)
        return _jacobi(jnp.zeros_like(b), b, cell, diag_c, 40, w)
    if n % 2:
        # odd resolution (fractional hCoef): cannot 2x-coarsen; smooth only
        diag_o = _H_diag(b.shape, cell, dtype)
        return _jacobi(jnp.zeros_like(b), b, cell, diag_o, 20, w)
    diag = _H_diag(b.shape, cell, dtype)
    u = _jacobi(jnp.zeros_like(b), b, cell, diag, nu, w)
    r = b - _Hp_apply(u, cell, w)
    e = v_cycle(restrict(r), 2.0 * cell, nu, coarsest, pins_c)
    u = u + prolong(e)
    return _jacobi(u, b, cell, diag, nu, w)


def build_pin_masks(nodes8, shape, coarsest: int = 8):
    """Per-level pin masks for the penalized V-cycle: 1.0 at every node a
    constraint row touches on the fine grid, full-weighting restricted down
    the hierarchy (values in [0, 1] — a soft indicator of constraint
    density).  Tuple of (n_l, n_l, n_l) device arrays, level 0 first."""
    N = int(np.prod(shape))
    m0 = jnp.zeros(N, jnp.float32).at[
        jnp.asarray(nodes8).reshape(-1)].set(1.0).reshape(shape)
    masks = [m0]
    n = shape[0]
    while n > coarsest and n % 2 == 0:
        masks.append(jnp.clip(restrict(masks[-1]) * 8.0, 0.0, 1.0))
        n //= 2
    return tuple(masks)


def make_node_preconditioner(shape, cell, dtype=jnp.float32, cycles: int = 1,
                             pins=None):
    """Preconditioner closure for flat (N,) node vectors."""

    def precond(r_flat):
        b = r_flat.reshape(shape)
        u = v_cycle(b, jnp.asarray(cell, dtype), pins=pins)
        for _ in range(cycles - 1):
            u = u + v_cycle(b - _Hp_apply(u, jnp.asarray(cell, dtype),
                                          None if pins is None else
                                          pins[0] * jnp.asarray(6.0 / (cell * cell), dtype)),
                            jnp.asarray(cell, dtype), pins=pins)
        return u.reshape(-1)

    return precond
