"""Matrix-free Krylov solvers (jit-compatible, lax.while_loop based).

The reference performs direct sparse factorizations (CHOLMOD Cholesky / LU
via geometry-central's PositiveDefiniteSolver / solveSquare,
/root/reference/src/signed_heat_tet_solver.cpp:179,217; .../signed_heat_grid_solver.cpp:107).
Direct factorization does not map to TPUs; the TPU-native replacement is
matrix-free preconditioned CG (SPD systems) and MINRES (symmetric indefinite
KKT saddles), with stencil/segment-sum matvecs (SURVEY.md §7 "hard parts" #1).

All routines operate on flat 1-D vectors; operators close over shapes.
Scalar reductions are done in the iterate dtype; convergence checks compare
preconditioned residual norms against ``tol * ||b||_M``.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


class SolveResult(NamedTuple):
    x: jnp.ndarray
    iterations: jnp.ndarray
    residual: jnp.ndarray  # final (preconditioned) residual norm estimate
    # stall-detector state (best residual so far, iterations since it
    # improved) — thread back in via ``stall_state`` when warm-restarting in
    # bounded chunks, otherwise every restart resets the detector and an
    # unconverged solve near its floor gets killed chunks too early
    # (measured: 180 vs 288 iterations, 4.7e-3 vs 1.2e-3 residual, 7e-2
    # phi error on the recovered bunny_small CR system).
    best: Optional[jnp.ndarray] = None
    since: Optional[jnp.ndarray] = None


def _identity(x):
    return x


def cg(
    matvec: Callable,
    b: jnp.ndarray,
    x0: Optional[jnp.ndarray] = None,
    precond: Optional[Callable] = None,
    tol: float = 1e-8,
    maxiter: int = 1000,
    rhs_mnorm=None,
    stall_window: Optional[int] = None,
    stall_state=None,
) -> SolveResult:
    """Preconditioned conjugate gradients for SPD ``matvec``.

    ``tol`` and ``maxiter`` may be traced scalars — chunked callers pass the
    chunk bound dynamically so ONE compiled program serves every chunk size
    (each static chunk size used to compile its own multi-minute program
    over the remote-TPU tunnel).

    ``rhs_mnorm`` overrides the reference norm for the relative convergence
    test — pass ||b||_M of the ORIGINAL system when warm-restarting in
    chunks, otherwise each chunk would try to shrink its own residual by
    ``tol`` and never terminate.

    ``stall_window``: stop when the preconditioned residual has not improved
    by >2% for this many consecutive iterations (the dtype roundoff floor —
    float32 solves otherwise burn maxiter chasing unreachable tolerances).
    ``stall_state``: (best, since) from the previous chunk's SolveResult,
    so the detector state survives warm restarts."""
    M = precond or _identity
    x0 = jnp.zeros_like(b) if x0 is None else x0

    r0 = b - matvec(x0)
    z0 = M(r0)
    rz0 = jnp.vdot(r0, z0)
    bnorm = jnp.sqrt(jnp.vdot(b, M(b))) if rhs_mnorm is None else rhs_mnorm
    threshold = tol * jnp.maximum(bnorm, jnp.finfo(b.dtype).tiny)
    if stall_window is None:
        window = jnp.asarray(maxiter, jnp.int32) + 1
    else:
        window = jnp.asarray(stall_window, jnp.int32)
    rn0 = jnp.sqrt(jnp.abs(rz0))
    if stall_state is None:
        best0, since0 = rn0, jnp.array(0, jnp.int32)
    else:
        best0 = jnp.minimum(jnp.asarray(stall_state[0], rn0.dtype), rn0)
        since0 = jnp.asarray(stall_state[1], jnp.int32)

    def cond(state):
        _, r, _, _, rz, k, best, since = state
        return (jnp.sqrt(jnp.abs(rz)) > threshold) & (k < maxiter) & (since < window)

    def body(state):
        x, r, z, p, rz, k, best, since = state
        Ap = matvec(p)
        alpha = rz / jnp.vdot(p, Ap)
        x = x + alpha * p
        r = r - alpha * Ap
        z = M(r)
        rz_new = jnp.vdot(r, z)
        beta = rz_new / rz
        p = z + beta * p
        rn = jnp.sqrt(jnp.abs(rz_new))
        improved = rn < 0.98 * best
        best = jnp.minimum(best, rn)
        since = jnp.where(improved, 0, since + 1)
        return (x, r, z, p, rz_new, k + 1, best, since)

    state = (x0, r0, z0, z0, rz0, jnp.array(0, jnp.int32), best0, since0)
    x, r, _, _, rz, k, best, since = jax.lax.while_loop(cond, body, state)
    return SolveResult(x, k, jnp.sqrt(jnp.abs(rz)), best, since)


def chebyshev(
    matvec: Callable,
    b: jnp.ndarray,
    lam_min,
    lam_max,
    degree: int,
) -> jnp.ndarray:
    """Fixed-degree Chebyshev iteration for ``matvec`` SPD with spectrum
    window [lam_min, lam_max]: returns x_d = p_d(A) b where
    p_d = (1 - r_d)/lam and r_d is the degree-d Chebyshev residual
    polynomial on the window (r_d(0) = 1, |r_d| <= 2 q^d on the window,
    q = (sqrt(k)-1)/(sqrt(k)+1), k = lam_max/lam_min).

    No inner products (scan of fixed length — ideal under jit/TPU).  For
    eigencomponents BELOW lam_min the iteration applies a *soft truncated
    inverse*: p_d(lam) -> bounded as lam -> 0 instead of 1/lam, i.e. those
    components are deliberately (and stably) under-solved.  This is the
    device projector's regularization for near-dependent constraint rows
    (see shm3d.solve.projection)."""
    d = 0.5 * (lam_max + lam_min)
    c = 0.5 * (lam_max - lam_min)

    def body(carry, _):
        x, r, p, alpha, k = carry
        beta = jnp.where(k == 0, 0.0,
                         jnp.where(k == 1, 0.5 * (c * alpha) ** 2,
                                   (0.5 * c * alpha) ** 2))
        alpha = jnp.where(k == 0, 1.0 / d, 1.0 / (d - beta / alpha))
        p = r + beta * p
        x = x + alpha * p
        r = r - alpha * matvec(p)
        return (x, r, p, alpha, k + 1), None

    x0 = jnp.zeros_like(b)
    init = (x0, b, jnp.zeros_like(b), jnp.asarray(1.0, b.dtype),
            jnp.asarray(0, jnp.int32))
    (x, _, _, _, _), _ = jax.lax.scan(body, init, None, length=degree)
    return x


def chebyshev_degree(kappa: float, eps: float) -> int:
    """Degree d with Chebyshev residual 2 q^d <= eps on a window of
    condition ``kappa`` (q = (sqrt(kappa)-1)/(sqrt(kappa)+1))."""
    rk = float(np.sqrt(max(kappa, 1.0 + 1e-12)))
    q = (rk - 1.0) / (rk + 1.0)
    if q <= 0.0:
        return 1
    import math

    return max(1, int(math.ceil(math.log(2.0 / eps) / -math.log(q))))


def minres(
    matvec: Callable,
    b: jnp.ndarray,
    x0: Optional[jnp.ndarray] = None,
    precond: Optional[Callable] = None,
    tol: float = 1e-8,
    maxiter: int = 2000,
    rhs_mnorm=None,
) -> SolveResult:
    """Preconditioned MINRES (Paige & Saunders 1975) for symmetric
    (possibly indefinite) ``matvec`` with an SPD preconditioner.

    Used for the KKT saddle systems: the grid's always-on trilinear pinning
    (signed_heat_grid_solver.cpp:100-108) and the Multiple-constraint modes
    (signed_heat_tet_solver.cpp:211-217,286-292,382-389).
    """
    M = precond or _identity
    dtype = b.dtype
    eps = jnp.finfo(dtype).eps
    x0 = jnp.zeros_like(b) if x0 is None else x0

    r1 = b - matvec(x0)
    y = M(r1)
    beta1 = jnp.sqrt(jnp.abs(jnp.vdot(r1, y)))
    ref = beta1 if rhs_mnorm is None else rhs_mnorm
    threshold = tol * jnp.maximum(ref, jnp.finfo(dtype).tiny)

    class _S(NamedTuple):
        x: jnp.ndarray
        r1: jnp.ndarray
        r2: jnp.ndarray
        y: jnp.ndarray
        w: jnp.ndarray
        w2: jnp.ndarray
        oldb: jnp.ndarray
        beta: jnp.ndarray
        dbar: jnp.ndarray
        epsln: jnp.ndarray
        phibar: jnp.ndarray
        cs: jnp.ndarray
        sn: jnp.ndarray
        k: jnp.ndarray

    f = lambda v: jnp.asarray(v, dtype)
    init = _S(
        x0, r1, r1, y,
        jnp.zeros_like(b), jnp.zeros_like(b),
        f(0.0), beta1, f(0.0), f(0.0), beta1, f(-1.0), f(0.0),
        jnp.array(0, jnp.int32),
    )

    def cond(s: _S):
        return (s.phibar > threshold) & (s.k < maxiter) & (s.beta > 0)

    def body(s: _S):
        v = s.y / s.beta
        y = matvec(v)
        y = jnp.where(s.k >= 1, y - (s.beta / s.oldb) * s.r1, y)
        alfa = jnp.real(jnp.vdot(v, y))
        y = y - (alfa / s.beta) * s.r2
        r1, r2 = s.r2, y
        y = M(r2)
        oldb = s.beta
        beta = jnp.sqrt(jnp.abs(jnp.vdot(r2, y)))

        oldeps = s.epsln
        delta = s.cs * s.dbar + s.sn * alfa
        gbar = s.sn * s.dbar - s.cs * alfa
        epsln = s.sn * beta
        dbar = -s.cs * beta
        gamma = jnp.maximum(jnp.sqrt(gbar * gbar + beta * beta), eps)
        cs = gbar / gamma
        sn = beta / gamma
        phi = cs * s.phibar
        phibar = sn * s.phibar

        w1 = s.w2
        w2 = s.w
        w = (v - oldeps * w1 - delta * w2) / gamma
        x = s.x + phi * w
        return _S(x, r1, r2, y, w, w2, oldb, beta, dbar, epsln, phibar, cs, sn, s.k + 1)

    out = jax.lax.while_loop(cond, body, init)
    return SolveResult(out.x, out.k, out.phibar)
