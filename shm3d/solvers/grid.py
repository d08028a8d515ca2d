"""TPU-native grid solver: the device pipeline for the regular-grid domain.

End-to-end reimplementation of ``SignedHeatGridSolver``
(/root/reference/src/signed_heat_grid_solver.cpp) as a JAX program:

  host:   sources + grid spec + trilinear constraint rows   (NumPy, cached)
  device: Pallas Yukawa convolution -> normalize -> adjoint divergence ->
          projected MG-PCG solve -> mean shift               (one jit chain)

The always-on soft zero-set pinning (KKT [[L, A^T],[A, 0]], phi = -u,
signed_heat_grid_solver.cpp:77-109) is solved matrix-free with the
*null-space method* (shm3d.solve.projection): multigrid-preconditioned CG on
the SPD projected system P H P u = P b, P = I - A^T (A A^T)^{-1} A, H = -L.
This replaces both the reference's direct LU on the saddle and round 1's
MINRES-with-diagonal-Schur (which needed thousands of iterations and did not
converge at 128^3); the projected solve is mesh-size robust because MG
preconditions the full SPD block and the constraint Gram matrix A A^T is
local and mass-matrix conditioned.  A MINRES-on-KKT path is retained behind
``options.solver_method`` for comparison.

Optional float64 defect correction recovers near-f64 accuracy from f32
device solves (skipped automatically when the f64 residual already meets the
refine target).

Operator caching: discretization artifacts are cached keyed on
(geometry hash, hCoef, scale, dtype), replacing the reference's ``rebuild``
flag contract (/root/reference/src/main.cpp:113,146-147; README.md:73).
"""

from __future__ import annotations

import dataclasses
import functools
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SignedHeatOptions
from ..domains import grid as griddom
from ..geometry import sources as src_mod
from ..io.mesh_io import Mesh, PointCloud
from ..ops import stencil
from ..ops.yukawa import yukawa_field
from ..solve import krylov, multigrid, projection
from ..utils import checks, diskcache, timing


class GridResult:
    """Solve result.  ``phi`` is fully computed on device when
    ``compute_distance`` returns (the solve blocks on it); the host copy is
    pulled lazily on first access — over the remote TPU tunnel the (N,)
    transfer costs ~0.5 s at 128^3 and device-side consumers (isosurface
    extraction, downstream jnp ops) never need it."""

    def __init__(self, phi_dev, grid: griddom.GridSpec, Y=None, u_dev=None):
        self._phi_dev = phi_dev
        self._phi_host: Optional[np.ndarray] = None
        self.grid = grid
        # (N, 3) normalized vector field; left on device (jax array) to avoid
        # an eager host transfer — np.asarray(result.Y) pulls it when needed.
        self.Y = Y
        # (N,) primal solution of the projected system BEFORE the phi = -u
        # sign flip and mean shift (exact-integration path only).
        self.u_device = u_dev

    @property
    def phi(self) -> np.ndarray:
        if self._phi_host is None:
            self._phi_host = np.asarray(self._phi_dev, dtype=np.float64)
        return self._phi_host

    @property
    def phi_device(self):
        """The (N,) device array (reference flat ordering)."""
        return self._phi_dev

    def phi3(self) -> np.ndarray:
        return self.phi.reshape(self.grid.shape)


# Largest grid (total nodes) the f64 defect correction attempts on one
# chip: beyond it the pair-refinement working set OOMs a 16 GB v5e
# (measured at 512^3 = 134M nodes; 256^3 = 16.8M fits with >10x headroom).
REFINE_MAX_NODES = 100_000_000


# ---------------------------------------------------------------------------
# jitted device stages


@functools.partial(jax.jit, static_argnames=("n", "dtype"))
def _node_positions_device(bbox_min, cell_size, n: int, dtype):
    r = jnp.arange(n, dtype=dtype) * cell_size
    z, y, x = jnp.meshgrid(r, r, r, indexing="ij")
    pos = jnp.stack([x, y, z], axis=-1).reshape(-1, 3)
    return pos + jnp.asarray(bbox_min, dtype=dtype)[None, :]


@functools.partial(jax.jit, static_argnames=("shape", "guard_nans"))
def _rhs_div(Y, cell_size, shape, guard_nans: bool):
    """Adjoint divergence of the normalized field (+ NaN guard)."""
    div = stencil.divergence_apply(Y.reshape(*shape, 3), cell_size).reshape(-1)
    if guard_nans:
        # mesh-on-grid path only (signed_heat_grid_solver.cpp:72-74)
        div = jnp.where(jnp.isfinite(div), div, 0.0)
    return div


@functools.partial(jax.jit, static_argnames=("shape", "tol", "chunk"))
def _pinned_pcg_chunk(b, x0, nodes8, coeffs8, gram, cell_size, shape, tol: float, chunk: int,
                      pins=None):
    """One bounded chunk of projected MG-PCG on P H P u = P b, warm-started
    from x0.  (Chunked because the TPU runtime kills minutes-long single
    programs; see shm3d.tet.solver CHUNK_ITERS.)  ``b`` is the (N,) primal
    right-hand side; iterates live in ker(A).  Both the matvec and the
    preconditioner project: the residual must stay in the projected space
    for the MG application to see only ker(A) content (applying MG to an
    unprojected residual builds wrong search directions — a tempting
    one-projection 'PPCG' shortcut that measurably diverges)."""
    dtype = b.dtype
    N = b.shape[0]
    proj = projection.make_projector(nodes8, coeffs8, gram, N)
    mg = multigrid.make_node_preconditioner(shape, cell_size, dtype=dtype,
                                            pins=pins)

    def matvec(u):
        # u stays in ker(A) along the Krylov recurrence, so P H P u = P (H u).
        return proj(-stencil.laplacian_apply(u.reshape(shape), cell_size).reshape(-1))

    def precond(r):
        return proj(mg(r))

    Pb = proj(b)
    rhs_mnorm = jnp.sqrt(jnp.abs(jnp.vdot(Pb, precond(Pb))))
    res = krylov.cg(matvec, Pb, x0=x0, precond=precond, tol=tol, maxiter=chunk,
                    rhs_mnorm=rhs_mnorm, stall_window=60)
    rel = res.residual / jnp.maximum(rhs_mnorm, jnp.finfo(b.dtype).tiny)
    return res.x, res.iterations, rel


def _solve_pinned(
    b, nodes8, coeffs8, gram, cell_size, shape, tol: float, maxiter: int,
    x0=None, chunk: Optional[int] = None, host_gram=None, pins=None,
):
    """Chunked projected MG-PCG.  Returns (u, iters, resid) with u in ker(A);
    phi = -u (signed_heat_grid_solver.cpp:108).

    Chunking (warm restarts) only matters on TPU where the runtime kills
    long-running programs; on other backends the solve runs in larger chunks.
    A chunk that fails to shrink the preconditioned residual marks a stall
    (dtype roundoff floor) and stops early instead of burning maxiter.

    When the Gram table has no whitening artifacts (m > ORTHO_GRAM_CAP and
    subsampling disabled), the loop runs at the Python level with the exact
    f64 host projection (_solve_pinned_hostproj)."""
    if gram.bmat is None and gram.tmat is None:
        if host_gram is None:
            host_gram = projection.host_gram_factor(
                np.asarray(nodes8), np.asarray(coeffs8, np.float64), b.shape[0]
            )
        return _solve_pinned_hostproj(
            b, nodes8, coeffs8, host_gram, cell_size, shape, tol, maxiter, x0=x0
        )
    if chunk is None:
        chunk = 200 if jax.default_backend() == "tpu" else min(maxiter, 500)
    u = jnp.zeros_like(b) if x0 is None else x0
    total = 0
    resid = jnp.asarray(jnp.inf, b.dtype)
    while True:
        this = min(chunk, maxiter - total)
        if this <= 0:
            break
        prev = float(resid)
        u, iters, resid = _pinned_pcg_chunk(
            b, u, nodes8, coeffs8, gram, cell_size, shape, tol, this, pins
        )
        total += int(iters)
        if int(iters) < this:
            break
        if float(resid) >= prev * 0.99:  # stalled at the dtype roundoff floor
            break
    return u, total, resid


# --- large-m tier: Python-level PCG with exact f64 host projection --------

# Measured at 256^3 (SprayBottle): a stronger 2-V-cycle preconditioner left
# the host-projected iteration count unchanged (56 -> 56) — the count is set
# by the f32 noise floor and constraint coupling, not by smooth-mode
# convergence — so the extra cycle is pure overhead.  Kept as a constant for
# future experiments.
HOSTPROJ_MG_CYCLES = 1


@jax.jit
def _a_apply_j(v, nodes8, coeffs8):
    return projection.a_apply(v, nodes8, coeffs8)


@jax.jit
def _sub_at_j(v, z, nodes8, coeffs8):
    return v - projection.at_apply(z, nodes8, coeffs8, v.shape[0])


@functools.partial(jax.jit, static_argnames=("shape",))
def _hmatvec_j(u, cell_size, shape):
    return -stencil.laplacian_apply(u.reshape(shape), cell_size).reshape(-1)


@functools.partial(jax.jit, static_argnames=("shape", "cycles"))
def _mg_j(r, cell_size, shape, cycles: int = 1):
    return multigrid.make_node_preconditioner(
        shape, cell_size, dtype=r.dtype, cycles=cycles
    )(r)


@functools.partial(jax.jit, static_argnames=("shape",))
def _hp_step1(p, nodes8, coeffs8, cell_size, shape):
    """H p and the constraint image of the raw matvec (first host solve)."""
    Ap_raw = -stencil.laplacian_apply(p.reshape(shape), cell_size).reshape(-1)
    return Ap_raw, projection.a_apply(Ap_raw, nodes8, coeffs8)


@functools.partial(jax.jit, static_argnames=("shape", "cycles"))
def _hp_step2(u, r, p, Ap_raw, z1, rz, nodes8, coeffs8, cell_size, shape,
              cycles: int = 1):
    """Finish the projected matvec, take the CG step, start the projected
    preconditioner application (second host solve)."""
    N = u.shape[0]
    Ap = Ap_raw - projection.at_apply(z1, nodes8, coeffs8, N)
    pAp = jnp.vdot(p, Ap)
    # guard 0/0 after in-batch convergence (the host checks residuals only
    # every CHECK_EVERY iterations)
    alpha = jnp.where(pAp != 0, rz / pAp, 0.0)
    u = u + alpha * p
    r = r - alpha * Ap
    Mr = multigrid.make_node_preconditioner(
        shape, cell_size, dtype=r.dtype, cycles=cycles
    )(r)
    return u, r, Mr, projection.a_apply(Mr, nodes8, coeffs8)


@jax.jit
def _hp_step3(r, Mr, z2, p, rz, nodes8, coeffs8):
    """Finish the projected preconditioner, update the search direction."""
    z = Mr - projection.at_apply(z2, nodes8, coeffs8, r.shape[0])
    rz_new = jnp.vdot(r, z)
    p = z + jnp.where(rz != 0, rz_new / rz, 0.0) * p
    return p, rz_new


# --- two-float (pair) defect correction, device-resident ------------------
# See solve/twofloat module docstring.  Only the cancelling sums (rhs
# divergence, residual b - H u, accumulation of corrections into u) carry
# pairs; the projection's Gram solve stays the exact host f64 splu (cheap
# (m,)-sized crossings), and the correction solve is the ordinary f32
# projected MG-PCG — its rounding is relative to the already-small residual.


@functools.partial(jax.jit, static_argnames=("cell_size", "shape", "guard_nans"))
def _pair_rhs(Y, cell_size: float, shape, guard_nans: bool):
    """b = -div(Y) as an (hi, lo) pair, with the mesh-path NaN guard applied
    to both components (signed_heat_grid_solver.cpp:72-74)."""
    d = stencil.divergence_apply_pair(Y.reshape(*shape, 3), cell_size)
    hi, lo = -d[0].reshape(-1), -d[1].reshape(-1)
    if guard_nans:
        ok = jnp.isfinite(hi) & jnp.isfinite(lo)
        hi = jnp.where(ok, hi, 0.0)
        lo = jnp.where(ok, lo, 0.0)
    return hi, lo


@functools.partial(jax.jit, static_argnames=("cell_size", "shape"))
def _pair_residual(b_hi, b_lo, u_hi, u_lo, nodes8, coeffs8, cell_size: float,
                   shape):
    """r = b - H u in pair precision (H = -L, so r = b + L u) plus the
    constraint image A r (one (m,)-sized host pull for the Gram solve)."""
    from ..solve import twofloat as tf

    lap = stencil.laplacian_apply_pair(
        u_hi.reshape(shape), u_lo.reshape(shape), cell_size)
    r = tf.add((b_hi, b_lo), (lap[0].reshape(-1), lap[1].reshape(-1)))
    a = projection.a_apply_pair(r[0], r[1], nodes8, coeffs8[0], coeffs8[1])
    return r[0], r[1], a[0], a[1]


@jax.jit
def _pair_project_finish(r_hi, r_lo, z1, z2, at_nodes, at_rows, at_chi, at_clo):
    """r <- r - A^T z with z = (AA^T)^{-1} A r from the host Gram solve,
    delivered as the f32 pair (z1, z2) and applied through the exact
    transposed-ELL gather (projection.at_sub_pair); returns the projected
    pair plus ||r_hi||^2 and max|r_hi| (scalars pulled by the host
    driver)."""
    r_hi, r_lo = projection.at_sub_pair(r_hi, r_lo, z1, z2,
                                        at_nodes, at_rows, at_chi, at_clo)
    return r_hi, r_lo, jnp.vdot(r_hi, r_hi), jnp.abs(r_hi).max()


@jax.jit
def _pair_axpy(u_hi, u_lo, d, nodes8, c_hi, c_lo):
    """(u_hi, u_lo) + d without losing the accumulated low part, plus the
    pair-accurate constraint image of the updated iterate (for the host
    Gram solve that re-projects it onto ker(A) — the correction only lies
    in the kernel to its own solver tolerance, and without re-projection
    the drift's P H w term floors refinement near 1e-9)."""
    from ..solve import twofloat as tf

    u = tf.add((u_hi, u_lo), (d, jnp.zeros_like(d)))
    a = projection.a_apply_pair(u[0], u[1], nodes8, c_hi, c_lo)
    return u[0], u[1], a[0], a[1]


@jax.jit
def _pair_a_j(v_hi, v_lo, nodes8, c_hi, c_lo):
    a = projection.a_apply_pair(v_hi, v_lo, nodes8, c_hi, c_lo)
    return a[0], a[1]


def _solve_pinned_hostproj(
    b, nodes8, coeffs8, host_gram, cell_size, shape, tol: float, maxiter: int, x0=None
):
    """Projected MG-PCG driven from Python: the N-space matvec/MG run as
    jitted device programs, the Gram solve of each projection runs on host
    in exact f64 (sparse splu; only the (m,) constraint vectors cross the
    host<->device boundary).  This is the m > ORTHO_GRAM_CAP tier — the
    cond-1e7 Gram admits no f32-stable device factorization at this size,
    and the axon plugin lacks host callbacks that would let the host solve
    ride inside a jitted loop (see projection.GramTable).

    The iteration is fused into three device programs so each pass costs
    exactly two synchronous (m,)-sized device->host pulls (the Gram RHS of
    the matvec and preconditioner projections) plus async dispatches; the
    convergence scalar is pulled every CHECK_EVERY iterations.  Over the
    remote TPU tunnel this is what bounds per-iteration latency."""
    A_h, lu = host_gram
    dtype = b.dtype
    # Residual checks are cheap (one scalar pull) but stall detection costs
    # real iterations: the loop stops only after STALL_CHECKS consecutive
    # checks without a 2% improvement on the best residual seen, i.e. up to
    # CHECK_EVERY*STALL_CHECKS wasted iterations at the f32 roundoff floor
    # (~110 ms each at 256^3 over the tunnel).  The patience cannot be
    # arbitrarily tight: PCG's preconditioned residual is NON-monotonic
    # (measured at 256^3: best 7.9e-2 at iter 12, a 6x bump peaking at iter
    # 24, new best at iter 32) — 6 checks of 4 tolerate a ~24-iteration
    # excursion while still halving the old 8x8 stall proof.
    CHECK_EVERY = 4
    STALL_CHECKS = 6

    def proj(v):
        a = np.asarray(_a_apply_j(v, nodes8, coeffs8), dtype=np.float64)
        z = lu.solve(a)
        return _sub_at_j(v, jnp.asarray(z, dtype), nodes8, coeffs8)

    Pb = proj(b)
    z0 = proj(_mg_j(Pb, cell_size, shape, cycles=HOSTPROJ_MG_CYCLES))
    bnorm = float(jnp.sqrt(jnp.abs(jnp.vdot(Pb, z0))))
    threshold = tol * max(bnorm, float(np.finfo(np.float32).tiny))

    # warm starts (cascadic coarse-level prolongation) arrive outside ker(A);
    # the iteration only corrects within ker(A), so project first
    u = jnp.zeros_like(b) if x0 is None else proj(x0)
    r = Pb - proj(_hmatvec_j(u, cell_size, shape))
    z = proj(_mg_j(r, cell_size, shape, cycles=HOSTPROJ_MG_CYCLES))
    rz = jnp.vdot(r, z)
    p = z
    best = float(jnp.sqrt(jnp.abs(rz)))
    resid = best
    since = 0
    k = 0
    while resid > threshold and k < maxiter and since < STALL_CHECKS:
        for _ in range(min(CHECK_EVERY, maxiter - k)):
            Ap_raw, a1 = _hp_step1(p, nodes8, coeffs8, cell_size, shape)
            z1 = jnp.asarray(lu.solve(np.asarray(a1, np.float64)), dtype)
            u, r, Mr, a2 = _hp_step2(u, r, p, Ap_raw, z1, rz,
                                     nodes8, coeffs8, cell_size, shape,
                                     cycles=HOSTPROJ_MG_CYCLES)
            z2 = jnp.asarray(lu.solve(np.asarray(a2, np.float64)), dtype)
            p, rz = _hp_step3(r, Mr, z2, p, rz, nodes8, coeffs8)
            k += 1
        resid = float(jnp.sqrt(jnp.abs(rz)))
        if resid < 0.98 * best:
            best, since = resid, 0
        else:
            since += 1
    # report a RELATIVE residual (the chunk tier does the same)
    return u, k, jnp.asarray(resid / max(bnorm, np.finfo(np.float64).tiny), b.dtype)


# --- legacy MINRES-on-KKT path (options.solver_method == "minres_kkt") ----


def _kkt_matvec(x, nodes8, coeffs8, cell_size, shape):
    """[[-L, -A^T], [-A, 0]] applied to x = concat(u, mu)."""
    N = shape[0] * shape[1] * shape[2]
    u, mu = x[:N], x[N:]
    Hu = -stencil.laplacian_apply(u.reshape(shape), cell_size).reshape(-1)
    At_mu = projection.at_apply(mu, nodes8, coeffs8, N)
    Au = projection.a_apply(u, nodes8, coeffs8)
    return jnp.concatenate([Hu - At_mu, -Au])


@functools.partial(jax.jit, static_argnames=("shape", "tol", "chunk"))
def _kkt_minres_chunk(rhs, x0, nodes8, coeffs8, cell_size, shape, tol: float, chunk: int):
    """One bounded MINRES chunk on the KKT saddle, warm-started from x0.
    Block-diagonal preconditioner: MG V-cycle for the u-block, diagonal Schur
    estimate for the multipliers.  Retained for comparison; the projected
    solver above converges orders of magnitude faster at scale."""
    dtype = rhs.dtype
    m = nodes8.shape[0]
    N = rhs.shape[0] - m

    matvec = functools.partial(
        _kkt_matvec, nodes8=nodes8, coeffs8=coeffs8, cell_size=cell_size, shape=shape
    )
    diag_H = -stencil.laplacian_diagonal(shape, cell_size, dtype=dtype).reshape(-1)
    diag_S = jnp.sum(coeffs8 * coeffs8 / diag_H[nodes8], axis=1)
    mg = multigrid.make_node_preconditioner(shape, cell_size, dtype=dtype)

    def precond(r):
        return jnp.concatenate([mg(r[:N]), r[N:] / diag_S])

    rhs_mnorm = jnp.sqrt(jnp.abs(jnp.vdot(rhs, precond(rhs))))
    res = krylov.minres(matvec, rhs, x0=x0, precond=precond, tol=tol, maxiter=chunk,
                        rhs_mnorm=rhs_mnorm)
    return res.x, res.iterations, res.residual


def _solve_kkt_minres(b, nodes8, coeffs8, cell_size, shape, tol, maxiter, chunk=None):
    if chunk is None:
        chunk = 200 if jax.default_backend() == "tpu" else maxiter
    m = nodes8.shape[0]
    rhs = jnp.concatenate([b, jnp.zeros(m, dtype=b.dtype)])
    x = jnp.zeros_like(rhs)
    total = 0
    resid = jnp.asarray(0.0, b.dtype)
    while True:
        this = min(chunk, maxiter - total)
        if this <= 0:
            break
        x, iters, resid = _kkt_minres_chunk(
            rhs, x, nodes8, coeffs8, cell_size, shape, tol, this
        )
        total += int(iters)
        if int(iters) < this:
            break
    N = b.shape[0]
    return x[:N], total, resid


def _integrate_exact(
    Y, nodes8, coeffs8, cell_size, shape, guard_nans: bool, tol: float, maxiter: int,
    method: str = "projected_cg", gram=None, x0=None, chunk: Optional[int] = None,
    host_gram=None, pins=None,
):
    """divergence + NaN guard + constrained Poisson solve.  Returns
    (u, iters, resid) with u the (N,) primal solution; phi = -u."""
    div = _rhs_div(Y, cell_size, shape, guard_nans)
    b = -div
    if method == "minres_kkt":
        return _solve_kkt_minres(b, nodes8, coeffs8, cell_size, shape, tol, maxiter,
                                 chunk=chunk)
    if gram is None:
        gram = projection.build_gram_table(
            np.asarray(nodes8), np.asarray(coeffs8, np.float64), b.shape[0], b.dtype
        )
    return _solve_pinned(b, nodes8, coeffs8, gram, cell_size, shape, tol, maxiter,
                         x0=x0, chunk=chunk, host_gram=host_gram, pins=pins)


@functools.partial(jax.jit, static_argnames=())
def _mean_shift(phi, src_nodes8, src_coeffs8, weights):
    """Weighted average of the trilinear interpolant along the source
    (signed_heat_grid_solver.cpp:466-496) and subtraction."""
    vals = jnp.sum(phi[src_nodes8] * src_coeffs8, axis=1)
    shift = jnp.sum(weights * vals) / jnp.sum(weights)
    return phi - shift


# ---------------------------------------------------------------------------
# float64 residual for defect correction (host NumPy mirror of the
# device operators; adjointness/mirroring identical by construction)


def _laplacian_apply_np(u3: np.ndarray, cell: float) -> np.ndarray:
    acc = -6.0 * u3
    for axis in range(3):

        def shift(arr, d):
            pad = [(0, 0)] * 3
            pad[axis] = (1, 0) if d < 0 else (0, 1)
            padded = np.pad(arr, pad, mode="edge")
            sl = [slice(None)] * 3
            sl[axis] = slice(1, None) if d > 0 else slice(0, -1)
            return padded[tuple(sl)]

        acc = acc + shift(u3, +1) + shift(u3, -1)
    return acc / (cell * cell)


# ---------------------------------------------------------------------------
# solver with operator caching


class GridSolver:
    """Stateful grid solver mirroring the reference caching contract.

    Pass a ``jax.sharding.Mesh`` (shm3d.parallel.device_mesh; 1-D
    single-slice or 2-D ("s", "d") multi-slice) to run
    multi-chip: Step 1 uses the ring schedule (sources rotate over ICI,
    queries stay z-slab-resident) and Step 3's stencils/Krylov iterations
    run under jit on z-slab-sharded fields with XLA-inserted halo
    collectives.  One code path serves 1 and N devices; results match the
    single-device solve (tests/test_parallel.py)."""

    def __init__(self, mesh=None):
        self._cache = {}
        self.mesh = mesh
        self.last_stats = {}

    def compute_distance(self, geom, options: SignedHeatOptions = SignedHeatOptions()) -> GridResult:
        tm = timing.PhaseTimer(verbose=options.verbose)
        is_mesh = isinstance(geom, Mesh)
        dtype = jnp.dtype(options.dtype)
        tol = options.resolved_solver_tol()
        self.last_stats = {}

        with tm.phase("precompute (sources + grid + constraints)"):
            # "g2": artifact-encoding version — r5 replaced the subsampled
            # gram artifacts with the full-row tform marker at 8.2k<m<=24.6k
            key = (diskcache.geometry_content_hash(geom), options.cache_key())
            cached = self._cache.get(key)
            if cached is None:
                arrays = (diskcache.load(("grid", "g2") + key)
                          if options.disk_cache else None)
                if arrays is not None:
                    tm.note("operator cache: disk hit")
                else:
                    arrays = self._build_host_arrays(geom, options)
                    if options.disk_cache:
                        diskcache.save(("grid", "g2") + key, arrays)
                cached = self._cached_from_arrays(arrays, dtype)
                self._cache[key] = cached
            grid = cached["grid"]

        t = options.t_coef * float(cached["spacing"]) ** 2
        lam = float(np.sqrt(1.0 / t))

        use_mesh = self.mesh is not None
        if use_mesh and grid.n % self.mesh.devices.size != 0:
            tm.note(f"grid n={grid.n} not divisible by {self.mesh.devices.size} "
                    "devices; falling back to single-device")
            use_mesh = False

        with tm.phase("steps 1&2 (Yukawa convolution + normalize)"):
            queries = cached.get("queries")
            if queries is None:
                queries = _node_positions_device(
                    jnp.asarray(grid.bbox_min, dtype), jnp.asarray(grid.cell_size, dtype),
                    grid.n, dtype,
                )
                if use_mesh:
                    from ..parallel import shards

                    queries = jax.device_put(queries, shards.node_sharding(self.mesh))
                cached["queries"] = queries
            use_shell = (
                options.step1_method == "shell"
                or (options.step1_method == "auto" and grid.n >= options.shell_auto_n)
            )
            if use_shell:
                from ..ops import farfield

                plan_key = ("shell_plan", "v2", lam, options.shell_t,
                            options.shell_coarse_factor)
                plan = cached.get(plan_key)
                if plan is None:
                    arrays = (
                        diskcache.load(("grid_shell",) + key + plan_key)
                        if options.disk_cache else None
                    )
                    if arrays is not None:
                        plan = farfield.ShellPlan.from_arrays(arrays)
                    else:
                        plan = farfield.build_shell_plan(
                            grid, np.asarray(cached["points"], np.float64), lam,
                            options.shell_t, options.shell_coarse_factor,
                        )
                        if options.disk_cache:
                            diskcache.save(("grid_shell",) + key + plan_key,
                                           plan.arrays())
                    plan = farfield.DeviceShellPlan(plan)
                    cached[plan_key] = plan
                tm.note(
                    f"shell decomposition: {plan.shell_fraction:.1%} exact nodes"
                    f" + {plan.m}^3 coarse lattice"
                )
                Y = farfield.yukawa_field_shell(
                    plan, cached["points"], cached["vectors"], lam, grid.n,
                    mesh=self.mesh,
                )
            elif use_mesh:
                from ..parallel import yukawa_field_ring

                Y = yukawa_field_ring(
                    queries, cached["points"], cached["vectors"], lam, self.mesh
                )
            else:
                Y = yukawa_field(queries, cached["points"], cached["vectors"], lam)
            Y.block_until_ready()
            # sanitizer (--debug / SHM3D_DEBUG): unit rows except the
            # coincident-node singularity the divergence guard zeroes
            checks.check_unit_field("grid Step 2 field", Y)

        if options.fast_integration:
            if grid.n <= 32:
                # exact reference-BFS semantics (and oracle parity) where the
                # host loop is affordable
                self.last_stats["step3_path"] = "greedy-bfs"
                with tm.phase("step 3 (greedy BFS integration, host)"):
                    from ..oracle.reference import integrate_greedily_grid

                    phi_np = integrate_greedily_grid(grid, np.asarray(Y, dtype=np.float64))
                    phi = jnp.asarray(phi_np, dtype)
            else:
                # device wavefront variant (SURVEY §7 hard part 4): same
                # edge increments, level-synchronous spanning tree
                self.last_stats["step3_path"] = "greedy-wavefront"
                with tm.phase("step 3 (greedy wavefront integration, device)"):
                    from ..ops.wavefront import greedy_integrate_wavefront

                    tm.note(
                        "fast integration beyond 32^3 uses the device "
                        "wavefront spanning tree: same edge increments as the "
                        "reference BFS but a different (level-synchronous) "
                        "visit order, so path-dependent values differ"
                    )
                    phi = greedy_integrate_wavefront(
                        Y.astype(dtype), grid.cell_size, grid.shape
                    )
                    phi.block_until_ready()
        else:
            # (A cascadic coarse-level warm start was measured here and
            # removed: prolonging the h-1 solution cut only 56->60 fine
            # iterations — MG-PCG spends its iterations on f32 noise and
            # constraint coupling, not on the smooth error a coarse start
            # removes — while costing a full coarse-level solve.)
            self.last_stats["step3_path"] = "projected-mg-pcg"
            with tm.phase("step 3 (divergence + projected MG-PCG solve)"):
                if cached.get("pin_keep") is not None:
                    tm.note(
                        f"device solve pins {cached['pin_nodes8'].shape[0]} of "
                        f"{cached['nodes8'].shape[0]} rows (subsampled tier)"
                    )
                    if options.solver_tol is None:
                        # the fast tier's accuracy is bounded by the pin
                        # subsampling (~1e-3 relative, measured); iterating
                        # the Krylov solve to 1e-5 past that is wasted work
                        tol = max(tol, 1e-4)
                u, iters, resid = _integrate_exact(
                    Y,
                    cached["pin_nodes8"],
                    cached["pin_coeffs8"],
                    jnp.asarray(grid.cell_size, dtype),
                    grid.shape,
                    is_mesh,
                    tol,
                    options.solver_maxiter,
                    method=options.solver_method,
                    gram=cached["gram"],
                    host_gram=cached.get("host_gram"),
                    pins=self._pin_masks(cached, grid),
                )
                u.block_until_ready()
                tm.note(f"{options.solver_method} iters={int(iters)} rel_res={float(resid):.2e}")
                # primary-solve observables (bench_all "solve" detail; the
                # grid path used to record these only as a verbose note)
                self.last_stats["iters"] = int(iters)
                self.last_stats["rel_res"] = float(resid)
                checks.check_finite("grid Step 3 solution", u)
                if checks.enabled() and options.solver_method == "projected_cg":
                    # null-space invariant: the pinned rows hold on the iterate
                    checks.check_constraint(
                        "grid Step 3 pinning", u,
                        lambda v: projection.a_apply(
                            v, cached["pin_nodes8"], cached["pin_coeffs8"]
                        ),
                        b_scale=float(jnp.linalg.norm(u)),
                    )

            if (options.refine_steps > 0 and dtype == jnp.float32
                    and grid.total_nodes > REFINE_MAX_NODES):
                # 512^3-class grids: the pair-refinement working set
                # (~14 field-sized buffers + hostproj program temps on
                # 537 MB fields) exceeds the 16 GB chip — measured
                # RESOURCE_EXHAUSTED, and the failed attempt poisons the
                # heap for the ops that follow.  Predictable upfront skip
                # beats an unreliable recovery.
                self.last_stats["refine_skipped"] = (
                    f"grid {grid.total_nodes:,} nodes > REFINE_MAX_NODES")
                tm.note("refinement skipped: grid too large for the f64 "
                        "defect correction on one chip (f32 solution, "
                        "rel_res ~1e-5)")
            elif (options.refine_steps > 0 and dtype == jnp.float32
                    and not cached.get("_refine_oom")):
                with tm.phase("float64 defect correction"):
                    try:
                        u = self._refine(u, Y, cached, grid, is_mesh,
                                         options, tm)
                    except Exception as e:
                        # graceful degradation (SURVEY §5.3): at 512^3 the
                        # pair-refinement working set (b/u/r hi-lo pairs +
                        # hostproj program temps on 537 MB fields) exceeds
                        # the 16 GB chip (measured r5).  Keep the f32
                        # solution, warn once, and skip re-attempting for
                        # this discretization.
                        if "RESOURCE_EXHAUSTED" not in str(e):
                            raise
                        import warnings

                        cached["_refine_oom"] = True
                        self.last_stats["refine_skipped"] = "device OOM"
                        tm.note("refinement skipped: device memory "
                                "exhausted at this grid size; returning "
                                "the f32 solution")
                        warnings.warn(
                            "shm3d: f64 defect correction exhausted device "
                            "memory at this grid size; returning the f32 "
                            "fast-tier solution (rel_res ~1e-5)")
            phi = -u
            u_dev = u

        if options.fast_integration:
            u_dev = None
        with tm.phase("mean shift along source"):
            phi = _mean_shift(phi, cached["src_nodes8"], cached["src_coeffs8"], cached["weights"])
            if hasattr(phi, "block_until_ready"):
                phi.block_until_ready()  # the solve is done; only transfers remain
        checks.check_finite("grid phi", phi)

        # per-phase wall clock (Step 1 vs Step 3 split at scale; SURVEY §5.1)
        self.last_stats["phases"] = tm.as_dict()
        if tm.mem:  # device-memory high-water per phase (MB)
            self.last_stats["mem_peak_mb"] = dict(tm.mem)
        else:  # one end-of-solve high-water query (single device RTT)
            peak = timing.device_memory_peak_mb()
            if peak is not None:
                self.last_stats["mem_peak_mb"] = peak
        return GridResult(phi, grid, Y, u_dev=u_dev)

    def _refine(self, u, Y, cached, grid, is_mesh, options, tm=None):
        """Defect correction around the f32 device solve.

        Dispatches on ``options.refine_mode``: "pair" (default) runs the
        device-resident two-float path (_refine_pair); "host" computes exact
        f64 residuals of the projected system on host (cached splu
        factorization of the constraint Gram matrix), skips entirely when
        the f32 solve already meets ``options.refine_target``, and otherwise
        re-solves the scaled defect on device."""
        if options.refine_mode == "pair":
            return self._refine_pair(u, Y, cached, grid, is_mesh, options, tm)
        if options.refine_mode != "host":  # config validates; belt-and-braces
            raise ValueError(f"unknown refine_mode {options.refine_mode!r}")
        shape = grid.shape
        N = grid.total_nodes
        nodes8 = np.asarray(cached["nodes8"])
        coeffs8 = cached["coeffs8_f64"]
        host = cached.get("host_gram")
        if host is None:
            host = projection.host_gram_factor(nodes8, coeffs8, N)
            cached["host_gram"] = host
        A, gram_lu = host

        Y64 = np.asarray(Y, dtype=np.float64).reshape(*shape, 3)
        div64 = np.asarray(
            stencil.divergence_apply(jnp.asarray(Y64), jnp.float64(grid.cell_size))
        ).reshape(-1) if jax.config.jax_enable_x64 else self._div64_np(Y64, grid.cell_size)
        if is_mesh:
            div64 = np.where(np.isfinite(div64), div64, 0.0)
        b64 = -div64
        bnorm = np.linalg.norm(projection.host_project(b64, A, gram_lu))

        u64 = np.asarray(u, dtype=np.float64)
        # restore A u = 0 exactly before measuring the defect
        u64 = projection.host_project(u64, A, gram_lu)

        def _defect(u64):
            Hu = -_laplacian_apply_np(u64.reshape(shape), grid.cell_size).reshape(-1)
            r = projection.host_project(b64 - Hu, A, gram_lu)
            return r, np.linalg.norm(r) / max(bnorm, np.finfo(np.float64).tiny)

        r, rel = _defect(u64)
        rels = self.last_stats.setdefault("refine_pass_rels", [])
        rels.append(float(rel))
        # pass budget derived from the measured start (advisor r4: a fixed
        # refine_steps=1 pass could not reach refine_target); stagnation
        # (< 2x contraction) means the correction floor is reached
        for _ in range(options.refine_pass_budget(rel)):
            if not np.isfinite(rel) or rel <= options.refine_target:
                if tm is not None:
                    tm.note(f"refine skipped/stopped at rel_res={rel:.2e}")
                break
            scale = np.abs(r).max()
            # correction solve on device on the scaled residual
            dx = self._correction_solve(r / scale, cached, grid, options,
                                        rel=rel)
            u64 = u64 + scale * np.asarray(dx, dtype=np.float64)
            u64 = projection.host_project(u64, A, gram_lu)
            r, new_rel = _defect(u64)
            rels.append(float(new_rel))
            stalled = not np.isfinite(new_rel) or new_rel > 0.5 * rel
            rel = new_rel if np.isfinite(new_rel) else rel
            if stalled:
                break
        if rel is not None:
            # exact f64 relative residual of the projected system after the
            # last correction — the accuracy certificate bench.py reports
            self.last_stats["refine_rel_res"] = float(rel)
        return jnp.asarray(u64, jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)

    def _refine_pair(self, u, Y, cached, grid, is_mesh, options, tm=None):
        """Device-resident defect correction with two-float residuals.

        Functionally the "host" path (_refine) with the f64 host stencils
        replaced by error-free pair arithmetic on device: per pass, the only
        host<->device traffic is two (m,)-sized constraint vectors for the
        exact f64 Gram solve plus two scalars — vs the host path's (N,3)
        field pull, (N,) iterate round-trips and slow-host f64 stencils
        (measured ~60 s/solve at 256^3 over the TPU tunnel).  The f32
        correction solves are unchanged; ``refine_rel_res`` is the
        pair-measured relative residual of the projected system (exact to
        ~1e-6 of its own value — the f32 norm's accumulation error)."""
        from ..solve import twofloat as tf

        shape = grid.shape
        N = grid.total_nodes
        host = cached.get("host_gram")
        if host is None:
            host = projection.host_gram_factor(
                np.asarray(cached["nodes8"]), cached["coeffs8_f64"], N)
            cached["host_gram"] = host
        _, lu = host
        dtype = u.dtype
        nodes8 = jnp.asarray(np.asarray(cached["nodes8"]), jnp.int32)
        cpair = cached.get("_coeffs8_pair")
        if cpair is None:
            c64 = np.asarray(cached["coeffs8_f64"], np.float64)
            c_hi = c64.astype(np.float32)
            cpair = (jnp.asarray(c_hi), jnp.asarray((c64 - c_hi).astype(np.float32)))
            cached["_coeffs8_pair"] = cpair
        c_hi, c_lo = cpair
        at_table = cached.get("_at_table")
        if at_table is None:
            at_table = tuple(jnp.asarray(a) for a in projection.build_at_table(
                np.asarray(cached["nodes8"]), cached["coeffs8_f64"]))
            cached["_at_table"] = at_table
        cell = float(grid.cell_size)
        tiny = float(np.finfo(np.float64).tiny)

        # wall-clock attribution of the refinement (VERDICT r4 weak #3: the
        # 256^3 default-tier overhead was unexplained) — host Gram solves +
        # (m,) transfers vs device correction solves vs pair defects
        detail = self.last_stats.setdefault(
            "refine_detail", {"project_s": 0.0, "correction_s": 0.0})

        def project(r_hi, r_lo, a_hi, a_lo):
            t0 = time.perf_counter()
            z = lu.solve(np.asarray(a_hi, np.float64)
                         + np.asarray(a_lo, np.float64))
            z1 = z.astype(np.float32)
            z2 = (z - z1).astype(np.float32)
            out = _pair_project_finish(r_hi, r_lo, jnp.asarray(z1),
                                       jnp.asarray(z2), *at_table)
            jax.block_until_ready(out)
            detail["project_s"] += time.perf_counter() - t0
            return out

        b_hi, b_lo = _pair_rhs(Y, cell, shape, is_mesh)
        _, _, bn2, _ = project(b_hi, b_lo,
                               *_pair_a_j(b_hi, b_lo, nodes8, c_hi, c_lo))
        bnorm = max(float(np.sqrt(float(bn2))), tiny)

        # restore A u = 0 before measuring the defect (matches the host
        # path's exact-f64 iterate projection); the pair-accurate A keeps
        # the near-kernel cancellation faithful (projection.a_apply_pair)
        zero = jnp.zeros_like(u)
        u_hi, u_lo, _, _ = project(u, zero, *_pair_a_j(u, zero, nodes8,
                                                       c_hi, c_lo))

        def defect(u_hi, u_lo):
            r_hi, r_lo, a_hi, a_lo = _pair_residual(
                b_hi, b_lo, u_hi, u_lo, nodes8, cpair, cell, shape)
            r_hi, r_lo, rn2, rmax = project(r_hi, r_lo, a_hi, a_lo)
            return r_hi, r_lo, float(np.sqrt(float(rn2))) / bnorm, float(rmax)

        rels = self.last_stats.setdefault("refine_pass_rels", [])
        r_hi, _, rel, rmax = defect(u_hi, u_lo)
        rels.append(float("%.3e" % rel))
        # derived pass budget + stagnation guard (see _refine)
        for _ in range(options.refine_pass_budget(rel)):
            if not np.isfinite(rel) or rel <= options.refine_target:
                if tm is not None:
                    tm.note(f"pair refine skipped/stopped at rel_res={rel:.2e}")
                break
            scale = rmax if rmax > 0 else 1.0
            t0 = time.perf_counter()
            dx = self._correction_solve(r_hi / dtype.type(scale), cached,
                                        grid, options, rel=rel)
            jax.block_until_ready(dx)
            detail["correction_s"] += time.perf_counter() - t0
            u_hi, u_lo, au_hi, au_lo = _pair_axpy(
                u_hi, u_lo, jnp.asarray(dx, dtype) * dtype.type(scale),
                nodes8, c_hi, c_lo)
            u_hi, u_lo, _, _ = project(u_hi, u_lo, au_hi, au_lo)
            r_hi, _, new_rel, rmax = defect(u_hi, u_lo)
            rels.append(float("%.3e" % new_rel))
            stalled = not np.isfinite(new_rel) or new_rel > 0.5 * rel
            rel = new_rel if np.isfinite(new_rel) else rel
            if stalled:
                break
        self.last_stats["refine_rel_res"] = float(rel)
        if jax.config.jax_enable_x64:
            # CPU/x64: hand back the full pair precision (tests compare
            # against f64 oracles)
            return u_hi.astype(jnp.float64) + u_lo.astype(jnp.float64)
        return u_hi + u_lo  # f32 output: the pair collapses to hi

    def _pin_masks(self, cached, grid):
        """Per-level Dirichlet-penalty masks for the pin-aware V-cycle
        (multigrid.build_pin_masks), cached per discretization.  Gated by
        SHM3D_PIN_MG (default on; set 0 to fall back to the plain MG)."""
        if os.environ.get("SHM3D_PIN_MG", "1") == "0":
            return None
        pins = cached.get("pin_masks")
        if pins is None:
            pins = multigrid.build_pin_masks(
                np.asarray(cached["pin_nodes8"]), grid.shape)
            cached["pin_masks"] = pins
        return pins

    @staticmethod
    def _correction_tol(options, rel=None, exact_projector=True) -> float:
        """Per-pass tolerance for an f32 correction solve.

        Aim the pass at the REMAINING contraction (refine_target / rel)
        instead of a fixed value — each pass pays ~2 host Gram projections
        of fixed overhead, so fewer deeper passes win WHEN the solve can
        deliver them.  That depends on the projector tier (measured,
        SprayBottle):

        - bmat (exact orthonormalized rows, 128^3): per-pass contraction
          tracks tol — one 12-iteration pass at 1e-5 contracted 1.8e4x
          (vs 2 loose passes costing 1.54 s; adaptive: 1.19 s).
        - tmat (shifted full-row factor, 256^3): true f64 contraction
          SATURATES at ~1e-2 per pass regardless of tol (the eps-damped
          ker(W) mismatch bounds the correction direction); tol 1e-5
          burned 169 stall iterations for the same 20x a 6-iteration
          1e-2 pass achieves.  Clamp at refine_solver_tol there.

        Bucketed to DECADES because tol is a static jit argument:
        arbitrary floats would compile a fresh chunk program per pass
        (minutes over the tunnel); decades cap the variant count."""
        hi = options.refine_solver_tol
        if not exact_projector:
            return hi
        lo = 1e-5  # f32 Krylov floor (resolved_solver_tol)
        if rel is None or not np.isfinite(rel) or rel <= 0:
            return hi
        needed = options.refine_target / rel
        return float(min(max(10.0 ** np.ceil(np.log10(max(needed, lo))), lo),
                         hi))

    def _correction_solve(self, rhs_np, cached, grid, options, rel=None):
        """Projected MG-PCG on the defect (same operator, arbitrary RHS).

        When x64 is available (CPU backend) the correction runs in float64:
        the f32 dense-inverse projector carries an ~eps*sqrt(cond(AA^T))
        error floor that would otherwise cap refinement gains.  On TPU
        (x64 unavailable) the correction runs in f32 and refinement stops at
        that floor (see shm3d.solve.projection docstring).

        When the primary solve pinned a SUBSAMPLED row subset, the
        correction must enforce the FULL row set (a correction computed in
        the larger ker(A_sub) and projected back is not a contraction —
        measured: the defect iteration DIVERGES at ~2x/step), so it runs
        the host-projected loop with the exact f64 Gram factorization."""
        if cached.get("pin_keep") is not None:
            host = cached.get("host_gram")
            if host is None:
                host = projection.host_gram_factor(
                    np.asarray(cached["nodes8"]), cached["coeffs8_f64"],
                    grid.total_nodes,
                )
                cached["host_gram"] = host
            dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
            neutered = cached["gram"]._replace(bmat=None, tmat=None)
            u, _it, _ = _solve_pinned(
                jnp.asarray(rhs_np, dtype),
                jnp.asarray(np.asarray(cached["nodes8"]), jnp.int32),
                jnp.asarray(cached["coeffs8_f64"], dtype),
                neutered,
                dtype(grid.cell_size),
                grid.shape,
                (options.resolved_solver_tol("float64")
                 if jax.config.jax_enable_x64
                 else self._correction_tol(options, rel,
                                           exact_projector=False)),
                options.solver_maxiter,
                host_gram=host,
            )
            self.last_stats.setdefault("correction_iters", []).append(int(_it))
            return u
        if jax.config.jax_enable_x64:
            g64 = cached.get("gram64")
            if g64 is None:
                nodes8 = np.asarray(cached["nodes8"])
                coeffs8 = cached["coeffs8_f64"]
                g64 = (
                    jnp.asarray(coeffs8, jnp.float64),
                    projection.build_gram_table(
                        nodes8, coeffs8, grid.total_nodes, jnp.float64
                    ),
                )
                cached["gram64"] = g64
            coeffs8_64, gram64 = g64
            u, _it, _ = _solve_pinned(
                jnp.asarray(rhs_np, jnp.float64),
                cached["nodes8"],
                coeffs8_64,
                gram64,
                jnp.float64(grid.cell_size),
                grid.shape,
                options.resolved_solver_tol("float64"),
                options.solver_maxiter,
                host_gram=cached.get("host_gram"),
            )
            self.last_stats.setdefault("correction_iters", []).append(int(_it))
            return u
        # f32 corrections: the LOOSE per-pass tolerance (config
        # refine_solver_tol).  Chasing the primary tolerance on a defect
        # RHS is pure stall-grinding — the f64 contraction per pass is
        # bounded by the f32 representability of the correction, NOT by
        # CG's own residual (measured at 256^3: tol 1e-5 burned 169/180/146
        # iterations for 20x/6.4x/6.3x actual contraction; the derived pass
        # budget makes many cheap passes strictly better)
        u, _it, _ = _solve_pinned(
            jnp.asarray(rhs_np, jnp.float32),
            cached["pin_nodes8"],
            cached["pin_coeffs8"],
            cached["gram"],
            jnp.float32(grid.cell_size),
            grid.shape,
            self._correction_tol(
                options, rel,
                exact_projector=cached["gram"].bmat is not None),
            options.solver_maxiter,
            host_gram=cached.get("host_gram"),
            pins=self._pin_masks(cached, grid),
        )
        self.last_stats.setdefault("correction_iters", []).append(int(_it))
        return u

    @staticmethod
    def _div64_np(Y64: np.ndarray, cell: float) -> np.ndarray:
        """NumPy f64 adjoint divergence (used when x64 is disabled)."""
        shape = Y64.shape[:3]
        out = np.zeros(shape)
        comp_axis = {0: 2, 1: 1, 2: 0}
        for comp in range(3):
            axis = comp_axis[comp]
            g = Y64[..., comp] / cell
            n = shape[axis]
            sl = lambda a, b: tuple(
                slice(a, b) if ax == axis else slice(None) for ax in range(3)
            )
            # adjoint of: out[i] = u[i+1] - u[i] (i < n-1); out[n-1] = u[n-1] - u[n-2]
            acc = np.zeros(shape)
            sub = np.zeros(shape)
            # contribution +g[i] to u[i+1] for i < n-1
            acc[sl(1, n)] += g[sl(0, n - 1)]
            # contribution -g[i] to u[i] for i < n-1
            sub[sl(0, n - 1)] += g[sl(0, n - 1)]
            # last row: +g[n-1] to u[n-1], -g[n-1] to u[n-2]
            acc[sl(n - 1, n)] += g[sl(n - 1, n)]
            sub[sl(n - 2, n - 1)] += g[sl(n - 1, n)]
            out += acc - sub
        return out.reshape(-1)

    def _build_host_arrays(self, geom, options: SignedHeatOptions) -> dict:
        """Full host precompute as plain numpy arrays (the serializable
        operator-cache artifact): source quadrature, grid spec, constraint
        and source trilinear rows, Gram projection artifacts."""
        is_mesh = isinstance(geom, Mesh)
        dtype = jnp.dtype(options.dtype)
        sources = self._sources(geom)
        seed_pts = geom.vertices if is_mesh else geom.positions
        grid = griddom.build_grid(seed_pts, options.scale, options.h_coef)
        nodes8, coeffs8 = griddom.constraint_rows(grid, sources.points)
        src_nodes8, src_coeffs8 = griddom.trilinear_rows(grid, sources.points)
        pin_keep = None
        if (
            options.max_device_pins is not None
            and nodes8.shape[0] > projection.ORTHO_GRAM_CAP
            and nodes8.shape[0] <= projection.TFORM_FULL_CAP
            and dtype == jnp.dtype("float32")
        ):
            # full-row device tier (r5): shifted-Cholesky whitening of ALL
            # constraint rows, factor built on device at load.  Closes the
            # 256^3 accuracy gap the subsampled tier had (rel-L2 9.5e-4 ->
            # constraint parity on device) with no host-projected loop.
            gram_arrays = projection.build_tform_full_arrays(
                nodes8, coeffs8, grid.total_nodes
            )
        elif (
            options.max_device_pins is not None
            and nodes8.shape[0] > projection.ORTHO_GRAM_CAP
            and dtype == jnp.dtype("float32")
        ):
            # at-scale tier: the device solve pins a spatially subsampled,
            # well-conditioned row subset (full rows kept for refinement)
            pin_keep = griddom.subsample_pin_rows(
                grid, nodes8, coeffs8, options.max_device_pins
            )
            gram_arrays = projection.build_tform_arrays(
                nodes8[pin_keep], coeffs8[pin_keep], grid.total_nodes
            )
        else:
            gram_arrays = projection.build_gram_arrays(
                nodes8, coeffs8, grid.total_nodes, dtype
            )
        arrays = dict(
            grid_bbox_min=np.asarray(grid.bbox_min, np.float64),
            grid_cell=np.float64(grid.cell_size),
            grid_n=np.int64(grid.n),
            spacing=np.float64(sources.spacing),
            nodes8=nodes8.astype(np.int32),
            coeffs8=np.asarray(coeffs8, np.float64),
            src_nodes8=src_nodes8.astype(np.int32),
            src_coeffs8=np.asarray(src_coeffs8, np.float64),
            points=np.asarray(sources.points, np.float64),
            vectors=np.asarray(sources.vectors(), np.float64),
            weights=np.asarray(sources.weights, np.float64),
        )
        for k, v in gram_arrays.items():
            arrays["gram_" + k] = v
        if pin_keep is not None:
            arrays["pin_keep"] = pin_keep.astype(np.int32)
        return arrays

    def _cached_from_arrays(self, arrays: dict, dtype) -> dict:
        """Device-side operator cache entry from (possibly disk-loaded)
        host arrays."""
        grid = griddom.GridSpec(
            bbox_min=tuple(np.asarray(arrays["grid_bbox_min"], np.float64)),
            cell_size=float(arrays["grid_cell"]),
            n=int(arrays["grid_n"]),
        )
        gram_arrays = {
            k[len("gram_"):]: v for k, v in arrays.items() if k.startswith("gram_")
        }
        gram = projection.gram_from_arrays(gram_arrays, dtype)
        nodes8 = np.asarray(arrays["nodes8"])
        coeffs8 = np.asarray(arrays["coeffs8"], np.float64)
        pin_keep = arrays.get("pin_keep")
        if pin_keep is not None:
            pin_keep = np.asarray(pin_keep)
            pin_nodes8, pin_coeffs8 = nodes8[pin_keep], coeffs8[pin_keep]
        else:
            pin_nodes8, pin_coeffs8 = nodes8, coeffs8
        cached = dict(
            grid=grid,
            spacing=float(arrays["spacing"]),
            nodes8=jnp.asarray(nodes8, jnp.int32),
            coeffs8=jnp.asarray(coeffs8, dtype),
            coeffs8_f64=coeffs8,  # host copy for refinement
            pin_keep=pin_keep,
            pin_nodes8=jnp.asarray(pin_nodes8, jnp.int32),
            pin_coeffs8=jnp.asarray(pin_coeffs8, dtype),
            gram=gram,
            src_nodes8=jnp.asarray(arrays["src_nodes8"], jnp.int32),
            src_coeffs8=jnp.asarray(arrays["src_coeffs8"], dtype),
            points=jnp.asarray(arrays["points"], dtype),
            vectors=jnp.asarray(arrays["vectors"], dtype),
            weights=jnp.asarray(arrays["weights"], dtype),
        )
        if gram.bmat is None and gram.tmat is None:
            # host-projected tier: the solve projects through the exact f64
            # host factorization every iteration — build it up front (splu)
            cached["host_gram"] = projection.host_gram_factor(
                nodes8, coeffs8, grid.total_nodes
            )
        return cached

    def _sources(self, geom) -> src_mod.SourceDistribution:
        cache_attr = "_shm3d_sources"
        cached = getattr(geom, cache_attr, None)
        if cached is None:
            cached = src_mod.from_geometry(geom)
            try:
                setattr(geom, cache_attr, cached)
            except Exception:
                pass
        return cached


def solve_grid(geom, options: SignedHeatOptions = SignedHeatOptions()) -> GridResult:
    return GridSolver().compute_distance(geom, options)
