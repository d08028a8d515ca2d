"""TPU-native grid solver: the device pipeline for the regular-grid domain.

End-to-end reimplementation of ``SignedHeatGridSolver``
(/root/reference/src/signed_heat_grid_solver.cpp) as a JAX program:

  host:   sources + grid spec + trilinear constraint rows   (NumPy, cached)
  device: Pallas Yukawa convolution -> normalize -> adjoint divergence ->
          MINRES KKT solve -> mean shift                    (one jit chain)

The always-on soft zero-set pinning (KKT [[L, A^T],[A, 0]], phi = -u,
signed_heat_grid_solver.cpp:77-109) is solved matrix-free with preconditioned
MINRES in the symmetrized form [[-L, -A^T], [-A, 0]] [u; mu] = [-div; 0].
Optional float64 iterative refinement recovers near-f64 accuracy from f32
device solves.

Operator caching: discretization artifacts are cached keyed on
(geometry hash, hCoef, scale, dtype), replacing the reference's ``rebuild``
flag contract (/root/reference/src/main.cpp:113,146-147; README.md:73).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SignedHeatOptions
from ..domains import grid as griddom
from ..geometry import sources as src_mod
from ..io.mesh_io import Mesh, PointCloud
from ..ops import stencil
from ..ops import yukawa_sparse
from ..ops.yukawa import yukawa_field
from ..solve import krylov, multigrid
from ..utils import timing


@dataclasses.dataclass
class GridResult:
    phi: np.ndarray  # (N,) float64 host, reference flat ordering
    grid: griddom.GridSpec
    Y: Optional[np.ndarray] = None  # (N, 3) normalized vector field

    def phi3(self) -> np.ndarray:
        return self.phi.reshape(self.grid.shape)


# ---------------------------------------------------------------------------
# jitted device stages


@functools.partial(jax.jit, static_argnames=("n", "dtype"))
def _node_positions_device(bbox_min, cell_size, n: int, dtype):
    r = jnp.arange(n, dtype=dtype) * cell_size
    z, y, x = jnp.meshgrid(r, r, r, indexing="ij")
    pos = jnp.stack([x, y, z], axis=-1).reshape(-1, 3)
    return pos + jnp.asarray(bbox_min, dtype=dtype)[None, :]


def _kkt_matvec(x, nodes8, coeffs8, cell_size, shape):
    """[[-L, -A^T], [-A, 0]] applied to x = concat(u, mu)."""
    N = shape[0] * shape[1] * shape[2]
    u, mu = x[:N], x[N:]
    Hu = -stencil.laplacian_apply(u.reshape(shape), cell_size).reshape(-1)
    At_mu = jnp.zeros(N, dtype=x.dtype).at[nodes8.reshape(-1)].add(
        (coeffs8 * mu[:, None]).reshape(-1)
    )
    Au = jnp.sum(u[nodes8] * coeffs8, axis=1)
    return jnp.concatenate([Hu - At_mu, -Au])


@functools.partial(jax.jit, static_argnames=("shape", "guard_nans"))
def _kkt_rhs(Y, cell_size, shape, guard_nans: bool, m: int = 0):
    """divergence + NaN guard -> KKT right-hand side [-div; 0]."""
    div = stencil.divergence_apply(Y.reshape(*shape, 3), cell_size).reshape(-1)
    if guard_nans:
        # mesh-on-grid path only (signed_heat_grid_solver.cpp:72-74)
        div = jnp.where(jnp.isfinite(div), div, 0.0)
    return div


@functools.partial(jax.jit, static_argnames=("shape", "tol", "chunk"))
def _kkt_minres_chunk(rhs, x0, nodes8, coeffs8, cell_size, shape, tol: float, chunk: int):
    """One bounded MINRES chunk on the KKT saddle, warm-started from x0.
    (Chunked because the TPU runtime kills minutes-long single programs;
    see shm3d.tet.solver CHUNK_ITERS.)  ``rhs`` is the full (N + m,) vector.
    """
    dtype = rhs.dtype
    m = nodes8.shape[0]
    N = rhs.shape[0] - m

    matvec = functools.partial(
        _kkt_matvec, nodes8=nodes8, coeffs8=coeffs8, cell_size=cell_size, shape=shape
    )
    # Block-diagonal preconditioner: symmetric multigrid V-cycle for the
    # u-block H = -L, diagonal Schur estimate diag(A diag(H)^-1 A^T) for the
    # multipliers (the direct-factorization replacement, SURVEY.md §7).
    diag_H = -stencil.laplacian_diagonal(shape, cell_size, dtype=dtype).reshape(-1)
    diag_S = jnp.sum(coeffs8 * coeffs8 / diag_H[nodes8], axis=1)
    mg = multigrid.make_node_preconditioner(shape, cell_size, dtype=dtype)

    def precond(r):
        return jnp.concatenate([mg(r[:N]), r[N:] / diag_S])

    rhs_mnorm = jnp.sqrt(jnp.abs(jnp.vdot(rhs, precond(rhs))))
    res = krylov.minres(matvec, rhs, x0=x0, precond=precond, tol=tol, maxiter=chunk,
                        rhs_mnorm=rhs_mnorm)
    return res.x, res.iterations, res.residual


def _integrate_exact(
    Y, nodes8, coeffs8, cell_size, shape, guard_nans: bool, tol: float, maxiter: int,
    x0=None, chunk: Optional[int] = None,
):
    """divergence + NaN guard + chunked MINRES KKT solve.  Returns
    (x, iters, res): x = concat(u, mu); phi = -u.

    Chunking (restarts) only matters on TPU where the runtime kills
    long-running programs; restarted MINRES converges more slowly, so on
    other backends the solve runs as one unbounded chunk."""
    if chunk is None:
        chunk = 200 if jax.default_backend() == "tpu" else maxiter
    div = _kkt_rhs(Y, cell_size, shape, guard_nans)
    N = div.shape[0]
    m = nodes8.shape[0]
    rhs = jnp.concatenate([-div, jnp.zeros(m, dtype=div.dtype)])
    x = jnp.zeros(N + m, dtype=div.dtype) if x0 is None else x0
    total = 0
    resid = jnp.asarray(0.0, div.dtype)
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
    return x, total, resid


@functools.partial(jax.jit, static_argnames=())
def _mean_shift(phi, src_nodes8, src_coeffs8, weights):
    """Weighted average of the trilinear interpolant along the source
    (signed_heat_grid_solver.cpp:466-496) and subtraction."""
    vals = jnp.sum(phi[src_nodes8] * src_coeffs8, axis=1)
    shift = jnp.sum(weights * vals) / jnp.sum(weights)
    return phi - shift


# ---------------------------------------------------------------------------
# float64 residual for iterative refinement (host NumPy mirror of the
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


def _kkt_residual_np(x, rhs, nodes8, coeffs8, cell, shape):
    N = shape[0] * shape[1] * shape[2]
    u, mu = x[:N], x[N:]
    Hu = -_laplacian_apply_np(u.reshape(shape), cell).reshape(-1)
    At_mu = np.zeros(N)
    np.add.at(At_mu, nodes8.reshape(-1), (coeffs8 * mu[:, None]).reshape(-1))
    Au = (u[nodes8] * coeffs8).sum(axis=1)
    return rhs - np.concatenate([Hu - At_mu, -Au])


# ---------------------------------------------------------------------------
# solver with operator caching


class GridSolver:
    """Stateful grid solver mirroring the reference caching contract."""

    def __init__(self):
        self._cache = {}

    def compute_distance(self, geom, options: SignedHeatOptions = SignedHeatOptions()) -> GridResult:
        tm = timing.PhaseTimer(verbose=options.verbose)
        is_mesh = isinstance(geom, Mesh)
        dtype = jnp.dtype(options.dtype)

        with tm.phase("precompute (sources + grid + constraints)"):
            sources = self._sources(geom)
            key = (sources.content_hash(), options.cache_key())
            cached = self._cache.get(key)
            if cached is None:
                seed_pts = geom.vertices if is_mesh else geom.positions
                grid = griddom.build_grid(seed_pts, options.scale, options.h_coef)
                nodes8, coeffs8 = griddom.constraint_rows(grid, sources.points)
                src_nodes8, src_coeffs8 = griddom.trilinear_rows(grid, sources.points)
                cached = dict(
                    grid=grid,
                    nodes8=jnp.asarray(nodes8, jnp.int32),
                    coeffs8=jnp.asarray(coeffs8, dtype),
                    src_nodes8=jnp.asarray(src_nodes8, jnp.int32),
                    src_coeffs8=jnp.asarray(src_coeffs8, dtype),
                    points=jnp.asarray(sources.points, dtype),
                    vectors=jnp.asarray(sources.vectors(), dtype),
                    weights=jnp.asarray(sources.weights, dtype),
                )
                self._cache[key] = cached
            grid = cached["grid"]

        t = options.t_coef * sources.spacing ** 2
        lam = float(np.sqrt(1.0 / t))

        with tm.phase("steps 1&2 (Yukawa convolution + normalize)"):
            queries = _node_positions_device(
                jnp.asarray(grid.bbox_min, dtype), jnp.asarray(grid.cell_size, dtype), grid.n, dtype
            )
            use_sparse = (
                options.cull_eps > 0
                and grid.n % yukawa_sparse.BRICK == 0
                and jax.default_backend() == "tpu"
            )
            if use_sparse:
                plan_key = ("cull_plan", lam, options.cull_eps)
                plan = cached.get(plan_key)
                if plan is None:
                    plan = yukawa_sparse.build_plan(
                        grid, sources.points, lam, options.cull_eps
                    )
                    cached[plan_key] = plan
                tm.note(f"culling kept {plan.kept_fraction:.1%} of source blocks")
                Y = yukawa_sparse.yukawa_field_sparse(
                    queries, cached["points"], cached["vectors"], lam, plan
                )
            else:
                Y = yukawa_field(queries, cached["points"], cached["vectors"], lam)
            Y.block_until_ready()

        if options.fast_integration:
            with tm.phase("step 3 (greedy BFS integration, host)"):
                from ..oracle.reference import integrate_greedily_grid

                phi_np = integrate_greedily_grid(grid, np.asarray(Y, dtype=np.float64))
                phi = jnp.asarray(phi_np, dtype)
        else:
            with tm.phase("step 3 (divergence + MINRES KKT solve)"):
                x, iters, resid = _integrate_exact(
                    Y,
                    cached["nodes8"],
                    cached["coeffs8"],
                    jnp.asarray(grid.cell_size, dtype),
                    grid.shape,
                    is_mesh,
                    options.solver_tol,
                    options.solver_maxiter,
                )
                x.block_until_ready()
                tm.note(f"MINRES iters={int(iters)} rel_res={float(resid):.2e}")

            if options.refine_steps > 0 and dtype == jnp.float32:
                with tm.phase("float64 iterative refinement"):
                    x = self._refine(x, Y, cached, grid, is_mesh, options)
            N = grid.total_nodes
            phi = -x[:N]

        with tm.phase("mean shift along source"):
            phi = _mean_shift(phi, cached["src_nodes8"], cached["src_coeffs8"], cached["weights"])

        phi_host = np.asarray(phi, dtype=np.float64)
        return GridResult(phi_host, grid, np.asarray(Y, dtype=np.float64))

    def _refine(self, x, Y, cached, grid, is_mesh, options):
        """f64 defect correction around the f32 device solve."""
        shape = grid.shape
        N = grid.total_nodes
        nodes8 = np.asarray(cached["nodes8"])
        coeffs8 = np.asarray(cached["coeffs8"], dtype=np.float64)
        Y64 = np.asarray(Y, dtype=np.float64).reshape(*shape, 3)
        # f64 divergence via the same adjoint structure (numpy gradient mirror)
        div64 = np.asarray(
            stencil.divergence_apply(jnp.asarray(Y64), jnp.float64(grid.cell_size))
        ).reshape(-1) if jax.config.jax_enable_x64 else self._div64_np(Y64, grid.cell_size)
        if is_mesh:
            div64 = np.where(np.isfinite(div64), div64, 0.0)
        rhs64 = np.concatenate([-div64, np.zeros(nodes8.shape[0])])
        x64 = np.asarray(x, dtype=np.float64)
        for _ in range(options.refine_steps):
            r = _kkt_residual_np(x64, rhs64, nodes8, coeffs8, grid.cell_size, shape)
            scale = np.abs(r).max()
            if scale == 0 or not np.isfinite(scale):
                break
            # correction solve in f32 on device on the scaled residual
            rr = jnp.asarray((r / scale), jnp.float32)
            dx = self._correction_solve(rr, cached, grid, options)
            x64 = x64 + scale * np.asarray(dx, dtype=np.float64)
        return jnp.asarray(x64, jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)

    def _correction_solve(self, rhs_f32, cached, grid, options):
        """Chunked MINRES on the KKT operator with an arbitrary RHS (used by
        the f64 defect correction; reuses the same preconditioner)."""
        shape = grid.shape
        N = grid.total_nodes
        nodes8 = cached["nodes8"]
        coeffs8 = jnp.asarray(cached["coeffs8"], jnp.float32)
        cell = jnp.float32(grid.cell_size)
        x = jnp.zeros_like(rhs_f32)
        total = 0
        while True:
            this = min(200, options.solver_maxiter - total)
            if this <= 0:
                break
            x, iters, _ = _kkt_minres_chunk(
                rhs_f32, x, nodes8, coeffs8, cell, shape, options.solver_tol, this
            )
            total += int(iters)
            if int(iters) < this:
                break
        return x

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
