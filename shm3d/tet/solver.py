"""TPU-native tet-domain solver: the device pipeline for tetrahedral meshes.

End-to-end reimplementation of ``SignedHeatTetSolver``
(/root/reference/src/signed_heat_tet_solver.cpp) as a JAX program over the
Kuhn-lattice stuffing mesh (shm3d.tet.mesher):

  host:   tet domain + FEM operator arrays                (NumPy, cached)
  device: Yukawa convolution at tet barycenters -> normalize -> vertex
          divergence (segment_sum) -> constrained solve    (jit)

For triangle meshes the domain is surface-conforming (mesher + conforming
recovery) and Step 3 defaults to the Crouzeix-Raviart face path
(cr_solver.CRPath, reference :234-317).  Polygon meshes, point clouds, and
recovery failures take the reference's vertex/dual-Laplacian fallback path
(signed_heat_tet_solver.cpp:24-33,319-397).  All three level-set-constraint
modes are provided on both paths; on the vertex path:

- ZERO_SET: Dirichlet elimination on the source vertices (indices 0..V-1,
  the vertex-index contract; reference :169-180,336-350) via masked CG on
  the interior block of H = -L (positive definite there);
- MULTIPLE: per-connected-component equality rows (reference DFS loop
  :183-210,353-381) define the subspace 'phi constant per component' —
  solved by projected CG (componentwise-averaging projector), no saddle;
- NONE: singular Poisson solve (constants projected out of the Krylov
  iteration; the particular solution is irrelevant because the source mean
  shift :576-589 cancels the constant).

Greedy ("fast") BFS integration :399-556 runs on host (sequential by
nature; SURVEY.md §7 hard part 4).
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

from ..config import LevelSetConstraint, SignedHeatOptions
from ..geometry import pointcloud as pc_geom
from ..geometry import sources as src_mod
from ..geometry import surface as surf
from ..io.mesh_io import Mesh, PointCloud
from ..ops.yukawa import yukawa_field
from ..solve import amg, ell, krylov, pell
from ..utils import checks, diskcache, timing, treestore
from . import fem
from .mesher import TetMesh, build_tet_domain


@dataclasses.dataclass
class TetResult:
    phi: np.ndarray          # (NV,) float64, per tet-mesh vertex
    mesh: TetMesh
    Y: Optional[np.ndarray] = None  # (NT, 3) normalized field at barycenters

    def phi_at_sources(self) -> np.ndarray:
        """phi sampled at the input source vertices (the reference returns
        phi over all tet vertices with sources first; this is that prefix
        resolved through the dedup map)."""
        return self.phi[self.mesh.src_vertex]


# ---------------------------------------------------------------------------
# jitted stages


def _divergence(Y, div_rows, div_tets, div_gvec, n):
    return jax.ops.segment_sum(
        jnp.einsum("ij,ij->i", div_gvec, Y[div_tets]), div_rows,
        num_segments=n, indices_are_sorted=True,
    )


# The Krylov solves run as bounded-iteration chunks warm-started from the
# previous chunk, with convergence checked on host between chunks.  A single
# unbounded while_loop at production sizes runs for minutes inside one XLA
# program, which the TPU runtime's watchdog kills ("TPU worker process
# crashed or restarted"); chunking bounds per-program runtime.
#
# The chunk bound is a DYNAMIC argument of one compiled program (krylov.cg
# takes traced tol/maxiter), so adapting the size costs nothing: per-chunk
# remote compiles of a static-size ladder used to dominate cold solves
# (~60-120 s each over the tunnel).  Sizing is per-iteration-cost based:
# start from the iter_cost estimate, then track measured wall-clock toward
# a ~20 s per-program target.  Stall-detector state is threaded through the
# chunks (krylov.SolveResult.best/since) so restarts don't reset it.
CHUNK_ITERS = 400  # initial bound when no cost estimate is available
_CHUNK_MIN, _CHUNK_MAX = 25, 4000
_CHUNK_TARGET_S = 20.0
# conservative v5e throughputs for the two operator encodings, used only to
# pick the FIRST chunk size so solves don't pay several host round-trips
# before the measured-wall-clock adaptation kicks in:
# - ELL gathers: measured 123M elems/s with random indices, halved;
# - paged-ELL: measured 3.45M passes/s at knot scale (49 ms for 169k
#   passes, solve/pell.py), with margin
_GATHER_RATE = 6e7
_PELL_PASS_RATE = 3.0e6


def op_iter_seconds(op) -> float:
    """Estimated seconds for ONE device application of an operator."""
    if op is None:
        return 0.0
    if isinstance(op, pell.PagedMat):
        return op.n_passes / _PELL_PASS_RATE
    if isinstance(op, ell.SlicedEll):
        return (op.n_slots + op.n_rows) / _GATHER_RATE
    return op.vals.size / _GATHER_RATE


def hierarchy_iter_seconds(h, l0=None) -> float:
    """Estimated seconds per AMG-preconditioned CG iteration: the CG matvec
    on the level-0 operator plus a Chebyshev-smoothed V-cycle — per level,
    (degree - 1) pre + degree post smoother matvecs + the coarse-residual
    matvec = 2 * degree operator applications, plus P + P^T.  ``l0``: the
    solve operator standing in for a skip_level0_A hierarchy's level 0."""
    from ..solve.amg import CHEB_DEGREE

    per_level = 2 * CHEB_DEGREE
    cost = 0.0
    for i, lvl in enumerate(h.levels):
        if lvl.A is not None:
            a = op_iter_seconds(lvl.A)
        elif l0 is not None:
            a = op_iter_seconds(l0)
        else:
            a = h.l0_nnz / _GATHER_RATE
        cost += (per_level + 1 if i == 0 else per_level) * a
        cost += op_iter_seconds(lvl.P) + op_iter_seconds(lvl.PT)
    return cost


def _clamp_chunk(n: float) -> int:
    return int(min(max(n, _CHUNK_MIN), _CHUNK_MAX))


@functools.partial(jax.jit, static_argnames=("n",))
def _divergence_jit(Y, div_rows, div_tets, div_gvec, n: int):
    return _divergence(Y, div_rows, div_tets, div_gvec, n)


def _mg_or_jacobi(mg_levels, mg_coarse, mg_sizes, diag, matvec0=None):
    """AMG V-cycle when a hierarchy was built, else Jacobi.  ``matvec0``
    applies the level-0 operator (hierarchies are built with skip_level0_A,
    reusing the solve's own operator panel instead of duplicating it)."""
    if mg_sizes:
        return amg.make_preconditioner_parts(mg_levels, mg_coarse, mg_sizes,
                                             matvec0=matvec0)
    return lambda r: r / diag


def _stall_window(dtype):
    """f32 solves hit their roundoff floor and must stop instead of
    burning maxiter (a knot-sized f32 solve spent 10k iterations at its
    floor); f64 AMG-CG can plateau for long stretches near machine
    precision and needs a far more patient guard."""
    return 60 if jnp.dtype(dtype) == jnp.float32 else 1000


# The vertex (dual-Laplacian) chunks run in SYMMETRICALLY EQUILIBRATED
# variables: the device operator is S H S with S = diag(1/sqrt(diag H))
# (built host-side, _build_vertex_ops), the caller maps rhs/solution with
# x = S y, b_s = S b.  The dual Laplacian's weights span ~0.76..9e8 on
# TetGen-quality graded meshes (knot@h=1) and pure-f32 CG floors near 1e-2
# relative residual on the raw operator purely from VALUE rounding (an
# f64-V-cycle emulation still floors ~2e-4); the scaled operator has unit
# diagonal, so CG's recurrences mix like-sized components and reach the
# ordinary f32 roundoff floor.  Exact-arithmetic iterates are identical
# (diagonal preconditioning == equilibration), so f64 runs are unaffected.
# CAUTION (modes without Dirichlet rows): the scaled operator's null space
# is S^{-1}·1 = sqrt(diag H), NOT constants — the deflations inside
# _none_chunk/_multiple_chunk use the ``vnull`` direction, and the MULTIPLE
# group subspace 'phi constant per component' maps to 'y proportional to
# sqrt(diag H) per component' (weighted group projection).  The Galerkin
# condition is invariant under the congruence (residual ⊥ S·V_s == the
# original constraint space), so the unscaled answer is unchanged up to the
# null component, which _shift fixes in original variables either way.


@functools.partial(jax.jit, static_argnames=("n", "n_src", "mg_sizes"))
def _zeroset_chunk(b, x0, H, diagH, mg_levels, mg_coarse, stall,
                   n: int, n_src: int, tol=1e-5, chunk=CHUNK_ITERS,
                   mg_sizes: tuple = ()):
    """Dirichlet solve chunk: phi = 0 on source vertices, H_II phi_I = b_I
    (b = masked, equilibrated -div, or a refinement residual).  H = the
    scaled dual Laplacian S(-L_dual)S (positive definite on the interior
    block), in ELL form."""
    mask = (jnp.arange(n) >= n_src).astype(b.dtype)

    def matvec(x):
        return mask * pell.apply(H, mask * x) + (1.0 - mask) * x

    # hierarchy is built on the SAME masked operator -> matvec0 = matvec
    precond = _mg_or_jacobi(mg_levels, mg_coarse, mg_sizes, diagH, matvec0=matvec)
    rhs_mnorm = jnp.sqrt(jnp.abs(jnp.vdot(b, precond(b))))
    res = krylov.cg(matvec, b, x0=x0, precond=precond, tol=tol, maxiter=chunk,
                    rhs_mnorm=rhs_mnorm, stall_window=_stall_window(b.dtype),
                    stall_state=stall)
    rel = res.residual / jnp.maximum(rhs_mnorm, jnp.finfo(res.residual.dtype).tiny)
    return res.x * mask, res.iterations, rel, (res.best, res.since)


@functools.partial(jax.jit, static_argnames=("n", "mg_sizes"))
def _none_chunk(b, x0, H, diagH, vnull, mg_levels, mg_coarse, stall,
                n: int, tol=1e-5, chunk=CHUNK_ITERS, mg_sizes: tuple = ()):
    """Singular Poisson chunk in equilibrated variables: H y = b with the
    scaled null direction ``vnull`` (unit sqrt(diag) vector) deflated."""
    defl = lambda v: v - vnull * jnp.vdot(vnull, v)
    b = defl(b)

    def matvec(x):
        return defl(pell.apply(H, x))

    mg = _mg_or_jacobi(mg_levels, mg_coarse, mg_sizes, diagH,
                       matvec0=lambda v: pell.apply(H, v))
    precond = lambda r: defl(mg(r))
    rhs_mnorm = jnp.sqrt(jnp.abs(jnp.vdot(b, precond(b))))
    res = krylov.cg(matvec, b, x0=x0, precond=precond, tol=tol, maxiter=chunk,
                    rhs_mnorm=rhs_mnorm, stall_window=_stall_window(b.dtype),
                    stall_state=stall)
    rel = res.residual / jnp.maximum(rhs_mnorm, jnp.finfo(res.residual.dtype).tiny)
    return res.x, res.iterations, rel, (res.best, res.since)


@functools.partial(jax.jit, static_argnames=("n_groups", "mg_sizes"))
def _multiple_chunk(b, x0, H, diagH,
                    group_elems, group_ids, group_u, group_uinv, vnull,
                    mg_levels, mg_coarse, stall,
                    n_groups: int, tol=1e-5, chunk=CHUNK_ITERS,
                    mg_sizes: tuple = ()):
    """MULTIPLE mode via projected CG in equilibrated variables: the
    reference's per-component equality rows (:211-217,382-389) define the
    subspace 'phi constant per source component', which the scaling maps to
    'y proportional to ``group_u`` (= sqrt(diag H) at the component
    vertices) per component'; solve P H P u = P b with P = the weighted
    per-group projection composed with ``vnull`` deflation (the scaled
    operator is singular on vnull, as the raw one is on constants — the
    mean shift fixes that component afterwards, in original variables)."""

    def pgroup(v):
        sums = jax.ops.segment_sum(group_u * v[group_elems], group_ids,
                                   num_segments=n_groups)
        return v.at[group_elems].set((sums * group_uinv)[group_ids] * group_u)

    proj = lambda v: (lambda w: w - vnull * jnp.vdot(vnull, w))(pgroup(v))
    b = proj(b)

    def matvec(x):
        return proj(pell.apply(H, x))

    mg = _mg_or_jacobi(mg_levels, mg_coarse, mg_sizes, diagH,
                       matvec0=lambda v: pell.apply(H, v))
    precond = lambda r: proj(mg(r))
    rhs_mnorm = jnp.sqrt(jnp.abs(jnp.vdot(b, precond(b))))
    res = krylov.cg(matvec, b, x0=x0, precond=precond, tol=tol, maxiter=chunk,
                    rhs_mnorm=rhs_mnorm, stall_window=_stall_window(b.dtype),
                    stall_state=stall)
    rel = res.residual / jnp.maximum(rhs_mnorm, jnp.finfo(res.residual.dtype).tiny)
    return res.x, res.iterations, rel, (res.best, res.since)


def _run_chunked(chunk_fn, x0, tol: float, maxiter: int, chunk: Optional[int] = None,
                 iter_seconds: Optional[float] = None,
                 stats: Optional[dict] = None):
    """Host loop: run bounded Krylov chunks until converged or maxiter.
    chunk_fn(x0, chunk, stall) -> (x, iters, residual, stall'); residual is
    the solver's preconditioned-norm estimate, already compared against tol
    internally; stall is the cross-chunk (best, since) detector state.

    The chunk bound and tol are DYNAMIC jit arguments, so all chunk sizes
    share one compiled program.  On TPU the size adapts: the first bound
    comes from the ``iter_seconds`` estimate (op_iter_seconds), then
    wall-clock measurements (the int(iters) read blocks on the program)
    steer toward _CHUNK_TARGET_S per program (the worker watchdog kills
    minutes-long programs).  Elsewhere: one unbounded chunk.

    ``stats``: optional dict accumulating per-chunk observability — a
    ``chunks`` list of (iterations, wall seconds) per device program, across
    every call sharing the dict (the f64 refinement passes reuse one) — so
    perf regressions show up in a JSON diff, not a timeout (VERDICT r2 #8)."""
    adaptive = chunk is None and jax.default_backend() == "tpu"
    if chunk is None:
        if not adaptive:
            chunk = maxiter
        elif iter_seconds:
            chunk = _clamp_chunk(_CHUNK_TARGET_S / iter_seconds)
        else:
            chunk = CHUNK_ITERS
    total = 0
    x = x0
    dtype = jnp.asarray(x0).dtype
    stall = (jnp.asarray(jnp.finfo(dtype).max, dtype), jnp.asarray(0, jnp.int32))
    while True:
        this = min(chunk, maxiter - total)
        if this <= 0:
            break
        t0 = time.perf_counter()
        x, iters, resid, stall = chunk_fn(x, this, stall)
        done = int(iters)
        dt = time.perf_counter() - t0
        total += done
        if stats is not None:
            stats.setdefault("chunks", []).append(
                {"iters": done, "s": round(dt, 3)})
        if done < this:  # converged (or stalled at the floor) inside the chunk
            break
        if adaptive and done:
            chunk = _clamp_chunk(_CHUNK_TARGET_S / (dt / done))
    return x, total, resid


def _refined_solve(run, host_op, b64, dtype, options, tm=None, device_mesh=None,
                   stats=None):
    """Mixed-precision solve of A x = b with f64 defect correction.

    ``run(b_device)`` performs one full chunked device solve of
    A x = b from x0 = 0 (f32 on TPU, where CG stalls at its roundoff floor —
    measured 4.7e-3 relative residual and 7e-2 phi error on the recovered
    bunny_small CR system).  ``host_op(x64) -> A @ x64`` applies the SAME
    operator (mask/projection included) in f64 on host (SciPy; cheap
    next to the device solve).  Each correction pass contracts the true
    residual by roughly the device solver's stall floor, so
    ``options.refine_steps`` passes recover f64-grade accuracy from f32
    device solves — the tet-path analog of the grid solver's defect
    correction (solvers/grid.py _refine).

    ``device_mesh``: place right-hand sides on that mesh (replicated) so the
    sharded-operator solves receive co-located inputs.

    ``run(b, tol=None)``: correction passes run with
    ``options.refine_solver_tol`` — a LOOSE per-pass contraction target
    (see its config comment; tol is a dynamic jit argument, so no
    recompile).  The final rel_res is always measured in f64 against the
    true operator, so a loose pass never misreports accuracy.  The pass
    budget is DERIVED from the measured starting residual
    (options.refine_pass_budget, advisor r4: a fixed single 1e-2-tol pass
    left refine_target unreachable), with a stagnation guard: a pass that
    fails to halve the residual means the f32 floor is reached and more
    passes only burn device time.

    ``stats``: optional dict; per-pass f64 residuals land in
    stats["refine_pass_rels"] (VERDICT r4 #6: per-pass contraction is an
    observable, not a dev-note).

    Returns (x64, iters_total, rel_res_f64)."""
    b64 = np.asarray(b64, np.float64)
    put = lambda a: ell.replicated(a, dtype, device_mesh)
    x, iters, res = run(put(b64))
    x64 = np.asarray(x, np.float64)
    total = int(iters)
    rel = float(res)
    bnorm = float(np.linalg.norm(b64))
    if options.refine_steps > 0 and jnp.dtype(dtype) == jnp.float32 and bnorm > 0:
        r64 = b64 - host_op(x64)
        rel = float(np.linalg.norm(r64)) / bnorm
        rels = [rel] if stats is None else stats.setdefault("refine_pass_rels", [rel])
        budget = options.refine_pass_budget(rel)
        # per-pass iteration cap: a correction pass costing more device
        # time than the primary solve is bad ROI — on ill-conditioned CR
        # operators (knot) the correction Krylov crawls on sliver modes
        # (the 1,232-iteration pathology; with the derived budget an
        # UNCAPPED refinement ran ~20 min at knot scale, r5 measurement)
        cap = max(2 * max(int(iters), 1), 60)
        for _ in range(budget):
            if not np.isfinite(rel) or rel <= options.refine_target:
                break
            d, it2, _ = run(put(r64), tol=options.refine_solver_tol,
                            maxiter=cap)
            x64 = x64 + np.asarray(d, np.float64)
            total += int(it2)
            r64 = b64 - host_op(x64)
            new_rel = float(np.linalg.norm(r64)) / bnorm
            rels.append(new_rel)
            # each tet correction pass costs about a primary solve (the cap
            # above), so a pass that fails to contract 10x is bad ROI — at
            # knot scale the sliver-mode floor gives 4.8x/3.2x passes at
            # ~112 s each (r5 measurement: stopping here trades 3.9e-8 for
            # 1.3e-7 final rel_res and saves ~2 primary-solve costs).  The
            # grid path keeps its looser 2x guard: its passes cost ~1/10th
            # of a primary there.
            stalled = not np.isfinite(new_rel) or new_rel > 0.1 * rel
            rel = new_rel if np.isfinite(new_rel) else rel
            if stalled:
                break  # f32 correction floor: further passes cannot help
        if tm is not None:
            tm.note(f"defect correction: rel_res={rel:.2e} (f64, "
                    f"{len(rels) - 1}/{budget} passes)")
    return x64, total, rel


# ---------------------------------------------------------------------------
# host helpers


def integrate_greedily_tet(mesh: TetMesh, Y: np.ndarray, seeds: np.ndarray) -> np.ndarray:
    """FIFO BFS line integration over the vertex->tet adjacency
    (reference integrateGreedily, signed_heat_tet_solver.cpp:468-491):
    phi[next] = phi[curr] + Y_tet . (v_next - v_curr)."""
    import collections

    NV = mesh.n_vertices
    phi = np.zeros(NV)
    visited = np.zeros(NV, dtype=bool)
    visited[seeds] = True
    queue = collections.deque(int(s) for s in seeds)
    verts, tets = mesh.vertices, mesh.tets
    indptr, data = mesh.vt_indptr, mesh.vt_data
    while queue:
        curr = queue.popleft()
        p = verts[curr]
        for tid in data[indptr[curr]:indptr[curr + 1]]:
            for nb in tets[tid]:
                if visited[nb]:
                    continue
                phi[nb] = phi[curr] + float(np.dot(Y[tid], verts[nb] - p))
                visited[nb] = True
                queue.append(int(nb))
    return phi


def _vertex_scale(H_scipy) -> np.ndarray:
    """Equilibration scale s = 1/sqrt(diag H) (f64), with the same
    positivity repair the Jacobi diagonal uses (fem.build_dual_laplacian
    repairs negative-star rows; any residual non-positive diagonal maps to
    scale 1 so the row is passed through unscaled)."""
    d = np.asarray(H_scipy.diagonal())
    return 1.0 / np.sqrt(np.where(d > 0, d, 1.0))


def _equilibrated(H_scipy, s: Optional[np.ndarray] = None):
    """S H S as CSR (unit diagonal wherever diag H > 0)."""
    import scipy.sparse as sp

    if s is None:
        s = _vertex_scale(H_scipy)
    S = sp.diags(s)
    return (S @ H_scipy @ S).tocsr()


def _component_rows(labels: np.ndarray, src_vertex: np.ndarray):
    """Reference Multiple-mode constraint rows: for each source vertex w
    (per component, excluding the component's first vertex v0), a row
    (+1 at v0, -1 at w) — equality of every member to the root
    (signed_heat_tet_solver.cpp:183-210, the DFS emits exactly these)."""
    roots, members = [], []
    seen_root = {}
    seen_members = {}
    for idx in range(labels.shape[0]):
        c = labels[idx]
        mv = src_vertex[idx]
        if c not in seen_root:
            seen_root[c] = mv
            seen_members[c] = {int(mv)}
            continue
        if int(mv) in seen_members[c]:
            # coincident input vertices merged to one mesh vertex: a second
            # (root, mv) row would make the KKT matrix singular
            continue
        seen_members[c].add(int(mv))
        roots.append(seen_root[c])
        members.append(mv)
    return np.asarray(roots, dtype=np.int64), np.asarray(members, dtype=np.int64)


# ---------------------------------------------------------------------------
# solver


class SignedHeatTetSolver:
    """Stateful solver mirroring the reference caching contract
    (operators rebuilt only when geometry/hCoef change, main.cpp:113,146-147)."""

    def __init__(self, mesh=None):
        """``mesh``: optional jax.sharding.Mesh (shm3d.parallel.device_mesh;
        1-D single-slice or 2-D ("s", "d") multi-slice)
        — Step 1 (the tet hot spot, O(n_tets x n_sources)) then runs the
        ring schedule: barycenter queries stay device-resident, source
        shards rotate over ICI.  Step 3's unstructured segment-sum solves
        stay single-logical-device (replicated), the right v1 split since
        Step 1 dominates asymptotically (SURVEY.md §2e)."""
        self._cache = {}
        self.last_stats = {}
        self.mesh = mesh

    def compute_distance(self, geom, options: SignedHeatOptions = SignedHeatOptions()) -> TetResult:
        tm = timing.PhaseTimer(verbose=options.verbose)
        dtype = jnp.dtype(options.dtype)
        is_mesh = isinstance(geom, Mesh)
        self.last_stats = {}

        with tm.phase("tet precompute (mesh + operators)"):
            from .mesher import MESHER_VERSION

            key = (diskcache.geometry_content_hash(geom), options.cache_key(),
                   MESHER_VERSION,
                   os.environ.get("SHM3D_GRADED", ""),
                   self.mesh.size if self.mesh is not None else 1)
            cached = self._cache.get(key)
            if cached is None:
                prepared = (treestore.load_tree(("tetprep",) + key)
                            if options.disk_cache else None)
                if prepared is not None:
                    tm.note("operator cache: disk hit (mmap)")
                else:
                    prepared = self._prepare_host(geom, options)
                    if options.disk_cache:
                        treestore.save_tree(("tetprep",) + key, prepared)
                cached = self._to_device(prepared, dtype)
                cached["_key"] = key  # for in-place artifact upgrades
                self._cache[key] = cached
        mesh: TetMesh = cached["mesh"]

        lam = float(np.sqrt(1.0 / (options.t_coef * cached["spacing"] ** 2)))

        with tm.phase("steps 1&2 (Yukawa at tet barycenters)"):
            if self.mesh is not None:
                from ..parallel import yukawa_field_ring

                Y = yukawa_field_ring(
                    cached["barys"], cached["points"], cached["vectors"], lam,
                    self.mesh,
                )
            else:
                Y = yukawa_field(cached["barys"], cached["points"], cached["vectors"], lam)
            Y.block_until_ready()
            checks.check_unit_field("tet Step 2 field", Y)

        n = mesh.n_vertices
        cr_wanted = options.use_crouzeix_raviart and not options.fast_integration
        if (cr_wanted and cached.get("cr_path") is None
                and not cached.get("_cr_unsupported")):
            # mode upgrade on an artifact whose first run didn't need CR:
            # minutes of host work at scale — attribute it a visible phase
            with tm.phase("tet precompute (CR face operators, mode upgrade)"):
                self._ensure_cr_path(cached, geom, options)
        if options.fast_integration:
            self.last_stats["step3_path"] = "greedy"
            with tm.phase("step 3 (greedy BFS, host)"):
                phi = self._greedy(mesh, np.asarray(Y, np.float64), geom, cached, options)
        elif cr_wanted and cached.get("cr_path") is not None:
            self.last_stats["step3_path"] = "crouzeix-raviart"
            # reference default for conforming triangle meshes
            # (integrateVectorFieldToFaces; gate at src/main.cpp:142-144);
            # active whenever surface recovery succeeded (mesh.conforming)
            with tm.phase("step 3 (Crouzeix-Raviart face solve)"):
                phi = cached["cr_path"].integrate(
                    Y, options,
                    src_face_components=cached.get("cr_face_components"),
                    src_face_areas=cached.get("cr_face_areas"),
                )
            self.last_stats.update(cached["cr_path"].last_stats)
        else:
            self.last_stats["step3_path"] = "vertex"
            with tm.phase("step 3 (divergence + constrained solve)"):
                phi = self._integrate(Y, mesh, geom, cached, options, tm)

        phi_host = np.asarray(phi, dtype=np.float64)
        checks.check_finite("tet phi", phi_host)
        # per-phase wall clock (Step 1 vs Step 3 split at scale; SURVEY §5.1)
        self.last_stats["phases"] = tm.as_dict()
        if tm.mem:  # device-memory high-water per phase (MB)
            self.last_stats["mem_peak_mb"] = dict(tm.mem)
        else:  # one end-of-solve high-water query (single device RTT)
            peak = timing.device_memory_peak_mb()
            if peak is not None:
                self.last_stats["mem_peak_mb"] = peak
        return TetResult(phi_host, mesh, np.asarray(Y, np.float64))

    # -- internals

    def _prepare_host(self, geom, options) -> dict:
        """Full host precompute as a persistable numpy-leaf tree
        (utils/treestore): tet domain, dual Laplacian (device ELL + host f64
        CSR), CR path preparation (cr_solver.CRPath.prepare), the
        default-mode AMG hierarchy, source quadrature, component labels —
        everything in FINAL dtypes, so a disk load is an mmap plus one
        batched device transfer (VERDICT r2 items 1a/2/4; the round-2
        artifact stored raw f64 COO arrays and re-derived the rest at load,
        costing ~61 s + a lazy 104 s in-solve AMG build at knot scale)."""
        np_dtype = np.dtype(jnp.dtype(options.dtype))
        sources = src_mod.from_geometry(geom)
        is_mesh = isinstance(geom, Mesh)
        if is_mesh and geom.is_triangular:
            src_pts = geom.vertices
            mean_area = float(np.mean(sources.weights))
            labels = surf.connected_components_vertices(geom)
            dual_areas = surf.vertex_dual_areas(geom)
        elif is_mesh:
            # polygon mesh: the reference wraps the vertices as a point cloud
            # (non-conforming fallback, signed_heat_tet_solver.cpp:24-33) and
            # takes tufted vertex dual areas (:81-86)
            src_pts = geom.vertices
            mean_area = float(np.mean(sources.weights))
            labels = surf.connected_components_vertices(geom)
            dual_areas = pc_geom.point_dual_areas(geom.vertices)
        else:
            src_pts = geom.positions
            mean_area = float(np.mean(sources.weights))
            labels = pc_geom.connected_components(geom.positions)
            dual_areas = sources.weights
        # Intentional fix of a reference quirk: the reference tet path always
        # builds its bounding cube with the DEFAULT scale=2 (triangulateCube
        # called without options.scale, signed_heat_tet_solver.cpp:893,1024)
        # even when the user sets options.scale; here the option is honored
        # on both domains (SURVEY.md §7 quirk-handling policy).
        src_faces = None
        if is_mesh and geom.is_triangular and options.conforming:
            # surface-conforming domain, the reference default for triangle
            # meshes (TETFLAGS_PRESERVE, signed_heat_tet_solver.cpp:967)
            src_faces = geom.triangles()
        mesh = build_tet_domain(src_pts, options.scale, options.h_coef,
                                mean_area=mean_area, src_faces=src_faces)
        # Crouzeix-Raviart face path surface ids (the reference's default
        # Step 3 for conforming triangle meshes, :234-317).  Input faces may
        # be subdivided into coplanar sub-faces by the recovery; constraints
        # and the mean shift then act on the sub-faces (same geometric
        # surface), with components inherited from the parent input face.
        surf_ids = cr_face_components = cr_face_areas = None
        if is_mesh and geom.is_triangular:
            surf_ids, cr_face_components, cr_face_areas = \
                SignedHeatTetSolver._cr_surface_info(mesh, geom, sources)

        pad = self.mesh.size if self.mesh is not None else 1
        labels = np.asarray(labels, np.int64)
        comp_root, comp_member = _component_rows(labels, mesh.src_vertex)
        # final dtypes on host, one batched transfer at load (ell.py module
        # docstring); with a device mesh the operator rows are sharded and
        # GSPMD runs Step 3 as distributed SpMV (VERDICT r1 item 7)
        dev = dict(
            barys=np.asarray(mesh.barycenters(), np_dtype),
            points=np.asarray(sources.points, np_dtype),
            vectors=np.asarray(sources.vectors(), np_dtype),
            dual_areas=np.asarray(dual_areas, np_dtype),
            comp_root=np.asarray(comp_root, np.int32),
            comp_member=np.asarray(comp_member, np.int32),
        )
        # Mode-aware persistence (VERDICT r2 item 4): the artifact holds the
        # discretization (mesh + quadrature) plus ONLY the Step-3 operator
        # family this run's mode needs — CR face state for the CR default,
        # vertex (dual-Laplacian) state otherwise, neither for greedy.  The
        # cache key deliberately stays mode-free (the reference rebuilds
        # only on hCoef change, main.cpp:146-147): a later run in a
        # different mode upgrades the SAME artifact in place
        # (_ensure_cr_path / _ensure_vertex_ops + _upgrade_artifact)
        # instead of re-meshing.  At knot scale this cuts ~600 MB of
        # vertex-path dead weight from the default (CR) artifact.
        cr_prep = None
        if (surf_ids is not None and options.use_crouzeix_raviart
                and not options.fast_integration):
            from .cr_solver import CRPath

            cr_prep = CRPath.prepare(mesh, surf_ids, np_dtype,
                                     cr_ops=fem.build_cr_operators(mesh),
                                     pad=pad)
        H_scipy = None
        vamg = {}
        if cr_prep is None and not options.fast_integration:
            H_scipy, vdev = SignedHeatTetSolver._build_vertex_ops(
                mesh, np_dtype, pad)
            dev.update(vdev)
            # the vertex path is the DEFAULT Step 3 here: build (and
            # persist) its hierarchy eagerly so the solve phase never pays
            # a host AMG setup
            vamg = SignedHeatTetSolver._eager_vamg(
                H_scipy, mesh, options, np_dtype, pad)
        return dict(
            spacing=float(mesh.mean_node_spacing()),
            mesh=mesh,
            src_labels=labels,
            dev=dev,
            H_csr=(None if H_scipy is None
                   else ell.CSR64.from_scipy(H_scipy)),
            cr=cr_prep,
            cr_face_components=(None if cr_face_components is None
                                else np.asarray(cr_face_components, np.int64)),
            cr_face_areas=(None if cr_face_areas is None
                           else np.asarray(cr_face_areas, np.float64)),
            vamg=vamg,
            vertex_v=SignedHeatTetSolver.VERTEX_V,
        )

    #: device-side vertex-path operator keys (built by _build_vertex_ops)
    VERTEX_KEYS = ("H_ell", "diagH", "div_rows", "div_tets", "div_gvec",
                   "vscale", "vnull")

    #: vertex-family artifact encoding version: bump when the DEVICE-side
    #: operator encoding changes so stale disk artifacts rebuild their
    #: vertex family from the (expensive, still-valid) cached mesh instead
    #: of mixing encodings.  v2 = equilibrated operator panels + hierarchy
    #: (vscale/vnull vectors); v1 (implicit, key absent) = raw operator.
    VERTEX_V = 2

    @staticmethod
    def _cr_surface_info(mesh: TetMesh, geom, sources):
        """(surf_ids, face_components, face_areas) for the CR path, or
        (None, None, None) when the mesh does not conform to the source
        (signed_heat_tet_solver.cpp:983-1011 surface identification)."""
        from .cr_solver import find_surface_faces

        if mesh.conforming:
            surf_ids = mesh.surface_faces
            face_labels = surf.connected_components_faces(geom)
            return (surf_ids, face_labels[mesh.surface_parent],
                    mesh.face_areas()[surf_ids])
        # externally-aligned meshes (e.g. lattice-aligned fixtures)
        src_faces_global = mesh.src_vertex[geom.triangles()]
        surf_ids = find_surface_faces(mesh, src_faces_global)
        if surf_ids is None:
            return None, None, None
        return (surf_ids, surf.connected_components_faces(geom),
                sources.weights)

    @staticmethod
    def _build_vertex_ops(mesh: TetMesh, np_dtype, pad: int):
        """(H_scipy, device-panel dict) for the vertex (dual-Laplacian)
        Step 3 — final dtypes, one batched transfer at the call site.

        ``H_scipy`` is the RAW operator (host f64 refinement and oracles
        act on it); the device panels hold the symmetrically EQUILIBRATED
        operator S H S, S = diag(1/sqrt(diag H)), plus the change-of-
        variable vectors ``vscale`` (= diag of S) and ``vnull`` (unit
        null direction of the scaled operator) — see the chunk-function
        header comment for why and for the null-space caveat."""
        dual = fem.build_dual_laplacian(mesh)
        H_scipy = (-dual.to_scipy()).tocsr()  # positive (semi)definite
        s = _vertex_scale(H_scipy)
        Hs = _equilibrated(H_scipy, s)
        diagH = Hs.diagonal()  # ~1 by construction; guard stays for repair
        diagH = np.where(diagH > 0, diagH, 1.0)
        u = 1.0 / s
        return H_scipy, dict(
            # high-degree vertices skew the dual-Laplacian row widths
            # (knot: width 68 panel for ~13/row mean, 4.4x padding waste);
            # single-chip solves store it sliced, multi-chip keeps the
            # GSPMD-shardable single panel (ell.SlicedEll docstring)
            H_ell=(ell.build_sliced(Hs, np_dtype)
                   if pad == 1 and Hs.nnz >= amg.SLICED_MIN_NNZ
                   and ell.sliced_waste(Hs) > 1.5
                   else ell.build_ell(Hs, np_dtype, pad_rows_to=pad)),
            div_rows=np.asarray(dual.div_rows, np.int32),
            div_tets=np.asarray(dual.div_tets, np.int32),
            div_gvec=np.asarray(dual.div_gvec, np_dtype),
            diagH=diagH.astype(np_dtype),
            vscale=s.astype(np_dtype),
            vnull=(u / np.linalg.norm(u)).astype(np_dtype),
        )

    @staticmethod
    def _eager_vamg(H_scipy, mesh: TetMesh, options, np_dtype, pad: int) -> dict:
        """Eagerly-built (persisted) vertex AMG hierarchy for the run's
        constraint mode; other modes build lazily per process
        (_hierarchy)."""
        mode = options.level_set_constraint
        # hierarchy on the EQUILIBRATED operator, masked after scaling —
        # matching the chunk matvec mask*(SHS)(mask x) + (1-mask)x exactly
        Hh = _equilibrated(H_scipy)
        if mode == LevelSetConstraint.ZERO_SET:
            mask = np.ones(Hh.shape[0])
            mask[:mesh.n_src] = 0.0
            Hh = amg.masked_operator(Hh, mask)
        from .cr_solver import PAGED_MIN_NNZ

        return {mode.value: amg.build_hierarchy_host(
            Hh, np_dtype, pad_rows_to=pad, skip_level0_A=True,
            # same at-scale encodings as the CR hierarchies: paged square
            # levels + sliced transfers on the single-chip path
            paged_min_nnz=(PAGED_MIN_NNZ
                           if pad == 1 and np_dtype == np.float32
                           else None))}

    def _upgrade_artifact(self, cached, options, mutate) -> None:
        """Merge a mode upgrade (vertex ops / CR state built after the
        fact) back into the on-disk artifact, so later processes load it
        instead of rebuilding.  ``mutate(prepared)`` returns True when it
        changed the tree — a False (another process already merged this
        family) skips the multi-GB rewrite.  Best-effort and
        last-writer-wins: concurrent upgrades of DIFFERENT families can
        drop one of them (save_tree replaces the whole directory
        atomically), costing a later re-upgrade, never corruption."""
        key = cached.get("_key")
        if not options.disk_cache or key is None:
            return
        prepared = treestore.load_tree(("tetprep",) + key)
        if prepared is None:
            return
        if mutate(prepared):
            treestore.save_tree(("tetprep",) + key, prepared)

    def _to_device(self, prepared: dict, dtype) -> dict:
        """Operator-cache entry from a prepared (possibly memory-mapped)
        tree: scipy wrappers + one batched device transfer."""
        mesh: TetMesh = prepared["mesh"]
        # vertex-family encoding gate: an artifact written before VERTEX_V
        # carries raw (unequilibrated) panels/hierarchies — drop that family
        # and let _ensure_vertex_ops rebuild it from the cached mesh (and
        # merge the upgrade back to disk); the mesh/CR/quadrature state in
        # the artifact stays valid.
        stale_vertex = (prepared.get("H_csr") is not None
                        and prepared.get("vertex_v", 1)
                        < SignedHeatTetSolver.VERTEX_V)
        H_scipy = (prepared["H_csr"].to_scipy()
                   if prepared["H_csr"] is not None and not stale_vertex
                   else None)
        if H_scipy is not None and checks.enabled():
            # sanitizer: the segment-sum assembly must stay symmetric
            # (CG assumes it; an asymmetric dedup is silently wrong)
            checks.check_symmetric(
                "tet dual Laplacian", lambda x: H_scipy @ np.asarray(x),
                H_scipy.shape[0],
            )
        # the vertex-path operators (H_ell, divergence tables) are dead
        # weight when CR Step 3 is active (the default on conforming
        # meshes; the vertex path then only runs under --no-cr) — ~600 MB
        # of transfer + HBM at knot scale.  Mode-aware artifacts no longer
        # persist them alongside CR state (_prepare_host); older/upgraded
        # artifacts that do carry both defer the vertex arrays to first
        # vertex-path use (_ensure_vertex_ops).
        VERTEX_KEYS = SignedHeatTetSolver.VERTEX_KEYS
        dev_host = dict(prepared["dev"])
        if stale_vertex:
            for k in VERTEX_KEYS:
                dev_host.pop(k, None)
        vertex_host = None
        if prepared["cr"] is not None and "H_ell" in dev_host:
            vertex_host = {k: dev_host.pop(k) for k in VERTEX_KEYS}
        device = ell.device_put_tree(dict(
            dev=dev_host,
            vamg=({} if stale_vertex else
                  {k: (h.levels, h.coarse_inv)
                   for k, h in prepared["vamg"].items()}),
        ), self.mesh)
        amg_cache = {
            LevelSetConstraint(k): amg.AMGHierarchy(
                lev, cinv, prepared["vamg"][k].sizes, prepared["vamg"][k].l0_nnz)
            for k, (lev, cinv) in device["vamg"].items()
        }
        cr_path = None
        if prepared["cr"] is not None:
            from .cr_solver import CRPath

            cr_path = CRPath(mesh, dtype=dtype, device_mesh=self.mesh,
                             prepared=prepared["cr"])
        return dict(
            mesh=mesh,
            cr_path=cr_path,
            cr_face_components=prepared["cr_face_components"],
            cr_face_areas=prepared["cr_face_areas"],
            spacing=float(prepared["spacing"]),
            src_labels=np.asarray(prepared["src_labels"], dtype=np.int64),
            H_scipy=H_scipy,
            amg=amg_cache,  # per-constraint-mode hierarchies (+ lazy builds)
            _vertex_host=vertex_host,  # deferred vertex-path arrays (or None)
            **device["dev"],
        )

    def _ensure_vertex_ops(self, cached, options):
        """Make the vertex-path operators device-resident on first use
        (--no-cr / non-default modes on a CR-keyed artifact):

        1. already resident -> no-op;
        2. persisted-but-deferred (older both-family artifact) -> ship;
        3. absent from a lean mode-aware artifact -> BUILD from the cached
           mesh now and merge the upgrade back into the disk artifact so
           later processes skip the rebuild."""
        if "H_ell" in cached:
            return
        if cached.get("_vertex_host") is not None:
            cached.update(ell.device_put_tree(cached.pop("_vertex_host"),
                                              self.mesh))
            return
        mesh: TetMesh = cached["mesh"]
        np_dtype = np.dtype(cached["barys"].dtype)
        pad = self.mesh.size if self.mesh is not None else 1
        H_scipy, vdev = SignedHeatTetSolver._build_vertex_ops(
            mesh, np_dtype, pad)
        cached["H_scipy"] = H_scipy
        cached.update(ell.device_put_tree(vdev, self.mesh))
        # build (and persist) the current mode's hierarchy with the same
        # at-scale encodings the eager path uses — the generic lazy
        # _hierarchy rebuild would repay host SA-AMG setup per process
        # AND miss the paged/sliced encodings
        vamg = {}
        if not options.fast_integration:
            vamg = SignedHeatTetSolver._eager_vamg(
                H_scipy, mesh, options, np_dtype, pad)
            for k, h in vamg.items():
                lev, cinv = ell.device_put_tree(
                    (h.levels, h.coarse_inv), self.mesh)
                cached["amg"][LevelSetConstraint(k)] = amg.AMGHierarchy(
                    lev, cinv, h.sizes, h.l0_nnz)

        def mutate(prepared):
            if (prepared.get("H_csr") is not None
                    and prepared.get("vertex_v", 1)
                    >= SignedHeatTetSolver.VERTEX_V):
                return False
            # replace (don't merge) any pre-VERTEX_V vertex family: old
            # panels/hierarchies use the raw-operator encoding
            prepared["dev"] = {k: v for k, v in prepared["dev"].items()
                               if k not in SignedHeatTetSolver.VERTEX_KEYS}
            prepared["dev"].update(vdev)
            prepared["H_csr"] = ell.CSR64.from_scipy(H_scipy)
            prepared["vamg"] = dict(vamg)
            prepared["vertex_v"] = SignedHeatTetSolver.VERTEX_V
            return True

        self._upgrade_artifact(cached, options, mutate)

    def _ensure_cr_path(self, cached, geom, options):
        """Build the CR face state on a vertex/greedy-keyed artifact when a
        CR-mode solve arrives (mode-aware artifacts persist only the family
        their first run needed; see _prepare_host).  Merges the upgrade
        into the disk artifact.  No-op when the mesh cannot support CR."""
        if cached.get("cr_path") is not None or cached.get("_cr_unsupported"):
            return
        mesh: TetMesh = cached["mesh"]
        if not (isinstance(geom, Mesh) and geom.is_triangular):
            cached["_cr_unsupported"] = True
            return
        sources = src_mod.from_geometry(geom)
        surf_ids, comps, areas = SignedHeatTetSolver._cr_surface_info(
            mesh, geom, sources)
        if surf_ids is None:
            cached["_cr_unsupported"] = True
            return
        from .cr_solver import CRPath

        np_dtype = np.dtype(cached["barys"].dtype)
        pad = self.mesh.size if self.mesh is not None else 1
        cr_prep = CRPath.prepare(mesh, surf_ids, np_dtype,
                                 cr_ops=fem.build_cr_operators(mesh), pad=pad)
        cached["cr_path"] = CRPath(mesh, dtype=np_dtype, device_mesh=self.mesh,
                                   prepared=cr_prep)
        cached["cr_face_components"] = np.asarray(comps, np.int64)
        cached["cr_face_areas"] = np.asarray(areas, np.float64)

        def mutate(prepared):
            if prepared.get("cr") is not None:
                return False
            prepared["cr"] = cr_prep
            prepared["cr_face_components"] = cached["cr_face_components"]
            prepared["cr_face_areas"] = cached["cr_face_areas"]
            return True

        self._upgrade_artifact(cached, options, mutate)

    def _hierarchy(self, cached, mode, n_src: int, dtype):
        """Per-mode SA-AMG hierarchy for the vertex (dual-Laplacian) solves
        (operator-cache artifact; the default mode is persisted by
        _prepare_host, others build lazily per process)."""
        if mode not in cached["amg"]:
            H = _equilibrated(cached["H_scipy"])
            if mode == LevelSetConstraint.ZERO_SET:
                mask = np.ones(H.shape[0])
                mask[:n_src] = 0.0
                H = amg.masked_operator(H, mask)
            cached["amg"][mode] = amg.build_hierarchy(H, dtype, mesh=self.mesh,
                                                      skip_level0_A=True)
        return cached["amg"][mode]

    def _integrate(self, Y, mesh, geom, cached, options, tm):
        if "H_ell" not in cached and cached.get("_vertex_host") is None:
            tm.note("vertex operators absent from artifact: building "
                    "(mode upgrade; merged back to disk)")
        self._ensure_vertex_ops(cached, options)
        n = mesh.n_vertices
        mode = options.level_set_constraint
        tol, maxiter = options.resolved_solver_tol(), options.solver_maxiter
        div = _divergence_jit(
            Y, cached["div_rows"], cached["div_tets"], cached["div_gvec"], n
        )
        dtype = div.dtype
        op = (cached["H_ell"], cached["diagH"])
        h = self._hierarchy(cached, mode, mesh.n_src, dtype)
        mg = (h.levels, h.coarse_inv)
        cost = hierarchy_iter_seconds(h, l0=cached["H_ell"])
        solve_stats: dict = {}
        H64 = cached["H_scipy"]
        # device solves run in equilibrated variables (chunk-function header
        # comment): scale the rhs into them, unscale the solution out; the
        # host f64 refinement ops below stay in ORIGINAL variables (run()
        # presents an original-variable solve to _refined_solve)
        vs = cached["vscale"]
        div64 = np.asarray(div, np.float64)
        zeros = ell.replicated(np.zeros(n), dtype, self.mesh)

        def scaled_run(chunk_of):
            def run(b, tol=tol, maxiter=maxiter):
                bs = vs * b
                y, iters, res = _run_chunked(
                    lambda x0, c, s: chunk_of(bs, x0, c, s, tol),
                    zeros, tol, maxiter, iter_seconds=cost,
                    stats=solve_stats)
                return vs * y, iters, res
            return run

        if mode == LevelSetConstraint.ZERO_SET:
            mask64 = np.ones(n)
            mask64[:mesh.n_src] = 0.0
            b64 = mask64 * -div64
            host_op = lambda x: mask64 * (H64 @ (mask64 * x)) + (1.0 - mask64) * x
            run = scaled_run(lambda bs, x0, c, s, t: _zeroset_chunk(
                bs, x0, *op, *mg, s, n=n, n_src=mesh.n_src, tol=t,
                chunk=c, mg_sizes=h.sizes))
            phi, iters, res = _refined_solve(run, host_op, b64, dtype, options, tm,
                                               device_mesh=self.mesh,
                                               stats=self.last_stats)
            phi = jnp.asarray(phi, dtype)
        elif mode == LevelSetConstraint.MULTIPLE:
            sv = np.asarray(mesh.src_vertex)
            first = np.sort(np.unique(sv, return_index=True)[1])
            elems = sv[first]
            _, gids = np.unique(cached["src_labels"][first], return_inverse=True)
            sizes = np.bincount(gids).astype(np.float64)
            n_groups = int(gids.max()) + 1
            # scaled-space group projection weights: u = sqrt(diag H) at the
            # component vertices (see _multiple_chunk docstring)
            u64 = 1.0 / _vertex_scale(H64)
            ue = u64[elems]
            uinv = 1.0 / np.bincount(gids, weights=ue ** 2,
                                     minlength=n_groups)
            gparts = ell.device_put_tree(dict(
                elems=elems.astype(np.int32), gids=gids.astype(np.int32),
                u=ue.astype(np.dtype(dtype)),
                uinv=uinv.astype(np.dtype(dtype))))

            def proj64(v):
                v = np.array(v, copy=True)
                sums = np.bincount(gids, weights=v[elems], minlength=n_groups)
                v[elems] = (sums / sizes)[gids]
                return v - v.mean()

            b64 = proj64(-div64)
            host_op = lambda x: proj64(H64 @ x)
            run = scaled_run(lambda bs, x0, c, s, t: _multiple_chunk(
                bs, x0, *op,
                gparts["elems"], gparts["gids"], gparts["u"], gparts["uinv"],
                cached["vnull"], *mg, s,
                n_groups=n_groups, tol=t, chunk=c, mg_sizes=h.sizes))
            x, iters, res = _refined_solve(run, host_op, b64, dtype, options, tm,
                                               device_mesh=self.mesh,
                                               stats=self.last_stats)
            phi = self._shift(jnp.asarray(x, dtype), mesh, cached)
        else:
            b64 = -div64
            b64 = b64 - b64.mean()
            host_op = lambda x: (lambda y: y - y.mean())(H64 @ x)
            run = scaled_run(lambda bs, x0, c, s, t: _none_chunk(
                bs, x0, *op, cached["vnull"], *mg, s, n=n, tol=t,
                chunk=c, mg_sizes=h.sizes))
            phi, iters, res = _refined_solve(run, host_op, b64, dtype, options, tm,
                                               device_mesh=self.mesh,
                                               stats=self.last_stats)
            phi = self._shift(jnp.asarray(phi, dtype), mesh, cached)
        tm.note(f"krylov iters={int(iters)} rel_res={float(res):.2e}")
        self.last_stats.update(
            iters=int(iters), rel_res=float(res), residual=float(res),
            chunks=solve_stats.get("chunks", []),
            amg_sizes=list(h.sizes), iter_seconds_est=round(cost, 4))
        return phi

    def _shift(self, phi, mesh, cached):
        """Dual-area-weighted mean of phi over the source vertices
        (averageVertexDataOnSource, signed_heat_tet_solver.cpp:576-604)."""
        w = cached["dual_areas"]
        vals = phi[jnp.asarray(mesh.src_vertex)]
        return phi - jnp.sum(w * vals) / jnp.sum(w)

    def _greedy(self, mesh, Y, geom, cached, options):
        mode = options.level_set_constraint
        if mode == LevelSetConstraint.ZERO_SET:
            seeds = np.unique(mesh.src_vertex)
            phi = integrate_greedily_tet(mesh, Y, seeds)
        elif mode == LevelSetConstraint.MULTIPLE:
            phi = self._greedy_multi(mesh, Y, cached)
        else:
            phi = integrate_greedily_tet(mesh, Y, np.array([0]))
            phi = np.asarray(self._shift(jnp.asarray(phi, jnp.float64), mesh, cached))
        return phi

    def _greedy_multi(self, mesh: TetMesh, Y: np.ndarray, cached) -> np.ndarray:
        """Reference integrateGreedilyMultipleLevelSets (:493-556): BFS from
        vertex 0; the first time a component is reached its value is locked
        and later member vertices copy it."""
        import collections

        NV = mesh.n_vertices
        comp_of = np.full(NV, -1, dtype=np.int64)
        # true per-input-vertex component labels cached at build time
        # (singleton components keep their own distinct label, matching the
        # reference's per-component tracking, signed_heat_tet_solver.cpp:493-556)
        src_labels = np.asarray(cached["src_labels"], dtype=np.int64)
        comp_of[np.asarray(mesh.src_vertex)] = src_labels
        n_comp = int(src_labels.max()) + 1 if src_labels.size else 1
        comp_value = np.zeros(n_comp)
        comp_visited = np.zeros(n_comp, dtype=bool)

        phi = np.zeros(NV)
        visited = np.zeros(NV, dtype=bool)
        visited[0] = True
        if comp_of[0] >= 0:
            comp_visited[comp_of[0]] = True
        queue = collections.deque([0])
        verts, tets = mesh.vertices, mesh.tets
        indptr, data = mesh.vt_indptr, mesh.vt_data
        V = mesh.n_src
        while queue:
            curr = queue.popleft()
            p = verts[curr]
            for tid in data[indptr[curr]:indptr[curr + 1]]:
                for nb in tets[tid]:
                    if visited[nb]:
                        continue
                    cb = comp_of[nb] if nb < V else -1
                    if cb >= 0 and comp_visited[cb]:
                        phi[nb] = comp_value[cb]
                    else:
                        phi[nb] = phi[curr] + float(np.dot(Y[tid], verts[nb] - p))
                        if cb >= 0:
                            comp_visited[cb] = True
                            comp_value[cb] = phi[nb]
                    visited[nb] = True
                    queue.append(int(nb))
        return phi


def solve_tet(geom, options: SignedHeatOptions = SignedHeatOptions()) -> TetResult:
    return SignedHeatTetSolver().compute_distance(geom, options)
