"""Smoothed-aggregation algebraic multigrid for unstructured FEM operators.

The grid domain has a geometric hierarchy (solve/multigrid.py); the tet
domain's operators — the Alexa dual Laplacian on vertices and the
Crouzeix-Raviart Laplacian on faces (tet/fem.py, reference
signed_heat_tet_solver.cpp:623-751) — live on unstructured meshes, where the
reference uses direct sparse Cholesky/LU.  Jacobi-PCG alone needs thousands
of iterations on these (measured: 1,896 on a 16.6k-face CR system).  This
module builds a classical smoothed-aggregation hierarchy ON HOST (SciPy,
f64, an operator-cache artifact) and applies symmetric V-cycles ON DEVICE as
fixed-depth chains of sorted-COO segment-sum matvecs — everything jittable,
f32-safe (the hierarchy is only a preconditioner; CG outside it controls
accuracy).

Standard SA construction (Vanek/Mandel/Brezina):
  strength   S_ij = |a_ij| >= theta sqrt(a_ii a_jj)
  aggregates greedy over the strength graph (two passes)
  tentative  T = piecewise-constant injection onto aggregates
  smoothing  P = (I - (4/3 / rho(D^{-1}A)) D^{-1}A) T
  coarse     A_c = P^T A P   (Galerkin)
Coarsest level is solved with a dense f64-computed (pseudo)inverse — a few
hundred rows, f32-safe to apply because the hierarchy conditions it.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class AMGLevel(NamedTuple):
    # operator A_l, COO sorted by row
    a_rows: jnp.ndarray
    a_cols: jnp.ndarray
    a_vals: jnp.ndarray
    inv_diag: jnp.ndarray       # 1 / diag(A_l)
    # prolongation P_l (n_l x n_c), COO sorted by row (for P @ xc)
    p_rows: jnp.ndarray
    p_cols: jnp.ndarray
    p_vals: jnp.ndarray
    # the same P sorted by column (for P^T @ x)
    pt_rows: jnp.ndarray        # = row indices, sorted by col
    pt_cols: jnp.ndarray        # = col indices (sorted)
    pt_vals: jnp.ndarray


class AMGHierarchy(NamedTuple):
    levels: Tuple[AMGLevel, ...]
    coarse_inv: jnp.ndarray     # dense (pseudo)inverse of the coarsest A
    sizes: Tuple[int, ...]      # static per-level sizes (incl. coarsest)


def _aggregate(A, theta: float) -> np.ndarray:
    """Strength-based aggregation; returns (n,) aggregate ids, with
    -1 marking DROPPED nodes: rows with no strong couplings (e.g. the
    identity rows of a Dirichlet-masked operator) get no coarse
    representation at all — the smoother already solves them pointwise,
    and carrying them as persistent singleton aggregates stalls coarsening
    (measured: 17.6k masked source rows pinned the coarsest level at 17.6k
    and sent the dense coarse solve into an O(n^3) pinv).

    Fully vectorized (the r1 greedy row loop cost ~15 min of the knot CR
    solve's cold path at n=4.5M on this VM): parallel MIS-style rounds —
    a free node whose random priority beats every free strong neighbor
    seeds an aggregate and captures its free neighbors; a few rounds cover
    the graph, then leftovers attach to any adjacent aggregate.  Same
    family as the r1 greedy (seed + one-ring aggregates), different (still
    valid) tie-breaking."""
    import scipy.sparse as sp

    n = A.shape[0]
    d = np.abs(A.diagonal())
    d = np.where(d > 0, d, 1.0)
    C = A.tocoo()
    strong_mask = (
        (C.row != C.col)
        & (np.abs(C.data) >= theta * np.sqrt(d[C.row] * d[C.col]))
    )
    rows = C.row[strong_mask]
    cols = C.col[strong_mask]
    # symmetric strength graph in CSR form (pattern only)
    S = sp.csr_matrix((np.ones(rows.shape[0], np.int8), (rows, cols)), shape=(n, n))
    indptr, indices = S.indptr, S.indices
    deg = np.diff(indptr)
    isolated = deg == 0

    rng = np.random.default_rng(0)
    pri = rng.permutation(n).astype(np.int64)  # unique priorities
    agg = np.full(n, -1, dtype=np.int64)
    next_id = 0
    MAX = np.iinfo(np.int64).max
    if indices.size == 0:
        return agg  # no strong couplings anywhere
    # CSR rows are contiguous, so per-row reduction is a reduceat over
    # indptr (np.minimum.at is ~10x slower on this VM's numpy)
    red_idx = np.minimum(indptr[:-1], indices.size - 1)

    def row_min(values_per_edge):
        """Per-row min over the strong neighbors (MAX for empty rows)."""
        out = np.minimum.reduceat(values_per_edge, red_idx)
        return np.where(isolated, MAX, out)

    for _ in range(4):  # MIS rounds; each covers a constant fraction
        free = (agg < 0) & ~isolated
        if not free.any():
            break
        # neighbor priorities: assigned/isolated neighbors -> +inf (they
        # don't block seeding); free ones compete
        nbr_pri = np.where(free[indices], pri[indices], MAX)
        blocked = row_min(np.where(agg[indices] >= 0, np.int64(0), MAX))
        min_free_nbr = row_min(nbr_pri)
        seeds = free & (pri < min_free_nbr) & (blocked > 0)
        ns = int(seeds.sum())
        if ns == 0:
            break
        agg[seeds] = next_id + np.arange(ns)
        seed_of_pri = np.full(n, -1, dtype=np.int64)
        seed_of_pri[pri[seeds]] = agg[seeds]
        next_id += ns
        # capture: each still-free node with a seed neighbor joins the
        # min-priority seed among its neighbors
        is_seed_nbr = seeds[indices]
        cand = np.where(is_seed_nbr, pri[indices], MAX)
        best = row_min(cand)
        grab = (agg < 0) & ~isolated & (best < MAX)
        agg[grab] = seed_of_pri[best[grab]]

    # attach leftovers to any adjacent aggregate (vectorized pass 2);
    # iterate so chains of leftovers drain into the aggregates
    for _ in range(3):
        free = (agg < 0) & ~isolated
        if not free.any():
            break
        nbr_agg = np.where(agg[indices] >= 0, agg[indices], MAX)
        best = row_min(nbr_agg)
        hit = free & (best < MAX)
        agg[hit] = best[hit]
    # anything still free (a free clique with no assigned contact) seeds
    # its own aggregates one-per-node
    free = (agg < 0) & ~isolated
    nf = int(free.sum())
    if nf:
        agg[free] = next_id + np.arange(nf)
    return agg


def _rho_dinv_a(A, d, iters: int = 12) -> float:
    """Power-iteration estimate of rho(D^{-1} A)."""
    rng = np.random.default_rng(0)
    x = rng.normal(size=A.shape[0])
    x /= np.linalg.norm(x)
    rho = 2.0
    for _ in range(iters):
        y = (A @ x) / d
        nrm = np.linalg.norm(y)
        if nrm == 0:
            break
        rho = nrm
        x = y / nrm
    return float(rho)


def _coo_sorted(M, by_col: bool = False):
    """COO triplets in row-major (or column-major) order.  CSR->COO emits
    row-major and CSC->COO column-major already, so no O(nnz log nnz)
    lexsort is needed (the r1 lexsorts cost minutes at 31M nnz on this VM)."""
    X = M.tocsc() if by_col else M.tocsr()
    X.sort_indices()
    C = X.tocoo()
    return C.row, C.col, C.data


def build_hierarchy(
    H, dtype, theta: float = 0.08, max_coarse: int = 192, max_levels: int = 12,
) -> AMGHierarchy:
    """Host-side SA-AMG setup for SPD (or semi-definite) sparse ``H``.

    Returns device-ready arrays; an operator-cache artifact (built once per
    discretization, reused across solves)."""
    import scipy.sparse as sp

    A = H.tocsr().astype(np.float64)
    levels = []
    sizes = [A.shape[0]]
    while A.shape[0] > max_coarse and len(levels) < max_levels:
        n = A.shape[0]
        agg = _aggregate(A, theta)
        nc = int(agg.max()) + 1
        if nc >= n or nc == 0:  # aggregation stalled (e.g. diagonal matrix)
            break
        kept = agg >= 0
        T = sp.csr_matrix(
            (np.ones(int(kept.sum())), (np.flatnonzero(kept), agg[kept])),
            shape=(n, nc),
        )
        d = np.asarray(A.diagonal())
        d = np.where(np.abs(d) > 0, d, 1.0)
        omega = 4.0 / (3.0 * _rho_dinv_a(A, d))
        P = (T - sp.diags(omega / d) @ (A @ T)).tocsr()
        Ac = (P.T @ A @ P).tocsr()
        Ac.sum_duplicates()

        ar, ac, av = _coo_sorted(A)
        pr, pc, pv = _coo_sorted(P)
        ptr, ptc, ptv = _coo_sorted(P, by_col=True)
        levels.append(AMGLevel(
            jnp.asarray(ar, jnp.int32), jnp.asarray(ac, jnp.int32),
            jnp.asarray(av, dtype), jnp.asarray(1.0 / d, dtype),
            jnp.asarray(pr, jnp.int32), jnp.asarray(pc, jnp.int32),
            jnp.asarray(pv, dtype),
            jnp.asarray(ptr, jnp.int32), jnp.asarray(ptc, jnp.int32),
            jnp.asarray(ptv, dtype),
        ))
        A = Ac
        sizes.append(A.shape[0])

    if A.shape[0] > 8 * max_coarse:
        # coarsening failed to reach dense-solve size (pathological inputs);
        # a diagonal coarse "solve" keeps the preconditioner SPD and cheap
        d = np.asarray(A.diagonal())
        d = np.where(np.abs(d) > 0, d, 1.0)
        coarse_inv = jnp.asarray(np.diag(1.0 / d), dtype)
        return AMGHierarchy(tuple(levels), coarse_inv, tuple(sizes))
    Ad = A.toarray()
    # pseudo-inverse tolerates the singular Neumann-mode operators (constant
    # null space); computed in f64, applied in the compute dtype
    coarse_inv = jnp.asarray(np.linalg.pinv(Ad, rcond=1e-10), dtype)
    return AMGHierarchy(tuple(levels), coarse_inv, tuple(sizes))


def _seg_matvec(x, rows, cols, vals, n: int):
    return jax.ops.segment_sum(
        vals * x[cols], rows, num_segments=n, indices_are_sorted=True
    )


def make_preconditioner_parts(levels, coarse_inv, sizes, smooth_iters: int = 1):
    """Symmetric V-cycle preconditioner M ~ H^{-1} (damped-Jacobi smoothing,
    identical pre/post counts — SPD, valid inside CG).

    ``levels``/``coarse_inv`` are pytrees of device arrays (jit arguments);
    ``sizes`` must be a static tuple of ints (segment counts)."""
    omega = 0.67

    def smooth(lvl: AMGLevel, n, x, b):
        for _ in range(smooth_iters):
            r = b - _seg_matvec(x, lvl.a_rows, lvl.a_cols, lvl.a_vals, n)
            x = x + omega * lvl.inv_diag * r
        return x

    def cycle(level: int, b):
        if level == len(levels):
            return coarse_inv @ b
        lvl = levels[level]
        n, nc = sizes[level], sizes[level + 1]
        x = omega * lvl.inv_diag * b  # pre-smooth from zero
        r = b - _seg_matvec(x, lvl.a_rows, lvl.a_cols, lvl.a_vals, n)
        rc = _seg_matvec(r, lvl.pt_cols, lvl.pt_rows, lvl.pt_vals, nc)  # P^T r
        xc = cycle(level + 1, rc)
        x = x + _seg_matvec(xc, lvl.p_rows, lvl.p_cols, lvl.p_vals, n)  # + P xc
        return smooth(lvl, n, x, b)

    return lambda b: cycle(0, b)


def make_preconditioner(h: AMGHierarchy, smooth_iters: int = 1):
    return make_preconditioner_parts(h.levels, h.coarse_inv, h.sizes, smooth_iters)


def masked_operator(H, mask: np.ndarray):
    """Dirichlet elimination: diag(mask) H diag(mask) + diag(1 - mask) —
    the operator the ZeroSet chunks apply on device (identity rows on
    constrained unknowns)."""
    import scipy.sparse as sp

    Dm = sp.diags(mask.astype(np.float64))
    return (Dm @ H @ Dm + sp.diags(1.0 - mask.astype(np.float64))).tocsr()

