"""Smoothed-aggregation algebraic multigrid for unstructured FEM operators.

The grid domain has a geometric hierarchy (solve/multigrid.py); the tet
domain's operators — the Alexa dual Laplacian on vertices and the
Crouzeix-Raviart Laplacian on faces (tet/fem.py, reference
signed_heat_tet_solver.cpp:623-751) — live on unstructured meshes, where the
reference uses direct sparse Cholesky/LU.  Jacobi-PCG alone needs thousands
of iterations on these (measured: 1,896 on a 16.6k-face CR system).  This
module builds a classical smoothed-aggregation hierarchy ON HOST (SciPy,
f64, an operator-cache artifact) and applies symmetric V-cycles ON DEVICE as
fixed-depth chains of fixed-width gather (ELL) matvecs (solve/ell.py — TPU
scatter-adds run at ~60M elem/s and put knot's CR solve into the worker
watchdog; gathers halve that and drop the row arrays) — everything jittable,
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

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import ell, pell
from ..utils import order, treestore

#: transfer operators at/above this nnz with ELL padding waste > 1.5x build
#: as ell.SlicedEll on the single-chip paged path (build_hierarchy_host
#: build_op); below it the single panel is small enough not to matter
SLICED_MIN_NNZ = 200_000


#: Chebyshev smoother parameters (see make_preconditioner_parts).  Degree 3
#: over [rho/30, 1.1 rho] measured 91 PCG iterations to rel 1e-5 on the
#: knot CR operator vs 221 for safe damped Jacobi (f64 host experiment,
#: physical divergence RHS) — the sliver-dominated spectrum needs the wider
#: polynomial attenuation band.  Degree-2 variants: lo=4 -> 138, lo=16 ->
#: 120; Jacobi with 2 post-smooths only reached 187.  WALL-CLOCK sweep on
#: the real chip (r5, knot warm solve end-to-end): degree 2 = 60.1 s /
#: 95 iters, degree 3 = 59.7 s / 78, degree 4 = 62.3 s / 68 — iteration
#: savings and per-cycle SpMV cost cancel almost exactly; 3 is the flat
#: optimum (override with SHM3D_CHEB_DEGREE for other spectra).
CHEB_DEGREE = 3
CHEB_LO_FRAC = 30.0
CHEB_LMAX_SAFETY = 1.1


@treestore.register
class AMGLevel(NamedTuple):
    A: Optional[ell.EllMat]     # operator A_l (n_l x n_l); None at level 0
                                # when the caller's solve matvec is reused
                                # (make_preconditioner_parts matvec0) — the
                                # level-0 panel would duplicate the solve
                                # operator (250 MB at knot scale)
    inv_diag: jnp.ndarray       # 1 / diag(A_l): the Jacobi scaling the
                                # Chebyshev smoother iterates D^-1 A with.
                                # (Historical note: this field once baked a
                                # damped-Jacobi omega; the per-level safe
                                # damping 4/(3 rho) remains in use for
                                # PROLONGATOR smoothing — a fixed omega
                                # assumed rho <= 2 while sliver-bearing CR
                                # operators measure rho up to 4.6, where it
                                # diverged on high modes)
    P: ell.EllMat               # prolongation (n_l x n_c)
    PT: ell.EllMat              # restriction P^T (n_c x n_l)
    cheb: jnp.ndarray           # (2,) [theta, delta]: Chebyshev interval
                                # midpoint/half-width over the D^-1 A
                                # spectrum estimate [rho/CHEB_LO_FRAC,
                                # CHEB_LMAX_SAFETY * rho], baked at build


@treestore.register
class AMGHierarchy(NamedTuple):
    levels: Tuple[AMGLevel, ...]
    coarse_inv: jnp.ndarray     # dense (pseudo)inverse of the coarsest A
    sizes: Tuple[int, ...]      # static per-level sizes (incl. coarsest)
    l0_nnz: int = 0             # level-0 operator nnz (iter-cost accounting
                                # when levels[0].A is None)


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


def _truncate_prolongator(P, k: int):
    """Keep the k largest-|.| entries per row of CSR ``P``, rescaling the
    kept entries so row sums are preserved (P interpolates the constant
    near-null vector exactly: T row sums are 1 and smoothing preserves them
    because A annihilates constants).  Bounds the ELL width of P and, more
    importantly, the fill of the Galerkin coarse operators — the V-cycle's
    per-iteration gather cost on TPU is proportional to those widths
    (unbounded SA: 47.4M gathered elems/iter at 265k faces, 4x the level-0
    matvec's)."""
    import scipy.sparse as sp

    counts = np.diff(P.indptr)
    if counts.size == 0 or counts.max() <= k:
        return P
    n = P.shape[0]
    w = int(counts.max())
    rows_all = np.repeat(np.arange(n, dtype=np.int64), counts)
    pos = np.arange(P.indices.size, dtype=np.int64) - np.repeat(P.indptr[:-1], counts)
    vals_p = np.zeros((n, w))
    cols_p = np.zeros((n, w), np.int64)
    vals_p[rows_all, pos] = P.data
    cols_p[rows_all, pos] = P.indices
    top = np.argpartition(-np.abs(vals_p), k - 1, axis=1)[:, :k]
    kv = np.take_along_axis(vals_p, top, axis=1)
    kc = np.take_along_axis(cols_p, top, axis=1)
    orig_sum = vals_p.sum(axis=1)
    kept_sum = kv.sum(axis=1)
    scale = np.where(np.abs(kept_sum) > 0.1 * np.abs(orig_sum) + 1e-300,
                     orig_sum / np.where(kept_sum == 0, 1.0, kept_sum), 1.0)
    kv = kv * scale[:, None]
    keep = kv != 0.0
    r = np.repeat(np.arange(n, dtype=np.int64), k)
    out = sp.csr_matrix((kv.ravel()[keep.ravel()],
                         (r[keep.ravel()], kc.ravel()[keep.ravel()])),
                        shape=P.shape)
    out.sum_duplicates()
    return out


def _filter_operator(A, drop_tol: float):
    """Drop off-diagonal entries |a_ij| < drop_tol sqrt(a_ii a_jj), adding
    |a_ij| to the row's diagonal.  Removing the symmetric pair (i,j),(j,i)
    of value v and adding |v| to both diagonals perturbs A by
    |v| (e_i -+ e_j)(e_i -+ e_j)^T >= 0, so the filtered operator stays SPD
    — compensating with the SIGNED value instead preserves row sums but
    SUBTRACTS that PSD term for the Laplacian's negative off-diagonals and
    made coarse levels indefinite (measured eig -1.7e-4: CG stalled at 1e-2
    on the NONE-mode CR solve).  Keeps the coarse-level ELL widths bounded;
    the result only serves as a preconditioner level, CG outside the V-cycle
    controls accuracy."""
    import scipy.sparse as sp

    if drop_tol <= 0.0:
        return A
    C = A.tocoo()
    d = np.abs(A.diagonal())
    d = np.where(d > 0, d, 1.0)
    is_diag = C.row == C.col
    keep = is_diag | (np.abs(C.data) >= drop_tol * np.sqrt(d[C.row] * d[C.col]))
    dropped = ~keep
    comp = np.bincount(C.row[dropped], weights=np.abs(C.data[dropped]),
                       minlength=A.shape[0])
    out = sp.csr_matrix((C.data[keep], (C.row[keep], C.col[keep])), shape=A.shape)
    out = (out + sp.diags(comp.astype(out.dtype))).tocsr()
    out.sum_duplicates()
    return out


def build_hierarchy_host(
    H, dtype, theta: float = 0.08, max_coarse: int = 192, max_levels: int = 12,
    p_keep: int = 4, drop_tol: float = 0.02, pad_rows_to: int = 1,
    first_P=None, skip_level0_A: bool = False,
    paged_min_nnz: Optional[int] = None,
) -> AMGHierarchy:
    """Host-side SA-AMG setup for SPD (or semi-definite) sparse ``H``;
    returns NUMPY-leaf arrays (a persistable operator-cache artifact — see
    utils/treestore) to be shipped with :func:`hierarchy_to_device`.

    Prolongators are truncated to ``p_keep`` entries/row and coarse Galerkin
    operators filtered at ``drop_tol`` (both row-sum preserving) so every
    level stays narrow in ELL form — on TPU the V-cycle's cost is gathered
    elements, not flops.

    ``first_P``: optional explicit level-0 prolongator (CSR, n x nc) — used
    by the CR face solves to coarsen faces -> mesh vertices geometrically
    (the 1/3-averaging matrix), a ~10x first-step coarsening with
    mesh-aware interpolation that SA aggregation cannot discover.
    ``skip_level0_A``: store None for level 0's operator panel; the caller
    passes its own solve matvec to make_preconditioner_parts (saves a
    duplicate of the largest operator on disk/HBM/transfer).
    ``paged_min_nnz``: when set, store LEVEL OPERATORS at or above this nnz
    as paged-ELL (solve/pell.py, single-chip Pallas SpMV — ~5x the XLA
    gather rate at knot scale) instead of plain ELL, and renumber each
    coarse space by first fine member (utils/order.first_row_order) so the
    level-0 locality ordering the CALLER applied to ``H`` carries down the
    hierarchy — pass-count, and hence V-cycle cost, depends on it.
    Prolongators/restrictions are NEVER paged: a transfer operator's rows
    live in one space and its columns in another ~10x smaller/larger one,
    so its (tile, page) passes run a few percent occupied — the knot CR
    restriction paged to 9.8 GB for 13.5M nnz (measured: OOM'd the chip) —
    while the same locality orderings make its narrow ELL gather fast."""
    import scipy.sparse as sp

    np_dtype = np.dtype(dtype)

    def build_op(M, square: bool):
        M = M.tocsr()
        if (square and paged_min_nnz is not None
                and M.nnz >= paged_min_nnz and np_dtype == np.float32):
            return pell.build_paged(M, np_dtype)
        if (not square and paged_min_nnz is not None and pad == 1
                and M.nnz >= SLICED_MIN_NNZ and ell.sliced_waste(M) > 1.5):
            # width-skewed transfer operator on the single-chip path: the
            # restriction rows (one per aggregate / vertex) have long-tailed
            # widths — knot's level-0 P^T is mean 29 / max 195, an 89M-slot
            # single-width panel for 13.4M nnz.  SlicedEll packs it in
            # ~1.1x nnz slots (ell.SlicedEll docstring).
            return ell.build_sliced(M, np_dtype)
        return ell.build_ell(M, np_dtype, pad_rows_to=pad)

    A = H.tocsr().astype(np.float64)
    l0_nnz = int(A.nnz)
    levels = []
    sizes = [A.shape[0]]
    pad = pad_rows_to
    while A.shape[0] > max_coarse and len(levels) < max_levels:
        n = A.shape[0]
        d = np.asarray(A.diagonal())
        d = np.where(np.abs(d) > 0, d, 1.0)
        # per-level safe smoother damping (see AMGLevel.inv_diag); the same
        # rho drives the prolongator smoothing below
        rho = _rho_dinv_a(A, d)
        omega = 4.0 / (3.0 * rho)
        if len(levels) == 0 and first_P is not None:
            P = first_P.tocsr()
        else:
            agg = _aggregate(A, theta)
            nc = int(agg.max()) + 1
            if nc >= n or nc == 0:  # aggregation stalled (e.g. diagonal matrix)
                break
            kept = agg >= 0
            T = sp.csr_matrix(
                (np.ones(int(kept.sum())), (np.flatnonzero(kept), agg[kept])),
                shape=(n, nc),
            )
            P = (T - sp.diags(omega / d) @ (A @ T)).tocsr()
            P = _truncate_prolongator(P, p_keep)
        if paged_min_nnz is not None:
            # inherit the fine level's locality ordering (see docstring)
            perm_c = order.first_row_order(P)
            P = P[:, perm_c].tocsr()
        Ac = _filter_operator((P.T @ A @ P).tocsr(), drop_tol)
        Ac.sum_duplicates()

        A_panel = (None if (skip_level0_A and len(levels) == 0)
                   else build_op(A, square=True))
        lmax = CHEB_LMAX_SAFETY * rho
        lmin = rho / CHEB_LO_FRAC
        levels.append(AMGLevel(
            A_panel,
            (1.0 / d).astype(np_dtype),
            build_op(P, square=False),
            build_op(P.T, square=False),
            np.array([(lmax + lmin) / 2.0, (lmax - lmin) / 2.0], np_dtype),
        ))
        A = Ac
        sizes.append(A.shape[0])

    if A.shape[0] > 8 * max_coarse:
        # coarsening failed to reach dense-solve size (pathological inputs);
        # a diagonal coarse "solve" keeps the preconditioner SPD and cheap
        d = np.asarray(A.diagonal())
        d = np.where(np.abs(d) > 0, d, 1.0)
        coarse_inv = np.diag(1.0 / d).astype(np_dtype)
    else:
        # pseudo-inverse tolerates the singular Neumann-mode operators
        # (constant null space); computed in f64, applied in compute dtype
        coarse_inv = np.linalg.pinv(A.toarray(), rcond=1e-10).astype(np_dtype)
    return AMGHierarchy(tuple(levels), coarse_inv, tuple(sizes), l0_nnz)


def hierarchy_to_device(h: AMGHierarchy, mesh=None) -> AMGHierarchy:
    """Ship a host hierarchy's arrays in ONE batched transfer.  With a
    device mesh, every level's rows are sharded along the same axis as the
    level-0 operator (ell.device_put_tree's rule) — the V-cycle then runs
    as a chain of distributed SpMVs under GSPMD."""
    levels, coarse_inv = ell.device_put_tree((h.levels, h.coarse_inv), mesh)
    return AMGHierarchy(levels, coarse_inv, h.sizes, h.l0_nnz)


def build_hierarchy(
    H, dtype, theta: float = 0.08, max_coarse: int = 192, max_levels: int = 12,
    p_keep: int = 4, drop_tol: float = 0.02, mesh=None, first_P=None,
    skip_level0_A: bool = False,
) -> AMGHierarchy:
    """Host SA-AMG setup + device shipment (see build_hierarchy_host)."""
    h = build_hierarchy_host(
        H, dtype, theta=theta, max_coarse=max_coarse, max_levels=max_levels,
        p_keep=p_keep, drop_tol=drop_tol,
        pad_rows_to=mesh.size if mesh is not None else 1,
        first_P=first_P, skip_level0_A=skip_level0_A,
    )
    return hierarchy_to_device(h, mesh)


def make_preconditioner_parts(levels, coarse_inv, sizes,
                              degree: Optional[int] = None,
                              matvec0: Optional[Callable] = None):
    """V-cycle preconditioner M ~ H^{-1} with degree-``degree`` Chebyshev
    smoothing on the D^{-1} A interval baked into each level (AMGLevel.cheb)
    — identical pre (from zero) and post polynomials, standard practice
    inside CG (hypre/MueLu); measured 91 vs 221 PCG iterations against
    safe damped Jacobi on the knot CR operator (CHEB_DEGREE note).

    ``levels``/``coarse_inv`` are pytrees of device arrays (jit arguments);
    ``sizes`` must be a static tuple of ints (true per-level lengths — the
    ELL panels may carry sharding padding rows, sliced off by matvec).
    ``matvec0``: the level-0 operator application when the hierarchy was
    built with skip_level0_A (must be the SAME operator the hierarchy was
    built on, e.g. the masked solve matvec)."""

    if degree is None:
        import os

        # experiment knob: per-cycle level-0 cost is ~2*degree+1 SpMVs, so
        # the degree trades cycle cost against iteration count (measured
        # knot CR, CHEB_DEGREE note)
        degree = int(os.environ.get("SHM3D_CHEB_DEGREE", CHEB_DEGREE))

    def mv(level: int, lvl: AMGLevel, x):
        if lvl.A is None:
            assert level == 0 and matvec0 is not None, "missing level-0 matvec"
            return matvec0(x)
        return pell.apply(lvl.A, x, n_out=sizes[level])

    def cheb(level: int, lvl: AMGLevel, b, x0=None):
        """Chebyshev(degree) iteration on D^{-1} A x = D^{-1} b over the
        baked [lmin, lmax]; the from-zero form skips the first matvec."""
        theta, delta = lvl.cheb[0], lvl.cheb[1]
        sigma = theta / delta
        rho_c = 1.0 / sigma
        if x0 is None:
            d = (lvl.inv_diag * b) / theta
            x = d
        else:
            x = x0
            d = (lvl.inv_diag * (b - mv(level, lvl, x))) / theta
            x = x + d
        for _ in range(degree - 1):
            r = lvl.inv_diag * (b - mv(level, lvl, x))
            rho_new = 1.0 / (2.0 * sigma - rho_c)
            d = rho_new * rho_c * d + (2.0 * rho_new / delta) * r
            rho_c = rho_new
            x = x + d
        return x

    def cycle(level: int, b):
        if level == len(levels):
            return coarse_inv @ b
        lvl = levels[level]
        x = cheb(level, lvl, b)  # pre-smooth from zero
        r = b - mv(level, lvl, x)
        rc = pell.apply(lvl.PT, r, n_out=sizes[level + 1])
        xc = cycle(level + 1, rc)
        x = x + pell.apply(lvl.P, xc, n_out=sizes[level])
        return cheb(level, lvl, b, x0=x)

    return lambda b: cycle(0, b)


def make_preconditioner(h: AMGHierarchy, degree: Optional[int] = None,
                        matvec0: Optional[Callable] = None):
    return make_preconditioner_parts(h.levels, h.coarse_inv, h.sizes,
                                     degree, matvec0=matvec0)


def masked_operator(H, mask: np.ndarray):
    """Dirichlet elimination: diag(mask) H diag(mask) + diag(1 - mask) —
    the operator the ZeroSet chunks apply on device (identity rows on
    constrained unknowns)."""
    import scipy.sparse as sp

    Dm = sp.diags(mask.astype(np.float64))
    return (Dm @ H @ Dm + sp.diags(1.0 - mask.astype(np.float64))).tocsr()

