"""Null-space projection for trilinear pinning constraints.

The reference enforces its grid zero-set pinning through a KKT saddle system
[[L, A^T], [A, 0]] solved with a direct LU factorization
(/root/reference/src/signed_heat_grid_solver.cpp:100-108).  Iterating on that
indefinite saddle with a diagonal Schur estimate does not converge at scale
(20k MINRES iterations at 128^3).  The TPU-native replacement is the
*null-space method*: the unique constrained minimizer of
``min 1/2 u^T H u - b^T u  s.t.  A u = 0`` satisfies

    P H P u = P b,   u in ker(A),   P = I - A^T (A A^T)^{-1} A,

an SPD system on ker(A) solved with multigrid-preconditioned CG.  The key
structural fact making this cheap: ``A A^T`` (m x m Gram matrix of the
trilinear rows) is *local* — row i and row j overlap only when their grid
cells share corner nodes, so each row has at most 27 nonzeros.  The host
extracts that sparsity once into a padded (m, K) neighbor table (an
operator-cache artifact), and the inner Gram solve is Jacobi-PCG whose
matvec is a pure (m, K) gather/multiply/sum — it never touches the (N,)
node space.  Every operation is jittable and shardable.

The Gram matrix can be ill-conditioned (adjacent cells whose pinned points
nearly coincide give nearly-parallel rows; measured cond ~5e3 on a 16^3
icosphere), so the inner iteration budget is dtype-aware: float64 solves run
to near machine precision, float32 solves accept the f32 roundoff floor and
rely on the float64 defect correction (solvers/grid.py:_refine, which uses
the exact host factorization below) for final accuracy.

``A`` is represented throughout as (nodes8 (m, 8) int32, coeffs8 (m, 8)),
one trilinear row per pinned grid cell (domains/grid.py:constraint_rows,
matching signed_heat_grid_solver.cpp:84-100,433-464).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from . import krylov


def a_apply(u: jnp.ndarray, nodes8: jnp.ndarray, coeffs8: jnp.ndarray) -> jnp.ndarray:
    """A u: (N,) -> (m,) trilinear evaluation at the pinned points."""
    return jnp.sum(u[nodes8] * coeffs8, axis=1)


def at_apply(y: jnp.ndarray, nodes8: jnp.ndarray, coeffs8: jnp.ndarray, n: int) -> jnp.ndarray:
    """A^T y: (m,) -> (N,) scatter-add of the row stencils."""
    return jnp.zeros(n, dtype=y.dtype).at[nodes8.reshape(-1)].add(
        (coeffs8 * y[:, None]).reshape(-1)
    )


def build_at_table(nodes8: "np.ndarray", coeffs8_f64: "np.ndarray"):
    """Transposed constraint table for pair-accurate A^T application.

    The constraint rows are deduplicated source CELLS (one trilinear row per
    occupied cell, domains/grid.py), so any grid node appears in at most its
    8 surrounding cells' rows — the transpose is a natural width-<=8 ELL
    gather.  Returns (at_nodes (K,), at_rows (K, W), at_chi, at_clo
    (K, W)) with -0-coefficient padding; K = touched nodes."""
    import numpy as np

    m, w8 = nodes8.shape
    flat_nodes = np.asarray(nodes8, np.int64).reshape(-1)
    flat_rows = np.repeat(np.arange(m, dtype=np.int64), w8)
    flat_c = np.asarray(coeffs8_f64, np.float64).reshape(-1)
    order = np.argsort(flat_nodes, kind="stable")
    sn, sr, sc = flat_nodes[order], flat_rows[order], flat_c[order]
    at_nodes, starts = np.unique(sn, return_index=True)
    counts = np.diff(np.append(starts, sn.size))
    W = int(counts.max())
    K = at_nodes.size
    at_rows = np.zeros((K, W), np.int32)
    at_c = np.zeros((K, W), np.float64)
    pos = (np.arange(sn.size) - starts[np.searchsorted(at_nodes, sn)])
    at_rows[np.searchsorted(at_nodes, sn), pos] = sr.astype(np.int32)
    at_c[np.searchsorted(at_nodes, sn), pos] = sc
    c_hi = at_c.astype(np.float32)
    c_lo = (at_c - c_hi).astype(np.float32)
    return (at_nodes.astype(np.int32), at_rows, c_hi, c_lo)


def at_sub_pair(r_hi, r_lo, z1, z2, at_nodes, at_rows, at_chi, at_clo):
    """(r - A^T z) in pair precision, z delivered as the split (z1, z2).

    A plain f32 ``.at[].add`` scatter of A^T z rounds at ~1e-7 * ||z||
    absolute — with ||z|| set by the RAW (unprojected) residual's A^T-lambda
    component, that noise floors the measured projected residual near
    1e-9 * ||b|| regardless of the true defect.  Here every touched node's
    <=8 contributions are summed with compensated two-products against the
    pair-split coefficients (exact to ~2^-48) and merged into r with a
    single per-node pair update (no accumulation, so no scatter rounding)."""
    from . import twofloat as tf

    zg1 = z1[at_rows]
    zg2 = z2[at_rows]
    s, e = tf.two_prod(at_chi[:, 0], zg1[:, 0])
    e = e + (at_chi[:, 0] * zg2[:, 0] + at_clo[:, 0] * zg1[:, 0])
    for k in range(1, at_rows.shape[1]):
        p, pe = tf.two_prod(at_chi[:, k], zg1[:, k])
        s, se = tf.two_sum(s, p)
        e = e + (se + pe + at_chi[:, k] * zg2[:, k] + at_clo[:, k] * zg1[:, k])
    v = tf.fast_two_sum(s, e)
    sub = tf.add((r_hi[at_nodes], r_lo[at_nodes]), tf.neg(v))
    return (r_hi.at[at_nodes].set(sub[0]), r_lo.at[at_nodes].set(sub[1]))


def a_apply_pair(u_hi, u_lo, nodes8, c_hi, c_lo):
    """Pair-accurate A u for a pair field against PAIR-SPLIT coefficients
    (c_hi + c_lo == the exact f64 trilinear weights).

    Needed wherever u lies near ker(A): each 8-term row sum then cancels to
    ~1e-5..1e-10 of its operands, and a plain-f32 evaluation (or exact
    evaluation against f32-rounded coefficients) reports A u with an
    absolute ~1e-7 * |u| error — which, fed into the Gram solve, re-injects
    that noise into the projected iterate.  Compensated two-product row
    sums against the split coefficients keep the evaluation faithful to the
    host f64 Gram operator to ~2^-48.  Returns an (m,) (hi, lo) pair."""
    from . import twofloat as tf

    g_hi = u_hi[nodes8]
    g_lo = u_lo[nodes8]
    s, e = tf.two_prod(g_hi[:, 0], c_hi[:, 0])
    e = e + (g_hi[:, 0] * c_lo[:, 0] + g_lo[:, 0] * c_hi[:, 0])
    for k in range(1, nodes8.shape[1]):
        p, pe = tf.two_prod(g_hi[:, k], c_hi[:, k])
        s, se = tf.two_sum(s, p)
        e = e + (se + pe + g_hi[:, k] * c_lo[:, k] + g_lo[:, k] * c_hi[:, k])
    return tf.fast_two_sum(s, e)


class GramTable(NamedTuple):
    """Gram-matrix artifacts of A A^T (host-extracted cache artifact).

    The Gram matrix can be *extremely* ill-conditioned (cond ~1e7 measured
    for 52k points in 4.1k cells at 128^3: points straddling a cell face
    give nearly identical rows; the smallest third of the spectrum is a
    continuum, not a few outliers).  That kills Krylov iterations on it AND
    any f32-factored application of its inverse: noise along an
    eigendirection with tiny eigenvalue lam is amplified by eps/sqrt(lam)
    (~4e-4 in f32).  Two application modes, chosen by size at build time:

    - ``bmat`` set (m <= ORTHO_GRAM_CAP — small problems and the strict
      oracle-parity regime): the constraint rows are re-orthonormalized ON
      HOST in float64 (dense eigh of the scaled Gram; P depends only on the
      ROW SPACE of A, so any basis change is exact).
      B = Lam^{-1/2} Q^T D^{-1/2} A satisfies B B^T = I exactly, making B a
      partial isometry: every row has unit norm and entries <= 1, so
      P = I - B^T B applies in PURE float32 with error ~eps*sqrt(nt) and NO
      cond(G) amplification (measured 3.4e-8 vs the exact f64 projection on
      the cond-1e7 case above).  B is stored dense on the nt <= 8m touched
      nodes; application is two MXU matvecs.  Costs O(m^3) host time and
      O(m * nt) device bytes — both prohibitive past a few thousand rows
      (the B transfer alone is ~0.5 GB at m=4k over the TPU tunnel).
    - ``tmat`` set (m > ORTHO_GRAM_CAP, rows SUBSAMPLED to spatial
      separation — the default at-scale path): compact whitening factor
      T = L^{-1} D^{-1/2} (see ``build_tform_arrays``); the device solve
      pins a well-conditioned spatial subset of the rows entirely on
      device, and the f64 defect correction (which projects with the FULL
      row set through ``host_gram_factor``) restores exact parity.
    - neither set (m > ORTHO_GRAM_CAP with subsampling disabled,
      ``options.max_device_pins=None``): the solver runs its Krylov loop at
      the Python level and applies the EXACT f64 host projection (sparse
      splu of the Gram, ``host_gram_factor``) every iteration, shipping
      only the (m,) constraint-space vectors across the host<->device
      boundary (~50 KB each way; the A / A^T applications stay on device).  This replaced two failed device-side designs:
      a dense f64-factored inverse applied in f32 (eps*sqrt(cond) noise
      floor — diverged outright at 256^3, rel-res 29), and a deflated-
      isometry + fixed-degree Chebyshev iteration (exact in f64 CPU tests
      but latency-bound on real TPU: ~0.8 ms per m-space polynomial step
      made a 128^3 solve 77 s, and the degree-725 f32 recurrence stalled
      CG at rel-res 1e-2).  jax.pure_callback would fuse the host solve
      into the jitted loop, but the axon PJRT plugin does not implement
      host callbacks.
    """

    idx: jnp.ndarray            # (m, K) int32 column indices, padded with 0
    val: jnp.ndarray            # (m, K) values, padded with 0.0
    diag: jnp.ndarray           # (m,) diagonal
    inv: Optional[jnp.ndarray] = None      # retired dense-inverse tier (unused)
    dinv: Optional[jnp.ndarray] = None     # (m,) diag^{-1/2} Jacobi scaling
    bmat: Optional[jnp.ndarray] = None     # (r, nt) orthonormalized rows
    touched: Optional[jnp.ndarray] = None  # (nt,) int32 touched node ids
    tmat: Optional[jnp.ndarray] = None     # (r, m) whitening factor (T-form)


# Largest m for which the rows are re-orthonormalized on host (dense f64
# eigh is O(m^3): ~10 s at m=4k, ~80 s at m=8k).  Past this the solver
# switches to per-iteration exact host projection (see GramTable).
ORTHO_GRAM_CAP = 8192

# Largest m for the FULL-row shifted-Cholesky whitening tier (r5): the
# (m, m) f32 factor is built ON DEVICE (XLA blocked Cholesky + triangular
# solve ride the MXU: sub-second at m=12.6k, where this single-core host
# needs ~200 s of LAPACK) and costs m^2 * 4 B of HBM — 2.4 GB at the cap.
# Past it the subsampled-pin tier (+ host-projected refinement) takes over.
TFORM_FULL_CAP = 24576

# Tikhonov shift of the scaled Gram for the full-row factor.  The full row
# set's spectrum has a near-null continuum (measured 256^3/SprayBottle:
# lam in [3.2e-6, 6.0], cond 1.9e6 — nearly-coincident source points give
# nearly-parallel rows).  The shift keeps the f32 Cholesky away from
# breakdown and caps ||T|| at eps^-1/2, at the price of DAMPING constraint
# modes with lam < eps instead of enforcing them.  Larger shifts are NOT
# safer: phi accuracy tracks the damped-mode mass (measured on the real
# 256^3 Gram, random-vector violation after the projector's one
# Gram-refinement step: eps=1e-4 -> 1.8e-4, 1e-5 -> 1.8e-5, 3e-6 ->
# 4.3e-6; f32 spotrf succeeded with identical quality to the f64 build at
# every one of these).  3e-6 sits at the measured lam_min, so effectively
# nothing physical is damped; gram_from_arrays escalates eps x10 (up to
# 4 times) if a smaller spectrum ever breaks the f32 factorization (NaNs).
TFORM_FULL_EPS = 3e-6


def gram_apply(y: jnp.ndarray, gram: GramTable) -> jnp.ndarray:
    """(A A^T) y as an O(m K) gather — never touches the (N,) node space."""
    return jnp.sum(gram.val * y[gram.idx], axis=1)


def build_gram_arrays(
    nodes8: np.ndarray, coeffs8: np.ndarray, n: int, dtype,
    ortho_cap: Optional[int] = None,
) -> dict:
    """Host-side extraction of the sparse Gram matrix into a padded neighbor
    table (K = max nonzeros per row, <= 27: the 26 cell neighbors + self),
    plus — below the ortho cap — the orthonormalized row factor (see
    GramTable docstring).  Returns plain numpy arrays (the serializable
    operator-cache artifact; shm3d.utils.diskcache)."""
    import scipy.sparse as sp

    if ortho_cap is None:
        ortho_cap = ORTHO_GRAM_CAP  # resolved at call time (patchable in tests)
    m = nodes8.shape[0]
    rows = np.repeat(np.arange(m), 8)
    A = sp.coo_matrix(
        (coeffs8.reshape(-1), (rows, nodes8.reshape(-1))), shape=(m, n)
    ).tocsr()
    G = (A @ A.T).tocsr()
    G.sum_duplicates()
    nnz = np.diff(G.indptr)
    K = int(nnz.max())
    idx = np.zeros((m, K), dtype=np.int32)
    val = np.zeros((m, K), dtype=np.float64)
    r = np.repeat(np.arange(m), nnz)
    c = np.arange(G.nnz) - np.repeat(G.indptr[:-1], nnz)
    idx[r, c] = G.indices
    val[r, c] = G.data

    d = G.diagonal()
    out = {"idx": idx, "val": val, "diag": d}
    if m <= ortho_cap:
        # exact f64 re-orthonormalization of the row space (P is basis-
        # independent); exact-duplicate rows show up as eigenvalues at the
        # f64 noise floor and are dropped — an exact rank reduction
        dscale = 1.0 / np.sqrt(d)
        touched = np.unique(nodes8)
        remap = np.zeros(n, dtype=np.int64)
        remap[touched] = np.arange(touched.size)
        Asub = sp.coo_matrix(
            (coeffs8.reshape(-1), (rows, remap[nodes8.reshape(-1)])),
            shape=(m, touched.size),
        ).tocsr()
        Gs = (sp.diags(dscale) @ G @ sp.diags(dscale)).toarray()
        lam, Q = np.linalg.eigh(Gs)
        keep = lam > 1e-10 * lam[-1]
        T = (Q[:, keep] / np.sqrt(lam[keep])).T * dscale[None, :]
        # sparse @ dense: O(nnz(A) * r), vs O(m^2 nt) for a dense product
        B = np.ascontiguousarray((Asub.T @ T.T).T)
        # stored in the compute dtype (dtype is part of the cache key)
        out["bmat"] = B.astype(jnp.dtype(dtype).type)
        out["touched"] = touched.astype(np.int32)
    return out


def build_tform_arrays(nodes8: np.ndarray, coeffs8: np.ndarray, n: int) -> dict:
    """Compact whitening factor for WELL-SEPARATED pinning rows (the
    subsampled at-scale tier; see ``subsample_pin_rows``).

    With G = A A^T, D = diag(G) and the f64 Cholesky D^{-1/2} G D^{-1/2}
    = L L^T, the factor T = L^{-1} D^{-1/2} makes W = T A a partial isometry
    (W W^T = I exactly), so P = I - A^T T^T T A.  Unlike ``bmat`` (which
    materializes W on the touched nodes, O(m * nt) bytes), T is (m, m) —
    65 MB at m = 4k — and W is applied in factored form W v = T (A v).  The
    factored application amplifies the f32 rounding of (A v) by ||T||_2,
    which is why this tier REQUIRES subsampled (spatially separated) rows:
    ||T|| = (min eig of the scaled Gram)^{-1/2} ~ 17 measured at
    256^3/SprayBottle (projection error ~1e-6 in f32), versus ~4e3 for the
    full near-parallel row set (the failed round-1 dense-inverse tier).
    Falls back to a truncated eigendecomposition if the Cholesky fails.
    """
    import scipy.linalg as sla
    import scipy.sparse as sp

    m = nodes8.shape[0]
    rows = np.repeat(np.arange(m), 8)
    A = sp.coo_matrix(
        (coeffs8.reshape(-1), (rows, nodes8.reshape(-1))), shape=(m, n)
    ).tocsr()
    G = (A @ A.T).tocsr()
    G.sum_duplicates()
    nnz = np.diff(G.indptr)
    K = int(nnz.max())
    idx = np.zeros((m, K), dtype=np.int32)
    val = np.zeros((m, K), dtype=np.float64)
    r = np.repeat(np.arange(m), nnz)
    c = np.arange(G.nnz) - np.repeat(G.indptr[:-1], nnz)
    idx[r, c] = G.indices
    val[r, c] = G.data

    d = G.diagonal()
    dscale = 1.0 / np.sqrt(d)
    Gs = (sp.diags(dscale) @ G @ sp.diags(dscale)).toarray()
    try:
        L = sla.cholesky(Gs, lower=True)
        T = sla.solve_triangular(L, np.eye(m), lower=True) * dscale[None, :]
    except np.linalg.LinAlgError:
        lam, Q = np.linalg.eigh(Gs)
        keep = lam > 1e-10 * lam[-1]
        T = (Q[:, keep] / np.sqrt(lam[keep])).T * dscale[None, :]
    return {"idx": idx, "val": val, "diag": d, "tmat": T}


def build_tform_full_arrays(nodes8: np.ndarray, coeffs8: np.ndarray,
                            n: int) -> dict:
    """FULL-row whitening tier (ORTHO_GRAM_CAP < m <= TFORM_FULL_CAP):
    host side only extracts the sparse Gram table; the dense factor is
    built on device at load time (``gram_from_arrays`` -> ``_device_tform``)
    so the persisted artifact stays a few MB instead of m^2 * 4 B."""
    arr = build_gram_arrays(nodes8, coeffs8, n, np.float32,
                            ortho_cap=0)  # sparse table only, no bmat
    arr["tform_eps"] = np.float64(TFORM_FULL_EPS)
    return arr


def _device_tform(idx: np.ndarray, val: np.ndarray, diag: np.ndarray,
                  eps: float, dtype):
    """T = chol(D^{-1/2} G D^{-1/2} + eps I)^{-1} D^{-1/2}, built on device.

    XLA's blocked Cholesky + triangular solve run on the MXU: ~1 s at
    m = 12.6k vs ~200 s of single-core host LAPACK (measured).  The scaled
    Gram is densified from the padded neighbor table with one scatter-add
    (padded slots carry exact zeros)."""
    import jax

    @functools.partial(jax.jit, static_argnames=())
    def build(idx, val, diag):
        m = idx.shape[0]
        dscale = jax.lax.rsqrt(jnp.maximum(diag, jnp.finfo(dtype).tiny))
        rows = jnp.arange(m, dtype=jnp.int32)[:, None]
        v = val * dscale[:, None] * dscale[idx]
        Gs = jnp.zeros((m, m), dtype).at[rows, idx].add(v)
        Gs = Gs + jnp.asarray(eps, dtype) * jnp.eye(m, dtype=dtype)
        L = jnp.linalg.cholesky(Gs)
        # T = L^-1 D^{-1/2}, solved in COLUMN BLOCKS: one triangular_solve
        # against the full (m, m) RHS makes XLA keep O(m/blk) half-GB
        # dynamic-update-slice temps live simultaneously (measured
        # RESOURCE_EXHAUSTED at m = 12.6k on the 16 GB chip); 2048-column
        # blocks bound the transient set while the MXU stays busy.
        CH = 2048
        nb = -(-m // CH)
        ar = jnp.arange(m, dtype=jnp.int32)

        def solve_block(j0):
            rhs = jnp.where(ar[:, None] == (j0 + jnp.arange(CH))[None, :],
                            dscale[:, None], jnp.zeros((), dtype))
            return jax.scipy.linalg.solve_triangular(L, rhs, lower=True)

        blocks = jax.lax.map(solve_block,
                             jnp.arange(nb, dtype=jnp.int32) * CH)
        T = jnp.moveaxis(blocks, 0, 1).reshape(m, nb * CH)[:, :m]
        if polish:
            # one Newton step on the factor: T <- T - L^-1 (L T - D^-1/2)
            # with L^-1 = T D^1/2.  Two MXU GEMMs (~0.1 s at m=12.6k)
            # knock the f32 chol/trsm rounding out of the whitening, so the
            # CG projector noise floor is set by the GEMV rounding alone.
            R = L @ T - dscale[None, :] * jnp.eye(m, dtype=dtype)
            T = T - T @ ((1.0 / dscale)[:, None] * R)
        return T

    import os

    # Newton polish measured HARMFUL at m=12.6k/256^3: the f32 GEMM pair
    # injects ~eps*sqrt(m)*||T|| noise exceeding the trsm error it removes
    # (CG: 108 -> 267 iters, rel_res stall 1e-4).  Kept behind an env flag
    # for future spectra where the tradeoff might flip.
    polish = os.environ.get("SHM3D_TFORM_POLISH", "0") == "1"
    return build(jnp.asarray(idx), jnp.asarray(val, dtype),
                 jnp.asarray(diag, dtype))


def gram_from_arrays(arr: dict, dtype) -> GramTable:
    """Device GramTable from (possibly disk-loaded) host arrays."""
    bmat = arr.get("bmat")
    touched = arr.get("touched")
    tmat = arr.get("tmat")
    if tmat is None and arr.get("tform_eps") is not None:
        eps = float(arr["tform_eps"])
        for _ in range(4):
            tmat = _device_tform(arr["idx"], arr["val"], arr["diag"],
                                 eps, dtype)
            if bool(jnp.isfinite(tmat).all()):
                break
            eps *= 10.0  # f32 Cholesky breakdown -> NaN factor: re-shift
        else:
            # even eps*1e3 failed: surrender the device tier — a None tmat
            # makes _solve_pinned fall back to the exact host-projected
            # loop (slow but always correct) instead of propagating NaNs
            import warnings

            warnings.warn("shm3d: full-row whitening factorization failed "
                          "at all shifts; falling back to host-projected "
                          "solves for this discretization")
            tmat = None
    return GramTable(
        jnp.asarray(arr["idx"]),
        jnp.asarray(arr["val"], dtype),
        jnp.asarray(arr["diag"], dtype),
        None,
        None,
        None if bmat is None else jnp.asarray(bmat, dtype),
        None if touched is None else jnp.asarray(touched, jnp.int32),
        None if tmat is None else jnp.asarray(tmat, dtype),
    )


def build_gram_table(
    nodes8: np.ndarray, coeffs8: np.ndarray, n: int, dtype,
    ortho_cap: Optional[int] = None,
) -> GramTable:
    return gram_from_arrays(
        build_gram_arrays(nodes8, coeffs8, n, dtype, ortho_cap=ortho_cap), dtype
    )


def make_projector(nodes8, coeffs8, gram: GramTable, n: int):
    """P v = v - A^T (A A^T)^{-1} A v via a host-whitened partial isometry —
    stable in f32, MXU matvecs.  Two modes:

    - ``bmat``: W materialized on the touched nodes (m <= ORTHO_GRAM_CAP,
      arbitrary conditioning — the strict oracle-parity regime).
    - ``tmat``: W = T A applied in factored form (the subsampled at-scale
      tier; requires well-separated rows, see build_tform_arrays).

    When neither artifact exists the caller must run the host-projected
    Python-level loop instead (solvers/grid.py)."""
    if gram.tmat is not None:

        def project_t(v):
            a = a_apply(v, nodes8, coeffs8)
            z = gram.tmat.T @ (gram.tmat @ a)
            # one Gram-refinement step: with the shifted full-row factor
            # (tform_eps) this squares the eps-tail damping error and mops
            # up f32 factor rounding; with the exact subsampled factor it
            # is a cheap near-no-op.  Costs one sparse gram_apply + two
            # extra MXU matvecs per projection — and EARNS it: dropping it
            # (single-apply) was measured at 256^3/SprayBottle with the
            # pin-aware MG to cost 17 -> 43 CG iterations, 0.81 -> 1.04 s
            # warm, and rel-L2 1.4e-6 -> 7.9e-6 (r5).
            r = a - gram_apply(z, gram)
            z = z + gram.tmat.T @ (gram.tmat @ r)
            return v - at_apply(z, nodes8, coeffs8, n)

        return project_t

    def project(v):
        vs = v[gram.touched]
        w = gram.bmat @ vs
        return v.at[gram.touched].add(-(gram.bmat.T @ w))

    return project


# ---------------------------------------------------------------------------
# host (SciPy) mirror — exact projection for f64 defect correction


def host_gram_factor(nodes8: np.ndarray, coeffs8: np.ndarray, n: int):
    """splu factorization of the sparse Gram matrix A A^T (host, cached as an
    operator-cache artifact; the direct-solve role the reference gives to
    geometry-central's LU, confined here to the tiny m x m system)."""
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    m = nodes8.shape[0]
    rows = np.repeat(np.arange(m), 8)
    A = sp.coo_matrix(
        (coeffs8.reshape(-1), (rows, nodes8.reshape(-1))), shape=(m, n)
    ).tocsr()
    gram = (A @ A.T).tocsc()
    # tiny shift: exact-duplicate rows make the Gram exactly singular
    gram = gram + 1e-14 * sp.eye(m, format="csc")
    return A, spla.splu(gram)


def host_project(v: np.ndarray, A, gram_lu) -> np.ndarray:
    """Exact f64 P v using the cached host factorization."""
    return v - A.T @ gram_lu.solve(A @ v)
