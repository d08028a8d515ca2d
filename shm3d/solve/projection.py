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

from typing import NamedTuple

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


class GramTable(NamedTuple):
    """Padded CSR neighbor table of A A^T (host-built cache artifact)."""

    idx: jnp.ndarray   # (m, K) int32 column indices, padded with 0
    val: jnp.ndarray   # (m, K) values, padded with 0.0
    diag: jnp.ndarray  # (m,) diagonal


def gram_apply(y: jnp.ndarray, gram: GramTable) -> jnp.ndarray:
    """(A A^T) y as an O(m K) gather — never touches the (N,) node space."""
    return jnp.sum(gram.val * y[gram.idx], axis=1)


def build_gram_table(nodes8: np.ndarray, coeffs8: np.ndarray, n: int, dtype) -> GramTable:
    """Host-side extraction of the sparse Gram matrix into a padded neighbor
    table.  K = max nonzeros per row (<= 27: the 26 cell neighbors + self)."""
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
    return GramTable(
        jnp.asarray(idx), jnp.asarray(val, dtype), jnp.asarray(G.diagonal(), dtype)
    )


def inner_gram_budget(dtype) -> tuple:
    """(tol, maxiter) for the inner Gram solve.  float64 runs near machine
    precision (floor ~ eps * cond); float32 accepts its roundoff floor and
    defers final accuracy to the f64 defect correction."""
    if jnp.dtype(dtype) == jnp.float32:
        return 1e-5, 200
    return 2e-12, 1500


def make_projector(nodes8, coeffs8, gram: GramTable, n: int):
    """P v = v - A^T (A A^T)^{-1} A v with Jacobi-PCG on the Gram table.

    The Gram solve is consistent by construction (rhs = A v is in the range),
    so CG converges even for (near-)duplicate rows."""
    tol, maxiter = inner_gram_budget(gram.val.dtype)

    def project(v):
        av = a_apply(v, nodes8, coeffs8)
        res = krylov.cg(
            lambda y: gram_apply(y, gram),
            av,
            precond=lambda r: r / gram.diag,
            tol=tol,
            maxiter=maxiter,
        )
        return v - at_apply(res.x, nodes8, coeffs8, n)

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
    return A, spla.splu(gram)


def host_project(v: np.ndarray, A, gram_lu) -> np.ndarray:
    """Exact f64 P v using the cached host factorization."""
    return v - A.T @ gram_lu.solve(A @ v)
