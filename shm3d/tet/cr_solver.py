"""Crouzeix-Raviart face path for conforming tet meshes.

The reference's *default* Step-3 path for triangle meshes whose tet mesh
conforms to the surface (``useCrouzeixRaviart=true``,
/root/reference/src/signed_heat_tet_solver.cpp:234-317): FEM on per-face
(nonconforming CR) elements, with the level-set constraints applied to the
tet faces lying on the source surface, then an L2 projection onto vertices
and a final sign flip (the reference returns ``-phi``, :316).

The mesher's conforming recovery (shm3d.tet.conforming) makes this the
active default for triangle meshes: the recovered surface is a union of tet
faces (input faces possibly subdivided into coplanar sub-faces), and the
constraints/mean shift act on those sub-faces — the same geometric surface
the reference pins.  Externally-supplied conforming meshes are detected via
``find_surface_faces``.

All solves are matrix-free segment-sum matvecs + (chunked) CG/MINRES like
the vertex path.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import LevelSetConstraint, SignedHeatOptions
from ..solve import krylov
from . import fem
from .mesher import TetMesh
from .solver import _run_chunked


def find_surface_faces(mesh: TetMesh, src_faces: np.ndarray) -> Optional[np.ndarray]:
    """Global tet-face ids matching the source triangles (sorted-triple
    lookup; the reference matches orientation too, :983-1011 — the sign is
    only needed to orient constraint normals, which the CR solves below do
    not use).  Returns None if any source face is missing (non-conforming).
    """
    NV = mesh.n_vertices
    assert NV < (1 << 21)

    def pack(tris):
        t = np.sort(np.asarray(tris, dtype=np.int64), axis=1)
        return (t[:, 0] << 42) | (t[:, 1] << 21) | t[:, 2]

    face_keys = pack(mesh.faces)
    order = np.argsort(face_keys)
    skeys = face_keys[order]
    want = pack(src_faces)
    pos = np.searchsorted(skeys, want)
    ok = (pos < skeys.shape[0]) & (skeys[np.minimum(pos, skeys.shape[0] - 1)] == want)
    if not ok.all():
        return None
    return order[pos]


@functools.partial(jax.jit, static_argnames=("nf",))
def _cr_divergence(Y, div_faces, div_tets, div_nvec, nf: int):
    """Integrated divergence onto faces: div[f] += n_f(outward) . Y_tet
    (faceDivergence, signed_heat_tet_solver.cpp:609-621)."""
    return jax.ops.segment_sum(
        jnp.einsum("ij,ij->i", div_nvec, Y[div_tets]), div_faces, num_segments=nf
    )


@jax.jit
def _coo_matvec(x, rows, cols, vals):
    return jax.ops.segment_sum(
        vals * x[cols], rows, num_segments=x.shape[0], indices_are_sorted=True
    )


@functools.partial(jax.jit, static_argnames=("tol", "chunk"))
def _cr_zeroset_chunk(div, x0, rows, cols, vals, diag, surf_mask, tol: float, chunk: int):
    """Dirichlet on the surface faces: phi = 0 there, H_II phi_I = -div_I,
    H = -L_CR."""
    def matvec(x):
        return surf_mask * -_coo_matvec(surf_mask * x, rows, cols, vals)

    precond = lambda r: r / diag
    b = surf_mask * -div
    rhs_mnorm = jnp.sqrt(jnp.abs(jnp.vdot(b, precond(b))))
    res = krylov.cg(matvec, b, x0=x0, precond=precond, tol=tol, maxiter=chunk,
                    rhs_mnorm=rhs_mnorm)
    return res.x * surf_mask, res.iterations, res.residual


@functools.partial(jax.jit, static_argnames=("tol", "chunk"))
def _cr_none_chunk(div, x0, rows, cols, vals, diag, tol: float, chunk: int):
    b = -div
    b = b - jnp.mean(b)

    def matvec(x):
        y = -_coo_matvec(x, rows, cols, vals)
        return y - jnp.mean(y)

    precond = lambda r: r / diag
    rhs_mnorm = jnp.sqrt(jnp.abs(jnp.vdot(b, precond(b))))
    res = krylov.cg(matvec, b, x0=x0, precond=precond, tol=tol, maxiter=chunk,
                    rhs_mnorm=rhs_mnorm)
    return res.x, res.iterations, res.residual


@functools.partial(jax.jit, static_argnames=("nf", "tol", "chunk"))
def _cr_multiple_chunk(div, x0, rows, cols, vals, diag, comp_root, comp_member,
                       nf: int, tol: float, chunk: int):
    """KKT with face equality-to-root rows (reference :256-295)."""
    m = comp_root.shape[0]

    def matvec(x):
        u, mu = x[:nf], x[nf:]
        Hu = -_coo_matvec(u, rows, cols, vals)
        At_mu = (
            jnp.zeros(nf, dtype=x.dtype).at[comp_root].add(mu).at[comp_member].add(-mu)
        )
        Au = u[comp_root] - u[comp_member]
        return jnp.concatenate([Hu + At_mu, Au])

    rhs = jnp.concatenate([-div, jnp.zeros(m, dtype=div.dtype)])
    diag_S = 1.0 / diag[comp_root] + 1.0 / diag[comp_member]

    def precond(r):
        return jnp.concatenate([r[:nf] / diag, r[nf:] / diag_S])

    rhs_mnorm = jnp.sqrt(jnp.abs(jnp.vdot(rhs, precond(rhs))))
    res = krylov.minres(matvec, rhs, x0=x0, precond=precond, tol=tol, maxiter=chunk,
                        rhs_mnorm=rhs_mnorm)
    return res.x, res.iterations, res.residual


@functools.partial(jax.jit, static_argnames=("nv", "tol", "chunk"))
def _project_chunk(bvec, x0, p_rows, p_cols, p_vals, p_diag, nv: int, tol: float, chunk: int):
    """(A^T M A) w = b, SPD (projectOntoVertices, :790-810)."""
    def matvec(x):
        return _coo_matvec(x, p_rows, p_cols, p_vals)

    precond = lambda r: r / p_diag
    rhs_mnorm = jnp.sqrt(jnp.abs(jnp.vdot(bvec, precond(bvec))))
    res = krylov.cg(matvec, bvec, x0=x0, precond=precond, tol=tol, maxiter=chunk,
                    rhs_mnorm=rhs_mnorm)
    return res.x, res.iterations, res.residual


def face_component_rows(surface_faces: np.ndarray, components) -> Tuple[np.ndarray, np.ndarray]:
    """MULTIPLE-mode equality rows over surface faces: the first face of
    each component is its root; every later face gets a (root, member) row
    (reference per-component DFS emission, signed_heat_tet_solver.cpp:256-285).
    Shared by the device path and the SciPy oracle so both solve the same
    KKT system."""
    comp = np.asarray(components)
    surface_faces = np.asarray(surface_faces, dtype=np.int64)
    roots, members = [], []
    seen = {}
    for local_idx, c in enumerate(comp):
        g = int(surface_faces[local_idx])
        c = int(c)
        if c not in seen:
            seen[c] = g
            continue
        roots.append(seen[c])
        members.append(g)
    return np.asarray(roots, np.int64), np.asarray(members, np.int64)


class CRPath:
    """Prepared CR operators for one conforming (mesh, surface) pair."""

    def __init__(self, mesh: TetMesh, surface_faces: np.ndarray, dtype=jnp.float64):
        import scipy.sparse as sp

        self.mesh = mesh
        self.nf = mesh.n_faces
        self.surface_faces = np.asarray(surface_faces, dtype=np.int64)
        cr = fem.build_cr_operators(mesh)
        self.cr = cr
        L = cr.L_scipy()
        diag = np.asarray(-L.diagonal())
        diag = np.where(diag > 0, diag, 1.0)

        A = cr.A_scipy()
        M = cr.M_scipy()
        P = (A.T @ M @ A).tocoo()
        # sort projection entries by row for sorted segment_sum
        order = np.lexsort((P.col, P.row))
        p_rows, p_cols, p_vals = P.row[order], P.col[order], P.data[order]
        p_diag = np.asarray(P.diagonal())
        p_diag = np.where(np.abs(p_diag) > 0, p_diag, 1.0)

        self.arrays = dict(
            rows=jnp.asarray(cr.L_rows, jnp.int32),
            cols=jnp.asarray(cr.L_cols, jnp.int32),
            vals=jnp.asarray(cr.L_vals, dtype),
            diag=jnp.asarray(diag, dtype),
            p_rows=jnp.asarray(p_rows, jnp.int32),
            p_cols=jnp.asarray(p_cols, jnp.int32),
            p_vals=jnp.asarray(p_vals, dtype),
            p_diag=jnp.asarray(p_diag, dtype),
        )
        order_d = np.argsort(cr.div_faces, kind="stable")
        self.arrays["divf"] = jnp.asarray(cr.div_faces[order_d], jnp.int32)
        self.arrays["divt"] = jnp.asarray(cr.div_tets[order_d], jnp.int32)
        self.arrays["divn"] = jnp.asarray(cr.div_nvec[order_d], dtype)
        # surface mask (0 on constrained faces)
        mask = np.ones(self.nf)
        mask[self.surface_faces] = 0.0
        self.arrays["surf_mask"] = jnp.asarray(mask, dtype)
        # M A phi_face -> vertices uses A^T M: precompute (A^T M) as COO
        AtM = (A.T @ M).tocoo()
        order2 = np.lexsort((AtM.col, AtM.row))
        self.arrays["am_rows"] = jnp.asarray(AtM.row[order2], jnp.int32)
        self.arrays["am_cols"] = jnp.asarray(AtM.col[order2], jnp.int32)
        self.arrays["am_vals"] = jnp.asarray(AtM.data[order2], dtype)
        self.dtype = dtype
        self.last_stats = {}

    def integrate(self, Y, options: SignedHeatOptions, src_face_components=None,
                  src_face_areas=None) -> jnp.ndarray:
        """Full CR Step 3: returns -phi_vertices (reference sign, :316)."""
        a = self.arrays
        nf = self.nf
        nv = self.mesh.n_vertices
        tol, maxiter = options.resolved_solver_tol(), options.solver_maxiter
        div = _cr_divergence(Y, a["divf"], a["divt"], a["divn"], nf)

        mode = options.level_set_constraint
        if mode == LevelSetConstraint.ZERO_SET:
            fn = lambda x0, c: _cr_zeroset_chunk(
                div, x0, a["rows"], a["cols"], a["vals"], a["diag"], a["surf_mask"],
                tol=tol, chunk=c)
            phi_f, it1, r1 = _run_chunked(fn, jnp.zeros(nf, self.dtype), tol, maxiter)
        elif mode == LevelSetConstraint.MULTIPLE:
            roots, members = face_component_rows(self.surface_faces, src_face_components)
            comp_root = jnp.asarray(roots, jnp.int32)
            comp_member = jnp.asarray(members, jnp.int32)
            m = comp_root.shape[0]
            fn = lambda x0, c: _cr_multiple_chunk(
                div, x0, a["rows"], a["cols"], a["vals"], a["diag"],
                comp_root, comp_member, nf=nf, tol=tol, chunk=c)
            x, it1, r1 = _run_chunked(fn, jnp.zeros(nf + m, self.dtype), tol, maxiter)
            phi_f = x[:nf]
            phi_f = phi_f - self._face_shift(phi_f, src_face_areas)
        else:
            fn = lambda x0, c: _cr_none_chunk(
                div, x0, a["rows"], a["cols"], a["vals"], a["diag"], tol=tol, chunk=c)
            phi_f, it1, r1 = _run_chunked(fn, jnp.zeros(nf, self.dtype), tol, maxiter)
            phi_f = phi_f - self._face_shift(phi_f, src_face_areas)

        # L2 projection to vertices: (A^T M A) w = A^T M phi_f
        b = jax.ops.segment_sum(
            a["am_vals"] * phi_f[a["am_cols"]], a["am_rows"],
            num_segments=nv, indices_are_sorted=True,
        )
        fnp = lambda x0, c: _project_chunk(
            b, x0, a["p_rows"], a["p_cols"], a["p_vals"], a["p_diag"],
            nv=nv, tol=tol, chunk=c)
        w, it2, r2 = _run_chunked(fnp, jnp.zeros(nv, self.dtype), tol, maxiter)
        self.last_stats = {"iters": int(it1), "residual": float(r1),
                           "proj_iters": int(it2), "proj_residual": float(r2)}
        # The reference returns -phi here (:316) to compensate its internal
        # divergence sign convention; our faceDivergence is built from
        # outward-positive signed normals (mesher tet_face_sign), which
        # already yields the vertex-path sign (inside negative) directly.
        return w

    def _face_shift(self, phi_f, src_face_areas):
        """Area-weighted mean of phi over the surface faces
        (averageFaceDataOnSource, :558-573)."""
        areas = jnp.asarray(src_face_areas, self.dtype)
        vals = phi_f[jnp.asarray(self.surface_faces, jnp.int32)]
        return jnp.sum(areas * vals) / jnp.sum(areas)
