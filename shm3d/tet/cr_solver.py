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
from ..solve import amg, krylov
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


def _mg_or_jacobi(mg_levels, mg_coarse, mg_sizes, diag):
    """AMG V-cycle when a hierarchy was built, else Jacobi."""
    if mg_sizes:
        return amg.make_preconditioner_parts(mg_levels, mg_coarse, mg_sizes)
    return lambda r: r / diag


def _stall_window(dtype):
    """f32 solves hit their roundoff floor and must stop instead of
    burning maxiter (a knot-sized f32 solve spent 10k iterations at its
    floor); f64 AMG-CG can plateau for long stretches near machine
    precision and needs a far more patient guard."""
    return 60 if jnp.dtype(dtype) == jnp.float32 else 1000


@functools.partial(jax.jit, static_argnames=("tol", "chunk", "mg_sizes"))
def _cr_zeroset_chunk(div, x0, rows, cols, vals, diag, surf_mask,
                      mg_levels, mg_coarse, tol: float, chunk: int,
                      mg_sizes: tuple = ()):
    """Dirichlet on the surface faces: phi = 0 there, L_II phi_I = div_I
    (L_CR stored in the positive-definite convention, fem.py)."""
    def matvec(x):
        return surf_mask * _coo_matvec(surf_mask * x, rows, cols, vals) + (1.0 - surf_mask) * x

    precond = _mg_or_jacobi(mg_levels, mg_coarse, mg_sizes, diag)
    b = surf_mask * div
    rhs_mnorm = jnp.sqrt(jnp.abs(jnp.vdot(b, precond(b))))
    res = krylov.cg(matvec, b, x0=x0, precond=precond, tol=tol, maxiter=chunk,
                    rhs_mnorm=rhs_mnorm, stall_window=_stall_window(b.dtype))
    return res.x * surf_mask, res.iterations, res.residual / jnp.maximum(rhs_mnorm, jnp.finfo(res.residual.dtype).tiny)


@functools.partial(jax.jit, static_argnames=("tol", "chunk", "mg_sizes"))
def _cr_none_chunk(div, x0, rows, cols, vals, diag,
                   mg_levels, mg_coarse, tol: float, chunk: int,
                   mg_sizes: tuple = ()):
    b = div - jnp.mean(div)

    def matvec(x):
        y = _coo_matvec(x, rows, cols, vals)
        return y - jnp.mean(y)

    mg = _mg_or_jacobi(mg_levels, mg_coarse, mg_sizes, diag)
    precond = lambda r: (lambda z: z - jnp.mean(z))(mg(r))
    rhs_mnorm = jnp.sqrt(jnp.abs(jnp.vdot(b, precond(b))))
    res = krylov.cg(matvec, b, x0=x0, precond=precond, tol=tol, maxiter=chunk,
                    rhs_mnorm=rhs_mnorm, stall_window=_stall_window(b.dtype))
    return res.x, res.iterations, res.residual / jnp.maximum(rhs_mnorm, jnp.finfo(res.residual.dtype).tiny)


def _group_projector(group_elems, group_ids, group_winv, n_groups: int):
    """Orthogonal projector onto the MULTIPLE-constraint subspace
    {u : u constant over each component's element set}: componentwise
    averaging, an exact O(m) segment-sum (no KKT multipliers, no MINRES —
    the saddle formulation with an AMG u-block preconditioner hit MINRES
    breakdowns; the equality structure makes the null-space method free)."""

    def project(v):
        sums = jax.ops.segment_sum(v[group_elems], group_ids, num_segments=n_groups)
        return v.at[group_elems].set((sums * group_winv)[group_ids])

    return project


@functools.partial(jax.jit, static_argnames=("n_groups", "tol", "chunk", "mg_sizes"))
def _cr_multiple_chunk(div, x0, rows, cols, vals, diag,
                       group_elems, group_ids, group_winv,
                       mg_levels, mg_coarse,
                       n_groups: int, tol: float, chunk: int, mg_sizes: tuple = ()):
    """MULTIPLE mode via projected CG: the reference's per-component
    equality rows (:256-295) define the subspace 'u constant per component';
    solve P L P u = P div with P = componentwise averaging."""
    pgroup = _group_projector(group_elems, group_ids, group_winv, n_groups)
    # constants live in the subspace AND in ker(L) (the reference KKT is
    # equally singular, :256-295; a particular solution suffices because the
    # source mean shift fixes the constant) — deflate the mean as well.
    proj = lambda v: (lambda w: w - jnp.mean(w))(pgroup(v))

    def matvec(x):
        # x stays in the subspace along the recurrence, so P L P x = P (L x)
        return proj(_coo_matvec(x, rows, cols, vals))

    mg = _mg_or_jacobi(mg_levels, mg_coarse, mg_sizes, diag)
    precond = lambda r: proj(mg(r))
    b = proj(div)
    rhs_mnorm = jnp.sqrt(jnp.abs(jnp.vdot(b, precond(b))))
    res = krylov.cg(matvec, b, x0=x0, precond=precond, tol=tol, maxiter=chunk,
                    rhs_mnorm=rhs_mnorm, stall_window=_stall_window(b.dtype))
    return res.x, res.iterations, res.residual / jnp.maximum(rhs_mnorm, jnp.finfo(res.residual.dtype).tiny)


@functools.partial(jax.jit, static_argnames=("nv", "tol", "chunk", "shift"))
def _project_chunk(bvec, x0, p_rows, p_cols, p_vals, p_diag, nv: int, tol: float,
                   chunk: int, shift: float = 0.0):
    """(A^T M A + shift I) w = b, SPD (projectOntoVertices, :790-810;
    shift = the relative Tikhonov of projection_regularization)."""
    def matvec(x):
        return _coo_matvec(x, p_rows, p_cols, p_vals) + shift * x

    precond = lambda r: r / p_diag
    rhs_mnorm = jnp.sqrt(jnp.abs(jnp.vdot(bvec, precond(bvec))))
    res = krylov.cg(matvec, bvec, x0=x0, precond=precond, tol=tol, maxiter=chunk,
                    rhs_mnorm=rhs_mnorm, stall_window=_stall_window(bvec.dtype))
    return res.x, res.iterations, res.residual / jnp.maximum(rhs_mnorm, jnp.finfo(res.residual.dtype).tiny)


# --- projection regularization on sliver-bearing recovery meshes ----------

PROJ_SHIFT_REL = 1e-8  # relative Tikhonov shift on the projection Gram
PROJ_WEAK_REL = 1e-6   # mass-starved vertex flag threshold


def projection_regularization(p_diag: np.ndarray):
    """(shift, weak_vertex_ids) for the L2 face->vertex projection Gram.

    Conforming recovery meshes carry near-degenerate tets whose faces have
    ~zero mass; a vertex incident ONLY to such faces has a ~zero Gram row —
    the projection there is underdetermined and spikes (measured -2.9 in an
    otherwise [-0.55, 4.4] field on the recovered bunny_small; with two
    exactly-degenerate tets the direct oracle factorization is outright
    singular).  A shift of 1e-8x the median diagonal regularizes the solve
    without measurably perturbing healthy vertices; the flagged rows are
    then repaired by ``repair_mass_starved``.  On quality meshes the weak
    set is empty and the shift is a 1e-8 relative no-op."""
    pos = p_diag[p_diag > 0]
    med = float(np.median(pos)) if pos.size else 1.0
    shift = PROJ_SHIFT_REL * med
    weak = np.nonzero(p_diag < PROJ_WEAK_REL * med)[0].astype(np.int64)
    return shift, weak


def repair_mass_starved(w: np.ndarray, weak: np.ndarray, tets: np.ndarray,
                        sweeps: int = 3) -> np.ndarray:
    """Replace mass-starved vertices' projected values by the mean of their
    tet-edge neighbors (host; the weak set is a handful of vertices).
    Healthy neighbors are preferred; weak-weak chains resolve over the
    sweeps."""
    if weak.size == 0:
        return w
    weak_set = {int(v) for v in weak}
    nbrs = {int(v): set() for v in weak}
    mask = np.isin(tets, weak).any(axis=1)
    for t in tets[mask]:
        for v in t:
            if int(v) in weak_set:
                for u in t:
                    if int(u) != int(v):
                        nbrs[int(v)].add(int(u))
    w = np.array(w, dtype=np.float64, copy=True)
    for _ in range(sweeps):
        for v in weak:
            nb = [u for u in nbrs[int(v)] if u not in weak_set] or list(nbrs[int(v)])
            if nb:
                w[int(v)] = float(np.mean(w[nb]))
    return w


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

    def __init__(self, mesh: TetMesh, surface_faces: np.ndarray, dtype=jnp.float64,
                 cr_ops=None):
        import scipy.sparse as sp

        self.mesh = mesh
        self.nf = mesh.n_faces
        self.surface_faces = np.asarray(surface_faces, dtype=np.int64)
        # cr_ops: pre-built (e.g. disk-cached) operator arrays
        cr = cr_ops if cr_ops is not None else fem.build_cr_operators(mesh)
        self.cr = cr
        L = cr.L_scipy()
        # L_CR is assembled in the positive-(semi)definite convention
        # (diag > 0, annihilates constants) — its diagonal IS the Jacobi
        # scaling.  (A historical -diagonal() here was all-negative and the
        # >0 guard silently degraded Jacobi to identity: 1,896 CG iterations
        # on a 16.6k-face solve.)
        self._H = L.tocsr()
        self._amg_cache = {}
        diag = np.asarray(L.diagonal())
        diag = np.where(diag > 0, diag, 1.0)

        A = cr.A_scipy()
        M = cr.M_scipy()
        P = (A.T @ M @ A).tocoo()
        # sort projection entries by row for sorted segment_sum
        order = np.lexsort((P.col, P.row))
        p_rows, p_cols, p_vals = P.row[order], P.col[order], P.data[order]
        p_diag = np.asarray(P.diagonal())
        self._proj_shift, self._proj_weak = projection_regularization(p_diag)
        p_diag = np.where(np.abs(p_diag) > 0, p_diag, 1.0) + self._proj_shift

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

    def _hierarchy(self, mode):
        """Per-constraint-mode SA-AMG hierarchy (operator-cache artifact)."""
        if mode not in self._amg_cache:
            if mode == LevelSetConstraint.ZERO_SET:
                mask = np.asarray(self.arrays["surf_mask"], np.float64)
                H = amg.masked_operator(self._H, mask)
            else:
                H = self._H
            self._amg_cache[mode] = amg.build_hierarchy(H, self.dtype)
        return self._amg_cache[mode]

    def integrate(self, Y, options: SignedHeatOptions, src_face_components=None,
                  src_face_areas=None) -> jnp.ndarray:
        """Full CR Step 3: returns -phi_vertices (reference sign, :316)."""
        a = self.arrays
        nf = self.nf
        nv = self.mesh.n_vertices
        tol, maxiter = options.resolved_solver_tol(), options.solver_maxiter
        div = _cr_divergence(Y, a["divf"], a["divt"], a["divn"], nf)

        mode = options.level_set_constraint
        h = self._hierarchy(mode)
        if mode == LevelSetConstraint.ZERO_SET:
            fn = lambda x0, c: _cr_zeroset_chunk(
                div, x0, a["rows"], a["cols"], a["vals"], a["diag"], a["surf_mask"],
                h.levels, h.coarse_inv, tol=tol, chunk=c, mg_sizes=h.sizes)
            phi_f, it1, r1 = _run_chunked(fn, jnp.zeros(nf, self.dtype), tol, maxiter)
        elif mode == LevelSetConstraint.MULTIPLE:
            labels = np.asarray(src_face_components)
            _, gids = np.unique(labels, return_inverse=True)
            sizes = np.bincount(gids).astype(np.float64)
            n_groups = int(gids.max()) + 1
            fn = lambda x0, c: _cr_multiple_chunk(
                div, x0, a["rows"], a["cols"], a["vals"], a["diag"],
                jnp.asarray(self.surface_faces, jnp.int32),
                jnp.asarray(gids, jnp.int32),
                jnp.asarray(1.0 / sizes, self.dtype),
                h.levels, h.coarse_inv,
                n_groups=n_groups, tol=tol, chunk=c, mg_sizes=h.sizes)
            phi_f, it1, r1 = _run_chunked(fn, jnp.zeros(nf, self.dtype), tol, maxiter)
            phi_f = phi_f - self._face_shift(phi_f, src_face_areas)
        else:
            fn = lambda x0, c: _cr_none_chunk(
                div, x0, a["rows"], a["cols"], a["vals"], a["diag"],
                h.levels, h.coarse_inv, tol=tol, chunk=c, mg_sizes=h.sizes)
            phi_f, it1, r1 = _run_chunked(fn, jnp.zeros(nf, self.dtype), tol, maxiter)
            phi_f = phi_f - self._face_shift(phi_f, src_face_areas)

        # L2 projection to vertices: (A^T M A) w = A^T M phi_f
        b = jax.ops.segment_sum(
            a["am_vals"] * phi_f[a["am_cols"]], a["am_rows"],
            num_segments=nv, indices_are_sorted=True,
        )
        fnp = lambda x0, c: _project_chunk(
            b, x0, a["p_rows"], a["p_cols"], a["p_vals"], a["p_diag"],
            nv=nv, tol=tol, chunk=c, shift=float(self._proj_shift))
        w, it2, r2 = _run_chunked(fnp, jnp.zeros(nv, self.dtype), tol, maxiter)
        self.last_stats = {"iters": int(it1), "residual": float(r1),
                           "proj_iters": int(it2), "proj_residual": float(r2)}
        if self._proj_weak.size:
            w = jnp.asarray(
                repair_mass_starved(np.asarray(w, np.float64), self._proj_weak,
                                    np.asarray(self.mesh.tets)),
                self.dtype,
            )
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
