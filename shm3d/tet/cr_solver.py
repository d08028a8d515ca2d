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

All solves are matrix-free (chunked) CG like the vertex path.  Operators at
production sizes run through the paged-ELL Pallas SpMV over a Morton-
relabeled face space (solve/pell.py — measured 49 ms vs 240 ms for the XLA
ELL gather at knot's 31.4M nnz, vs 512 ms for scatter-add segment-sums);
small/multi-chip/f64 operators stay plain ELL (solve/ell.py).  The AMG
preconditioner uses the geometric face->vertex averaging as its first
prolongator and per-level spectrally-safe Jacobi smoothing (solve/amg.py —
a fixed 0.67 damping DIVERGES on sliver-bearing recovery meshes where
rho(D^-1 A) reaches 4.6).  Operator arrays are built on host in final
dtypes (CRPath.prepare, a persistable treestore artifact) and shipped with
one batched transfer (ell.py module docstring).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import LevelSetConstraint, SignedHeatOptions
from ..solve import amg, ell, krylov, pell
from ..utils import order
from . import fem
from .mesher import TetMesh
from . import solver as solver_mod
from .solver import (_refined_solve, _run_chunked, hierarchy_iter_seconds,
                     op_iter_seconds)

#: use the paged-ELL Pallas SpMV (solve/pell.py) for CR operators at or
#: above this nnz — below it the plain XLA ELL gather is already sub-10 ms
#: and not worth the pass-decomposition build or its kernel compile
PAGED_MIN_NNZ = 2_000_000


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


#: face rows per device program in the divergence gather.  A monolithic
#: gather over all ~4.5M knot faces made the axon worker raise
#: RESOURCE_EXHAUSTED (reproducibly, with 14+ GB of HBM measured free and
#: the same op fine in isolation — some transient per-program worker
#: resource, not array capacity); 512k-row lax.map slices run reliably and
#: cost the same wall clock once compiled (measured r4: 12 s compile,
#: then instant).  VALIDATED r5: with this chunking the FULL knot pipeline
#: (treestore load -> Step 1 -> chunked CR solve -> projection) completed
#: twice in one TPU process (171.4 s then 59.5 s warm, bitwise-close phi,
#: no RESOURCE_EXHAUSTED), and the r5 bench sweep ran it to completion in
#: a fresh process (BENCH_TABLE.md).  Per-phase HBM high-water would
#: upgrade this from behavioral to quantitative, but the axon PJRT plugin
#: reports an EMPTY memory_stats() dict over the tunnel (checked r5) —
#: utils/timing.device_memory_peak_mb degrades to None there.
_DIV_CHUNK = 1 << 19


@jax.jit
def _cr_divergence(Y, div_tets2, div_nvec2):
    """Integrated divergence onto faces: div[f] = sum over the <=2 incident
    tets of n_f(outward) . Y_tet (faceDivergence,
    signed_heat_tet_solver.cpp:609-621).  Gather form: (nf, 2) incident-tet
    ids + (nf, 2, 3) signed normals (zero rows pad boundary faces)."""
    nf = div_tets2.shape[0]
    if nf <= _DIV_CHUNK:
        return jnp.einsum("fkj,fkj->f", div_nvec2, Y[div_tets2])
    m = -(-nf // _DIV_CHUNK)
    pad = m * _DIV_CHUNK - nf
    tp = jnp.pad(div_tets2, ((0, pad), (0, 0))).reshape(m, _DIV_CHUNK, 2)
    npad = jnp.pad(div_nvec2, ((0, pad), (0, 0), (0, 0))).reshape(
        m, _DIV_CHUNK, 2, 3)
    out = jax.lax.map(
        lambda args: jnp.einsum("fkj,fkj->f", args[1], Y[args[0]]),
        (tp, npad))
    return out.reshape(-1)[:nf]


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


@functools.partial(jax.jit, static_argnames=("mg_sizes",))
def _cr_zeroset_chunk(b, x0, L, diag, surf_mask,
                      mg_levels, mg_coarse, stall, tol=1e-5,
                      chunk=solver_mod.CHUNK_ITERS, mg_sizes: tuple = ()):
    """Dirichlet on the surface faces: phi = 0 there, L_II phi_I = b_I
    (L_CR stored in the positive-definite convention, fem.py; b = masked
    div, or a refinement residual)."""
    def matvec(x):
        return surf_mask * pell.apply(L, surf_mask * x) + (1.0 - surf_mask) * x

    # hierarchy is built on the SAME masked operator -> matvec0 = matvec
    precond = _mg_or_jacobi(mg_levels, mg_coarse, mg_sizes, diag, matvec0=matvec)
    rhs_mnorm = jnp.sqrt(jnp.abs(jnp.vdot(b, precond(b))))
    res = krylov.cg(matvec, b, x0=x0, precond=precond, tol=tol, maxiter=chunk,
                    rhs_mnorm=rhs_mnorm, stall_window=_stall_window(b.dtype),
                    stall_state=stall)
    rel = res.residual / jnp.maximum(rhs_mnorm, jnp.finfo(res.residual.dtype).tiny)
    return res.x * surf_mask, res.iterations, rel, (res.best, res.since)


@functools.partial(jax.jit, static_argnames=("mg_sizes",))
def _cr_none_chunk(b, x0, L, diag,
                   mg_levels, mg_coarse, stall, tol=1e-5,
                   chunk=solver_mod.CHUNK_ITERS, mg_sizes: tuple = ()):
    """Singular CR Poisson chunk: L phi = b, constants deflated
    (b pre-deflated by the caller)."""
    def matvec(x):
        y = pell.apply(L, x)
        return y - jnp.mean(y)

    # hierarchy is built on the RAW operator (deflation lives outside it)
    mg = _mg_or_jacobi(mg_levels, mg_coarse, mg_sizes, diag,
                       matvec0=lambda v: pell.apply(L, v))
    precond = lambda r: (lambda z: z - jnp.mean(z))(mg(r))
    rhs_mnorm = jnp.sqrt(jnp.abs(jnp.vdot(b, precond(b))))
    res = krylov.cg(matvec, b, x0=x0, precond=precond, tol=tol, maxiter=chunk,
                    rhs_mnorm=rhs_mnorm, stall_window=_stall_window(b.dtype),
                    stall_state=stall)
    rel = res.residual / jnp.maximum(rhs_mnorm, jnp.finfo(res.residual.dtype).tiny)
    return res.x, res.iterations, rel, (res.best, res.since)


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


@functools.partial(jax.jit, static_argnames=("n_groups", "mg_sizes"))
def _cr_multiple_chunk(b, x0, L, diag,
                       group_elems, group_ids, group_winv,
                       mg_levels, mg_coarse, stall,
                       n_groups: int, tol=1e-5, chunk=solver_mod.CHUNK_ITERS,
                       mg_sizes: tuple = ()):
    """MULTIPLE mode via projected CG: the reference's per-component
    equality rows (:256-295) define the subspace 'u constant per component';
    solve P L P u = P div with P = componentwise averaging (``b`` is
    pre-projected by the caller)."""
    pgroup = _group_projector(group_elems, group_ids, group_winv, n_groups)
    # constants live in the subspace AND in ker(L) (the reference KKT is
    # equally singular, :256-295; a particular solution suffices because the
    # source mean shift fixes the constant) — deflate the mean as well.
    proj = lambda v: (lambda w: w - jnp.mean(w))(pgroup(v))

    def matvec(x):
        # x stays in the subspace along the recurrence, so P L P x = P (L x)
        return proj(pell.apply(L, x))

    mg = _mg_or_jacobi(mg_levels, mg_coarse, mg_sizes, diag,
                       matvec0=lambda v: pell.apply(L, v))
    precond = lambda r: proj(mg(r))
    rhs_mnorm = jnp.sqrt(jnp.abs(jnp.vdot(b, precond(b))))
    res = krylov.cg(matvec, b, x0=x0, precond=precond, tol=tol, maxiter=chunk,
                    rhs_mnorm=rhs_mnorm, stall_window=_stall_window(b.dtype),
                    stall_state=stall)
    rel = res.residual / jnp.maximum(rhs_mnorm, jnp.finfo(res.residual.dtype).tiny)
    return res.x, res.iterations, rel, (res.best, res.since)


@jax.jit
def _project_chunk(bvec, x0, P, p_diag, stall, tol=1e-5,
                   chunk=solver_mod.CHUNK_ITERS, shift=0.0):
    """(A^T M A + shift I) w = b, SPD (projectOntoVertices, :790-810;
    shift = the relative Tikhonov of projection_regularization)."""
    def matvec(x):
        return pell.apply(P, x) + shift * x

    precond = lambda r: r / p_diag
    rhs_mnorm = jnp.sqrt(jnp.abs(jnp.vdot(bvec, precond(bvec))))
    res = krylov.cg(matvec, bvec, x0=x0, precond=precond, tol=tol, maxiter=chunk,
                    rhs_mnorm=rhs_mnorm, stall_window=_stall_window(bvec.dtype),
                    stall_state=stall)
    rel = res.residual / jnp.maximum(rhs_mnorm, jnp.finfo(res.residual.dtype).tiny)
    return res.x, res.iterations, rel, (res.best, res.since)


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


def _csr64(M):
    """Host defect-correction operators run f64; upcast f32-stored data
    in place (one copy at load, not one per matvec)."""
    if M.dtype != np.float64:
        M = M.astype(np.float64)
    return M


def _first_P_from_cols(face_cols: np.ndarray, n_vertices: int):
    """Geometric face->vertex prolongator from its (nf, 3) vertex-column
    table (every value is 1/3, so only the structure is persisted)."""
    import scipy.sparse as sp

    nf = face_cols.shape[0]
    return sp.csr_matrix(
        (np.full(3 * nf, 1.0 / 3.0),
         (np.repeat(np.arange(nf, dtype=np.int64), 3),
          face_cols.reshape(-1).astype(np.int64))),
        shape=(nf, n_vertices))


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
    """Prepared CR operators for one conforming (mesh, surface) pair.

    Construction is split so the expensive host work is a persistable
    artifact (utils/treestore; VERDICT r2 items 1a/4):

    - :meth:`prepare` (static, host): assembles ALL final-dtype device
      panels, the host f64 CSR operators for defect correction, and the
      default-mode (ZeroSet) AMG hierarchy, as a numpy-leaf tree;
    - ``__init__`` with ``prepared=`` just ships that tree with one batched
      put and wraps it (milliseconds plus the transfer).
    """

    def __init__(self, mesh: TetMesh, surface_faces: np.ndarray = None,
                 dtype=jnp.float64, cr_ops=None, device_mesh=None,
                 prepared: Optional[dict] = None):
        """``device_mesh``: optional jax.sharding.Mesh — operator rows
        are sharded across it and the face solves run as distributed SpMV
        under GSPMD (ell.device_put_tree)."""
        self.mesh = mesh
        self.device_mesh = device_mesh
        if prepared is None:
            prepared = CRPath.prepare(
                mesh, surface_faces, dtype, cr_ops=cr_ops,
                pad=device_mesh.size if device_mesh is not None else 1)
        self.nf = int(prepared["nf"])
        self.surface_faces = np.asarray(prepared["surface_faces"], np.int64)
        self._H = prepared["H_csr"].to_scipy()
        self._first_P_scipy = _first_P_from_cols(
            np.asarray(prepared["first_P_cols"]), int(prepared["n_vertices"]))
        # projection operators may be STORED f32 (artifact size); upcast
        # once here — a mixed f32-matrix @ f64-vector matvec makes scipy
        # allocate a fresh f64 copy of the data per call
        self._P_scipy = _csr64(prepared["P_csr"].to_scipy())
        self._AtM_scipy = _csr64(prepared["AtM_csr"].to_scipy())
        self._proj_shift = float(prepared["proj_shift"])
        self._proj_weak = np.asarray(prepared["proj_weak"])
        self._mask64 = np.asarray(prepared["ell"]["surf_mask"], np.float64)
        # ONE batched put for the solve panels + every prepared hierarchy
        dev = ell.device_put_tree(
            dict(a=prepared["ell"],
                 amg={k: (h.levels, h.coarse_inv)
                      for k, h in prepared["amg"].items()}),
            device_mesh)
        self.arrays = dev["a"]
        self._amg_cache = {
            LevelSetConstraint(k): amg.AMGHierarchy(
                lev, cinv, prepared["amg"][k].sizes, prepared["amg"][k].l0_nnz)
            for k, (lev, cinv) in dev["amg"].items()
        }
        self.dtype = dtype
        self.last_stats = {}

    @staticmethod
    def prepare(mesh: TetMesh, surface_faces: np.ndarray, dtype,
                cr_ops=None, pad: int = 1,
                eager_modes=(LevelSetConstraint.ZERO_SET,)) -> dict:
        """Host-side CR preparation: numpy-leaf tree (see class docstring).
        ``eager_modes``: constraint modes whose AMG hierarchies are built
        (and hence persisted) now; others are built lazily per process.

        At production sizes (single chip, f32, nnz >= PAGED_MIN_NNZ) the
        WHOLE face space is relabeled by a Morton order on face barycenters
        and the solve operator stored paged (solve/pell.py): the pass count
        — the paged matvec's cost — tracks spatial locality of the
        numbering.  The permutation is baked into every face-indexed array
        here once, so the solves run entirely in the permuted space with
        zero per-matvec cost; only the face->vertex projection (whose
        output is vertex-indexed) crosses back, via the column-permuted
        A^T M."""
        np_dtype = np.dtype(dtype)
        nf = mesh.n_faces
        surface_faces = np.asarray(surface_faces, dtype=np.int64)
        cr = cr_ops if cr_ops is not None else fem.build_cr_operators(mesh)
        L = cr.L_scipy().tocsr()
        use_paged = (np_dtype == np.float32 and pad == 1
                     and L.nnz >= PAGED_MIN_NNZ)
        df = cr.div_faces
        if use_paged:
            fb = np.asarray(mesh.vertices)[np.asarray(mesh.faces)].mean(axis=1)
            fperm = order.morton_order(fb)
            finv = order.inverse_permutation(fperm)
            L = L[fperm][:, fperm].tocsr()
            surface_faces = finv[surface_faces]  # positions preserved
            df = finv[df]
        # L_CR is assembled in the positive-(semi)definite convention
        # (diag > 0, annihilates constants) — its diagonal IS the Jacobi
        # scaling.  (A historical -diagonal() here was all-negative and the
        # >0 guard silently degraded Jacobi to identity: 1,896 CG iterations
        # on a 16.6k-face solve.)
        diag = np.asarray(L.diagonal())
        diag = np.where(diag > 0, diag, 1.0)

        A = cr.A_scipy()
        M = cr.M_scipy()
        AtM = (A.T @ M).tocsr()
        P = (AtM @ A).tocsr()
        if use_paged:
            AtM = AtM[:, fperm].tocsr()
        p_diag = np.asarray(P.diagonal())
        proj_shift, proj_weak = projection_regularization(p_diag)
        p_diag = np.where(np.abs(p_diag) > 0, p_diag, 1.0) + proj_shift

        # everything below is built in final dtypes and shipped with ONE
        # batched put (per-array converting puts cost seconds each over the
        # remote-TPU tunnel; ell.py module docstring)
        arrays = dict(
            L=(pell.build_paged(L, np_dtype) if use_paged
               else ell.build_ell(L, np_dtype, pad_rows_to=pad)),
            diag=diag.astype(np_dtype),
            # the projection Gram lives in the (unpermuted) VERTEX space —
            # paging it without a vertex locality order exploded to 2.2 GB
            # for ~20M nnz (measured).  Its row widths are long-tailed
            # (knot: mean 12.7, max 68 — a 31M-slot single-width panel for
            # 5.8M nnz), so at production sizes it stores sliced
            # (ell.SlicedEll, ~1.15x nnz slots, ~4x less gather traffic);
            # small or multi-chip solves keep the plain GSPMD-shardable ELL
            P=(ell.build_sliced(P, np_dtype)
               if use_paged and P.nnz >= amg.SLICED_MIN_NNZ
               and ell.sliced_waste(P) > 1.5
               else ell.build_ell(P, np_dtype, pad_rows_to=pad)),
            p_diag=p_diag.astype(np_dtype),
        )
        # divergence in gather form: (nf, 2) incident tets + signed normals
        counts = np.bincount(df, minlength=nf)
        order_d = np.argsort(df, kind="stable")
        dfs = df[order_d]
        first = np.zeros(nf, np.int64)
        first[1:] = np.cumsum(counts)[:-1]
        pos = np.arange(dfs.size) - first[dfs]
        K = int(counts.max()) if counts.size else 1
        dtets2 = np.zeros((nf, K), np.int32)
        dnvec2 = np.zeros((nf, K, 3), np_dtype)
        dtets2[dfs, pos] = cr.div_tets[order_d]
        dnvec2[dfs, pos] = cr.div_nvec[order_d]
        arrays["divt"] = dtets2
        arrays["divn"] = dnvec2
        # surface mask (0 on constrained faces)
        mask = np.ones(nf, np_dtype)
        mask[surface_faces] = 0.0
        arrays["surf_mask"] = mask

        # geometric face->vertex first prolongator (the CR dof at a face
        # barycenter is the mean of the P1 values at its 3 vertices): a 10x
        # first coarsening with mesh-aware interpolation that SA aggregation
        # cannot discover — equal measured CG convergence on the knot CR
        # system, ~10x faster hierarchy setup (11 s vs 104 s host)
        faces_p = np.asarray(mesh.faces)
        if use_paged:
            faces_p = faces_p[fperm]
        first_P = _first_P_from_cols(faces_p, mesh.n_vertices)

        hierarchies = {}
        for mode in eager_modes:
            hierarchies[mode.value] = CRPath._build_hierarchy_host(
                L, mask.astype(np.float64), mode, np_dtype, pad,
                first_P=first_P, paged=use_paged)
        # artifact size (VERDICT r2 item 4): at production scale the
        # projection Gram / RHS operators store f32 values (their host use
        # is the f32-tier defect correction, floored at ~1e-5 rel by the
        # device pipeline — f32 value rounding adds ~1e-7); the face
        # operator L stays f64 (it IS the refinement target).  first_P is
        # structure-only (every value is 1/3): persist just its (nf, 3)
        # int32 column table and rebuild the CSR at load.
        host_dt = np.float32 if use_paged else np.float64
        return dict(
            nf=nf,
            surface_faces=surface_faces,
            ell=arrays,
            H_csr=ell.CSR64.from_scipy(L),
            P_csr=ell.CSR64.from_scipy(P, host_dt),
            AtM_csr=ell.CSR64.from_scipy(AtM, host_dt),
            first_P_cols=faces_p.astype(np.int32),
            n_vertices=int(mesh.n_vertices),
            proj_shift=float(proj_shift),
            proj_weak=proj_weak,
            amg=hierarchies,
        )

    @staticmethod
    def _build_hierarchy_host(H, mask64, mode, np_dtype, pad, first_P=None,
                              paged: bool = False):
        if mode == LevelSetConstraint.ZERO_SET:
            H = amg.masked_operator(H, mask64)
        return amg.build_hierarchy_host(
            H, np_dtype, pad_rows_to=pad, skip_level0_A=True,
            first_P=first_P,
            paged_min_nnz=PAGED_MIN_NNZ if paged else None)

    def _hierarchy(self, mode):
        """Per-constraint-mode AMG hierarchy (operator-cache artifact;
        non-default modes are built lazily per process)."""
        if mode not in self._amg_cache:
            h = CRPath._build_hierarchy_host(
                self._H, self._mask64, mode, np.dtype(self.dtype),
                self.device_mesh.size if self.device_mesh is not None else 1,
                first_P=self._first_P_scipy,
                paged=isinstance(self.arrays["L"], pell.PagedMat))
            self._amg_cache[mode] = amg.hierarchy_to_device(h, self.device_mesh)
        return self._amg_cache[mode]

    def integrate(self, Y, options: SignedHeatOptions, src_face_components=None,
                  src_face_areas=None) -> jnp.ndarray:
        """Full CR Step 3: returns -phi_vertices (reference sign, :316).

        Both solves (face system + vertex projection) run f32-chunked on
        device with host-f64 defect correction (solver._refined_solve) —
        recovery meshes are ill-conditioned enough that f32 CG stalls well
        short of useful accuracy (measured 7e-2 phi error on TPU without
        correction)."""
        a = self.arrays
        nf = self.nf
        nv = self.mesh.n_vertices
        tol, maxiter = options.resolved_solver_tol(), options.solver_maxiter
        div = _cr_divergence(Y, a["divt"], a["divn"])
        div64 = np.asarray(div, np.float64)

        mode = options.level_set_constraint
        h = self._hierarchy(mode)
        cost = hierarchy_iter_seconds(h, l0=a["L"])
        solve_stats: dict = {}
        proj_stats: dict = {}
        refine_stats: dict = {}
        proj_refine_stats: dict = {}
        mg = (h.levels, h.coarse_inv)
        H64 = self._H
        zeros = ell.replicated(np.zeros(nf), self.dtype, self.device_mesh)
        if mode == LevelSetConstraint.ZERO_SET:
            m64 = self._mask64
            b64 = m64 * div64
            host_op = lambda x: m64 * (H64 @ (m64 * x)) + (1.0 - m64) * x
            run = lambda b, tol=tol, maxiter=maxiter: _run_chunked(
                lambda x0, c, s: _cr_zeroset_chunk(
                    b, x0, a["L"], a["diag"], a["surf_mask"], *mg, s,
                    tol=tol, chunk=c, mg_sizes=h.sizes),
                zeros, tol, maxiter, iter_seconds=cost, stats=solve_stats)
            phi_f, it1, r1 = _refined_solve(run, host_op, b64, self.dtype, options,
                                              device_mesh=self.device_mesh,
                                              stats=refine_stats)
        elif mode == LevelSetConstraint.MULTIPLE:
            labels = np.asarray(src_face_components)
            _, gids = np.unique(labels, return_inverse=True)
            sizes = np.bincount(gids).astype(np.float64)
            n_groups = int(gids.max()) + 1
            elems = self.surface_faces
            gparts = ell.device_put_tree(dict(
                elems=elems.astype(np.int32),
                gids=gids.astype(np.int32),
                winv=(1.0 / sizes).astype(np.dtype(self.dtype))))

            def proj64(v):
                v = np.array(v, copy=True)
                sums = np.bincount(gids, weights=v[elems], minlength=n_groups)
                v[elems] = (sums / sizes)[gids]
                return v - v.mean()

            b64 = proj64(div64)
            host_op = lambda x: proj64(H64 @ x)
            run = lambda b, tol=tol, maxiter=maxiter: _run_chunked(
                lambda x0, c, s: _cr_multiple_chunk(
                    b, x0, a["L"], a["diag"],
                    gparts["elems"], gparts["gids"], gparts["winv"], *mg, s,
                    n_groups=n_groups, tol=tol, chunk=c, mg_sizes=h.sizes),
                zeros, tol, maxiter, iter_seconds=cost, stats=solve_stats)
            phi_f, it1, r1 = _refined_solve(run, host_op, b64, self.dtype, options,
                                              device_mesh=self.device_mesh,
                                              stats=refine_stats)
            phi_f = phi_f - self._face_shift64(phi_f, src_face_areas)
        else:
            b64 = div64 - div64.mean()
            host_op = lambda x: (lambda y: y - y.mean())(H64 @ x)
            run = lambda b, tol=tol, maxiter=maxiter: _run_chunked(
                lambda x0, c, s: _cr_none_chunk(
                    b, x0, a["L"], a["diag"], *mg, s,
                    tol=tol, chunk=c, mg_sizes=h.sizes),
                zeros, tol, maxiter, iter_seconds=cost, stats=solve_stats)
            phi_f, it1, r1 = _refined_solve(run, host_op, b64, self.dtype, options,
                                              device_mesh=self.device_mesh,
                                              stats=refine_stats)
            phi_f = phi_f - self._face_shift64(phi_f, src_face_areas)

        # L2 projection to vertices: (A^T M A + shift I) w = A^T M phi_f
        shift = float(self._proj_shift)
        b64p = self._AtM_scipy @ phi_f
        P64 = self._P_scipy
        host_opp = lambda x: P64 @ x + shift * x
        runp = lambda b, tol=tol, maxiter=maxiter: _run_chunked(
            lambda x0, c, s: _project_chunk(
                b, x0, a["P"], a["p_diag"], s,
                tol=tol, chunk=c, shift=shift),
            ell.replicated(np.zeros(nv), self.dtype, self.device_mesh), tol, maxiter,
            iter_seconds=2 * op_iter_seconds(a["P"]), stats=proj_stats)
        w, it2, r2 = _refined_solve(runp, host_opp, b64p, self.dtype, options,
                                      device_mesh=self.device_mesh,
                                      stats=proj_refine_stats)
        self.last_stats = {"iters": int(it1), "residual": float(r1),
                           "proj_iters": int(it2), "proj_residual": float(r2),
                           "chunks": solve_stats.get("chunks", []),
                           "proj_chunks": proj_stats.get("chunks", []),
                           "amg_sizes": list(h.sizes),
                           "iter_seconds_est": round(cost, 4),
                           "refine_pass_rels": refine_stats.get("refine_pass_rels", []),
                           "proj_refine_pass_rels": proj_refine_stats.get("refine_pass_rels", [])}
        if self._proj_weak.size:
            w = repair_mass_starved(w, self._proj_weak, np.asarray(self.mesh.tets))
        # The reference returns -phi here (:316) to compensate its internal
        # divergence sign convention; our faceDivergence is built from
        # outward-positive signed normals (mesher tet_face_sign), which
        # already yields the vertex-path sign (inside negative) directly.
        return w

    def _face_shift64(self, phi_f, src_face_areas):
        """Area-weighted mean of phi over the surface faces, host f64
        (averageFaceDataOnSource, :558-573)."""
        areas = np.asarray(src_face_areas, np.float64)
        vals = np.asarray(phi_f)[self.surface_faces]
        return float(np.sum(areas * vals) / np.sum(areas))
