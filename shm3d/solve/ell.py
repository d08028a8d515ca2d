"""Fixed-width (ELL) sparse matvecs + batched device transfer for TPU.

Why not COO segment_sum: on TPU ``jax.ops.segment_sum`` lowers to a
scatter-add that executes at ~60M elements/s even with sorted indices
(measured on v5e: 512 ms for one 31.4M-nnz matvec), which put knot's CR
Step 3 (reference default path, signed_heat_tet_solver.cpp:234-317) at
620 s and into the worker watchdog.  The fixed-width gather form
``(vals * x[cols]).sum(axis=0)`` halves that (255 ms measured, random
indices) and drops the rows array entirely.  The FEM operators here have
naturally bounded row width — the CR Laplacian couples a face only within
its <=2 incident tets (diag + 6 = width 7) — so ELL padding is small; hub
rows beyond the chosen width spill into a sorted-COO tail applied with one
segment_sum over the (few) remaining entries.

Why the panels are TRANSPOSED (w, n): TPU tiles rank-2 f32/s32 arrays as
(8, 128) — a row-major (n, 7) panel pads its minor dim 7 -> 128 (an 18x
expansion; knot's CR chunk program budgeted 19 GB of HBM for its ELL
panels and failed to compile).  With the long axis minor, (w, n) only pads
w to the next multiple of 8 (<= 1.3x for the operators here) and the
row-sum becomes a cheap sublane reduction.

Why batched transfer: a per-array ``jnp.asarray(host_array, new_dtype)``
compiles and runs a tiny convert program PER ARRAY; over the remote-TPU
tunnel each round trip costs seconds (measured: 113 s of a 127 s AMG
hierarchy build was per-array conversion traffic, vs 0.14 s for a single
100 MB ``jax.device_put``).  Build everything on host in the FINAL dtypes
and ship the whole pytree with one ``device_put_tree`` call.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import treestore


@treestore.register
class EllMat(NamedTuple):
    """Fixed-width sparse matrix, transposed panels: slot j of row i holds
    entry (cols[j, i], vals[j, i]); padded slots have vals == 0 (cols point
    at 0, harmless under gather).  Rows wider than the ELL width spill into
    the sorted-COO tail."""

    cols: jnp.ndarray       # (w, n) int32
    vals: jnp.ndarray       # (w, n) compute dtype
    tail_rows: jnp.ndarray  # (t,) int32, row-sorted (t == 0 for most operators)
    tail_cols: jnp.ndarray  # (t,) int32
    tail_vals: jnp.ndarray  # (t,) compute dtype

    @property
    def n_rows(self) -> int:
        return self.cols.shape[1]

    @property
    def width(self) -> int:
        return self.cols.shape[0]


@treestore.register
class CSR64(NamedTuple):
    """Persistable host-side CSR (f64 data, int32 indices): the exact-
    operator form the f64 defect-correction passes apply on host
    (tet/solver._refined_solve).  Plain arrays so utils/treestore can
    memory-map it straight off disk."""

    data: np.ndarray
    indices: np.ndarray
    indptr: np.ndarray
    n_rows: int
    n_cols: int

    @staticmethod
    def from_scipy(M, data_dtype=np.float64) -> "CSR64":
        """``data_dtype``: f32 storage is offered for operators whose host
        use tolerates ~1e-7 relative value rounding (e.g. the CR projection
        Gram/RHS at production scale, where the f32 device pipeline floors
        well above that) — it halves the on-disk artifact for those
        operators (VERDICT r2 item 4)."""
        A = M.tocsr()
        # one index dtype for both arrays: scipy unifies mixed index dtypes
        # with a copy, which would defeat the memory-mapped load
        idx = np.int32 if A.nnz < np.iinfo(np.int32).max else np.int64
        return CSR64(np.asarray(A.data, data_dtype),
                     np.asarray(A.indices, idx),
                     np.asarray(A.indptr, idx),
                     int(A.shape[0]), int(A.shape[1]))

    def to_scipy(self):
        import scipy.sparse as sp

        return sp.csr_matrix((self.data, self.indices, self.indptr),
                             shape=(self.n_rows, self.n_cols))


def build_ell(M, dtype, width: int | None = None, percentile: float = 99.5,
              pad_rows_to: int = 1) -> EllMat:
    """Host-side ELL(+tail) build from any scipy sparse matrix.

    Returns an EllMat of NUMPY arrays already in their final dtypes —
    transfer with :func:`device_put_tree` (one batched put, see module
    docstring).  ``width`` pins the ELL width; by default the narrower of
    the max row width and the ``percentile`` row width is used, except that
    near-uniform matrices (padding <= 25%) take the full width and an empty
    tail.

    ``pad_rows_to``: round the panel row count (and tail length) up to a
    multiple of this — jax.device_put requires explicitly sharded axes to
    divide evenly by the mesh size, so sharded operators pad to it.  Padding
    rows are all-zero (cols 0) and tail padding is (row 0, col 0, val 0):
    no-ops under :func:`matvec`, whose output is sliced back to the true
    row count.
    """
    A = M.tocsr()
    A.sum_duplicates()
    A.sort_indices()
    n = A.shape[0]
    pad = lambda k: -(-k // pad_rows_to) * pad_rows_to
    counts = np.diff(A.indptr)
    nnz = int(A.indices.size)
    if n == 0 or nnz == 0:
        z = np.zeros((1, pad(max(n, 1))))
        return EllMat(z.astype(np.int32), z.astype(dtype),
                      np.zeros(0, np.int32), np.zeros(0, np.int32),
                      np.zeros(0, dtype))
    w_full = int(counts.max())
    if width is not None:
        w = max(1, int(width))
    elif n * w_full <= 1.25 * nnz:
        w = w_full
    else:
        w = max(1, int(np.percentile(counts, percentile)))
    rows_all = np.repeat(np.arange(n, dtype=np.int64), counts)
    pos = np.arange(nnz, dtype=np.int64) - np.repeat(A.indptr[:-1], counts)
    in_ell = pos < w
    cols = np.zeros((w, pad(n)), np.int32)
    vals = np.zeros((w, pad(n)), dtype)
    cols[pos[in_ell], rows_all[in_ell]] = A.indices[in_ell]
    vals[pos[in_ell], rows_all[in_ell]] = A.data[in_ell]
    tail = ~in_ell
    t = int(tail.sum())
    tp = pad(t) if t else 0
    tr = np.zeros(tp, np.int32)
    tc = np.zeros(tp, np.int32)
    tv = np.zeros(tp, dtype)
    # padding goes at the FRONT (row 0, val 0) so the tail stays row-sorted
    # for segment_sum(indices_are_sorted=True)
    tr[tp - t:] = rows_all[tail]
    tc[tp - t:] = A.indices[tail]
    tv[tp - t:] = A.data[tail]
    return EllMat(cols, vals, tr, tc, tv)


def matvec(m: EllMat, x: jnp.ndarray, n_out: int | None = None) -> jnp.ndarray:
    """y = M @ x; jit-safe, tail presence is static.

    ``n_out``: the true output length when the panel rows are padded
    (build_ell pad_rows_to) AND the matrix is rectangular — for square
    operators it defaults to len(x), which is always the true count (padding
    rows are all-zero, so slicing them off loses nothing)."""
    n = x.shape[0] if n_out is None else n_out
    y = jnp.sum(m.vals * x[m.cols], axis=0)[:n]
    if m.tail_rows.shape[0]:
        y = y + jax.ops.segment_sum(
            m.tail_vals * x[m.tail_cols], m.tail_rows,
            num_segments=n, indices_are_sorted=True,
        )
    return y


@treestore.register
class SlicedEll(NamedTuple):
    """Width-skewed sparse matrix as occupancy-sorted row slices (SELL-like).

    A single-width ELL panel pays ``max_row_width`` slots for EVERY row;
    transfer operators with long-tailed width distributions waste most of
    them — the knot CR restriction (AMG level-0 P^T, mean width 29, max
    195) packed into an 89M-slot panel (713 MB on disk AND HBM, ~0.7 s per
    V-cycle application at the measured v5e gather rate) for 13.4M nnz.

    Here rows are sorted by descending occupancy and cut into a handful of
    slices; slice s stores its rows in a transposed (w_s, n_s) panel whose
    width is that slice's max occupancy.  Boundaries come from an exact DP
    over the occupancy histogram (occupancies are small ints), so total
    slots approach sum(occ).  The same knot restriction packs into ~14.5M
    slots (~8 KB of extra metadata) — ~6x less memory and gather traffic.

    Application gathers each panel, concatenates, and inverse-permutes with
    ONE gather (``inv_ids``) — no scatter: every output row lives in
    exactly one slice, and rows with no entries point at a zero slot
    appended to the concatenation.

    Single-chip encoding (like PagedMat): built only on the paged
    tet/CR path; multi-chip solves keep plain EllMat panels, whose row
    sharding GSPMD partitions cleanly."""

    cols: tuple       # per slice: (w_s, n_s) int32 panels, widths descending
    vals: tuple       # per slice: (w_s, n_s) compute dtype
    inv_ids: np.ndarray  # (n_rows,) int32: output position in the
                         # concatenated slice results; empty rows point at
                         # the appended zero slot

    @property
    def n_rows(self) -> int:
        return self.inv_ids.shape[0]

    @property
    def n_slots(self) -> int:
        return sum(int(c.shape[0]) * int(c.shape[1]) for c in self.cols)


def _slice_boundaries(counts_desc: np.ndarray, max_slices: int) -> list:
    """Exact minimum-slot slicing of a descending occupancy sequence.

    Rows group by exact occupancy (small ints), so slices are unions of
    consecutive occupancy groups; a slice starting at group i costs
    ``width_i * rows_covered``.  DP over (group, slices used) — O(m^2 K)
    with m = #distinct widths (~200 for FEM transfer operators).

    Returns row-index boundaries [0, b1, ..., n_nonzero_rows]."""
    widths, first = np.unique(-counts_desc, return_index=True)
    widths = -widths                       # descending distinct widths
    if widths.size and widths[-1] == 0:    # zero-occupancy rows: not sliced
        widths, first = widths[:-1], first[:-1]
    m = widths.size
    if m == 0:
        return [0]
    ends = np.append(first[1:], np.searchsorted(-counts_desc, 0, side="left")
                     if counts_desc[-1] == 0 else counts_desc.size)
    n_rows_grp = ends - first
    K = min(max_slices, m)
    INF = float("inf")
    # cost[i][k]: min slots covering groups i.. with k slices left
    cost = [[INF] * (K + 1) for _ in range(m + 1)]
    cut = [[0] * (K + 1) for _ in range(m + 1)]
    for k in range(K + 1):
        cost[m][k] = 0.0
    for i in range(m - 1, -1, -1):
        for k in range(1, K + 1):
            rows = 0
            for j in range(i, m):
                rows += int(n_rows_grp[j])
                c = int(widths[i]) * rows + cost[j + 1][k - 1]
                if c < cost[i][k]:
                    cost[i][k] = c
                    cut[i][k] = j + 1
    bounds = [0]
    i, k = 0, K
    while i < m:
        j = cut[i][k]
        bounds.append(int(ends[j - 1]))
        i, k = j, k - 1
    return bounds


def build_sliced(M, dtype, max_slices: int = 8) -> SlicedEll:
    """Host-side sliced-ELL build from any scipy sparse matrix (see
    SlicedEll).  Same vectorized fill strategy as build_ell, one slice at a
    time (a handful of slices, each a single fancy-index assignment)."""
    A = M.tocsr()
    A.sum_duplicates()
    A.sort_indices()
    n = A.shape[0]
    np_dtype = np.dtype(dtype)
    counts = np.diff(A.indptr)
    order = np.argsort(-counts, kind="stable")
    c_desc = counts[order]
    bounds = _slice_boundaries(c_desc, max_slices)
    cols_s, vals_s = [], []
    nnz = int(A.indices.size)
    rows_all = np.repeat(np.arange(n, dtype=np.int64), counts)
    pos_all = np.arange(nnz, dtype=np.int64) - np.repeat(A.indptr[:-1], counts)
    # position of each row in the sorted order
    rank = np.empty(n, np.int64)
    rank[order] = np.arange(n, dtype=np.int64)
    rnk = rank[rows_all]
    for a, b in zip(bounds[:-1], bounds[1:]):
        w = int(c_desc[a])
        cols = np.zeros((max(w, 1), b - a), np.int32)
        vals = np.zeros((max(w, 1), b - a), np_dtype)
        sel = (rnk >= a) & (rnk < b)
        cols[pos_all[sel], rnk[sel] - a] = A.indices[sel]
        vals[pos_all[sel], rnk[sel] - a] = A.data[sel]
        cols_s.append(cols)
        vals_s.append(vals)
    n_sliced = bounds[-1]
    inv = np.full(n, n_sliced, np.int32)   # empty rows -> appended zero slot
    inv[order[:n_sliced]] = np.arange(n_sliced, dtype=np.int32)
    return SlicedEll(tuple(cols_s), tuple(vals_s), inv)


def sliced_matvec(m: SlicedEll, x: jnp.ndarray,
                  n_out: int | None = None) -> jnp.ndarray:
    """y = M @ x for a SlicedEll; jit-safe (slice shapes are static)."""
    parts = [jnp.sum(v * x[c], axis=0) for c, v in zip(m.cols, m.vals)]
    parts.append(jnp.zeros(1, x.dtype))    # slot for empty rows
    y = jnp.concatenate(parts)[jnp.asarray(m.inv_ids)]
    return y if n_out is None or n_out == y.shape[0] else y[:n_out]


def sliced_waste(M) -> float:
    """Padding waste factor of the single-width ELL encoding of ``M``
    (max_width * n_rows / nnz) — the builder's criterion for preferring
    SlicedEll on width-skewed operators."""
    A = M.tocsr()
    counts = np.diff(A.indptr)
    if A.nnz == 0 or counts.size == 0:
        return 1.0
    return float(int(counts.max()) * A.shape[0]) / float(A.nnz)


def replicated(a, dtype, mesh=None):
    """Device vector from host array: replicated on ``mesh`` when given
    (jit inputs must live on the computation's device set), default
    placement otherwise."""
    if mesh is None:
        return jnp.asarray(a, dtype)
    from jax.sharding import NamedSharding, PartitionSpec

    return jax.device_put(np.asarray(a, dtype),
                          NamedSharding(mesh, PartitionSpec()))


def device_put_tree(tree, mesh=None):
    """Transfer every array leaf of ``tree`` in ONE batched jax.device_put
    (leaves must already be in their final dtypes — see module docstring).

    With a ``jax.sharding.Mesh``, each leaf's LARGEST axis is sharded over
    ALL mesh axes (slice-major on a 2-D multi-slice mesh, matching
    parallel.shards) when it splits evenly and is large enough (>= 2
    rows/device) — the row partition of every operator (EllMat (w, n)
    panels shard their n axis, 1-D index tables their length).  The jitted solves themselves are
    unchanged: GSPMD propagates the sharding through gather/segment-sum
    matvecs, all-gathers x once per matvec, and psums the CG dot products —
    the standard distributed-SpMV schedule, expressed as data placement
    only.  jax.device_put requires the sharded axis to divide evenly;
    panels meant to shard are padded at build time (build_ell pad_rows_to),
    and since the consumers are plain jit (no shard_map) any placement is
    semantically transparent, so "shard iff divisible" is always safe."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    if mesh is None:
        return jax.tree_util.tree_unflatten(treedef, jax.device_put(leaves))
    from jax.sharding import NamedSharding, PartitionSpec

    names = tuple(mesh.axis_names)
    axis = names if len(names) > 1 else names[0]
    repl = NamedSharding(mesh, PartitionSpec())

    def sharding(leaf):
        shape = np.shape(leaf)
        if not shape:
            return repl
        k = int(np.argmax(shape))
        if shape[k] >= 2 * mesh.size and shape[k] % mesh.size == 0:
            spec = [None] * len(shape)
            spec[k] = axis
            return NamedSharding(mesh, PartitionSpec(*spec))
        return repl

    out = jax.device_put(leaves, [sharding(l) for l in leaves])
    return jax.tree_util.tree_unflatten(treedef, out)
