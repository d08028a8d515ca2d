"""Paged-ELL SpMV: a Pallas TPU kernel for large unstructured FEM matvecs.

Why: XLA's gather-based ELL matvec (solve/ell.py) reads x with a fully
random 31.4M-element gather at knot scale and runs at ~123M elem/s on v5e
(measured 240 ms per CR matvec) — an effective ~1.5 GB/s, 2% of HBM
bandwidth, because every gathered element pays a full HBM transaction.

Structure recovered: sort the matrix entries into (output-tile, source-page)
"passes", where an output tile is 1024 consecutive rows (one (8,128) f32
VPU tile of y) and a source page is 1024 consecutive entries of x (one
(8,128) tile).  Each pass holds, for one output tile, at most one entry per
row sourced from one page (rows needing several entries from the same page
occupy several passes via a multiplicity index).  A pass then costs:

- stream in the pass's values (4 KB) and packed in-page indices (4 KB)
  — *sequential* HBM reads at full bandwidth;
- fetch the source x page (4 KB, one (8,128) VMEM block, double-buffered
  by the Pallas pipeline; consecutive passes hitting the same page are
  fetched once);
- an 8-step lane-gather: for each source sublane k,
  ``take_along_axis(page[k], lane_idx)`` + select — pure VPU work;
- FMA into the resident output tile (revisited across the tile's passes,
  written back once per tile).

With a locality-improving row/column ordering (the caller bakes e.g. a
Morton permutation into the matrix; tet/cr_solver does) the knot CR
operator packs into ~169k passes (~16% slot utilization), i.e. ~2 GB of
sequential traffic per matvec — bandwidth-bound at ~3 ms vs 240 ms.

Kernel form: ONE pallas_call per segment with an in-kernel fori over passes
and manual DMA double-buffering (_pipe_kernel) — value/index chunks and
metadata super-chunks stream HBM->VMEM/SMEM, x pages prefetch a few deep
with modulo scheduling, and the output tile accumulates in VMEM, flushing
on tile change.  Per-pass metadata packs into one int32
``local_tile << 20 | page`` word (SMEM-resident super-chunks).  Matrices
split into SEGMENTS of at most _SEG_TILES output tiles (the 11-bit
local_tile field) and _SEG_PASSES passes, concatenated on the way out.

Intended use: the big CR/vertex Step-3 operators and their AMG hierarchy
levels on a single chip (tet/cr_solver.py, tet/solver.py).  Multi-chip
solves keep the GSPMD ELL path (pallas_call does not partition under
GSPMD).  Reference counterpart: the CHOLMOD-factorized solves of
/root/reference/src/signed_heat_tet_solver.cpp:234-317 — same operators,
direct-factorization there, matrix-free iterative here.

Off the TPU backend ``matvec`` computes the identical pass decomposition
with plain XLA ops (page gather + take_along_axis + sorted segment-sum) —
the packing and arithmetic are exercised by the CPU test suite, the Mosaic
kernel itself by small interpret-mode tests (set ``FORCE_INTERPRET``) and
on the chip.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils import treestore
from . import ell

PAGE = 1024                 # entries per x page / rows per output tile
_SEG_TILES = 2048           # local_tile must fit in 11 bits (i32 sign-safe)
_SEG_PASSES = 150_000       # ~600 KB of i32 scalar-prefetch per call
_PAGE_BITS = 20             # page must fit below the local_tile field

# Compiled kernels are keyed by the static shape triple (T, n_tiles,
# n_source_pages); segments are BUCKETED — pass counts and tile/page counts
# round up to a coarse geometric grid — so similarly-sized operators
# (across AMG levels, meshes, assets) reuse a compiled kernel and the
# persistent compile cache.  Padding costs dummy passes (zero values,
# page 0, last tile) — bandwidth, not correctness.
_T_BUCKETS_BASE = 1024


def _bucket(n: int, base: int = _T_BUCKETS_BASE) -> int:
    """Smallest base * 1.5^k >= n, rounded up to a 1024 multiple (the
    pipelined kernel's meta super-chunk size; coarse geometric grid)."""
    b = base
    while b < n:
        b = int(b * 3 // 2)
    return -(-b // 1024) * 1024


def _bucket_pow2(n: int) -> int:
    b = 1
    while b < n:
        b <<= 1
    return b

#: test hook — run the Mosaic kernel in the Pallas interpreter even off-TPU
#: (the interpreter steps the grid one pass at a time; fine for tiny
#: matrices, minutes for real ones — the XLA fallback is the default there)
FORCE_INTERPRET = False


@functools.partial(jax.tree_util.register_dataclass,
                   data_fields=["vals", "idx", "meta", "nT"],
                   meta_fields=["t0", "n_tiles"])
@dataclasses.dataclass(frozen=True)
class PagedSeg:
    """One kernel launch worth of passes, covering output tiles
    [t0, t0 + n_tiles)."""

    vals: jnp.ndarray   # (T, 8, 128) compute dtype, slot = row % 1024
    idx: jnp.ndarray    # (T, 8, 128) int32, col % 1024 (sublane*128 + lane)
    meta: jnp.ndarray   # (T,) int32, (local_tile << 20) | page
    nT: jnp.ndarray     # (1,) int32 == T as a RUNTIME value: feeding the
                        # kernel's loop bounds a trace-time constant lets
                        # the compiler specialize on it — measured 151 s
                        # Mosaic compile vs 4.5 s with a dynamic bound
    t0: int
    n_tiles: int


def _pack_seg(s: PagedSeg) -> dict:
    """Compact on-disk form: the pass panels are ~16%-occupied dense slots;
    store only the occupied ones (int16 in-page indices) and re-scatter at
    load — ~4.4x smaller artifacts at knot scale for a ~1 s load scatter."""
    v = np.asarray(s.vals).reshape(-1)
    nz = np.flatnonzero(v).astype(np.int32)
    return dict(T=int(s.vals.shape[0]), t0=int(s.t0),
                n_tiles=int(s.n_tiles), dt=str(np.asarray(s.vals).dtype),
                meta=np.asarray(s.meta),
                pos=nz, val=v[nz],
                idx=np.asarray(s.idx).reshape(-1)[nz].astype(np.int16))


def _unpack_seg(d: dict) -> PagedSeg:
    T = int(d["T"])
    vals = np.zeros(T * PAGE, np.dtype(d["dt"]))
    idx = np.zeros(T * PAGE, np.int32)
    pos = np.asarray(d["pos"])
    vals[pos] = d["val"]
    idx[pos] = np.asarray(d["idx"], np.int32)
    return PagedSeg(vals.reshape(T, 8, 128), idx.reshape(T, 8, 128),
                    np.asarray(d["meta"]), np.array([T], np.int32),
                    int(d["t0"]), int(d["n_tiles"]))


treestore.register_packed(PagedSeg, _pack_seg, _unpack_seg)


@treestore.register
@functools.partial(jax.tree_util.register_dataclass,
                   data_fields=["segs"],
                   meta_fields=["n_rows", "n_cols", "cols_pad", "nnz"])
@dataclasses.dataclass(frozen=True)
class PagedMat:
    segs: Tuple[PagedSeg, ...]
    n_rows: int
    n_cols: int
    cols_pad: int        # bucketed source length (x is zero-padded to it)
    nnz: int

    @property
    def n_rows_pad(self) -> int:
        return sum(s.n_tiles for s in self.segs) * PAGE

    @property
    def n_passes(self) -> int:
        return sum(int(s.meta.shape[0]) for s in self.segs)


def build_paged(M, dtype=np.float32) -> PagedMat:
    """Host-side pass decomposition of any scipy sparse matrix.

    The caller is responsible for ordering: pass counts (and hence matvec
    cost) track how well consecutive rows read consecutive columns — apply
    a locality permutation (Morton on element positions, or RCM) to the
    matrix FIRST.  Vectorized packed-key sorts throughout (np.lexsort and
    np.add.at are ~10x slower on this host)."""
    import scipy.sparse as sp  # noqa: F401  (type availability)

    A = M.tocsr()
    A.sum_duplicates()
    A.sort_indices()
    n, m = A.shape
    if m > (1 << (_PAGE_BITS + 10)):
        raise ValueError(f"paged matvec supports up to 2^30 columns, got {m}")
    counts = np.diff(A.indptr)
    nnz = int(A.indices.size)
    if nnz >= (1 << 31):
        # pass ids are int32 (build below) and the meta word packs
        # 11-bit tiles + 20-bit pages; far beyond any target operator
        raise ValueError(f"paged matvec supports < 2^31 nonzeros, got {nnz}")
    n_tiles = max(1, -(-n // PAGE))
    n_pages = max(1, -(-m // PAGE))
    cols_pad = _bucket_pow2(n_pages) * PAGE
    if nnz == 0:
        segs = tuple(_empty_seg(t0, min(_SEG_TILES, n_tiles - t0), dtype)
                     for t0 in range(0, n_tiles, _SEG_TILES))
        return PagedMat(segs, n, m, cols_pad, 0)

    rows = np.repeat(np.arange(n, dtype=np.int64), counts)
    cols = A.indices.astype(np.int64)
    page = cols >> 10
    # multiplicity within each (row, page) group — CSR order makes the
    # groups contiguous, so group-start repeats suffice (np.repeat of the
    # start offsets beats a maximum.accumulate scan ~2x on this host)
    grp = rows * n_pages + page
    new = np.ones(nnz, bool)
    new[1:] = grp[1:] != grp[:-1]
    starts_g = np.flatnonzero(new)
    sizes_g = np.diff(np.append(starts_g, nnz))
    mult = np.arange(nnz, dtype=np.int64) - np.repeat(starts_g, sizes_g)
    # pass identity (tile, page, mult), sorted; tile order is already
    # ascending in CSR, so sorting the packed key keeps tile runs contiguous
    tile = rows >> 10
    key = (tile * n_pages + page) * PAGE + mult
    order = np.argsort(key, kind="stable")
    ks = key[order]
    new2 = np.ones(nnz, bool)
    new2[1:] = ks[1:] != ks[:-1]
    # int32 cumsum is ~20x faster than the int64 default on this host;
    # pass ids fit easily (T <= nnz < 2^31)
    pass_id = np.cumsum(new2, dtype=np.int32) - 1
    T = int(pass_id[-1]) + 1

    vals3 = np.zeros((T, PAGE), dtype)
    idx3 = np.zeros((T, PAGE), np.int32)
    e = (rows[order] & 1023).astype(np.int32)
    vals3[pass_id, e] = A.data[order].astype(dtype)
    idx3[pass_id, e] = (cols[order] & 1023).astype(np.int32)
    starts_p = np.flatnonzero(new2)  # first sorted entry of each pass:
    pass_tile = tile[order[starts_p]]  # a T-sized gather, not a 31M scatter
    pass_page = page[order[starts_p]]

    # tiles with no entries (possible for rectangular/padded shapes) still
    # need one zero pass so their output block is initialized
    present = np.zeros(n_tiles, bool)
    present[pass_tile] = True
    missing = np.flatnonzero(~present)
    if missing.size:
        vals3 = np.concatenate([vals3, np.zeros((missing.size, PAGE), dtype)])
        idx3 = np.concatenate([idx3, np.zeros((missing.size, PAGE), np.int32)])
        pass_tile = np.concatenate([pass_tile, missing])
        pass_page = np.concatenate([pass_page, np.zeros(missing.size, np.int64)])
        order2 = np.argsort(pass_tile, kind="stable")
        vals3, idx3 = vals3[order2], idx3[order2]
        pass_tile, pass_page = pass_tile[order2], pass_page[order2]
        T += missing.size

    # segment at tile-run boundaries: <= _SEG_TILES tiles AND <= _SEG_PASSES
    # passes per segment (SMEM + i32 packing limits), then pad each segment
    # to the compile-shape buckets (module docstring above _bucket)
    run_start = np.ones(T, bool)
    run_start[1:] = pass_tile[1:] != pass_tile[:-1]
    starts = np.flatnonzero(run_start)          # first pass of each tile
    start_tiles = pass_tile[starts]
    segs = []
    s_pass = 0
    s_tile_i = 0  # index into starts
    while s_pass < T:
        t0 = int(start_tiles[s_tile_i])
        # furthest tile-run start within both budgets
        j = s_tile_i
        while (j + 1 < starts.size
               and int(start_tiles[j + 1]) - t0 < _SEG_TILES
               and int(starts[j + 1]) - s_pass < _SEG_PASSES):
            j += 1
        e_pass = int(starts[j + 1]) if j + 1 < starts.size else T
        t_end = int(start_tiles[j]) + 1
        segs.append(_make_seg(vals3[s_pass:e_pass], idx3[s_pass:e_pass],
                              pass_tile[s_pass:e_pass] - t0,
                              pass_page[s_pass:e_pass], t0, t_end - t0,
                              dtype))
        s_pass = e_pass
        s_tile_i = j + 1
    # Coverage invariant the matvec concatenation relies on: segments tile
    # [0, n_tiles) contiguously and without overlap in their REAL spans
    # (seg.n_tiles is the pow2-padded count; the real span of a non-final
    # segment is next.t0 - seg.t0, and matvec slices its output to that).
    t0s = [s.t0 for s in segs] + [n_tiles]
    for k, s in enumerate(segs):
        real = t0s[k + 1] - s.t0
        if real <= 0 or real > s.n_tiles:
            raise AssertionError(
                f"segment {k} covers [{s.t0}, {s.t0}+{real}) with padded "
                f"n_tiles={s.n_tiles} — non-contiguous pass decomposition")
    return PagedMat(tuple(segs), n, m, cols_pad, nnz)


def _make_seg(vals3, idx3, local_tile, page, t0: int, n_tiles: int,
              dtype) -> PagedSeg:
    """Assemble one segment, padding tiles and passes to compile buckets
    (dummy passes: zero values, page 0; padding tiles each get one
    zero-initializing pass)."""
    nt_b = min(_bucket_pow2(n_tiles), _SEG_TILES)
    Tr = vals3.shape[0]
    extra_tiles = nt_b - n_tiles
    T_b = _bucket(Tr + extra_tiles)
    pad_n = T_b - Tr
    meta = np.empty(T_b, np.int32)
    meta[:Tr] = (local_tile.astype(np.int64) << _PAGE_BITS | page).astype(np.int32)
    # one pass per padding tile (zero-initializes its output block), then
    # repeat the last padding tile (or the last real tile) for the rest
    pad_tiles = np.concatenate([
        np.arange(n_tiles, nt_b, dtype=np.int64),
        np.full(pad_n - extra_tiles, nt_b - 1 if extra_tiles
                else int(local_tile[-1]) if Tr else 0, np.int64),
    ])
    meta[Tr:] = (pad_tiles << _PAGE_BITS).astype(np.int32)
    vals_p = np.zeros((T_b, PAGE), dtype)
    vals_p[:Tr] = vals3
    idx_p = np.zeros((T_b, PAGE), np.int32)
    idx_p[:Tr] = idx3
    return PagedSeg(vals_p.reshape(-1, 8, 128), idx_p.reshape(-1, 8, 128),
                    meta, np.array([T_b], np.int32), t0, nt_b)


def _empty_seg(t0: int, n_tiles: int, dtype) -> PagedSeg:
    # one zeroing pass per tile, then the usual bucket padding
    z = np.zeros((n_tiles, PAGE), dtype)
    return _make_seg(z, z.astype(np.int32),
                     np.arange(n_tiles, dtype=np.int64),
                     np.zeros(n_tiles, np.int64), t0, n_tiles, dtype)


# Pipeline geometry of the Mosaic kernel (see _pipe_kernel): values/indices
# stream in CH-pass chunks (double-buffered VMEM), pass metadata in
# 4*CH-pass super-chunks (1-D int32 HBM->SMEM DMAs must slice on 1024
# boundaries), x pages prefetch XD deep with modulo scheduling.
_CH = 256
_MCH = 4 * _CH
_XD = 8


def _pipe_kernel(nT_ref, meta_hbm, x_hbm, v_hbm, i_hbm, o_hbm,
                 meta_s, vbuf, ibuf, xbuf, acc, csem, xsem, osem, msem):
    """Whole-matrix SpMV in ONE kernel invocation: an in-kernel fori over
    passes with manual DMA double-buffering.

    Why not a Pallas grid over passes with scalar-prefetch index maps (the
    first design): its Mosaic compile cost scales with the pass count —
    measured 52 s at T=18k and 300 s at T=169k PER EMBEDDED INSTANCE, and a
    CG+V-cycle chunk program embeds the kernels ~10 times (the knot Step-3
    compile never returned in 30 minutes).  This form compiles the loop
    body once: 4.5 s cold at T=18k, independent of T — and runs ~2x faster
    (2.7 ms at T=18k = 6.8M passes/s vs 3.45M/s: the per-grid-step pipeline
    overhead exceeded the pass's actual VPU work).

    Output tiles accumulate in VMEM and flush synchronously on tile change
    (~1 flush per ~60 passes; the wait amortizes to noise).  Dummy passes
    (zero values) pad T to a _MCH multiple."""
    n_ch = nT_ref[0] // _CH
    n_m = nT_ref[0] // _MCH

    def meta_copy(s, slot):
        return pltpu.make_async_copy(
            meta_hbm.at[pl.ds(s * _MCH, _MCH)],
            meta_s.at[pl.ds(slot * _MCH, _MCH)], msem.at[slot])

    def chunk_copies(c, slot):
        return (pltpu.make_async_copy(v_hbm.at[pl.ds(c * _CH, _CH)],
                                      vbuf.at[slot], csem.at[slot, 0]),
                pltpu.make_async_copy(i_hbm.at[pl.ds(c * _CH, _CH)],
                                      ibuf.at[slot], csem.at[slot, 1]))

    def x_copy(page, slot):
        return pltpu.make_async_copy(x_hbm.at[pl.ds(page * 8, 8)],
                                     xbuf.at[slot], xsem.at[slot])

    mask = (1 << _PAGE_BITS) - 1
    meta_copy(0, 0).start()
    for dma in chunk_copies(0, 0):
        dma.start()

    def outer(c, cur_tile):
        slot = c % 2
        sc = c // 4
        mslot = sc % 2

        @pl.when(c + 1 < n_ch)
        def _():
            for dma in chunk_copies(c + 1, (c + 1) % 2):
                dma.start()

        @pl.when(c % 4 == 0)
        def _():
            meta_copy(sc, mslot).wait()

            @pl.when(sc + 1 < n_m)
            def _():
                meta_copy(sc + 1, 1 - mslot).start()

        for dma in chunk_copies(c, slot):
            dma.wait()
        base = mslot * _MCH + (c % 4) * _CH

        # prologue: prefetch the first _XD pages of this chunk
        for d in range(_XD):
            x_copy(meta_s[base + d] & mask, d).start()

        def inner(j, cur_tile):
            word = meta_s[base + j]
            tile = word >> _PAGE_BITS
            xslot = j % _XD

            @pl.when(tile != cur_tile)
            def _():
                @pl.when(cur_tile >= 0)
                def _():
                    dma = pltpu.make_async_copy(
                        acc, o_hbm.at[pl.ds(cur_tile * 8, 8)], osem)
                    dma.start()
                    dma.wait()
                acc[...] = jnp.zeros((8, 128), acc.dtype)

            x_copy(word & mask, xslot).wait()
            pagev = xbuf[xslot]

            # prefetch for pass j+_XD into the slot just freed
            @pl.when(j + _XD < _CH)
            def _():
                x_copy(meta_s[base + j + _XD] & mask, xslot).start()

            idx = ibuf[slot, j]
            lane = idx & 127
            sub = idx >> 7
            a = jnp.zeros((8, 128), acc.dtype)
            for k in range(8):
                rowk = jnp.broadcast_to(pagev[k, :][None, :], (8, 128))
                a = a + jnp.where(sub == k,
                                  jnp.take_along_axis(rowk, lane, axis=1), 0.0)
            acc[...] = acc[...] + vbuf[slot, j] * a
            return tile

        return jax.lax.fori_loop(0, _CH, inner, cur_tile)

    cur_tile = jax.lax.fori_loop(0, n_ch, outer, jnp.int32(-1))

    @pl.when(cur_tile >= 0)
    def _():
        dma = pltpu.make_async_copy(acc, o_hbm.at[pl.ds(cur_tile * 8, 8)],
                                    osem)
        dma.start()
        dma.wait()


def _seg_matvec_xla(seg: PagedSeg, x3: jnp.ndarray) -> jnp.ndarray:
    """Reference/off-TPU path: identical pass semantics in plain XLA."""
    T = seg.vals.shape[0]
    page_mask = (1 << _PAGE_BITS) - 1
    pages = seg.meta & page_mask
    tiles = seg.meta >> _PAGE_BITS
    xp = x3.reshape(-1, PAGE)[pages]                       # (T, 1024)
    g = jnp.take_along_axis(xp, seg.idx.reshape(T, PAGE), axis=1)
    contrib = seg.vals.reshape(T, PAGE) * g
    y = jax.ops.segment_sum(contrib, tiles, num_segments=seg.n_tiles,
                            indices_are_sorted=True)
    return y.reshape(seg.n_tiles * 8, 128)


def _seg_matvec(seg: PagedSeg, x3: jnp.ndarray) -> jnp.ndarray:
    if jax.default_backend() != "tpu" and not FORCE_INTERPRET:
        return _seg_matvec_xla(seg, x3)
    T = seg.vals.shape[0]
    if T % _MCH:
        raise ValueError(
            f"segment pass count {T} not a multiple of {_MCH} — artifact "
            "built by an older pell version; rebuild the operator cache")
    n_tiles = seg.n_tiles
    nbytes = seg.vals.dtype.itemsize
    return pl.pallas_call(
        _pipe_kernel,
        grid=(),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((n_tiles * 8, 128), seg.vals.dtype),
        scratch_shapes=[
            pltpu.SMEM((2 * _MCH,), jnp.int32),
            pltpu.VMEM((2, _CH, 8, 128), seg.vals.dtype),
            pltpu.VMEM((2, _CH, 8, 128), jnp.int32),
            pltpu.VMEM((_XD, 8, 128), seg.vals.dtype),
            pltpu.VMEM((8, 128), seg.vals.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((_XD,)),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=T * PAGE * 2 * 8,
            bytes_accessed=T * PAGE * (2 * nbytes + 4 + nbytes),
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=FORCE_INTERPRET and jax.default_backend() != "tpu",
    )(seg.nT, seg.meta, x3, seg.vals, seg.idx)


def matvec(p: PagedMat, x: jnp.ndarray, n_out: int | None = None) -> jnp.ndarray:
    """y = P @ x (jit-safe; segment structure is static)."""
    n = p.n_rows if n_out is None else n_out
    pad = p.cols_pad - x.shape[0]
    x3 = (jnp.pad(x, (0, pad)) if pad else x).reshape(-1, 128)
    # Each segment's output is padded to seg.n_tiles (pow2-bucketed) tiles;
    # its REAL span runs only to the next segment's t0.  Slice the padding
    # off before concatenating or every later row lands at a shifted offset
    # (the padded rows hold zeros from the padding passes, so dropping them
    # is exact).
    parts = []
    for k, s in enumerate(p.segs):
        y = _seg_matvec(s, x3)
        if k + 1 < len(p.segs):
            y = y[: (p.segs[k + 1].t0 - s.t0) * 8]
        parts.append(y)
    y = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)
    return y.reshape(-1)[:n]


def apply(op, x: jnp.ndarray, n_out: int | None = None) -> jnp.ndarray:
    """y = op @ x for any operator encoding (ell.EllMat, ell.SlicedEll or
    PagedMat) — the solve/preconditioner code paths hold whichever the
    builder chose."""
    if isinstance(op, PagedMat):
        return matvec(op, x, n_out)
    if isinstance(op, ell.SlicedEll):
        return ell.sliced_matvec(op, x, n_out=n_out)
    return ell.matvec(op, x, n_out=n_out)
