"""Block-sparse (distance-culled) Yukawa summation for grid queries.

The Yukawa kernel exp(-lam r)/r decays exponentially with rate lam =
sqrt(1/t), and t = tCoef * h^2 with h the source spacing — so for fine
sources the kernel's support is a thin shell around the surface.  The
reference evaluates all O(Q x S) pairs anyway
(/root/reference/src/signed_heat_grid_solver.cpp:157-174; README.md:77-81
lists "hierarchical summation techniques" as future work).  Because Step 2
normalizes X per query, only contributions *relative to the nearest source*
matter: a source block whose box distance d to a query brick satisfies
lam * (d - d_near) > tau = ln(1/cull_eps) is provably below cull_eps relative
weight and can be skipped.

Decomposition (the block-sparse flash-attention pattern):

- grid nodes are reordered into 8x8x8 spatial *bricks* (512 queries, one
  VMEM tile; bricks tile the cube exactly since n = 16 * 2^h);
- sources are Morton-sorted and chunked into *blocks* with tight bboxes;
- the host builds a CSR list of surviving (brick, block) pairs at operator-
  cache build time;
- a Pallas kernel walks the pair list (1-D grid, scalar-prefetch indices
  choosing the query brick / source block / accumulator phase per step),
  streaming blocks through each brick with the same running-min-exponent
  rescaling as the dense kernel (shm3d.ops.yukawa).

Per-brick results are bitwise independent of which far blocks were culled up
to the cull_eps relative tolerance (default 0 = dense/exact).

Measured tradeoff (TPU v5e, SprayBottle 52k sources, eps=1e-6): the exact
per-query culling floor is ~10% of pairs, but the brick-granular criterion
pays Lipschitz slop proportional to the brick diagonal (~17 decay lengths
at 128^3), keeping 47-55% of blocks; and the SMEM pair-list cap forces the
plan into 19-33 pallas calls whose launch overhead eats most of the win
(128^3: culled 1.6 s vs dense 1.0 s — negative; 256^3: culled 6.3 s vs
dense 7.6 s — a 1.2x win).  The sparse path therefore stays OPT-IN
(options.cull_eps > 0); closing the gap to the 10% floor needs a kernel
that streams pair indices from HBM with manual DMA instead of SMEM scalar
prefetch (planned).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .yukawa import _BIG, _FAR

BRICK = 8  # nodes per axis per query brick (8^3 = 512 = one tile)

# TPU SMEM is 1 MiB and must hold ALL scalar-prefetched operands of a
# pallas_call.  Each pair costs 3 int32 entries (brick, block, flags) = 12 B;
# cap a single call's pair list well under the budget and split longer plans
# into multiple calls (round 1 shipped an unchecked single call and crashed
# compilation at 128^3 with a ~280k-entry pair list: "Allocation would exceed
# memory, space=smem").
SMEM_PAIR_CAP = 49152  # 12 B * 49152 = 576 KiB of SMEM per call


# ---------------------------------------------------------------------------
# host-side plan construction (operator-cache artifact)


@dataclasses.dataclass
class CullingPlan:
    """Precomputed launch plan for one (grid, sources, lam, eps) tuple."""

    qperm: np.ndarray        # (N,) node index per brick-ordered query slot
    qinv: np.ndarray         # (N,) inverse permutation
    src_perm: np.ndarray     # (S,) Morton sort of sources
    s_block: int
    n_blocks: int            # number of source blocks (padded chunks)
    pair_brick: np.ndarray   # (P,) brick id per pair, sorted by brick
    pair_block: np.ndarray   # (P,) source block id per pair
    pair_flags: np.ndarray   # (P,) bit0 = first pair of brick, bit1 = last
    kept_fraction: float     # retained share of the dense pair grid
    _seg_cache: Optional[tuple] = None  # (cap, segments, nb_cap)

    @property
    def n_pairs(self) -> int:
        return int(self.pair_brick.shape[0])

    def fits_smem(self, cap: int = SMEM_PAIR_CAP) -> bool:
        """True when the whole pair list fits one pallas_call's SMEM."""
        return self.n_pairs <= cap

    def segments(self, cap: int = SMEM_PAIR_CAP):
        """Split the brick-sorted pair list into runs of <= cap pairs at
        brick boundaries (a brick's accumulator lives in per-call scratch, so
        its whole run must stay within one call).  Each segment is padded to
        exactly ``cap`` pairs with no-op entries (flags=0 repeats of the last
        pair, accumulated after the brick's output was already written) so
        every call shares one compiled program.  Returns (segments, nb_cap):
        segments are dicts with keys br_lo/nb/brick/block/flags, nb_cap is
        the fixed per-call brick count."""
        if self._seg_cache is not None and self._seg_cache[0] == cap:
            return self._seg_cache[1], self._seg_cache[2]
        ranges = _split_at_brick_boundaries(self.pair_brick, cap)
        segs = []
        for a, b in ranges:
            br = self.pair_brick[a:b]
            bl = self.pair_block[a:b]
            fl = self.pair_flags[a:b]
            br_lo = int(br[0])
            nb = int(br[-1]) - br_lo + 1
            pad = cap - (b - a)
            segs.append(
                dict(
                    br_lo=br_lo,
                    nb=nb,
                    brick=np.concatenate(
                        [br - br_lo, np.full(pad, br[-1] - br_lo, np.int32)]
                    ).astype(np.int32),
                    block=np.concatenate([bl, np.full(pad, bl[-1], np.int32)]).astype(np.int32),
                    flags=np.concatenate([fl, np.zeros(pad, np.int32)]).astype(np.int32),
                )
            )
        nb_cap = max(s["nb"] for s in segs)
        self._seg_cache = (cap, segs, nb_cap)
        return segs, nb_cap


def _split_at_brick_boundaries(pair_brick: np.ndarray, cap: int):
    """(start, end) ranges of <= cap pairs, never splitting a brick's run."""
    P = pair_brick.shape[0]
    run_starts = np.flatnonzero(
        np.concatenate([[True], pair_brick[1:] != pair_brick[:-1]])
    ).tolist() + [P]
    ranges = []
    seg_start = 0
    for i in range(len(run_starts) - 1):
        run_begin, run_end = run_starts[i], run_starts[i + 1]
        if run_end - seg_start > cap:
            if run_begin == seg_start:
                raise ValueError(
                    f"one query brick interacts with {run_end - run_begin} source "
                    f"blocks > SMEM pair cap {cap}; use the dense kernel"
                )
            ranges.append((seg_start, run_begin))
            seg_start = run_begin
            if run_end - seg_start > cap:
                raise ValueError(
                    f"one query brick interacts with {run_end - run_begin} source "
                    f"blocks > SMEM pair cap {cap}; use the dense kernel"
                )
    ranges.append((seg_start, P))
    return ranges


def _morton3(cells: np.ndarray, bits: int = 10) -> np.ndarray:
    """Interleave the bits of (M, 3) non-negative cell coords."""
    out = np.zeros(cells.shape[0], dtype=np.uint64)
    c = cells.astype(np.uint64)
    for b in range(bits):
        for axis in range(3):
            out |= ((c[:, axis] >> np.uint64(b)) & np.uint64(1)) << np.uint64(3 * b + axis)
    return out


def _box_min_dist(lo1, hi1, lo2, hi2) -> np.ndarray:
    """Min distance between axis-aligned boxes, broadcast over leading dims."""
    gap = np.maximum(0.0, np.maximum(lo2 - hi1, lo1 - hi2))
    return np.sqrt(np.sum(gap * gap, axis=-1))


def _box_max_dist(lo1, hi1, lo2, hi2) -> np.ndarray:
    """Max distance between points of two axis-aligned boxes."""
    span = np.maximum(np.abs(hi2 - lo1), np.abs(hi1 - lo2))
    return np.sqrt(np.sum(span * span, axis=-1))


def build_plan(
    grid,
    src_points: np.ndarray,
    lam: float,
    cull_eps: float,
    s_block: int = 512,
    tau_margin: float = 2.0,
) -> CullingPlan:
    """CSR pair list for the culled kernel.  ``grid`` is a GridSpec with
    n % BRICK == 0."""
    n = grid.n
    assert n % BRICK == 0, f"grid n={n} not divisible by brick {BRICK}"
    nb = n // BRICK
    cell = grid.cell_size
    bmin = np.asarray(grid.bbox_min)

    # brick-ordered query permutation: brick (bz, by, bx) -> its 512 nodes
    k = np.arange(n)
    # node flat index i + j*n + k*n^2 for brick-major ordering
    KK, JJ, II = np.meshgrid(k, k, k, indexing="ij")  # [k, j, i]
    brick_of = (II // BRICK) + (JJ // BRICK) * nb + (KK // BRICK) * nb * nb
    flat = II + JJ * n + KK * n * n
    order = np.argsort(brick_of.reshape(-1), kind="stable")
    qperm = flat.reshape(-1)[order]
    qinv = np.empty_like(qperm)
    qinv[qperm] = np.arange(qperm.shape[0])

    # brick bboxes (num_bricks, 3)
    b = np.arange(nb)
    BZ, BY, BX = np.meshgrid(b, b, b, indexing="ij")
    blo = np.stack([BX, BY, BZ], axis=-1).reshape(-1, 3) * (BRICK * cell) + bmin
    bhi = blo + (BRICK - 1) * cell

    # Morton-sorted source blocks
    S = src_points.shape[0]
    cells = np.clip(((src_points - bmin) / cell).astype(np.int64), 0, n - 1)
    src_perm = np.argsort(_morton3(cells), kind="stable")
    pts = src_points[src_perm]
    n_blocks = -(-S // s_block)
    Sp = n_blocks * s_block
    pad = Sp - S
    if pad:
        pts_pad = np.concatenate([pts, np.full((pad, 3), _FAR)], axis=0)
    else:
        pts_pad = pts
    pb = pts_pad.reshape(n_blocks, s_block, 3)
    # padded entries sit at _FAR; exclude them from the bbox of the last block
    slo = np.minimum.reduce(np.where(pb < _FAR / 2, pb, np.inf), axis=1)
    shi = np.maximum.reduce(np.where(pb < _FAR / 2, pb, -np.inf), axis=1)

    d = _box_min_dist(blo[:, None, :], bhi[:, None, :], slo[None, :, :], shi[None, :, :])
    if cull_eps > 0:
        # Conservative per-brick criterion: for EVERY query q in the brick,
        # its nearest-source distance is at most
        #   u = min over blocks of maxdist(brick box, block bbox),
        # while its distance to a culled block is at least the box min-dist.
        # Keeping blocks with lam * (d - u) <= tau bounds each culled term at
        # exp(-tau) relative to the per-query dominant term.  (Using the box
        # *min*-dist for u instead would over-cull queries at brick corners.)
        tau = np.log(1.0 / cull_eps) + tau_margin
        from scipy.spatial import cKDTree

        centers = 0.5 * (blo + bhi)
        brick_rad = 0.5 * np.linalg.norm(bhi[0] - blo[0])
        nn, _ = cKDTree(src_points).query(centers, k=1)[0], None
        u = (nn + brick_rad)[:, None]
        keep = lam * (d - u) <= tau
    else:
        keep = np.ones_like(d, dtype=bool)

    pair_brick, pair_block = np.nonzero(keep)  # row-major: sorted by brick
    P = pair_brick.shape[0]
    first = np.zeros(P, dtype=np.int32)
    last = np.zeros(P, dtype=np.int32)
    change = np.diff(pair_brick)
    first[0] = 1
    first[1:][change != 0] = 1
    last[-1] = 1
    last[:-1][change != 0] = 1
    flags = first | (last << 1)
    return CullingPlan(
        qperm=qperm.astype(np.int32),
        qinv=qinv.astype(np.int32),
        src_perm=src_perm.astype(np.int32),
        s_block=s_block,
        n_blocks=n_blocks,
        pair_brick=pair_brick.astype(np.int32),
        pair_block=pair_block.astype(np.int32),
        pair_flags=flags.astype(np.int32),
        kept_fraction=float(P) / float(d.size),
    )


def build_plan_points(
    queries: np.ndarray,
    src_points: np.ndarray,
    lam: float,
    cull_eps: float,
    s_block: int = 512,
    tau_margin: float = 2.0,
) -> CullingPlan:
    """Culling plan for an arbitrary query point set (tet barycenters):
    queries are Morton-sorted and chunked into bricks of BRICK^3 points with
    data-dependent bboxes; everything else matches ``build_plan``.  Queries
    are padded (by repeating the last point) to a brick multiple; the padded
    slots are sliced away by yukawa_field_sparse via qinv covering only the
    original N entries."""
    from scipy.spatial import cKDTree

    queries = np.asarray(queries, dtype=np.float64)
    N = queries.shape[0]
    bs = BRICK ** 3
    lo = queries.min(axis=0)
    span = np.maximum(queries.max(axis=0) - lo, 1e-30)
    cells = np.clip((1023 * (queries - lo) / span).astype(np.int64), 0, 1023)
    qorder = np.argsort(_morton3(cells), kind="stable")
    Np = -(-N // bs) * bs
    qperm = np.concatenate([qorder, np.full(Np - N, qorder[-1], dtype=np.int64)])
    qinv = np.empty(N, dtype=np.int64)
    qinv[qorder] = np.arange(N)

    qb = queries[qperm].reshape(-1, bs, 3)
    blo = qb.min(axis=1)
    bhi = qb.max(axis=1)
    centers = 0.5 * (blo + bhi)
    brick_rad = np.linalg.norm(qb - centers[:, None, :], axis=2).max(axis=1)

    S = src_points.shape[0]
    scells = np.clip((1023 * (src_points - lo) / span).astype(np.int64), 0, 1023)
    src_perm = np.argsort(_morton3(scells), kind="stable")
    pts = src_points[src_perm]
    n_blocks = -(-S // s_block)
    pad = n_blocks * s_block - S
    pts_pad = np.concatenate([pts, np.full((pad, 3), _FAR)], axis=0) if pad else pts
    pb = pts_pad.reshape(n_blocks, s_block, 3)
    slo = np.minimum.reduce(np.where(pb < _FAR / 2, pb, np.inf), axis=1)
    shi = np.maximum.reduce(np.where(pb < _FAR / 2, pb, -np.inf), axis=1)

    d = _box_min_dist(blo[:, None, :], bhi[:, None, :], slo[None, :, :], shi[None, :, :])
    if cull_eps > 0:
        tau = np.log(1.0 / cull_eps) + tau_margin
        nn = cKDTree(src_points).query(centers, k=1)[0]
        u = (nn + brick_rad)[:, None]
        keep = lam * (d - u) <= tau
    else:
        keep = np.ones_like(d, dtype=bool)

    pair_brick, pair_block = np.nonzero(keep)
    P = pair_brick.shape[0]
    first = np.zeros(P, dtype=np.int32)
    last = np.zeros(P, dtype=np.int32)
    change = np.diff(pair_brick)
    first[0] = 1
    first[1:][change != 0] = 1
    last[-1] = 1
    last[:-1][change != 0] = 1
    return CullingPlan(
        qperm=qperm.astype(np.int32),
        qinv=qinv.astype(np.int32),
        src_perm=src_perm.astype(np.int32),
        s_block=s_block,
        n_blocks=n_blocks,
        pair_brick=pair_brick.astype(np.int32),
        pair_block=pair_block.astype(np.int32),
        pair_flags=(first | (last << 1)).astype(np.int32),
        kept_fraction=float(P) / float(d.size),
    )


# ---------------------------------------------------------------------------
# Pallas kernel


def _sparse_kernel(brick_ref, block_ref, flags_ref, lam_ref, q_ref, sp_ref, sv_ref,
                   out_ref, m_ref, acc_ref, *, normalize):
    p = pl.program_id(0)
    flags = flags_ref[p]

    @pl.when((flags & 1) == 1)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, _BIG)

    lam = lam_ref[0]
    dx = q_ref[:, 0:1] - sp_ref[0:1, :]
    dy = q_ref[:, 1:2] - sp_ref[1:2, :]
    dz = q_ref[:, 2:3] - sp_ref[2:3, :]
    b = lam * jnp.sqrt(dx * dx + dy * dy + dz * dz)
    m_old = m_ref[:]
    m_new = jnp.minimum(m_old, jnp.min(b, axis=1, keepdims=True))
    w = jnp.exp(m_new - b) * (lam / b)
    contrib = jnp.concatenate(
        [
            jnp.sum(w * sv_ref[0:1, :], axis=1, keepdims=True),
            jnp.sum(w * sv_ref[1:2, :], axis=1, keepdims=True),
            jnp.sum(w * sv_ref[2:3, :], axis=1, keepdims=True),
        ],
        axis=1,
    )
    rescale = jnp.where(m_old >= _BIG, 0.0, jnp.exp(m_new - m_old))
    acc_ref[:] = acc_ref[:] * rescale + contrib
    m_ref[:] = m_new

    @pl.when((flags & 2) == 2)
    def _():
        X = acc_ref[:]
        if normalize:
            norm = jnp.sqrt(jnp.sum(X * X, axis=1, keepdims=True))
            out_ref[:] = X / norm
        else:
            out_ref[:] = X * jnp.exp(-m_ref[:])


@functools.partial(
    jax.jit,
    static_argnames=("n_pairs", "num_bricks", "s_block", "normalize", "interpret"),
)
def _sparse_call(
    pair_brick, pair_block, pair_flags, lam_arr, q_sorted, sp_t, sv_t,
    n_pairs: int, num_bricks: int, s_block: int, normalize: bool, interpret: bool,
):
    bs = BRICK ** 3
    kernel = functools.partial(_sparse_kernel, normalize=normalize)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_pairs,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # lam
            pl.BlockSpec((bs, 3), lambda p, br, bl, fl: (br[p], 0)),
            pl.BlockSpec((3, s_block), lambda p, br, bl, fl: (0, bl[p])),
            pl.BlockSpec((3, s_block), lambda p, br, bl, fl: (0, bl[p])),
        ],
        out_specs=pl.BlockSpec((bs, 3), lambda p, br, bl, fl: (br[p], 0)),
        scratch_shapes=[
            pltpu.VMEM((bs, 1), q_sorted.dtype),
            pltpu.VMEM((bs, 3), q_sorted.dtype),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_bricks * bs, 3), q_sorted.dtype),
        cost_estimate=pl.CostEstimate(
            flops=12 * n_pairs * bs * s_block,
            bytes_accessed=4 * n_pairs * (bs * 3 + s_block * 6),
            transcendentals=2 * n_pairs * bs * s_block,
        ),
        interpret=interpret,
    )(pair_brick, pair_block, pair_flags, lam_arr, q_sorted, sp_t, sv_t)


@functools.partial(
    jax.jit,
    static_argnames=("pair_cap", "nb_cap", "s_block", "normalize", "interpret"),
)
def _sparse_call_segment(
    pair_brick, pair_block, pair_flags, start_row, lam_arr, q_sorted_pad, sp_t, sv_t,
    pair_cap: int, nb_cap: int, s_block: int, normalize: bool, interpret: bool,
):
    """One fixed-geometry segment call: pair arrays are padded to pair_cap
    (brick ids RELATIVE to the segment's first brick), the query window of
    nb_cap bricks starting at ``start_row`` is sliced on device.  All
    segments share this one compiled program."""
    bs = BRICK ** 3
    q_seg = jax.lax.dynamic_slice(
        q_sorted_pad, (start_row, jnp.zeros((), start_row.dtype)), (nb_cap * bs, 3)
    )
    kernel = functools.partial(_sparse_kernel, normalize=normalize)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(pair_cap,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # lam
            pl.BlockSpec((bs, 3), lambda p, br, bl, fl: (br[p], 0)),
            pl.BlockSpec((3, s_block), lambda p, br, bl, fl: (0, bl[p])),
            pl.BlockSpec((3, s_block), lambda p, br, bl, fl: (0, bl[p])),
        ],
        out_specs=pl.BlockSpec((bs, 3), lambda p, br, bl, fl: (br[p], 0)),
        scratch_shapes=[
            pltpu.VMEM((bs, 1), q_sorted_pad.dtype),
            pltpu.VMEM((bs, 3), q_sorted_pad.dtype),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb_cap * bs, 3), q_sorted_pad.dtype),
        cost_estimate=pl.CostEstimate(
            flops=12 * pair_cap * bs * s_block,
            bytes_accessed=4 * pair_cap * (bs * 3 + s_block * 6),
            transcendentals=2 * pair_cap * bs * s_block,
        ),
        interpret=interpret,
    )(pair_brick, pair_block, pair_flags, lam_arr, q_seg, sp_t, sv_t)


def yukawa_field_sparse(
    queries: jnp.ndarray,
    src_points: jnp.ndarray,
    src_vectors: jnp.ndarray,
    lam,
    plan: CullingPlan,
    normalize: bool = True,
    interpret: bool = False,
    pair_cap: int = SMEM_PAIR_CAP,
) -> jnp.ndarray:
    """Culled Yukawa field on grid-node queries in reference flat ordering.

    ``queries`` must be the full (N, 3) grid-node array matching the plan's
    grid; sources are the unsorted (S, 3) arrays (the plan's Morton
    permutation and padding are applied here).  Plans whose pair list exceeds
    the SMEM budget are executed as multiple fixed-geometry segment calls.
    """
    dtype = queries.dtype if interpret else jnp.float32
    q_sorted = queries.astype(dtype)[jnp.asarray(plan.qperm)]
    pts = src_points.astype(dtype)[jnp.asarray(plan.src_perm)]
    vecs = src_vectors.astype(dtype)[jnp.asarray(plan.src_perm)]
    Sp = plan.n_blocks * plan.s_block
    pad = Sp - pts.shape[0]
    if pad:
        pts = jnp.pad(pts, ((0, pad), (0, 0)), constant_values=_FAR)
        vecs = jnp.pad(vecs, ((0, pad), (0, 0)))
    lam_arr = jnp.asarray([lam], dtype)
    bs = BRICK ** 3

    if plan.fits_smem(pair_cap):
        out_sorted = _sparse_call(
            jnp.asarray(plan.pair_brick),
            jnp.asarray(plan.pair_block),
            jnp.asarray(plan.pair_flags),
            lam_arr,
            q_sorted,
            pts.T,
            vecs.T,
            n_pairs=plan.n_pairs,
            num_bricks=plan.qperm.shape[0] // bs,
            s_block=plan.s_block,
            normalize=normalize,
            interpret=interpret,
        )
        return out_sorted[jnp.asarray(plan.qinv)]

    segs, nb_cap = plan.segments(pair_cap)
    q_pad = jnp.pad(q_sorted, ((0, nb_cap * bs), (0, 0)))
    sp_t, sv_t = pts.T, vecs.T
    outs = []
    for seg in segs:
        o = _sparse_call_segment(
            jnp.asarray(seg["brick"]),
            jnp.asarray(seg["block"]),
            jnp.asarray(seg["flags"]),
            jnp.asarray(seg["br_lo"] * bs, jnp.int32),
            lam_arr,
            q_pad,
            sp_t,
            sv_t,
            pair_cap=pair_cap,
            nb_cap=nb_cap,
            s_block=plan.s_block,
            normalize=normalize,
            interpret=interpret,
        )
        outs.append(o[: seg["nb"] * bs])
    out_sorted = jnp.concatenate(outs, axis=0)
    return out_sorted[jnp.asarray(plan.qinv)]
