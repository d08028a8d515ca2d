"""Steps 1 & 2 on device: blockwise Yukawa vector diffusion + normalization.

The asymptotic hot spot of the whole method is the pairwise summation
``X(q) = sum_s n_s w_s exp(-lambda |p_s - q|)/|p_s - q|`` over all
(query, source) pairs — a brute-force O(Q x S) double loop in the reference
(/root/reference/src/signed_heat_grid_solver.cpp:48-65,157-174;
/root/reference/src/signed_heat_tet_solver.cpp:54-72,131-147; README.md:77-81
explicitly notes it is unaccelerated but "trivially parallelizable").

Structurally this is unnormalized attention: queries = grid nodes / tet
barycenters, keys = source points, values = area-weighted normals.  We
therefore implement it exactly like a flash-attention kernel (SURVEY.md §2e):
(Q_tile x S_block) score tiles streamed through VMEM with running (Q_tile, 3)
accumulators, never materializing the Q x S matrix.  The final per-query
normalization X /= |X| (Step 2) is fused into the last source block.

Two implementations with identical semantics:
- ``yukawa_field_xla``: pure jnp lax.map over query tiles (runs anywhere —
  CPU oracle parity tests, TPU fallback).
- ``yukawa_field_pallas``: the Pallas TPU kernel (the framework's signature
  kernel).

Padding contract: sources are padded with zero weights at a far-away point so
padded entries contribute exactly 0; padded queries produce garbage rows that
are sliced off.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Padding location for sources; yields weight exactly 0.  Must satisfy
# (3*_FAR^2) finite in f32: the kernel computes r2 = dx^2+dy^2+dz^2 and
# (lam*r2)*rsqrt(r2) — with r2 = inf that is inf*0 = NaN.  1e17 keeps
# r2 ~ 3e34 < f32 max while exp(-lam*r) still underflows to exactly 0.
_FAR = 1e17
_BIG = 3e38  # sentinel for "no exponent minimum seen yet" (finite in f32)


def _pad_to(x: jnp.ndarray, size: int, value) -> jnp.ndarray:
    pad = size - x.shape[0]
    if pad == 0:
        return x
    widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, widths, constant_values=value)


def pad_sources(points, vectors, block: int):
    """Pad source arrays to a multiple of ``block`` with zero-contribution
    entries."""
    S = points.shape[0]
    Sp = -(-S // block) * block
    return _pad_to(points, Sp, _FAR), _pad_to(vectors, Sp, 0.0)


# ---------------------------------------------------------------------------
# XLA (jnp) implementation


def yukawa_field_xla(
    queries: jnp.ndarray,
    src_points: jnp.ndarray,
    src_vectors: jnp.ndarray,
    lam,
    q_tile: int = 2048,
    normalize: bool = True,
) -> jnp.ndarray:
    """Blocked jnp implementation; same tiling as the Pallas kernel."""
    dtype = queries.dtype
    Q = queries.shape[0]
    Qp = -(-Q // q_tile) * q_tile
    qpad = _pad_to(queries, Qp, 0.0).reshape(-1, q_tile, 3)
    lam = jnp.asarray(lam, dtype)
    out = _xla_map_tiles(qpad, src_points, src_vectors, lam, normalize)
    return out.reshape(Qp, 3)[:Q].astype(dtype)


@functools.partial(jax.jit, static_argnames=("normalize",))
def _xla_map_tiles(qpad, src_points, src_vectors, lam, normalize: bool):
    """jitted so repeat solves reuse the compiled scan — an eager lax.map
    closure re-traced (and recompiled) every call, costing ~1 s per warm
    CPU solve."""

    def tile_fn(q):
        # (q_tile, S) pairwise distances; same arithmetic as the Pallas
        # kernel (rsqrt form) so the two implementations agree bitwise.
        diff = q[:, None, :] - src_points[None, :, :]
        r2 = jnp.sum(diff * diff, axis=-1)
        # r2 == 0 (a query ON a source point — degenerate snapped tets put
        # barycenters exactly on source vertices, polygon-bear) gives
        # rsqrt(0) = inf and b = 0*inf = NaN, poisoning the running min.
        # Clamping to the smallest normal keeps inv finite and makes the
        # coincident source dominate the softmin — the correct limit.
        r2 = jnp.maximum(r2, jnp.finfo(r2.dtype).tiny)
        inv = jax.lax.rsqrt(r2)
        b = (lam * r2) * inv  # lam * r
        # Numerically-stable (flash-attention-style) evaluation: factor out
        # the per-query min of lam*r so far queries don't underflow exp to 0
        # in f32 (which would make the normalized field 0/0 = NaN; the f64
        # reference never underflows at these scales).  The normalized
        # direction is invariant to the exp(-m) scaling.
        m = jnp.min(b, axis=-1, keepdims=True)  # (q_tile, 1)
        w = jnp.exp(m - b) * inv
        X = jax.lax.dot_general(
            w, src_vectors,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=w.dtype,
        )  # (q_tile, 3)
        if normalize:
            X = X / jnp.linalg.norm(X, axis=-1, keepdims=True)
        else:
            X = X * jnp.exp(-m)
        return X

    return jax.lax.map(tile_fn, qpad)


# ---------------------------------------------------------------------------
# Pallas TPU kernel


def _yukawa_kernel(lam_ref, q_ref, sp_ref, sv_ref, out_ref, m_ref, acc_ref, *, normalize, s_blocks):
    """One (query-tile, source-block) grid step.

    q_ref: (QT, 3) query positions        [VMEM]
    sp_ref: (3, SB) source points, transposed  [VMEM]
    sv_ref: (3, SB) source vectors (n*w), transposed [VMEM]
    out_ref: (QT, 3) output; written in the final s step.
    m_ref: (QT, 1) scratch — running per-query min of lam*r over the s blocks.
    acc_ref: (QT, 3) scratch — accumulator of exp(m - lam*r)/r weighted sums.

    Flash-attention-style streaming: weights exp(-lam*r)/r are accumulated
    relative to the running exponent minimum m so far-away queries don't
    underflow to an all-zero (-> NaN after normalize) vector in f32; the
    normalized field is invariant to the exp(-m) factor.  The rescale
    recurrence is exactly the flash-attention softmax trick with
    scores = -lam*r (SURVEY.md §2e: this summation *is* unnormalized
    attention).
    """
    s = pl.program_id(1)

    @pl.when(s == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, _BIG)

    lam = lam_ref[0]
    # (QT, 1) - (1, SB) -> (QT, SB) per coordinate.  dx/dy/dz are formed by
    # direct subtraction (no |q|^2+|s|^2-2qs MXU trick: that cancels
    # catastrophically for near pairs, exactly the ones that dominate the
    # normalized direction).
    dx = q_ref[:, 0:1] - sp_ref[0:1, :]
    dy = q_ref[:, 1:2] - sp_ref[1:2, :]
    dz = q_ref[:, 2:3] - sp_ref[2:3, :]
    r2 = dx * dx + dy * dy + dz * dz
    # clamp r2 == 0 (query coincident with a source; see yukawa_field_xla)
    r2 = jnp.maximum(r2, jnp.finfo(r2.dtype).tiny)
    inv = jax.lax.rsqrt(r2)  # 1/r: one hw op replaces sqrt + divide
    b = (lam * r2) * inv  # lam * r
    m_old = m_ref[:]
    m_new = jnp.minimum(m_old, jnp.min(b, axis=1, keepdims=True))
    # Padded sources sit at r=inf: b=inf, exp(m-inf)=0; m_new stays finite
    # because every query sees at least one real source in some block.
    w = jnp.exp(m_new - b) * inv  # exp(m - lam r)/r
    # Accumulate the three components on the MXU: (QT, SB) @ (SB, 3).  The
    # matmul is tiny next to the elementwise work above and frees the VPU of
    # three cross-lane reductions.
    contrib = jax.lax.dot_general(
        w, sv_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=w.dtype,
    )
    rescale = jnp.exp(m_new - m_old)
    # First block: m_old = _BIG sentinel, acc = 0 -> rescale value irrelevant.
    rescale = jnp.where(m_old >= _BIG, 0.0, rescale)
    acc_ref[:] = acc_ref[:] * rescale + contrib
    m_ref[:] = m_new

    @pl.when(s == s_blocks - 1)
    def _():
        X = acc_ref[:]
        if normalize:
            norm = jnp.sqrt(jnp.sum(X * X, axis=1, keepdims=True))
            out_ref[:] = X / norm
        else:
            out_ref[:] = X * jnp.exp(-m_ref[:])


def yukawa_field_pallas(
    queries: jnp.ndarray,
    src_points: jnp.ndarray,
    src_vectors: jnp.ndarray,
    lam,
    q_tile: int = 1024,
    s_block: int = 1024,
    normalize: bool = True,
    interpret: bool = False,
    q_chunk: int = 1 << 21,
) -> jnp.ndarray:
    """Pallas blockwise Yukawa summation.  float32 on TPU; the compute dtype
    follows the query dtype (f64 only meaningful in interpret mode on CPU).

    queries (Q, 3); src_points/src_vectors (S, 3); returns (Q, 3).

    Queries are processed in chunks of at most ``q_chunk`` rows: the pallas
    custom call constrains its (N, 3) operands to row-major layout, whose
    (8, 128)-tiled HBM form pads the minor dim 3 -> 128 lanes (a 42.7x copy;
    at 256^3 a single call would materialize two 8 GB temporaries and OOM a
    16 GB chip).  Chunking keeps the padded copies ~1 GB and transient, and
    bounds per-program runtime under the TPU worker watchdog."""
    dtype = queries.dtype if interpret else jnp.float32
    Q = queries.shape[0]
    queries = queries.astype(dtype)
    sp, sv = pad_sources(src_points.astype(dtype), src_vectors.astype(dtype), s_block)
    S = sp.shape[0]
    s_block = min(s_block, S)
    q_tile = min(q_tile, max(8, Q))
    lam_arr = jnp.asarray([lam], dtype=dtype)
    sp_t, sv_t = sp.T, sv.T

    def run(qrows):
        Qp = -(-qrows.shape[0] // q_tile) * q_tile
        call = _pallas_call_cached(
            Qp, S, q_tile, s_block, normalize, interpret, jnp.dtype(dtype).name
        )
        return call(lam_arr, _pad_to(qrows, Qp, 0.0), sp_t, sv_t)

    if Q <= q_chunk:
        return run(queries)[:Q]
    # equal-size chunks reuse one compiled program; the ragged tail (if any)
    # compiles a second, smaller one
    outs = [run(queries[i : i + q_chunk]) for i in range(0, Q - q_chunk + 1, q_chunk)]
    tail = Q % q_chunk
    if tail:
        outs.append(run(queries[Q - tail :]))
    return jnp.concatenate(outs, axis=0)[:Q]


@functools.lru_cache(maxsize=64)
def _pallas_call_cached(Qp, S, q_tile, s_block, normalize, interpret, dtype_name):
    """jit-compiled pallas_call builder, cached on the static launch geometry
    so repeat solves don't re-trace/lower the kernel."""
    dtype = jnp.dtype(dtype_name)
    s_blocks = S // s_block
    grid = (Qp // q_tile, s_blocks)
    kernel = functools.partial(_yukawa_kernel, normalize=normalize, s_blocks=s_blocks)

    def call(lam_arr, qpad, sp_t, sv_t):
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((q_tile, 3), lambda i, s: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((3, s_block), lambda i, s: (0, s), memory_space=pltpu.VMEM),
                pl.BlockSpec((3, s_block), lambda i, s: (0, s), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((q_tile, 3), lambda i, s: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Qp, 3), dtype),
            scratch_shapes=[
                pltpu.VMEM((q_tile, 1), dtype),
                pltpu.VMEM((q_tile, 3), dtype),
            ],
            cost_estimate=pl.CostEstimate(
                flops=12 * Qp * S,
                bytes_accessed=4 * (Qp * 3 * 2 + S * 6 * grid[0]),
                transcendentals=2 * Qp * S,
            ),
            interpret=interpret,
        )(lam_arr, qpad, sp_t, sv_t)

    return jax.jit(call)


def yukawa_field(
    queries,
    src_points,
    src_vectors,
    lam,
    normalize: bool = True,
    use_pallas: Optional[bool] = None,
    **kwargs,
):
    """Dispatch: Pallas on TPU, XLA elsewhere.  Pallas/Mosaic kernels fail
    to compile when x64 is globally enabled (index maps trace to i64), so
    x64 processes take the XLA path."""
    if use_pallas is None:
        use_pallas = (
            jax.default_backend() == "tpu" and not jax.config.jax_enable_x64
        )
    if use_pallas:
        return yukawa_field_pallas(queries, src_points, src_vectors, lam, normalize=normalize, **kwargs)
    return yukawa_field_xla(queries, src_points, src_vectors, lam, normalize=normalize)
