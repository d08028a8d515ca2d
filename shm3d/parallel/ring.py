"""Ring-scheduled Step-1 Yukawa summation over a device mesh.

The reference's Step-1 hot loop is a brute-force O(Q x S) pairwise summation
(/root/reference/src/signed_heat_grid_solver.cpp:48-65; README.md:77-81 notes
it is unaccelerated).  Structurally it is unnormalized attention, so the
multi-chip decomposition is exactly ring attention (SURVEY.md §2e):

- queries (grid nodes / tet barycenters) are sharded across the mesh axis and
  never move (the DP dimension);
- source shards (points + area-weighted normals) rotate around the ring with
  ``jax.lax.ppermute`` over ICI, one hop per step, overlapping compute with
  the collective;
- each device streams every source shard through its resident queries with
  the same flash-attention-style running-min-exponent rescaling as the
  single-chip kernel (shm3d.ops.yukawa), so no psum is needed at the end —
  after n hops every device has seen every source.

Runs identically on a CPU mesh of virtual devices (tests) and a TPU slice.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.yukawa import _BIG, _FAR


def _block_update(q, sp, sv, lam, m, acc):
    """One source-shard contribution with running-exponent rescaling.

    q (Ql, 3); sp/sv (Sl, 3); m (Ql, 1); acc (Ql, 3) -> (m', acc')."""
    diff = q[:, None, :] - sp[None, :, :]
    # clamp r2 == 0 (query coincident with a source — degenerate snapped
    # tets; see ops.yukawa): b stays nonzero so lam/b is finite and the
    # coincident source dominates the softmin
    r2 = jnp.maximum(jnp.sum(diff * diff, axis=-1),
                     jnp.finfo(diff.dtype).tiny)
    b = lam * jnp.sqrt(r2)  # (Ql, Sl)
    m_new = jnp.minimum(m, jnp.min(b, axis=1, keepdims=True))
    w = jnp.exp(m_new - b) * (lam / b)
    contrib = w @ sv
    rescale = jnp.where(m >= _BIG, 0.0, jnp.exp(m_new - m))
    return m_new, acc * rescale + contrib


def _ring_pass(qr, m, acc, sp, sv, lam, axis_name: str):
    """One full rotation over ``axis_name``: the resident queries ``qr``
    absorb every (sp, sv) shard on this ring, and the shards end up back on
    their home device (n hops of a ring permute).

    Queries are streamed in tiles (lax.map) so the per-hop
    (Q_local x S_local) score block never materializes — at 128^3 over 8
    devices the untiled block would be ~7 GB."""
    n = jax.lax.axis_size(axis_name)
    perm = [(i, (i + 1) % n) for i in range(n)]

    def step(carry, _):
        m, acc, sp_cur, sv_cur = carry

        def tile(args):
            qt, mt, at = args
            return _block_update(qt, sp_cur, sv_cur, lam, mt, at)

        m, acc = jax.lax.map(tile, (qr, m, acc))
        sp_nxt = jax.lax.ppermute(sp_cur, axis_name, perm)
        sv_nxt = jax.lax.ppermute(sv_cur, axis_name, perm)
        return (m, acc, sp_nxt, sv_nxt), None

    (m, acc, sp, sv), _ = jax.lax.scan(step, (m, acc, sp, sv), None, length=n)
    return m, acc, sp, sv


def _finalize(m, acc, normalize: bool):
    m = m.reshape(-1, 1)
    acc = acc.reshape(-1, 3)
    if normalize:
        return acc / jnp.sqrt(jnp.sum(acc * acc, axis=1, keepdims=True))
    return acc * jnp.exp(-m)


def _init_carry(q, q_tile: int, axis_names):
    T = q.shape[0] // q_tile
    qr = q.reshape(T, q_tile, 3)
    m0 = jnp.full((T, q_tile, 1), _BIG, dtype=q.dtype)
    acc0 = jnp.zeros((T, q_tile, 3), dtype=q.dtype)
    # mark the device-invariant initial carry as device-varying for the scan
    m0 = jax.lax.pcast(m0, tuple(axis_names), to="varying")
    acc0 = jax.lax.pcast(acc0, tuple(axis_names), to="varying")
    return qr, m0, acc0


def _ring_body(q, sp, sv, lam, axis_name: str, normalize: bool, q_tile: int):
    """Per-device program, 1-D mesh: one ring pass over ``axis_name``."""
    qr, m0, acc0 = _init_carry(q, q_tile, (axis_name,))
    m, acc, _, _ = _ring_pass(qr, m0, acc0, sp, sv, lam, axis_name)
    return _finalize(m, acc, normalize)


def _ring_body_hier(q, sp, sv, lam, inner_axis: str, outer_axis: str,
                    normalize: bool, q_tile: int):
    """Per-device program, 2-D mesh (multi-slice): hierarchical ring.

    ``inner_axis`` is the fast intra-slice fabric (ICI), ``outer_axis`` the
    slow inter-slice link (DCN).  Each outer step runs a complete inner ring
    pass — every device absorbs all source shards currently resident on its
    slice, and the shards return home — then forwards the slice's shard to
    the peer device of the next slice with ONE ppermute over the outer axis.
    DCN therefore carries n_slices-1 transfers of one local shard each,
    amortized over an entire slice's worth of compute per transfer (the
    hierarchical layout the scaling recipe prescribes: frequent hops on ICI,
    rare hops on DCN)."""
    n_out = jax.lax.axis_size(outer_axis)
    perm_out = [(i, (i + 1) % n_out) for i in range(n_out)]
    qr, m0, acc0 = _init_carry(q, q_tile, (inner_axis, outer_axis))

    def outer(carry, _):
        m, acc, sp_cur, sv_cur = carry
        m, acc, sp_cur, sv_cur = _ring_pass(qr, m, acc, sp_cur, sv_cur, lam,
                                            inner_axis)
        sp_cur = jax.lax.ppermute(sp_cur, outer_axis, perm_out)
        sv_cur = jax.lax.ppermute(sv_cur, outer_axis, perm_out)
        return (m, acc, sp_cur, sv_cur), None

    (m, acc, _, _), _ = jax.lax.scan(outer, (m0, acc0, sp, sv), None,
                                     length=n_out)
    return _finalize(m, acc, normalize)


def yukawa_field_ring(
    queries: jnp.ndarray,
    src_points: jnp.ndarray,
    src_vectors: jnp.ndarray,
    lam,
    mesh: Mesh,
    normalize: bool = True,
    q_tile: int = 4096,
) -> jnp.ndarray:
    """Ring-scheduled Yukawa field over ``mesh``.

    A 1-D mesh (axes ``("d",)``) runs the flat ICI ring; a 2-D multi-slice
    mesh (axes ``("s", "d")`` — DCN slice axis major, see
    shm3d.parallel.device_mesh) runs the hierarchical ring: inner rotations
    on ICI, one inter-slice forward per inner pass on DCN.

    Accepts arbitrary (Q, 3) queries and (S, 3) sources: both are padded
    here to shard evenly (sources with far-away zero-weight entries, queries
    with zeros whose garbage rows are sliced off).  Returns (Q, 3) sharded
    like the queries.  Works inside or outside jit.
    """
    axes = tuple(mesh.axis_names)
    ndev = int(mesh.devices.size)
    dtype = queries.dtype
    Q = queries.shape[0]
    S = src_points.shape[0]

    Sp = -(-S // ndev) * ndev
    if Sp != S:
        src_points = jnp.pad(src_points, ((0, Sp - S), (0, 0)), constant_values=_FAR)
        src_vectors = jnp.pad(src_vectors, ((0, Sp - S), (0, 0)))

    t = min(q_tile, -(-Q // ndev))
    Qp = ndev * (-(-Q // (ndev * t))) * t
    qpad = jnp.pad(queries, ((0, Qp - Q), (0, 0))) if Qp != Q else queries

    lam = jnp.asarray(lam, dtype)
    if len(axes) == 1:
        body = functools.partial(
            _ring_body, lam=lam, axis_name=axes[0],
            normalize=normalize, q_tile=t,
        )
    else:
        body = functools.partial(
            _ring_body_hier, lam=lam, inner_axis=axes[-1],
            outer_axis=axes[0], normalize=normalize, q_tile=t,
        )
    spec = P(axes)  # dim 0 sharded over all mesh axes, slice-major
    fn = jax.shard_map(
        lambda q, sp, sv: body(q, sp, sv),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
    )
    out = fn(qpad, src_points, src_vectors)
    return out[:Q]
