"""Device wavefront variant of the greedy ("fast") grid integration.

The reference's fast mode integrates phi along a BFS tree from corner node
(0,0,0) with edge increments from the normalized average of the endpoint
vectors (/root/reference/src/signed_heat_grid_solver.cpp:224-275).  The BFS
is inherently sequential (SURVEY.md §7 hard part 4); the host transcription
(shm3d.oracle.reference.integrate_greedily_grid) is exact but a Python loop
— minutes at 128^3+.  This module is the scalable device variant promised
by SURVEY §7: a level-synchronous wavefront sweep.

Each sweep assigns every unvisited node adjacent to the visited region a
value through ONE deterministic parent — the first visited 6-neighbor in
the reference's own enumeration order (x-, x+, y-, y+, z-, z+) — using the
same normalized-average edge increment.  After D sweeps (D = Manhattan
radius, 3(n-1) worst case) all nodes are assigned.

Semantics note: greedy integration is path-dependent; BFS-queue parenthood
and wavefront parenthood pick different spanning trees, so phi differs from
the host BFS by the (method-inherent) path-integration error, not by a bug.
On a constant field both are exact and identical; the dispatch keeps the
host BFS for small grids (oracle parity) and uses the wavefront where the
host loop is unusable.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _from_parent(a, dim: int, delta: int, fill):
    """Value at each node's parent (node shifted by -delta along dim);
    ``fill`` where the parent is outside the grid."""
    n = a.shape[dim]
    pad = [(0, 0)] * a.ndim
    sl = [slice(None)] * a.ndim
    if delta > 0:
        pad[dim] = (1, 0)
        sl[dim] = slice(0, n)
    else:
        pad[dim] = (0, 1)
        sl[dim] = slice(1, n + 1)
    return jnp.pad(a, pad, constant_values=fill)[tuple(sl)]


@functools.partial(jax.jit, static_argnames=("shape", "sweeps"))
def _sweep_chunk(phi, visited, Y3, cell_size, shape, sweeps: int):
    """Run ``sweeps`` wavefront sweeps (bounded: one XLA program must stay
    under the TPU worker watchdog; the host loops chunks until done)."""
    # array dims are (k, j, i) = (z, y, x); axis a's array dim is 2 - a
    dirs = [(axis, delta) for axis in (0, 1, 2) for delta in (-1, 1)]

    def body(_, state):
        phi, visited = state
        newphi = phi
        chosen = jnp.zeros(shape, bool)
        for axis, delta in dirs:
            dim = 2 - axis
            pvis = _from_parent(visited, dim, delta, False)
            pphi = _from_parent(phi, dim, delta, 0.0)
            pY = _from_parent(Y3, dim, delta, 0.0)
            Yavg = pY + Y3
            Yavg = Yavg / jnp.linalg.norm(Yavg, axis=-1, keepdims=True)
            val = pphi + Yavg[..., axis] * (delta * cell_size)
            take = pvis & ~visited & ~chosen
            newphi = jnp.where(take, val, newphi)
            chosen = chosen | take
        return newphi, visited | chosen

    return jax.lax.fori_loop(0, sweeps, body, (phi, visited))


def greedy_integrate_wavefront(Y, cell_size, shape, chunk_sweeps: int = 64):
    """(N, 3) normalized field -> (N,) phi via wavefront sweeps from corner
    (0,0,0).  Chunked host loop; one pull of the done-flag per chunk."""
    n = shape[0]
    Y3 = Y.reshape(*shape, 3)
    phi = jnp.zeros(shape, Y.dtype)
    visited = jnp.zeros(shape, bool).at[0, 0, 0].set(True)
    max_sweeps = 3 * (n - 1)
    done = 0
    while done < max_sweeps:
        phi, visited = _sweep_chunk(
            phi, visited, Y3, jnp.asarray(cell_size, Y.dtype), shape,
            min(chunk_sweeps, max_sweeps - done),
        )
        done += chunk_sweeps
        if bool(jnp.all(visited)):
            break
    return phi.reshape(-1)
