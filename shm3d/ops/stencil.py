"""Device-side grid stencil operators (JAX, shape (nz, ny, nx)).

Matrix-free reimplementations of the reference's assembled sparse operators
(/root/reference/src/signed_heat_grid_solver.cpp:278-402), validated against
the SciPy constructions in shm3d/domains/grid.py.

Conventions (see shm3d/domains/grid.py): a flat node vector with index
i + j*n + k*n^2 reshapes to a C-order (nz, ny, nx) array u[k, j, i]; axis 2 is
x (the TPU lane dimension), axis 1 is y, axis 0 is z.

The 7-point Laplacian uses *mirrored* boundary differences: the off-grid
neighbor is replaced by the node itself, which is exactly edge-replication
padding.  The gradient is a forward difference whose last entry falls back to
the backward difference (next := curr, curr := prev at the far boundary).
The divergence is the exact adjoint D^T (the reference computes divYt =
D.transpose() * Y, signed_heat_grid_solver.cpp:70-71), obtained here with
``jax.linear_transpose`` so adjointness holds to machine precision.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# axis order of the 3-D layout for the (x, y, z) components
_COMPONENT_AXIS = {0: 2, 1: 1, 2: 0}  # x -> last axis, y -> middle, z -> first


def _shift_next(u: jnp.ndarray, axis: int) -> jnp.ndarray:
    """u[i+1] along ``axis`` with edge replication at the far boundary."""
    ahead = jax.lax.slice_in_dim(u, 1, u.shape[axis], axis=axis)
    last = jax.lax.slice_in_dim(u, u.shape[axis] - 1, u.shape[axis], axis=axis)
    return jnp.concatenate([ahead, last], axis=axis)


def _shift_prev(u: jnp.ndarray, axis: int) -> jnp.ndarray:
    """u[i-1] along ``axis`` with edge replication at the near boundary."""
    first = jax.lax.slice_in_dim(u, 0, 1, axis=axis)
    behind = jax.lax.slice_in_dim(u, 0, u.shape[axis] - 1, axis=axis)
    return jnp.concatenate([first, behind], axis=axis)


def laplacian_apply(u: jnp.ndarray, cell_size) -> jnp.ndarray:
    """L u for the mirrored 7-point Laplacian (negative semi-definite),
    scaled 1/cellSize^2 (signed_heat_grid_solver.cpp:278-334).

    Implemented as one edge-replicated pad plus six slice-adds: the slices
    fuse into a single kernel reading the padded array once, versus six
    materialized shifted copies with per-axis concatenates (the Jacobi
    smoother applies this operator several times per V-cycle, so its memory
    traffic sets the Step-3 per-iteration cost)."""
    up = jnp.pad(u, 1, mode="edge")
    acc = (
        -6.0 * u
        + up[2:, 1:-1, 1:-1] + up[:-2, 1:-1, 1:-1]
        + up[1:-1, 2:, 1:-1] + up[1:-1, :-2, 1:-1]
        + up[1:-1, 1:-1, 2:] + up[1:-1, 1:-1, :-2]
    )
    return acc / (cell_size * cell_size)


def laplacian_diagonal(shape, cell_size, dtype=jnp.float32) -> jnp.ndarray:
    """diag(L) as a (nz, ny, nx) array: -6 plus one per boundary axis
    (the mirrored entry folds into the diagonal)."""
    diag = jnp.full(shape, -6.0, dtype=dtype)
    for axis in range(3):
        n = shape[axis]
        idx = jnp.arange(n)
        bnd = ((idx == 0) | (idx == n - 1)).astype(dtype)
        bshape = [1, 1, 1]
        bshape[axis] = n
        diag = diag + bnd.reshape(bshape)
    return diag / (cell_size * cell_size)


def gradient_apply(u: jnp.ndarray, cell_size) -> jnp.ndarray:
    """Forward-difference gradient -> (nz, ny, nx, 3) with components ordered
    (x, y, z) (signed_heat_grid_solver.cpp:336-402).  At the far boundary the
    entry becomes the backward difference."""
    comps = []
    for comp in range(3):
        axis = _COMPONENT_AXIS[comp]
        n = u.shape[axis]
        fwd = _shift_next(u, axis) - u  # far boundary: u[n-1] - u[n-1] = 0
        # replace last slice with backward difference u[n-1] - u[n-2]
        bwd_last = jax.lax.slice_in_dim(u, n - 1, n, axis=axis) - jax.lax.slice_in_dim(
            u, n - 2, n - 1, axis=axis
        )
        head = jax.lax.slice_in_dim(fwd, 0, n - 1, axis=axis)
        comps.append(jnp.concatenate([head, bwd_last], axis=axis))
    return jnp.stack(comps, axis=-1) / cell_size


def divergence_apply(Y: jnp.ndarray, cell_size) -> jnp.ndarray:
    """D^T Y for Y of shape (nz, ny, nx, 3): the exact adjoint of
    ``gradient_apply`` (reference: divYt = D.transpose() * Y,
    signed_heat_grid_solver.cpp:70-71,179-180)."""
    shape = Y.shape[:3]
    f = functools.partial(gradient_apply, cell_size=cell_size)
    primal = jnp.zeros(shape, dtype=Y.dtype)
    (div,) = jax.linear_transpose(f, primal)(Y)
    return div
