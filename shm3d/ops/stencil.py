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


# ---------------------------------------------------------------------------
# two-float (pair) variants for device-resident defect correction
#
# The refinement residual r = b - H u cancels most of its operands'
# magnitude; evaluating it in plain f32 caps refinement at ~1e-7 relative.
# These variants carry the CANCELLING sums as error-free (hi, lo) pairs
# (solve/twofloat): the +-1-coefficient stencil sums are compensated exactly
# and the 1/h, 1/h^2 scalings multiply by a host-split f64 pair scalar, so
# no systematic 1e-7 operator-scale error enters the residual.


def _scalar_pair(c: float, dtype):
    """Host-split f64 scalar -> (hi, lo) pair of ``dtype``."""
    import numpy as np

    np_dtype = np.dtype(str(jnp.dtype(dtype)))
    hi = np_dtype.type(c)
    lo = np_dtype.type(np.float64(c) - np.float64(hi))
    return hi, lo


def _mul_scalar_pair(x, c_hi, c_lo):
    from ..solve import twofloat as tf

    p, pe = tf.two_prod(x[0], c_hi)
    return tf.fast_two_sum(p, pe + (x[0] * c_lo + x[1] * c_hi))


def laplacian_apply_pair(u_hi: jnp.ndarray, u_lo: jnp.ndarray, cell_size):
    """Pair-accurate L u for the mirrored 7-point Laplacian on a pair field
    (u_hi, u_lo).  Returns an (hi, lo) pair equal to the exact f64 stencil
    applied to (u_hi + u_lo) up to ~2^-48 relative."""
    from ..solve import twofloat as tf

    up = jnp.pad(u_hi, 1, mode="edge")
    p, pe = tf.two_prod(u_hi, jnp.asarray(-6.0, u_hi.dtype))
    s = tf.sum_pair([
        p,
        up[2:, 1:-1, 1:-1], up[:-2, 1:-1, 1:-1],
        up[1:-1, 2:, 1:-1], up[1:-1, :-2, 1:-1],
        up[1:-1, 1:-1, 2:], up[1:-1, 1:-1, :-2],
    ])
    s = (s[0], s[1] + pe)
    # the low component is ~2^-24 of the high one: plain precision suffices
    s = tf.add_f32(s, laplacian_apply(u_lo, 1.0))
    c_hi, c_lo = _scalar_pair(1.0 / (float(cell_size) * float(cell_size)),
                              u_hi.dtype)
    return _mul_scalar_pair(s, c_hi, c_lo)


def _adjoint_terms(y: jnp.ndarray, axis: int):
    """Signed +-1-coefficient term arrays of the UNSCALED adjoint of the
    forward-difference gradient along ``axis`` (far-boundary backward
    fallback): (D^T y)_j = y_{j-1} - y_j for interior j, with
    (D^T y)_0 = -y_0, (D^T y)_{n-2} = y_{n-3} - y_{n-2} - y_{n-1},
    (D^T y)_{n-1} = y_{n-2} + y_{n-1}."""
    n = y.shape[axis]
    assert n >= 3, "pair divergence requires >= 3 nodes per axis"
    zero = jnp.zeros_like(jax.lax.slice_in_dim(y, 0, 1, axis=axis))
    ym1 = jnp.concatenate(
        [zero, jax.lax.slice_in_dim(y, 0, n - 1, axis=axis)], axis=axis)
    y_last = jax.lax.slice_in_dim(y, n - 1, n, axis=axis)
    head_shape = list(y.shape)
    head_shape[axis] = n - 2
    zeros_head = jnp.zeros(head_shape, y.dtype)
    corr = jnp.concatenate([zeros_head, -y_last, 2.0 * y_last], axis=axis)
    return [ym1, -y, corr]


def divergence_apply_pair(Y: jnp.ndarray, cell_size):
    """Pair-accurate D^T Y (same adjoint as ``divergence_apply``; validated
    against it in f64 by tests/test_twofloat.py)."""
    from ..solve import twofloat as tf

    terms = []
    for comp in range(3):
        terms.extend(_adjoint_terms(Y[..., comp], _COMPONENT_AXIS[comp]))
    s = tf.sum_pair(terms)
    c_hi, c_lo = _scalar_pair(1.0 / float(cell_size), Y.dtype)
    return _mul_scalar_pair(s, c_hi, c_lo)
