"""Error-free two-float (double-f32) arithmetic for device-resident defect
correction.

TPUs have no fast f64: the x64 emulation works (within f32 RANGE) but is
slow, and the alternative the round-2/3 grid solver used — pulling the f32
field to host and computing residuals in NumPy f64 — moves hundreds of MB
over the remote tunnel per pass (measured: the 256^3 default accuracy tier
spent ~60 s/solve almost entirely on those transfers + slow-host stencils).

The TPU-native fix is classical compensated arithmetic: a value is carried
as an UNEVALUATED PAIR (hi, lo) of f32 with hi = fl(hi + lo), giving an
effective ~48-bit significand.  The only places the grid defect correction
needs more than f32 are the CANCELLING sums — the residual r = b - H u of a
converged iterate cancels ~1e-3..1e-7 of the operand magnitude — and the
accumulation of small corrections into u; everything else (projection of r,
the correction solve itself) operates RELATIVE to the already-small residual
and stays plain f32 (its rounding is 1e-7 * ||r||, far below target).

Algorithms: Knuth two-sum / Dekker split + two-product (see Ogita, Rump,
Oishi, "Accurate Sum and Dot Product", SISC 2005).  XLA does not reassociate
floating-point by default, so the error-free transforms survive jit.

Reference semantics being replaced: the host f64 defect loop in
solvers/grid.py _refine (itself the TPU-era stand-in for the reference's
all-f64 direct solves, /root/reference/src/signed_heat_grid_solver.cpp).
"""

from __future__ import annotations

import jax.numpy as jnp

# Dekker split constants: 2^ceil(p/2) + 1 for a p-bit significand.  Chosen
# per input dtype — the f32 constant silently loses the error-free property
# on f64 inputs (x64 CPU path; advisor r4).
_SPLIT_F32 = 4097.0        # binary32, p=24
_SPLIT_F64 = 134217729.0   # binary64, p=53 -> 2^27 + 1


def _split_const(a, b):
    dt = jnp.result_type(a, b)
    if dt == jnp.float64:
        return jnp.float64(_SPLIT_F64)
    if dt == jnp.float32:
        return jnp.float32(_SPLIT_F32)
    raise TypeError(f"two_prod: unsupported dtype {dt}")


def two_sum(a, b):
    """Error-free transform: a + b = s + e exactly (Knuth, 6 flops)."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def fast_two_sum(a, b):
    """Error-free a + b = s + e, REQUIRES |a| >= |b| elementwise (Dekker)."""
    s = a + b
    return s, b - (s - a)


def two_prod(a, b):
    """Error-free a * b = p + e exactly (Dekker split; no FMA dependence)."""
    split = _split_const(a, b)
    p = a * b
    ca = split * a
    ah = ca - (ca - a)
    al = a - ah
    cb = split * b
    bh = cb - (cb - b)
    bl = b - bh
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def add(x, y):
    """Pair + pair -> normalized pair (|hi| carries the value)."""
    s, e = two_sum(x[0], y[0])
    e = e + (x[1] + y[1])
    return fast_two_sum(s, e)


def add_f32(x, a):
    """Pair + plain f32 array -> pair."""
    s, e = two_sum(x[0], a)
    return fast_two_sum(s, e + x[1])


def neg(x):
    return (-x[0], -x[1])


def scale(x, c):
    """Pair * f32 scalar -> pair (two-product on the high part)."""
    p, pe = two_prod(x[0], c)
    return fast_two_sum(p, pe + x[1] * c)


def sum_pair(terms):
    """Compensated sum of a list of plain f32 arrays -> pair.

    Exact for the cascade (each partial sum's rounding error is captured),
    so the pair equals the true sum to ~2^-48 relative."""
    s = terms[0]
    e = jnp.zeros_like(s)
    for t in terms[1:]:
        s, e1 = two_sum(s, t)
        e = e + e1
    return fast_two_sum(s, e)


def value(x):
    """Collapse a pair to its best f32 representation."""
    return x[0] + x[1]
